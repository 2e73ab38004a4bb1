"""Pure-Python XXH64 for 64-bit integer inputs, matching Spark's
``F.xxhash64(<long column>)`` (seed 42).

Implements the fixed-width specialization of the public XXH64 algorithm
(Yann Collet's xxHash spec, BSD — the same algorithm Spark's
``XxHash64Function.hashLong`` implements): an 8-byte input skips the
stripe loop entirely, so the whole hash is one mix + avalanche. Having
it host-side lets the DuckDB oracles replay plans whose DETERMINISM
depends on xxhash64 ordering — e.g. the IVF codebook's hash-ordered
sample (ops/similarity.kmeans_centroids) — without a SparkSession.
Bit-parity with the JVM implementation is pinned by
tests/test_core.py::test_xxhash64_long_matches_spark.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42  # Spark's default xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit (two's-complement) integer; returns the SIGNED
    64-bit result exactly as Spark's xxhash64 column would carry it."""
    v = value & _MASK
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
    h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
    # avalanche
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_longs(values, seed: int = SPARK_SEED) -> np.ndarray:
    """Vectorized form over an int64 array -> int64 array of signed
    hashes (same values as xxhash64_long element-wise)."""
    return np.fromiter((xxhash64_long(int(v), seed) for v in values),
                       dtype=np.int64, count=len(values))


def _round(acc: int, val: int) -> int:
    acc = (acc + val * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def xxhash64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string, matching Spark's ``F.xxhash64(<string
    column>)`` (which hashes the UTF-8 bytes with seed 42 via
    ``XXH64.hashUnsafeBytesBlock`` — the standard xxHash64 layout: 32-byte
    stripes over 4 lanes, then 8-byte words, one 4-byte word, then single
    bytes). Returns the SIGNED 64-bit value exactly as the Spark column
    carries it. Lets DuckDB oracles reproduce Spark-side surrogate ids
    like ``clusters.cluster_id = xxhash64(cc_id)`` by injecting a
    host-computed (string -> hash) VALUES map. Bit-parity with the JVM
    pinned by tests/test_core.py::test_xxhash64_bytes_matches_spark."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h ^= k
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """xxhash64_bytes over the UTF-8 encoding — the exact twin of Spark's
    xxhash64 on a StringType column."""
    return xxhash64_bytes(s.encode("utf-8"), seed)
