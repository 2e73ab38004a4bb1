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
