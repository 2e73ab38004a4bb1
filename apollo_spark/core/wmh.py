"""Weighted MinHash (Ioffe consistent weighted sampling).

Sample math matches the reference's golden CPU implementation
(/root/reference/apollo/hasher.py:237-256) exactly, in float32:

    t    = floor(ln(w_f) / r[i,f] + beta[i,f])
    ln_y = (t - beta[i,f]) * r[i,f]
    ln_a = ln_c[i,f] - ln_y - r[i,f]
    k    = argmin_f ln_a          (ties -> lowest feature, like nanargmin)
    sample i = (k, uint32(t[k]))

**Parameter source — the one deliberate deviation, for 10^12-row scale.**
The reference materializes dense float32 parameter matrices rs/ln_cs/betas of
shape (K, vocab) on a GPU (hasher.py:66-87, doc/model/wmh.md:5-13); at a
10M-feature vocabulary that is ~15 GB — unshippable to executors. We instead
derive each feature's parameter column *on demand* from a counter-based RNG
keyed by (seed, feature_hash): r and c are Gamma(2,1) (as Ioffe's scheme and
libMHCUDA's generator prescribe), beta is Uniform(0,1), via splitmix64 +
inverse-transform. Deterministic, reproducible from the seed alone (the
``wmh_params`` resume artifact is just (seed, size) — stronger than the
reference's "must reuse the params file" contract, doc/model/wmh.md:14-17),
zero broadcast bytes, and identical in the NumPy oracle and the Spark kernel,
so cluster-assignment parity is preserved at the same config.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Hash-affecting kernel format version. Folded into the checkpoint config
# fingerprint (checkpoint.py): ANY change to signature/band math (parameter
# generation, uniform mapping, argmin tie-break, blob layout) must bump this
# so old checkpoints are invalidated instead of silently extended with
# incomparable signatures (ADVICE r1: the f64->f32x2 rewrite would have mixed
# kernels under the config-only fingerprint).
KERNEL_VERSION = "wmh-cws-f32x2-v2"

_PHI = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_DRAWS = 5  # counter stride per (feature, sample); >= the 3 hash rounds
            # consumed (r/c/beta draws), kept at 5 for headroom


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + _PHI).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


_EXP32_ONE = np.uint32(0x3F800000)  # IEEE-754 float32 exponent for [1, 2)


def _two_uniforms(bits64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash array -> two independent float32 uniforms in (0, 1].

    Bit trick instead of an integer->float convert (the convert was 50% of
    kernel time at scale): reinterpret each 64-bit hash as two uint32
    halves, graft 23 mantissa bits onto the [1, 2) exponent, reinterpret as
    float32, and map [1, 2) -> (0, 1] via 2 - x. Zero is impossible, so
    log() downstream is always finite."""
    h32 = bits64.view(np.uint32).reshape(*bits64.shape, 2)
    f = ((h32 >> np.uint32(9)) | _EXP32_ONE).view(np.float32)
    two = np.float32(2.0)
    return two - f[..., 0], two - f[..., 1]


def feature_hash(feature: str) -> int:
    """Stable 64-bit feature id (blake2b-8); shared by Spark stage and oracle."""
    return int.from_bytes(
        hashlib.blake2b(feature.encode("utf-8"), digest_size=8).digest(),
        "little")


def feature_hash_series(features) -> np.ndarray:
    """Vectorized-ish hashing of a pandas Series of feature strings."""
    cache: dict[str, int] = {}
    fh = feature_hash
    return np.fromiter((cache.get(f) or cache.setdefault(f, fh(f))
                        for f in features), dtype=np.uint64, count=len(features))


def gen_params_for(feat_hashes: np.ndarray, sample_size: int,
                   seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parameters for given features: rs, ln_cs, betas, each float32
    (sample_size, n_features). Column j belongs to feat_hashes[j].
    rs, cs ~ Gamma(2, 1), betas ~ Uniform(0, 1) — the Ioffe CWS scheme the
    reference's generator implements (hasher.py:66-87 via libMHCUDA)."""
    return _params_chunk(np.asarray(feat_hashes, dtype=np.uint64),
                         0, sample_size, seed)


def weighted_minhash(v: np.ndarray, sample_size: int, rs: np.ndarray,
                     ln_cs: np.ndarray, betas: np.ndarray) -> np.ndarray:
    """Single-document dense oracle (semantics of hasher.py:237-256).

    ``v``: float32 weights over the vocabulary (columns of the param
    matrices); zeros are treated as absent. Returns uint32 (sample_size, 2)
    of (argmin column index, t value) pairs. Used only by tests and the
    pure-NumPy reference replica; the production path is ``wmh_batch``.
    """
    if sample_size != rs.shape[0]:
        raise ValueError(f"sample size mismatch, expecting {rs.shape[0]}")
    if len(v) != rs.shape[1]:
        raise ValueError(f"dimension mismatch, expecting {rs.shape[1]}")
    v = np.asarray(v, dtype=np.float32).copy()
    zeros = v == 0
    if zeros.all():
        raise ValueError("Input is all zeros")
    v[zeros] = np.nan
    vlog = np.log(v)
    out = np.zeros((sample_size, 2), dtype=np.uint32)
    for i in range(sample_size):
        t = np.floor(vlog / rs[i] + betas[i])
        ln_y = (t - betas[i]) * rs[i]
        ln_a = ln_cs[i] - ln_y - rs[i]
        k = int(np.nanargmin(ln_a))
        out[i][0] = np.uint32(k)
        out[i][1] = np.uint32(int(t[k]) & 0xFFFFFFFF)
    return out


def wmh_batch(indptr: np.ndarray, feat_hashes: np.ndarray,
              weights: np.ndarray, sample_size: int, seed: int,
              chunk: int = 8) -> np.ndarray:
    """Batched sparse kernel — the production path inside mapInPandas.

    Documents are CSR-style segments: doc d owns rows
    indptr[d]:indptr[d+1] of (feat_hashes, weights), rows sorted by
    feat_hash ascending within each doc (fixes argmin tie-breaking to match
    the dense oracle's lowest-index rule). weights must be > 0.

    Returns uint32 (ndocs, sample_size, 2) where [:, :, 0] is the low 32
    bits of the winning feature hash and [:, :, 1] the t value. Fully
    vectorized: params are generated once per *unique* feature in the batch,
    segmented argmin via two ufunc.reduceat passes; O(nnz * K) work,
    O(chunk * nnz) peak memory (~5 float32 (chunk, nnz) buffers, reused
    across chunks — ~100 MB/task at the default chunk and a 640k-nnz
    Arrow batch).

    Round-6 tuning, measured on a real 480k-corpus batch (10k docs,
    nnz 635k, uniq 9.8k) and BIT-EXACT vs the previous loop (so no
    KERNEL_VERSION bump): chunk 4 -> 8 amortizes the reduceat and loop
    fixed costs (-21%); preallocated gather targets (np.take(..., out=))
    plus np.repeat for the per-row min expansion (sequential write instead
    of a (C, nnz) random gather of mins[:, doc_of_row]) take the rest
    (2.11 s -> 1.37 s per batch, -35%; tools/profile_wmh.py).
    """
    nnz = len(feat_hashes)
    ndocs = len(indptr) - 1
    if nnz == 0:
        return np.empty((0, sample_size, 2), dtype=np.uint32)
    if (weights <= 0).any():
        raise ValueError("weights must be positive")
    vlog = np.log(weights.astype(np.float32))  # float32, matches oracle
    uniq, inv = np.unique(feat_hashes.astype(np.uint64), return_inverse=True)
    starts = indptr[:-1].astype(np.int64)
    lens = np.diff(indptr).astype(np.int64)
    row_ids = np.arange(nnz, dtype=np.int32)
    nnz32 = np.int32(nnz)
    k_lo32 = (feat_hashes.astype(np.uint64) & np.uint64(0xFFFFFFFF)) \
        .astype(np.uint32)
    out = np.empty((ndocs, sample_size, 2), dtype=np.uint32)

    C = min(chunk, sample_size)
    r = np.empty((C, nnz), np.float32)
    b = np.empty((C, nnz), np.float32)
    lc = np.empty((C, nnz), np.float32)
    t = np.empty((C, nnz), np.float32)
    ln_a = np.empty((C, nnz), np.float32)
    for c0 in range(0, sample_size, C):
        c1 = min(sample_size, c0 + C)
        if c1 - c0 != C:  # ragged tail chunk (last iteration only)
            r, b, lc = r[:c1 - c0], b[:c1 - c0], lc[:c1 - c0]
            t, ln_a = t[:c1 - c0], ln_a[:c1 - c0]
        # params for this sample-chunk over unique features: (C, U) float32
        rs_u, ln_cs_u, betas_u = _params_chunk(uniq, c0, c1, seed)
        np.take(rs_u, inv, axis=1, out=r)
        np.take(betas_u, inv, axis=1, out=b)
        np.take(ln_cs_u, inv, axis=1, out=lc)
        # in-place arithmetic: these (C, nnz) temporaries dominate memory
        # traffic, which is what throttles concurrent executor kernels
        np.divide(vlog[None, :], r, out=t)
        t += b
        np.floor(t, out=t)
        np.subtract(t, b, out=ln_a)
        ln_a *= r
        np.subtract(lc, ln_a, out=ln_a)
        ln_a -= r
        mins = np.minimum.reduceat(ln_a, starts, axis=1)       # (C, ndocs)
        is_min = ln_a == np.repeat(mins, lens, axis=1)
        cand = np.where(is_min, row_ids[None, :], nnz32)
        first = np.minimum.reduceat(cand, starts, axis=1)      # (C, ndocs)
        out[:, c0:c1, 0] = k_lo32[first].T
        tk = np.take_along_axis(t, first, axis=1)              # (C, ndocs)
        out[:, c0:c1, 1] = (tk.astype(np.int64)
                            & np.int64(0xFFFFFFFF)).astype(np.uint32).T
    return out


def _params_chunk(uniq_hashes: np.ndarray, c0: int, c1: int,
                  seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Param rows [c0, c1) for the given unique feature hashes."""
    h = uniq_hashes.astype(np.uint64)
    base = splitmix64(np.asarray([np.uint64(seed)], dtype=np.uint64))[0]
    i = np.arange(c0, c1, dtype=np.uint64)[:, None]
    ctr = (h[None, :] ^ base) + (i * np.uint64(_DRAWS)) * _PHI

    # 3 hash rounds yield 6 32-bit uniforms (2 per 64-bit hash); all math in
    # float32 (the output dtype anyway — hasher.py:80-87 params are float32).
    u0, u1 = _two_uniforms(splitmix64(ctr))
    u2, u3 = _two_uniforms(splitmix64(ctr + _M1))
    betas, _ = _two_uniforms(splitmix64(ctr + _M2))
    # Gamma(2,1) = -ln(u1*u2); one log of the product, not two logs
    rs = -np.log(u0 * u1)
    ln_cs = np.log(-np.log(u2 * u3))
    return rs, ln_cs, betas


def pack_signature(sig: np.ndarray) -> bytes:
    """uint32 (K, 2) -> little-endian blob, same layout as the reference's
    ``bytearray(wmh.data)`` (hasher.py:196)."""
    return np.ascontiguousarray(sig, dtype="<u4").tobytes()


def band_slices(sig_bytes: bytes, htnum: int, band_size: int) -> list[bytes]:
    """Band i = raw bytes of samples [i*r, (i+1)*r) (hasher.py:95-99);
    8 bytes per (k, t) sample pair; leftover K - b*r samples unused."""
    w = 8 * band_size
    return [sig_bytes[i * w:(i + 1) * w] for i in range(htnum)]
