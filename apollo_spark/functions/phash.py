"""64-bit DCT perceptual hash, pure NumPy, deterministic.

Standard public pHash recipe: grayscale -> area-average resize to 32x32 ->
2-D DCT-II -> top-left 8x8 low-frequency block (skipping nothing; the DC term
is included in the median but excluded from biasing by using the median
itself) -> bit i set iff coefficient > median. Packed MSB-first into a signed
int64 (matching the ``phash:int64`` column of BASELINE.json:input_hint).

This is the analogue of the reference's content-derived document features
(reference extracts UAST bags via sourced-ml; we derive image features from
pixels). Vectorized: ``phash_batch`` hashes a list of images with one DCT
matrix reused across the batch.
"""

from __future__ import annotations

import numpy as np

_N = 32  # resize target
_K = 8   # low-frequency block


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n x n), float64."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT = _dct_matrix(_N)


def _to_gray(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float64 luma (ITU-R BT.601)."""
    p = pixels.astype(np.float64)
    return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]


def _resize_area(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Deterministic area-average resize to (n, n) via bin-summation."""
    h, w = gray.shape
    # integer bin edges; every source pixel contributes to exactly one bin
    ys = (np.arange(h) * n) // h
    xs = (np.arange(w) * n) // w
    out = np.zeros((n, n), dtype=np.float64)
    cnt = np.zeros((n, n), dtype=np.float64)
    np.add.at(out, (ys[:, None], xs[None, :]), gray)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return out / np.maximum(cnt, 1.0)


def phash64(pixels: np.ndarray) -> int:
    """Perceptual hash of one (h, w, 3) uint8 image -> signed int64."""
    small = _resize_area(_to_gray(pixels))
    coeffs = _DCT @ small @ _DCT.T
    block = coeffs[:_K, :_K].ravel()
    med = np.median(block)
    bits = block > med
    v = np.uint64(0)
    for b in bits:  # 64 iterations, MSB first
        v = (v << np.uint64(1)) | np.uint64(bool(b))
    return int(v.astype(np.int64))


def phash_batch(images: list[np.ndarray]) -> np.ndarray:
    """Hash a batch; returns int64[len(images)]."""
    out = np.empty(len(images), dtype=np.int64)
    for i, img in enumerate(images):
        out[i] = phash64(img)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 phash arrays."""
    x = (a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
