"""LSH (b, r) parameter optimization.

Same optimization the reference performs (/root/reference/apollo/hasher.py:25-58,
itself adapted from the public datasketch project): grid-search all (b, r)
with b*r <= K minimizing
    fp_weight * integral_0^t [1 - (1 - s^r)^b] ds
  + fn_weight * integral_t^1 [1 - (1 - (1 - s^r)^b)] ds.

scipy is unavailable here, so the integrals use composite Simpson on a fixed
fine grid (error O(h^4) ~ 1e-13 at h=1e-3 for these smooth integrands — far
below the gap between adjacent grid points of the *discrete* argmin, so the
selected (b, r) matches the scipy-quad-based reference).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_STEPS = 2000  # Simpson subintervals per integral (even)


def _simpson(y: np.ndarray, h: float) -> float:
    n = len(y) - 1
    s = y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum()
    return float(s * h / 3.0)


def _false_positive_probability(threshold: float, b: int, r: int) -> float:
    s = np.linspace(0.0, threshold, _STEPS + 1)
    y = 1.0 - (1.0 - s ** float(r)) ** float(b)
    return _simpson(y, threshold / _STEPS)


def _false_negative_probability(threshold: float, b: int, r: int) -> float:
    s = np.linspace(threshold, 1.0, _STEPS + 1)
    y = 1.0 - (1.0 - (1.0 - s ** float(r)) ** float(b))
    return _simpson(y, (1.0 - threshold) / _STEPS)


@lru_cache(maxsize=None)
def calc_hashtable_params(threshold: float, sample_size: int,
                          false_positive_weight: float = 0.5,
                          false_negative_weight: float = 0.5) -> tuple[int, int]:
    """Optimal (number of hashtables b, band size r), b*r <= sample_size.

    Vectorized over r for each b; semantics identical to the reference's
    nested-loop scan (hasher.py:47-58) including tie-breaking (strict '<'
    keeps the first/lowest (b, r) encountered in b-major order).
    """
    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, sample_size + 1):
        max_r = sample_size // b
        for r in range(1, max_r + 1):
            fp = _false_positive_probability(threshold, b, r)
            fn = _false_negative_probability(threshold, b, r)
            error = fp * false_positive_weight + fn * false_negative_weight
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt
