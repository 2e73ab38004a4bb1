"""Feature extractors: document -> weighted bag of namespaced tokens.

Retargeted analogues of the reference's sourced-ml extractors (SURVEY.md
§2.3): the *shape* is identical — each extractor emits namespaced tokens with
term frequencies, merged into one bag per document, later TF-IDF-weighted
over a global document-frequency table (hasher.py:16,227) with per-extractor
weight multipliers (hasher.py:102-131).

  phash_ngrams     : sliding bit n-grams over the 64-bit perceptual hash
                     (analogue of uast2seq node n-grams) -> "ph.<off>:<bits>"
  caption_shingles : character k-shingles of the caption (analogue of
                     id/lit token bags) -> "cs.<shingle>"

These run inside pandas UDFs on executors AND inside the pure-NumPy oracle
replica — one definition, both paths.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

PHASH_NS = "ph."
CAPTION_NS = "cs."


def phash_ngrams(ph: int, bits: int = 8, stride: int = 4) -> list[str]:
    """Bit n-grams of a signed-int64 phash; tf of each token is 1."""
    u = int(ph) & 0xFFFFFFFFFFFFFFFF  # two's-complement view of int64
    mask = (1 << bits) - 1
    return [f"{PHASH_NS}{off}:{(u >> off) & mask}"
            for off in range(0, 65 - bits, stride)]


def caption_shingles(caption: str, k: int = 3) -> Counter:
    """Character k-shingles with occurrence counts (tf)."""
    if caption is None:
        return Counter()
    if len(caption) < k:
        return Counter({f"{CAPTION_NS}{caption}": 1}) if caption else Counter()
    return Counter(f"{CAPTION_NS}{caption[i:i + k]}"
                   for i in range(len(caption) - k + 1))


def doc_bag(ph: int, caption: str, *, bits: int = 8, stride: int = 4,
            k: int = 3) -> Counter:
    """Merged multi-extractor bag for one document."""
    bag = caption_shingles(caption, k)
    for tok in phash_ngrams(ph, bits, stride):
        bag[tok] += 1
    return bag


def log_tf_log_idf(df: np.ndarray, tf: np.ndarray,
                   ndocs: int) -> np.ndarray:
    """TF-IDF weighting used by the reference (hasher.py:16,227; sourced-ml
    defines it as log(1 + tf) * log(ndocs / df))."""
    return np.log1p(tf) * np.log(ndocs / df)
