"""Deterministic synthetic ``images`` corpus (FIXTURES.md §1).

Schema = BASELINE.json:input_hint exactly:
  images(image_id string, bytes binary, w int, h int, fmt string,
         caption string, phash long)
plus a side table truth(image_id string, gt_cluster long) used only by tests.

Generation is **block-partitioned**: the id space is split into fixed-size
blocks, each block seeded independently with PCG64(seed * 1e9 + block_id) and
containing whole clusters (no cross-block duplicates). That makes generation
embarrassingly parallel — at 10^12 rows the same ``gen_block`` runs inside
``mapInPandas`` over ``spark.range(n_blocks)`` with zero driver data; at test
scale we call it directly. Seed 42 everywhere per FIXTURES.md.

Planted structure per FIXTURES.md: ~60% singletons, the rest clusters of size
2-8; members are the base image re-encoded (lossy 'jpeg', PSNR>=40dB) or with
<=2% pixel noise; captions within a cluster differ by <=2 character edits.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from apollo_spark.functions import codecs, phash

BLOCK = 1000  # rows per generation block

_WORDS = [
    "amber", "anchor", "arch", "atlas", "aurora", "basalt", "beacon", "birch",
    "bloom", "breeze", "canyon", "cedar", "cinder", "cliff", "cloud", "comet",
    "coral", "crest", "delta", "drift", "dune", "ember", "fern", "fjord",
    "flint", "forge", "frost", "gale", "glade", "glint", "gorge", "granite",
    "grove", "harbor", "haze", "heath", "hollow", "isle", "jade", "juniper",
    "karst", "kelp", "lagoon", "larch", "ledge", "lichen", "loam", "lumen",
    "marsh", "meadow", "mesa", "mist", "moor", "moss", "night", "oasis",
    "ochre", "onyx", "opal", "orchard", "pebble", "pine", "plume", "prairie",
    "quarry", "quartz", "reef", "ridge", "river", "rust", "sage", "shale",
    "shoal", "shore", "slate", "snow", "spire", "spring", "steppe", "stone",
    "storm", "strand", "summit", "surf", "thicket", "thorn", "tide", "timber",
    "trail", "tundra", "umber", "vale", "vapor", "verge", "wave", "willow",
    "wind", "zephyr",
]


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 13))
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _edit_caption(cap: str, rng: np.random.Generator) -> str:
    """<=2 single-character substitutions (cluster members stay near-dup)."""
    chars = list(cap)
    for _ in range(int(rng.integers(0, 3))):
        pos = int(rng.integers(0, len(chars)))
        if chars[pos] != " ":
            chars[pos] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(chars)


def _perturb(base: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """<=2% of pixels get +-8 noise."""
    out = base.copy()
    h, w, _ = out.shape
    k = max(1, int(0.02 * h * w))
    ys = rng.integers(0, h, k)
    xs = rng.integers(0, w, k)
    delta = rng.integers(-8, 9, (k, 3))
    out[ys, xs] = np.clip(out[ys, xs].astype(np.int32) + delta, 0, 255).astype(np.uint8)
    return out


def gen_block(block_id: int, seed: int = 42, rows: int = BLOCK) -> pd.DataFrame:
    """Generate one deterministic block; returns images+gt_cluster columns."""
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_000_007 + block_id))
    recs: list[tuple] = []
    cluster_local = 0
    while len(recs) < rows:
        remaining = rows - len(recs)
        r = rng.random()
        if r < 0.6 or remaining == 1:
            size = 1
        elif r < 0.8:
            size = min(2, remaining)
        else:
            size = min(int(rng.integers(3, 9)), remaining)
        gt = block_id * BLOCK + cluster_local
        cluster_local += 1
        side_w = int(rng.integers(32, 65))
        side_h = int(rng.integers(32, 65))
        base = rng.integers(0, 256, (side_h, side_w, 3)).astype(np.uint8)
        base_cap = _caption(rng)
        for m in range(size):
            if m == 0:
                px, cap = base, base_cap
            else:
                px = _perturb(base, rng) if rng.random() < 0.5 else base
                cap = _edit_caption(base_cap, rng)
            fmt = "jpeg" if rng.random() < 0.5 else "png"
            quality = int(rng.integers(85, 96))
            data = codecs.encode(px, fmt, quality)
            ph = phash.phash64(codecs.decode(data))
            rid = block_id * BLOCK + len(recs)
            recs.append((f"img{rid:010d}", data, side_w, side_h, fmt, cap, ph, gt))
    return pd.DataFrame(
        recs, columns=["image_id", "bytes", "w", "h", "fmt",
                       "caption", "phash", "gt_cluster"])


def gen_corpus(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation for tests/small scales (whole blocks)."""
    n_blocks = max(1, (n_rows + BLOCK - 1) // BLOCK)
    parts = [gen_block(b, seed, min(BLOCK, n_rows - b * BLOCK))
             for b in range(n_blocks)]
    return pd.concat(parts, ignore_index=True)


IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")
FULL_SCHEMA = IMAGES_SCHEMA + ", gt_cluster long"


def images_df(spark, n_rows: int, seed: int = 42, with_truth: bool = False):
    """Distributed corpus generation: spark.range(blocks) -> mapInPandas.

    This is the 10^12-scale entry point: no data ever sits on the driver
    (contrast the reference's driver-resident batches, hasher.py:179-181).
    """
    n_blocks = max(1, (n_rows + BLOCK - 1) // BLOCK)
    blocks = spark.range(n_blocks).repartition(
        min(n_blocks, spark.sparkContext.defaultParallelism * 2))

    def gen(iterator):
        for pdf in iterator:
            for b in pdf["id"].tolist():
                rows = min(BLOCK, n_rows - b * BLOCK)
                out = gen_block(int(b), seed, rows)
                yield out if with_truth else out.drop(columns=["gt_cluster"])

    schema = FULL_SCHEMA if with_truth else IMAGES_SCHEMA
    return blocks.mapInPandas(gen, schema=schema)


def cached_corpus_path(n_rows: int, seed: int = 42,
                       root: str = "/tmp/apollo_spark_corpus") -> str:
    """Parquet cache for repeated test/bench runs; generated once per size."""
    path = os.path.join(root, f"images_n{n_rows}_s{seed}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil
        import tempfile
        os.makedirs(root, exist_ok=True)
        pdf = gen_corpus(n_rows, seed)
        tmp = tempfile.mkdtemp(dir=root)
        pdf.to_parquet(os.path.join(tmp, "part-0.parquet"), index=False)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    return path
