"""Axis-extension candidate passes (north_star additions; no reference
counterpart — SURVEY.md §2.3 "axis ext" rows).

1. SimHash Hamming-ball over ``phash``: split the 64-bit hash into d+1 = 4
   16-bit blocks (pigeonhole: any pair within Hamming distance <= 3 agrees
   exactly on >= 1 block), join per block, verify the exact distance with
   JVM-side xor+bit_count, emit verified pairs. Hot blocks (near-constant
   images) are capped before the self-join — the quadratic guard.

2. Exact-substring pass over ``caption``: winnowed L-gram fingerprints
   (Schleimer/Wilkerson/Aiken's winnowing, SIGMOD'03 — the MOSS scheme):
   every window of WINNOW_W consecutive gram hashes contributes its
   minimum, so any two captions sharing an exact substring of length
   >= L + WINNOW_W - 1 are GUARANTEED to share a fingerprint — a hard
   guarantee, unlike the mod-p sampling it replaced (which could leave an
   arbitrarily long stretch unsampled). Shared-gram buckets above the cap
   are dropped (stop-phrase guard); surviving buckets feed CC as extra
   membership rows. Gram hashes use the portable md5-60bit so the DuckDB
   oracle reproduces the pass bit-for-bit.

Both passes integrate with the CC fixpoint either as pair-edges
(``pairs_as_membership``) or directly as bucket membership, unioned with the
WMH bands before label propagation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apollo_spark.config import PipelineConfig

SIMHASH_HT = -1      # hashtable ids for synthetic (non-WMH) membership rows
SUBSTRING_HT = -2
EDGE_HT = -3

_BLOCKS = 4          # 4 x 16-bit blocks -> guarantees Hamming <= 3
_SIMHASH_BUCKET_CAP = 256
WINNOW_W = 4         # winnowing window: guarantee at L + WINNOW_W - 1 chars,
                     # expected fingerprint density 2/(WINNOW_W + 1)


def simhash_pairs(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Verified near-duplicate phash pairs: (a, b), Hamming <= cfg.simhash_max_hamming."""
    blocks = F.explode(F.expr(
        f"transform(sequence(0, {_BLOCKS - 1}), "
        f"i -> struct(i as blk, shiftright(phash, i * 16) & 65535 as val))"))
    tagged = (images.select("image_id", "phash", blocks.alias("b"))
              .select("image_id", "phash",
                      F.col("b.blk").alias("blk"), F.col("b.val").alias("val")))
    sizes = tagged.groupBy("blk", "val").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {_SIMHASH_BUCKET_CAP}") \
        .select("blk", "val")
    t = tagged.join(ok, ["blk", "val"])
    a = t.select("blk", "val", F.col("image_id").alias("a"),
                 F.col("phash").alias("pa"))
    b = t.select("blk", "val", F.col("image_id").alias("b"),
                 F.col("phash").alias("pb"))
    return (a.join(b, ["blk", "val"])
            .filter(F.col("a") < F.col("b"))
            .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                    <= cfg.simhash_max_hamming)
            .select("a", "b").distinct())


def substring_membership(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Winnowed L-gram fingerprint buckets as CC membership rows
    (image_id, hashtable=SUBSTRING_HT, band binary).

    Per caption: hash every L-gram (portable md5-60bit), take the minimum
    over each sliding window of WINNOW_W positions (trailing partial
    windows included — harmless for the guarantee, and identical to the
    oracle's ROWS BETWEEN CURRENT ROW AND W-1 FOLLOWING spec), distinct.

    The whole winnow is ONE narrow projection over per-row arrays
    (transform/slice/array_min/array_distinct) — captions are short, so
    the per-doc gram array is tiny and the per-doc window NEVER needs a
    shuffle. The first cut used a window function partitioned by image_id;
    that paid a full shuffle + per-partition sort for what is row-local
    arithmetic (measured 65 s -> array form ~15 s at 480k rows,
    local[1])."""
    L, W = cfg.substring_min_len, WINNOW_W
    gh_arr = (
        f"transform("
        f"  filter(transform(sequence(0, greatest(length(caption) - {L}, 0)),"
        f"                   i -> substring(caption, i + 1, {L})),"
        f"         g -> length(g) >= {L}),"
        f"  g -> cast(conv(substring(md5(g), 1, 15), 16, 10) AS bigint))")
    winnow = (
        f"CASE WHEN size(gh) = 0 THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size(gh) - 1), "
        f"     i -> array_min(slice(gh, i + 1, {W})))) END")
    fp = (images.selectExpr("image_id", f"{gh_arr} AS gh")
          .selectExpr("image_id", f"explode({winnow}) AS gh"))
    sizes = fp.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {cfg.bucket_pair_cap}").select("gh")
    return (fp.join(ok, "gh")
            .select("image_id", F.lit(SUBSTRING_HT).alias("hashtable"),
                    F.encode(F.col("gh").cast("string"), "utf-8")
                    .alias("band")))


def pairs_as_membership(pairs: DataFrame, hashtable: int = EDGE_HT) -> DataFrame:
    """(a, b) verified pairs -> two membership rows per pair with a unique
    synthetic bucket key, so the CC fixpoint consumes edges and buckets
    uniformly."""
    key = F.encode(F.concat_ws("|", F.col("a"), F.col("b")), "utf-8") \
        .alias("band")
    a = pairs.select(F.col("a").alias("image_id"),
                     F.lit(hashtable).alias("hashtable"), key)
    b = pairs.select(F.col("b").alias("image_id"),
                     F.lit(hashtable).alias("hashtable"), key)
    return a.unionByName(b)
