"""Axis-extension candidate passes (north_star additions; no reference
counterpart — SURVEY.md §2.3 "axis ext" rows).

1. SimHash Hamming-ball over ``phash``: split the 64-bit hash into d+1 = 4
   16-bit blocks (pigeonhole: any pair within Hamming distance <= 3 agrees
   exactly on >= 1 block), join per block, verify the exact distance with
   JVM-side xor+bit_count, emit verified pairs. Hot blocks (near-constant
   images) are capped before the self-join — the quadratic guard.

2. Exact-substring pass over ``caption``: mod-p sampled L-gram fingerprints
   (winnowing-style): a gram at position i is kept iff xxhash64(gram) % p == 0,
   so any two captions sharing an exact substring of length >= L + p - 1 are
   guaranteed to share a sampled gram. Shared-gram buckets above the cap are
   dropped (stop-phrase guard); surviving buckets feed CC as extra membership
   rows.

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
_GRAM_MOD = 4        # mod-p sampling rate for substring fingerprints


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
    """Sampled L-gram fingerprint buckets as CC membership rows
    (image_id, hashtable=SUBSTRING_HT, band binary)."""
    L = cfg.substring_min_len
    grams = F.explode(F.expr(
        f"transform(sequence(0, greatest(length(caption) - {L}, 0)), "
        f"i -> substring(caption, i + 1, {L}))"))
    g = (images.select("image_id", grams.alias("gram"))
         .filter(F.length("gram") >= L)
         .withColumn("gh", F.xxhash64("gram"))
         .filter(F.pmod(F.col("gh"), F.lit(_GRAM_MOD)) == 0)
         .select("image_id", "gh").distinct())
    sizes = g.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {cfg.bucket_pair_cap}").select("gh")
    return (g.join(ok, "gh")
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
