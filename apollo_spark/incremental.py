"""Incremental append: extend an existing checkpointed dedup run with a
delta of new images without recomputing the corpus.

The reference's incrementality surface (SURVEY.md §2.9) is append-mode
Cassandra writes (bags.py:23, hasher.py:186-201), hashes-only resetdb
(cassandra_utils.py:66,78-81), deferred WMH-parameter reuse
(hasher.py:159-166) and cached-index subset processing
(__main__.py:95-110). The Spark-native equivalent:

  1. weight the delta's features against the FROZEN vocab checkpoint
     (doc/model/wmh.md:14-17 — signatures are only comparable when the
     model is reused; df drift is accepted exactly as the reference
     accepts it between bags runs);
  2. WMH-hash and band the delta only (params regenerate from the seed —
     nothing to load);
  3. append bags/signatures/bands deltas to the stage tables;
  4. invalidate and recompute only the cheap global stages (candidate
     extension passes, CC, clusters) — CC warm-starts are unnecessary
     because the fixpoint's working set is |dup edges|, not the corpus.

Cost per delta: O(|delta|) extraction+hashing + one CC over dup edges —
vs O(|corpus|) for a full rerun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apollo_spark.checkpoint import CheckpointCatalog
from apollo_spark.config import PipelineConfig
from apollo_spark.stages import bags as bags_stage
from apollo_spark.stages import hashst

DERIVED_STAGES = ["simhash_pairs", "substring_membership", "cc", "clusters",
                  "clusters_refined", "cluster_eval"]


def delta_fingerprint(new_images: DataFrame) -> str:
    """Order-insensitive identity of a delta: xor of image-id hashes plus
    the row count (one distributed agg, no collect). Shared by the batch
    append and the streaming ingest so a crash-replayed micro-batch maps
    to the same manifest entry."""
    fp_row = new_images.agg(
        F.expr("bit_xor(xxhash64(image_id))").alias("s"),
        F.count(F.lit(1)).alias("n")).first()
    return f"{int(fp_row['s'] or 0) & 0xFFFFFFFFFFFFFFFF:x}-{fp_row['n']}"


def append_images(spark: SparkSession, all_images: DataFrame | None,
                  new_images: DataFrame, cfg: PipelineConfig,
                  out_dir: str, extensions: bool = True,
                  refine: bool = False, evaluate: bool = False,
                  append_images_stage: bool = False) -> dict:
    """Append ``new_images`` to the run checkpointed at ``out_dir``.

    ``all_images`` must be the full corpus INCLUDING the delta (the
    extension candidate passes and singleton accounting scan it once) — or
    None with ``append_images_stage=True``, in which case the delta is
    appended to the checkpointed ``images`` stage inside the delta's
    begin/commit window and the extended stage table becomes the corpus
    (the streaming-ingest path: no caller-held corpus handle needed).
    Returns the same {stage: DataFrame} dict as run_pipeline.
    """
    if all_images is None and not append_images_stage:
        raise ValueError("all_images=None requires append_images_stage")
    cat = CheckpointCatalog(spark, out_dir, cfg)
    if not cat.is_complete("vocab") or not cat.is_complete("bands"):
        raise ValueError(f"no completed base run at {out_dir}")
    vocab = cat.load("vocab")
    ndocs = int(cat.stage_info("vocab")["ndocs"])

    # delta identity recorded pending -> committed in the manifest so a
    # duplicate invocation is refused and a crash between the stage appends
    # is detectable (ADVICE r1: non-atomic appends silently duplicated rows)
    delta_id = delta_fingerprint(new_images)
    cat.begin_delta(delta_id)

    feats = bags_stage.extract_features(new_images, cfg)
    delta_bags = bags_stage.weight_bags(feats, vocab, ndocs, cfg) \
        .localCheckpoint()
    cat.append("bags", delta_bags)
    delta_sigs = hashst.signatures(delta_bags, cfg).localCheckpoint()
    cat.append("signatures", delta_sigs)
    cat.append("bands", hashst.bands(delta_sigs, cfg),
               partition_by=["hashtable"])
    if append_images_stage:
        cat.append("images", new_images)
    if all_images is None:
        all_images = cat.load("images")
    cat.commit_delta(delta_id)

    # global stages derive from the (now extended) bands — rebuild them
    cat.reset([s for s in DERIVED_STAGES])
    from apollo_spark.pipeline import run_pipeline
    return run_pipeline(spark, all_images, cfg, out_dir,
                        extensions=extensions, refine=refine,
                        evaluate=evaluate)
