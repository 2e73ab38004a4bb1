"""cc stage: LSH bands -> connected components as iterative DataFrame joins.

Replaces the reference's driver-RAM BFS (graph.py:63-148 — every bucket and
element resident on one machine) with min-label propagation over the
bipartite doc<->bucket graph, expressed purely as joins/aggregations so it
shards across executors (the north_rule's "iterative connected-components
expressed as DataFrame self-joins"):

  label(doc)   <- min(label over docs sharing any of its buckets)
  (one round = groupBy bucket min + join back + groupBy doc min)

Converges in O(component diameter) rounds — near-dup components are shallow.
Scale devices:
  * singleton buckets pruned up front (the overwhelming majority at low
    collision rates) — docs only ever shuffle with genuinely co-bucketed docs;
  * each round ends in localCheckpoint() to truncate lineage (the classic
    iterative-join pitfall);
  * bucket keys stay composite (hashtable, band) — exact, no hash-collision
    false merges at 10^12 scale;
  * AQE handles hot (hashtable, band) skew; pair *materialization* is the
    only quadratic step and is capped/salted in stages/pairs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from apollo_spark.config import PipelineConfig


def multi_member_bands(bands: DataFrame) -> DataFrame:
    """Membership restricted to buckets with >= 2 docs (A3 size guard)."""
    sizes = (bands.groupBy("hashtable", "band")
             .agg(F.count(F.lit(1)).alias("n")))
    return (bands.join(sizes.filter("n >= 2").select("hashtable", "band"),
                       ["hashtable", "band"])
            .select("image_id", "hashtable", "band"))


def connected_components(bands: DataFrame, cfg: PipelineConfig,
                         all_ids: DataFrame | None = None) -> DataFrame:
    """-> cc(image_id string, cc_id string) for every banded doc.

    cc_id = lexicographic min image_id of the component (stable, needs no
    dense relabeling — the reference's uint32 remapping, graph.py:29-46, is
    a Cassandra artifact we drop). Docs in no multi-member bucket are
    singleton components (cc_id = own id); pass ``all_ids`` to include docs
    that produced no bands at all (empty bags).
    """
    memb = multi_member_bands(bands).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        labels = (memb.select("image_id").distinct()
                  .withColumn("label", F.col("image_id"))
                  .localCheckpoint())
        for _ in range(cfg.max_cc_iterations):
            bucket_min = (memb.join(labels, "image_id")
                          .groupBy("hashtable", "band")
                          .agg(F.min("label").alias("blabel")))
            new_labels = (memb.join(bucket_min, ["hashtable", "band"])
                          .groupBy("image_id")
                          .agg(F.min("blabel").alias("label"))
                          .localCheckpoint())
            changed = (new_labels.alias("n")
                       .join(labels.withColumnRenamed("label", "old"),
                             "image_id")
                       .filter(F.col("label") != F.col("old")).count())
            labels = new_labels
            if changed == 0:
                break
        cc = labels.withColumnRenamed("label", "cc_id")
        if all_ids is not None:
            singletons = (all_ids.select("image_id")
                          .join(cc.select("image_id"), "image_id", "left_anti")
                          .withColumn("cc_id", F.col("image_id")))
            cc = cc.unionByName(singletons)
        return cc
    finally:
        memb.unpersist()


def component_sizes(cc: DataFrame) -> DataFrame:
    """G5 triage input: (cc_id, n)."""
    return cc.groupBy("cc_id").agg(F.count(F.lit(1)).alias("n"))


def clusters(cc: DataFrame) -> DataFrame:
    """Final clusters table (FIXTURES.md §2): non-singleton components with
    a stable numeric id alongside the representative doc id."""
    sizes = component_sizes(cc).filter("n >= 2")
    return (cc.join(sizes, "cc_id")
            .select(F.xxhash64("cc_id").alias("cluster_id"),
                    F.col("cc_id").alias("rep"), "image_id"))


def dup_pairs(cc: DataFrame) -> DataFrame:
    """All within-component pairs (a < b) — the recall currency. Quadratic
    per component; evaluation-scale only (components are small in dedup;
    guarded upstream by bucket caps)."""
    a = cc.select(F.col("cc_id"), F.col("image_id").alias("a"))
    b = cc.select(F.col("cc_id"), F.col("image_id").alias("b"))
    return (a.join(b, "cc_id")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
