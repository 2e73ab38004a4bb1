"""A/B the CC label fixpoint: legacy (v1) vs the shipped exchange-reduced
loop (v2 == stages/cc.py label_fixpoint since round 6) vs two rejected
variants — two-rounds-per-barrier (v3) and a partition-local union-find
contraction prepass (v4).

Measured on the real 677k-edge star graph of the 480k scaling corpus at
local[4], best of 3: v1 13.47 s / v2 9.62 s (-29%) / v3 23.46 s (rejected:
the doubled-depth job costs more than the saved barrier). Parity 0
mismatches for both v2 and v3 against v1.

v4 (REJECTED, round 6): zero-shuffle mapInPandas union-find per partition
before the v2 loop — the classic local-contraction device for cutting
fixpoint rounds. Parity 0 mismatches at every scale tried, but SLOWER on
the bucket-chain graph shape this pipeline produces: 7.19 s vs v2's
5.72 s at 480k-synth / 7.00 vs 4.59 at 50k (best-of-3, local[4]). Root
cause: star contraction has already collapsed bucket-local structure, so
the fixpoint converges in ~3 pointer-jumped rounds and the prepass can
save at most ~1 of them, while its own cost (Arrow transfer of the full
edge list through Python + a checkpoint job) exceeds one round's barrier.
Would only pay on graphs with deep cross-bucket chains (diameter >> 8);
re-try there, not here.

v2 hypothesis (round-6 fixpoint-floor work): the 1->4 scaling floor of the
fixpoint (~10 s at local[4] on 677k contracted edges, BASELINE.md cc-stage
profile) is per-round exchange + barrier latency. Three devices cut it:

  1. the symmetric edge list is repartitioned by ``src`` ONCE and
     checkpointed — localCheckpoint preserves outputPartitioning, so every
     round's propagation join stops re-shuffling 2x|edges| rows;
  2. labels are repartitioned by ``image_id`` at round end (inside the same
     round job), so both label joins of the NEXT round are co-partitioned;
  3. round 1 collapses to a groupBy: star edges always point downward
     (rep = bucket min < member), so with identity labels the first
     propagation equals min(own, min fwd rep) — one agg, no joins.

Usage:
  python tools/fixpoint_ab.py --edges <parquet> --cores 4 [--impl v1|v2|both]
  python tools/fixpoint_ab.py --synth 200000 --cores 4      # synthetic graph

Correctness: both impls must produce identical (image_id, cc_id) sets; the
script asserts it when --impl both.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def fixpoint_v1(edges: DataFrame, max_iter: int) -> DataFrame:
    """Frozen copy of the pre-round-6 label_fixpoint (identity init, no
    pre-partitioning) — the A/B baseline. stages/cc.py now ships v2, so
    the legacy loop lives here to keep the comparison reproducible."""
    fwd = edges.select(F.col("image_id").alias("src"),
                       F.col("rep").alias("dst"))
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (edges.select("image_id")
              .unionByName(edges.select(F.col("rep").alias("image_id")))
              .distinct()
              .withColumn("label", F.col("image_id"))
              .localCheckpoint(eager=False))
    changed = 0
    for _ in range(max_iter):
        prop = (sym.join(labels.withColumnRenamed("image_id", "src"), "src")
                .groupBy(F.col("dst").alias("image_id"))
                .agg(F.min("label").alias("nlabel")))
        mids = (labels.join(prop, "image_id", "left")
                .select("image_id",
                        F.least("label", F.coalesce("nlabel", "label"))
                        .alias("mid"),
                        F.col("label").alias("old")))
        parents = mids.select(F.col("image_id").alias("mid"),
                              F.col("mid").alias("pmid"))
        new_labels = (mids.join(parents, "mid", "left")
                      .select("image_id",
                              F.coalesce("pmid", "mid").alias("new_label"),
                              "old")
                      .localCheckpoint(eager=False))
        changed = new_labels.filter(
            F.col("new_label") != F.col("old")).count()
        labels = new_labels.select(
            "image_id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    if changed:
        import warnings
        warnings.warn(f"fixpoint_v1 hit max_iter with {changed} moving",
                      RuntimeWarning, stacklevel=2)
    return labels.withColumnRenamed("label", "cc_id")


def local_contract(edges: DataFrame) -> DataFrame:
    """Partition-local union-find contraction (v4 prepass candidate):
    each task unions every edge it holds and re-emits its local
    components as stars rooted at the local min id — ZERO shuffle (runs
    over whatever partitioning the edge list already has), one
    Arrow-batched pass. Connectivity is preserved exactly (the union of
    per-partition spanning stars spans the same global components), the
    output edge count drops from |edges| to <= |distinct nodes per
    partition| minus the local component count, and — the actual target —
    the contracted graph's diameter collapses by the local fragment
    depth, so the distributed fixpoint needs fewer barrier rounds.
    Roots are local MINIMA, so the star-edge invariant rep < image_id
    that v2's init aggregate exploits still holds. Per-task memory is a
    dict over the partition's distinct node ids — bounded by the input
    split size (maxPartitionBytes), not the corpus."""
    import pandas as pd

    def kernel(it):
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in it:
            for a, b in zip(pdf["image_id"], pdf["rep"]):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        out_n, out_r = [], []
        for n in parent:
            r = find(n)
            if r != n:
                out_n.append(n)
                out_r.append(r)
        yield pd.DataFrame({"image_id": out_n, "rep": out_r})

    return edges.mapInPandas(kernel, schema="image_id string, rep string")


def fixpoint_v4(edges: DataFrame, max_iter: int, cc_stage) -> DataFrame:
    """v4 = local_contract prepass + the shipped v2 loop over the
    contracted stars. Hypothesis: the fixpoint floor is per-round barrier
    latency, so buying fewer rounds with one fully-parallel zero-shuffle
    pass is net positive whenever the input graph has cross-bucket
    chains deeper than one partition fragment."""
    contracted = local_contract(edges).localCheckpoint()
    return cc_stage.label_fixpoint(contracted, max_iter)


def fixpoint_v3(edges: DataFrame, max_iter: int) -> DataFrame:
    """v2's exchange elimination PLUS two propagate+jump passes per
    materialization barrier. The cc-stage profile (BASELINE.md round 6)
    attributes the local[4] fixpoint floor to per-round barrier latency
    (driver-blocking convergence count per round); fusing two rounds into
    one job halves the barrier count for at most one propagation pass of
    overshoot after convergence."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fwd = edges.select(F.col("image_id").alias("src"),
                       F.col("rep").alias("dst"))
    sym = (fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
           .repartition(npart, "src")
           .localCheckpoint(eager=False))
    nodes = (edges.select(F.col("image_id").alias("src"))
             .unionByName(edges.select(F.col("rep").alias("src")))
             .distinct())
    labels = (fwd.unionByName(nodes.withColumn("dst", F.col("src")))
              .groupBy("src").agg(F.min("dst").alias("label"))
              .withColumnRenamed("src", "image_id")
              .repartition(npart, "image_id")
              .localCheckpoint(eager=False))

    def one_pass(labels: DataFrame) -> DataFrame:
        prop = (sym.join(labels.withColumnRenamed("image_id", "src"), "src")
                .groupBy(F.col("dst").alias("image_id"))
                .agg(F.min("label").alias("nlabel")))
        mids = (labels.join(prop, "image_id", "left")
                .select("image_id",
                        F.least("label", F.coalesce("nlabel", "label"))
                        .alias("mid")))
        parents = mids.select(F.col("image_id").alias("mid"),
                              F.col("mid").alias("pmid"))
        return (mids.join(parents, "mid", "left")
                .select("image_id",
                        F.coalesce("pmid", "mid").alias("label")))

    changed = 0
    for _ in range(max(1, (max_iter + 1) // 2)):
        old = labels.select("image_id", F.col("label").alias("old"))
        labels = (one_pass(one_pass(labels))
                  .repartition(npart, "image_id")
                  .localCheckpoint(eager=False))
        changed = (labels.join(old, "image_id")
                   .filter(F.col("label") != F.col("old")).count())
        if changed == 0:
            break
    if changed:
        import warnings
        warnings.warn(f"fixpoint_v3 hit max_iter with {changed} moving",
                      RuntimeWarning, stacklevel=2)
    return labels.withColumnRenamed("label", "cc_id")


def synth_edges(spark, n: int, seed: int = 7) -> DataFrame:
    """Star-edge-shaped synthetic graph: chains of buckets so the fixpoint
    needs several rounds. ~n nodes, ~n edges, components of ~64 nodes built
    from 8-node stars whose reps chain."""
    df = spark.range(n).select(
        F.format_string("img%012d", F.col("id")).alias("image_id"),
        # bucket = id//8; rep of bucket b = min id in b, EXCEPT every other
        # bucket's rep also links to the previous bucket's rep (chain)
        (F.col("id") - (F.col("id") % 8)).alias("bmin"),
        F.col("id"))
    leaf = df.filter("id != bmin").select(
        "image_id", F.format_string("img%012d", F.col("bmin")).alias("rep"))
    chain = (df.filter("id = bmin").filter("bmin % 64 != 0")
             .select("image_id",
                     F.format_string("img%012d",
                                     (F.col("bmin") - (F.col("bmin") % 64))
                                     ).alias("rep")))
    return leaf.unionByName(chain)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", help="parquet path with (image_id, rep)")
    ap.add_argument("--edges-from-run",
                    help="pipeline --out dir: rebuild cc_input from its "
                         "bands/simhash_pairs/substring_membership "
                         "checkpoints, contract to star edges, and write "
                         "them next to the run as star_edges_ab/")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--impl", default="both",
                    choices=["v1", "v2", "v3", "v4", "both", "all", "v2v4"])
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from apollo_spark.session import get_spark
    from apollo_spark.stages import cc as cc_stage

    spark = get_spark("fixpoint-ab", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    if args.edges_from_run:
        ep = os.path.join(args.edges_from_run, "star_edges_ab")
        if not os.path.exists(os.path.join(ep, "_SUCCESS")):
            from apollo_spark.stages import candidates
            bands = spark.read.parquet(
                os.path.join(args.edges_from_run, "bands"))
            sim = spark.read.parquet(
                os.path.join(args.edges_from_run, "simhash_pairs"))
            sub = spark.read.parquet(
                os.path.join(args.edges_from_run, "substring_membership"))
            cc_input = (bands
                        .unionByName(candidates.pairs_as_membership(sim))
                        .unionByName(sub))
            cc_stage.star_edges(cc_input).write.mode("overwrite").parquet(ep)
        edges = spark.read.parquet(ep)
    elif args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        edges = synth_edges(spark, args.synth or 200000)
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    print(f"edges={n_edges}", file=sys.stderr)

    impls = {}
    if args.impl in ("v1", "both", "all"):
        impls["v1"] = lambda: fixpoint_v1(edges, 20)
    if args.impl in ("v2", "both", "all"):
        # v2 == the shipped stages/cc.py label_fixpoint (integrated r6)
        impls["v2"] = lambda: cc_stage.label_fixpoint(edges, 20)
    if args.impl in ("v3", "all"):
        impls["v3"] = lambda: fixpoint_v3(edges, 20)
    if args.impl in ("v4", "all", "v2v4"):
        impls["v4"] = lambda: fixpoint_v4(edges, 20, cc_stage)
    if args.impl == "v2v4" and "v2" not in impls:
        impls["v2"] = lambda: cc_stage.label_fixpoint(edges, 20)

    results = {}
    for name, fn in impls.items():
        walls = []
        for t in range(args.trials):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            cnt = out.count()
            walls.append(time.time() - t0)
            print(f"{name} trial {t}: {walls[-1]:.2f}s rows={cnt}",
                  file=sys.stderr)
        results[name] = (min(walls), out)

    if len(results) > 1:
        base = "v1" if "v1" in results else sorted(results)[0]
        a = results[base][1].withColumnRenamed("cc_id", "a")
        for name in results:
            if name == base:
                continue
            b = results[name][1].withColumnRenamed("cc_id", "b")
            bad = (a.join(b, "image_id", "full")
                   .filter("a is null or b is null or a != b").count())
            print(f"parity {base} vs {name}: {bad} mismatches",
                  file=sys.stderr)
            assert bad == 0, f"{base} vs {name} labeling mismatch"
    for name, (w, _) in results.items():
        print(f"{name} best wall: {w:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
