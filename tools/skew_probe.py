"""Adversarial skew measurement for the salted bucket self-joins.

Round-4 VERDICT #5: PLANS.md proves the salted plan SHAPE; this converts
"scale-safe" into "scale-MEASURED". A 480k-document corpus is synthesized
entirely in Catalyst with PLANTED hot keys sized to each guard's worst
legal case:

  * 10,000 identical documents  -> one SimHash block of 10k members (the
    uncapped-by-design exact path: C(10k,2) = 50M true pairs must emit)
    and an over-cap LSH bucket (exercises linear-mode star edges);
  * 512 identical documents     -> an LSH bucket exactly AT the quadratic
    cap (the biggest bucket candidate_pairs will cross-product) and
    shingles at df=512 (inside ngram's df<=1024 join window).

For each probed operator the heaviest post-shuffle stages' per-task
duration quantiles come from Spark's own REST API (taskSummary); the
verdict's acceptance bar is max/median <= ~4x on the heavy stages — i.e.
no task holds a hot bucket's whole cross product. Results print as one
JSON line (paste into BASELINE.md).

Run EXCLUSIVELY (any concurrent Spark job corrupts task timings):

    python tools/skew_probe.py [--rows 480000] [--hot 10000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


class StageProbe:
    """Per-task duration quantiles of the stages a query executed, via the
    Spark UI REST API (local mode: http://host:4040/api/v1)."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def _completed(self):
        return _api(f"{self.base}/stages?status=complete")

    def measure(self, name: str, df, top_stages: int = 3) -> dict:
        pre = {s["stageId"] for s in self._completed()}
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        new = [s for s in self._completed() if s["stageId"] not in pre]
        # heaviest stages by total executor run time, multi-task only
        # (single-task stages have max/median = 1 by construction)
        heavy = sorted([s for s in new if s.get("numCompleteTasks", 0) > 1],
                       key=lambda s: -s.get("executorRunTime", 0))
        rows = []
        for s in heavy[:top_stages]:
            q = _api(f"{self.base}/stages/{s['stageId']}/"
                     f"{s['attemptId']}/taskSummary"
                     f"?quantiles=0.0,0.5,1.0")
            lo, med, mx = (q["executorRunTime"][0],
                           q["executorRunTime"][1],
                           q["executorRunTime"][2])
            rows.append({
                "stage": s["stageId"], "tasks": s["numCompleteTasks"],
                "task_ms_min": int(lo), "task_ms_median": int(med),
                "task_ms_max": int(mx),
                "max_over_median": round(mx / max(med, 1.0), 2),
            })
        return {"query": name, "wall_sec": wall, "stages": rows,
                "worst_max_over_median": max(
                    (r["max_over_median"] for r in rows), default=0.0)}


def hot_corpus(spark, rows: int, hot_a: int, hot_b: int = 512):
    """480k documents, synthesized in Catalyst: hot_a identical docs
    (uncapped-simhash / linear-LSH case), hot_b identical docs (at-cap
    quadratic case), remainder pseudo-random 20-token texts over a 50k
    vocab (natural moderate collisions)."""
    from pyspark.sql import functions as F
    hot_text_a = " ".join(f"hota{i}" for i in range(20))
    hot_text_b = " ".join(f"hotb{i}" for i in range(20))
    return spark.range(rows).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot_a, F.lit(hot_text_a))
         .when(F.col("id") < hot_a + hot_b, F.lit(hot_text_b))
         .otherwise(F.expr(
             "concat_ws(' ', transform(sequence(1, 20), "
             "j -> concat('w', pmod(xxhash64(id, j), 50000))))"))
         .alias("text"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480_000)
    ap.add_argument("--hot", type=int, default=10_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from apollo_spark.ops import dedup
    from apollo_spark.session import get_spark

    # ONE FRESH SESSION PER QUERY FAMILY: a single shared session
    # accumulates every query's broadcast variables on the driver heap
    # (torrent blocks are only GC'd lazily) — a 4-query probe run was
    # measured dying with "Not enough memory to build and broadcast" on
    # query 3 while the same query alone passed with 7 GB to spare.
    # Fresh sessions also keep each query's task timings free of the
    # previous query's cached/broadcast state (measurement hygiene).
    results = []

    def fresh(name):
        # get_spark disables the UI by default (bench hygiene); the probe
        # NEEDS the REST API — re-enable it per-session
        spark = get_spark(name, cores=args.cores,
                          extra_conf={"spark.ui.enabled": "true"})
        spark.sparkContext.setLogLevel("ERROR")
        return spark, StageProbe(spark), hot_corpus(
            spark, args.rows, args.hot).localCheckpoint()

    # J2: salted LSH-bucket pair join (hot_b bucket at the 512 cap is the
    # largest legal cross product; hot_a routes to linear mode)
    spark, probe, docs = fresh("skew-probe-lsh")
    bands = dedup.lsh_bands(dedup.minhash_signatures(docs)) \
        .localCheckpoint()
    results.append(probe.measure(
        "candidate_pairs", dedup.candidate_pairs(bands)))
    results.append(probe.measure(
        "hot_bucket_edges_linear", dedup.hot_bucket_edges(bands)))
    spark.stop()
    # shared-shingle salted join (hot_b shingles at df=512 inside the
    # df<=1024 window; hot_a's are df-capped out by design)
    spark, probe, docs = fresh("skew-probe-ngram")
    results.append(probe.measure(
        "ngram_jaccard", dedup.ngram_jaccard_pairs(docs, 0.5)))
    spark.stop()
    # SimHash block join — UNCAPPED exact path: the hot_a block emits all
    # C(hot_a, 2) true pairs; salting must shard them across tasks
    spark, probe, docs = fresh("skew-probe-simhash")
    results.append(probe.measure(
        "simhash_pairs", dedup.simhash_pairs(docs)))
    spark.stop()

    out = {
        "rows": args.rows, "hot_cluster": args.hot, "hot_at_cap": 512,
        "cores": args.cores,
        "results": results,
        "worst_overall": max(r["worst_max_over_median"] for r in results),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
