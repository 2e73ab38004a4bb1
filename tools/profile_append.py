"""Profile the incremental-append path at bench scale.

Builds the 20k-row base run ONCE into a reusable directory, then times
append_images on a fresh copy of it (so repeated invocations measure the
same work). Used to adjudicate the round-5 catalog-op batching
(VERDICT r4 #3: append_sec 55.8s at sf0.1/local[32], overhead-bound).

    python tools/profile_append.py [--rows 20000] [--cores 32] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--base-dir", default="/tmp/apollo_profile_base")
    ap.add_argument("--rebuild", action="store_true",
                    help="force-rebuild the cached base run")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from apollo_spark import synth
    from apollo_spark.config import PipelineConfig
    from apollo_spark.incremental import append_images
    from apollo_spark.pipeline import run_pipeline
    from apollo_spark.session import get_spark

    spark = get_spark("apollo-profile-append", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(args.base_dir, f"r{args.rows}")
    images = spark.read.parquet(
        synth.cached_corpus_path(args.rows)).drop("gt_cluster").persist()
    images.count()
    if args.rebuild and os.path.exists(base):
        shutil.rmtree(base)
    if not os.path.exists(os.path.join(base, "manifest.json")):
        os.makedirs(base, exist_ok=True)
        t0 = time.time()
        run_pipeline(spark, images, PipelineConfig(), base, extensions=True)
        print(f"base built in {time.time() - t0:.1f}s", file=sys.stderr)

    n_delta = max(args.rows // 20, 100)
    delta = (spark.read.parquet(synth.cached_corpus_path(n_delta, seed=777))
             .drop("gt_cluster")
             .withColumn("image_id", F.concat(F.lit("d"), F.col("image_id"))))
    full = images.unionByName(delta)

    work = tempfile.mkdtemp(prefix="apollo-profile-append-")
    shutil.rmtree(work)
    shutil.copytree(base, work)
    try:
        t0 = time.time()
        res = append_images(spark, full, delta, PipelineConfig(), work)
        res["clusters"].write.format("noop").mode("overwrite").save()
        append_sec = round(time.time() - t0, 3)
        with open(os.path.join(work, "manifest.json")) as f:
            manifest = json.load(f)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "rows": args.rows, "delta_rows": n_delta, "cores": args.cores,
        "append_sec": append_sec,
        "append_stages": res.get("_append_timings"),
        "trailing_pipeline": round(
            sum(res.get("_timings", {}).values()), 3),
        "catalog_batch": manifest.get("catalog_batch"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
