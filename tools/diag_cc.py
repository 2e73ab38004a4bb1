"""Diagnose the CC fixpoint: per-round wall time, changed counts, memb size.

Usage: python tools/diag_cc.py <pipeline-out-dir> <cores>
Reads the bands/simhash_pairs/substring_membership checkpoints the pipeline
wrote, rebuilds cc_input exactly as pipeline.run_pipeline does, and runs an
instrumented copy of the label-propagation loop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def main() -> int:
    out_dir, cores = sys.argv[1], int(sys.argv[2])
    from apollo_spark.config import PipelineConfig
    from apollo_spark.session import get_spark
    from apollo_spark.stages import candidates, cc as cc_stage

    spark = get_spark("diag-cc", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()

    bands = spark.read.parquet(f"{out_dir}/bands")
    sim = spark.read.parquet(f"{out_dir}/simhash_pairs")
    sub = spark.read.parquet(f"{out_dir}/substring_membership")
    cc_input = (bands
                .unionByName(candidates.pairs_as_membership(sim))
                .unionByName(sub))

    t0 = time.time()
    memb = cc_stage.multi_member_bands(cc_input) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    n_memb = memb.count()
    print(f"memb rows={n_memb} build={time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    labels = (memb.select("image_id").distinct()
              .withColumn("label", F.col("image_id"))
              .localCheckpoint())
    print(f"init labels n={labels.count()} {time.time() - t0:.1f}s",
          flush=True)

    for rnd in range(cfg.max_cc_iterations):
        t0 = time.time()
        bucket_min = (memb.join(labels, "image_id")
                      .groupBy("hashtable", "band")
                      .agg(F.min("label").alias("blabel")))
        new_labels = (memb.join(bucket_min, ["hashtable", "band"])
                      .groupBy("image_id")
                      .agg(F.min("blabel").alias("label"))
                      .localCheckpoint())
        t1 = time.time()
        changed = (new_labels.alias("n")
                   .join(labels.withColumnRenamed("label", "old"), "image_id")
                   .filter(F.col("label") != F.col("old")).count())
        print(f"round {rnd}: propagate={t1 - t0:.1f}s "
              f"changed_count={time.time() - t1:.1f}s changed={changed}",
              flush=True)
        labels = new_labels
        if changed == 0:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
