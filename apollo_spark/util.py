"""Small shared execution helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Input-parallelism floor (optimization guide §2.5, 'input skew: one
    huge unsplittable file -> repartition immediately after the read').

    A parquet file is splittable only at row-group boundaries; a
    one-row-group file therefore scans as ONE task no matter what
    ``spark.sql.files.maxPartitionBytes`` says, and every narrow
    transform downstream — extraction kernels, md5 gram hashing, explode
    chains — serializes on one core until the first exchange (measured
    round 7: the 20k-row bench corpus is one such file, and the
    extraction + WMH-signature spans ran 3-5x slower than their widened
    twins). Round-robin repartition up to the session's default
    parallelism, applied ONLY when the scan is narrower than that: on a
    production table that already scans as hundreds of splits this is a
    no-op, and the caller is expected to pass a narrow PROJECTION (the
    columns the downstream transform needs) so the one-time shuffle never
    carries payload bytes."""
    n = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
