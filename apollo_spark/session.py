"""SparkSession construction tuned for the dedup pipeline.

Single place where execution knobs live so bench/tests/driver all agree:
AQE on (runtime skew-join splitting + partition coalescing — the north_rule's
skew mitigation), Arrow for all pandas-UDF boundaries, shuffle partitions
scaled to cores. On a real cluster the same builder is used by
``spark-submit --py-files apollo_spark.zip job.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "apollo-spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None,
              iceberg_warehouse: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` -> ``local[$SPARK_GRAFT_CPUS or *]``. On a cluster the
    master is taken from spark-submit and ``cores`` is ignored.

    ``iceberg_warehouse`` (or $SPARK_GRAFT_ICEBERG_WAREHOUSE) configures a
    hadoop-type Iceberg catalog named ``local`` for
    CheckpointCatalog(backend="iceberg"); the iceberg-spark runtime jar
    must be on the classpath ($SPARK_GRAFT_ICEBERG_JAR or
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-*).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = (cores or os.cpu_count() or 8) * 2

    b = (SparkSession.builder.appName(app_name)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         # AQE: runtime coalescing of small shuffle partitions + skew-join
         # splitting for hot LSH buckets (north_rule).
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         # Arrow at every pandas-UDF boundary; batch size bounds executor
         # memory the way the reference bounded GPU batches to 2 GB CSR
         # (doc/cmd/bags.md:12) — here it bounds the WMH kernel's working set.
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         # Deterministic timezone for reproducible fixtures.
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "false"))
    iceberg_warehouse = iceberg_warehouse or os.environ.get(
        "SPARK_GRAFT_ICEBERG_WAREHOUSE")
    if iceberg_warehouse:
        b = (b.config("spark.sql.extensions",
                      "org.apache.iceberg.spark.extensions."
                      "IcebergSparkSessionExtensions")
             .config("spark.sql.catalog.local",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.local.type", "hadoop")
             .config("spark.sql.catalog.local.warehouse",
                     iceberg_warehouse))
        jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
        if jar:
            b = b.config("spark.jars", jar)
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
