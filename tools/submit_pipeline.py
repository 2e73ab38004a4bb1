"""spark-submit entry point for the dedup pipeline.

On a cluster the master/executor topology comes from spark-submit; this
script only parses args and delegates to apollo_spark.pipeline.main, which
uses the session from the submit context (SPARK_GRAFT_ON_CLUSTER=1 keeps
the builder from forcing a local master).

    spark-submit --py-files dist/apollo_spark.zip tools/submit_pipeline.py \
        --images <path> --out <checkpoint dir>
"""

import os
import sys

os.environ.setdefault("SPARK_GRAFT_ON_CLUSTER", "1")

from apollo_spark.pipeline import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
