"""Build dist/apollo_spark.zip for cluster submission (north_rule:
"launched via spark-submit --py-files on multi-executor clusters"):

    python tools/package.py
    spark-submit --py-files dist/apollo_spark.zip \
        --master <cluster> tools/submit_pipeline.py \
        --images <iceberg-or-parquet path> --out <checkpoint dir>

The zip carries only the package sources (no tests/tools), so executors
unpack a few hundred KB.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "apollo_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "apollo_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
