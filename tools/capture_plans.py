"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [name ...]

Writes plans/<tag>/<name>_<suffix>.txt for each query name (default: the
bench HEADLINE set). The explain output is the judge-checkable evidence for
plan-shape claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython nodes) — guide §1/§7.2.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_NAMES = [
    "exact_dedup", "shingle_docfreq", "minhash_signatures", "lsh_buckets",
    "candidate_pairs", "minhash_dedup", "ngram_jaccard", "dedup_cc",
    "simhash_pairs", "token_count", "quality_score", "lang_id",
    "doc_fingerprint", "cosine_neardup", "embedding_topk", "ann_lsh_topk",
    "byte_stats", "wmh_clusters",
]


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_NAMES
    import __spark_entry__ as entry
    from apollo_spark.session import get_spark
    spark = get_spark("apollo-plan-capture", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    qmap = entry.queries()
    for name in names:
        fn = qmap.get(name)
        if fn is None:
            print(f"skip {name}: not declared")
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
