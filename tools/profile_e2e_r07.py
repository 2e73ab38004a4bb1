"""Round-7 profiling: break the e2e pipeline's expensive stages into
sub-spans with noop sinks (guide §1.4) so each optimization targets a
measured cost, not a guess.

Usage: python tools/profile_e2e_r07.py [rows]

Spans measured (all on the bench synthetic corpus, default 20k rows):
  extract_noop     one pass of bags.extract_features through a noop sink
  vocab_agg        docfreq agg + count on a persisted extraction
  signatures_mapside  the fresh-build kernel path end to end (noop)
  bands_noop       band explosion over checkpointed signatures
  star_edges       the census+join edge build over checkpointed bands
  fixpoint         label_fixpoint over the checkpointed star edges
  clusters         clusters() over the checkpointed cc
Prints one JSON line with seconds per span plus row counts for context.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from apollo_spark import synth
    from apollo_spark.config import PipelineConfig
    from apollo_spark.session import get_spark
    from apollo_spark.stages import bags as bags_stage
    from apollo_spark.stages import cc as cc_stage, hashst

    spark = get_spark("apollo-profile-r07", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py: fork workers + JIT
    def _touch(it):
        import numpy as np  # noqa: F401
        for pdf in it:
            yield pdf
    _force(spark.range(CPUS * 4, numPartitions=CPUS)
           .mapInPandas(_touch, "id long"))
    _force(spark.range(10_000).selectExpr("sum(id) s", "count(*) c"))

    cfg = PipelineConfig()
    images = spark.read.parquet(
        synth.cached_corpus_path(rows)).drop("gt_cluster").persist()
    n = images.count()
    out: dict[str, float] = {"rows": n}

    def span(name, fn):
        sc.setJobDescription(f"r07-profile: {name}")
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    # extraction alone, twice (first pays scan/JIT warmth)
    feats_df = bags_stage.extract_features(images, cfg)
    span("extract_noop_1", lambda: _force(feats_df))
    span("extract_noop_2", lambda: _force(feats_df))

    from pyspark.storagelevel import StorageLevel
    feats = bags_stage.extract_features(images, cfg) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    span("persist_feats", lambda: feats.count())
    vocab = span("vocab_agg", lambda: bags_stage.vocab_table(feats, cfg)
                 .localCheckpoint())
    nvocab = vocab.count()
    out["nvocab"] = nvocab

    import numpy as np
    vp = vocab.select("feat_hash", "df").toPandas()
    vh = vp["feat_hash"].to_numpy().astype(np.int64).view(np.uint64)
    vdf = vp["df"].to_numpy().astype(np.float64)
    vo = np.argsort(vh)
    sigs_df = hashst.signatures_mapside(feats, vh[vo], vdf[vo], n, cfg)
    span("signatures_mapside_noop", lambda: _force(sigs_df))
    sigs = span("signatures_lc", lambda: sigs_df.localCheckpoint())

    bands_df = hashst.bands(sigs, cfg)
    span("bands_noop", lambda: _force(bands_df))
    bands = span("bands_lc", lambda: bands_df.localCheckpoint())

    edges = span("star_edges_lc",
                 lambda: cc_stage.star_edges(bands).localCheckpoint())
    out["n_edges"] = edges.count()
    cc = span("fixpoint", lambda: cc_stage.label_fixpoint(
        edges, cfg.max_cc_iterations).localCheckpoint())
    out["n_cc_rows"] = cc.count()
    span("clusters_noop", lambda: _force(cc_stage.clusters(cc)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
