"""Profile the WMH signatures stage: where do its seconds go?

The 480k 32-core pipeline run spends ~45% of its wall in `signatures`
(164.6 s of 366 s, round 6). This tool decomposes that into
(a) the host-side NumPy kernel cost per Arrow batch, split into
    param generation / gather / arithmetic / segmented argmin, and
(b) the Spark stage cost split into the groupBy+collect_list shuffle
    alone vs shuffle + Arrow transfer + kernel,
so optimization effort lands on the measured term, not a guess.

Usage:
  python tools/profile_wmh.py --host-only          # (a) only, no JVM
  python tools/profile_wmh.py --run <pipeline-out> # (b) reads bags ckpt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_profile(ndocs: int, mean_feats: int, size: int, seed: int) -> None:
    """Synthetic batch shaped like one Arrow batch of the 480k corpus."""
    from apollo_spark.core import wmh

    rng = np.random.default_rng(7)
    lens = np.maximum(1, rng.poisson(mean_feats, ndocs)).astype(np.int64)
    nnz = int(lens.sum())
    indptr = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    # realistic sharing: feature ids drawn zipf-ish from a 60k vocab
    fh = rng.integers(0, 60_000, nnz)
    fh = wmh.splitmix64(fh.astype(np.uint64))
    w = rng.random(nnz, dtype=np.float32) + np.float32(0.01)
    doc_of_row = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    order = np.lexsort((fh, doc_of_row))
    fh, w = fh[order], w[order]
    print(f"batch: ndocs={ndocs} nnz={nnz} K={size} "
          f"uniq={len(np.unique(fh))}")

    t0 = time.time()
    wmh.wmh_batch(indptr, fh, w, size, seed)
    total = time.time() - t0
    print(f"wmh_batch total: {total:.3f}s "
          f"({ndocs / total:.0f} docs/s/core)")

    # decompose one pass manually (mirrors wmh_batch's loop body)
    uniq, inv = np.unique(fh, return_inverse=True)
    vlog = np.log(w.astype(np.float32))
    starts = indptr[:-1]
    row_ids = np.arange(nnz, dtype=np.int32)
    chunk = 4
    t_par = t_gat = t_ari = t_arg = 0.0
    for c0 in range(0, size, chunk):
        c1 = min(size, c0 + chunk)
        t0 = time.time()
        rs_u, ln_cs_u, betas_u = wmh._params_chunk(uniq, c0, c1, seed)
        t_par += time.time() - t0
        t0 = time.time()
        r = rs_u[:, inv]
        b = betas_u[:, inv]
        lc = ln_cs_u[:, inv]
        t_gat += time.time() - t0
        t0 = time.time()
        t = vlog[None, :] / r
        t += b
        np.floor(t, out=t)
        ln_a = t - b
        ln_a *= r
        np.subtract(lc, ln_a, out=ln_a)
        ln_a -= r
        t_ari += time.time() - t0
        t0 = time.time()
        mins = np.minimum.reduceat(ln_a, starts, axis=1)
        is_min = ln_a == mins[:, doc_of_row]
        cand = np.where(is_min, row_ids[None, :], nnz)
        np.minimum.reduceat(cand, starts, axis=1)
        np.take_along_axis(t, np.zeros((c1 - c0, ndocs), dtype=np.int64),
                           axis=1)
        t_arg += time.time() - t0
    dec = t_par + t_gat + t_ari + t_arg
    print(f"decomposed: params={t_par:.3f}s gather={t_gat:.3f}s "
          f"arith={t_ari:.3f}s argmin={t_arg:.3f}s (sum {dec:.3f}s)")


def spark_profile(run_dir: str, cores: int) -> None:
    from pyspark.sql import functions as F

    from apollo_spark.config import PipelineConfig
    from apollo_spark.session import get_spark
    from apollo_spark.stages import hashst

    spark = get_spark("profile-wmh", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()
    bags = spark.read.parquet(os.path.join(run_dir, "bags"))
    n = bags.count()
    print(f"bags rows={n}")

    # (1) shuffle-only: the groupBy+collect_list without Python
    t0 = time.time()
    grouped = (bags.groupBy("image_id")
               .agg(F.collect_list(F.struct("feat_hash", "weight"))
                    .alias("fw")))
    grouped.write.format("noop").mode("overwrite").save()
    t_shuffle = time.time() - t0
    print(f"groupBy+collect_list only: {t_shuffle:.1f}s")

    # (2) the full stage (shuffle + Arrow + kernel + blobs)
    t0 = time.time()
    hashst.signatures(bags, cfg).write.format("noop").mode("overwrite").save()
    t_full = time.time() - t0
    print(f"full signatures stage:    {t_full:.1f}s "
          f"(python side ~{t_full - t_shuffle:.1f}s)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--ndocs", type=int, default=10_000)
    ap.add_argument("--mean-feats", type=int, default=40)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--run", help="pipeline --out dir with a bags ckpt")
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args()

    from apollo_spark.config import DEFAULT
    size = args.size or DEFAULT.size
    host_profile(args.ndocs, args.mean_feats, size, args.seed)
    if args.run and not args.host_only:
        spark_profile(args.run, args.cores)
    return 0


if __name__ == "__main__":
    sys.exit(main())
