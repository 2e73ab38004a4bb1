"""hash stage: weighted bags -> WMH signatures -> LSH bands (distributed).

Replaces the reference's driver-resident GPU loop (hasher.py:134-205 — data
originated on the driver, "Currently does not work in Spark Cluster mode",
doc/cmd/hash.md:3) with a fully distributed plan:

  bags --groupBy(image_id)--> per-doc feature arrays
       --mapInPandas(NumPy CWS kernel)--> signatures(image_id, sig binary)
       --JVM-side substring/posexplode--> bands(image_id, hashtable, band)

The kernel is the batched analogue of libMHCUDA's CSR interface
(hasher.py:178): each Arrow batch becomes flat (indptr, feat_hash, weight)
arrays, one vectorized pass over all docs x samples. Band explosion is pure
Catalyst (whole-stage codegen — the HashExploder flatMap of hasher.py:90-99
as transform+posexplode over the signature blob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apollo_spark.config import PipelineConfig
from apollo_spark.core import wmh

SIGNATURES_SCHEMA = "image_id string, sig binary"


def signatures(bags: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(image_id, feat_hash, weight) -> (image_id, sig).

    sig = K little-endian uint32 (k, t) pairs — the same blob layout as the
    reference's hashes table value (hasher.py:196, cassandra_utils.py:82).
    """
    size, seed = cfg.size, cfg.seed
    grouped = (bags.groupBy("image_id")
               .agg(F.collect_list(F.struct("feat_hash", "weight")).alias("fw"))
               .select("image_id",
                       F.col("fw.feat_hash").alias("fh"),
                       F.col("fw.weight").alias("w")))

    def kernel(iterator):
        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"image_id": [], "sig": []})
                continue
            lens = np.fromiter((len(x) for x in pdf["fh"]), dtype=np.int64,
                               count=n)
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=indptr[1:])
            fh = np.concatenate([np.asarray(x, dtype=np.int64)
                                 for x in pdf["fh"]]).view(np.uint64)
            w = np.concatenate([np.asarray(x, dtype=np.float32)
                                for x in pdf["w"]])
            # sort rows by feature hash within each doc: fixes the argmin
            # tie-break to the dense oracle's lowest-index rule
            doc_of_row = np.repeat(np.arange(n, dtype=np.int64), lens)
            order = np.lexsort((fh, doc_of_row))
            sig = wmh.wmh_batch(indptr, fh[order], w[order], size, seed)
            blobs = [np.ascontiguousarray(sig[d], dtype="<u4").tobytes()
                     for d in range(n)]
            yield pd.DataFrame({"image_id": pdf["image_id"], "sig": blobs})

    return grouped.mapInPandas(kernel, schema=SIGNATURES_SCHEMA)


def bands(signatures_df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """signature blob -> htnum rows (image_id, hashtable, band).

    band i = bytes of samples [i*r, (i+1)*r) (hasher.py:95-99); leftover
    K - b*r samples are unused, as in the reference. Runs entirely in
    whole-stage codegen (no Python).
    """
    htnum, band_size = cfg.lsh_params()
    w = 8 * band_size
    slices = F.expr(
        f"transform(sequence(0, {htnum - 1}), "
        f"i -> substring(sig, i * {w} + 1, {w}))")
    return (signatures_df
            .select("image_id", F.posexplode(slices)
                    .alias("hashtable", "band")))


def run(bags: DataFrame, cfg: PipelineConfig) -> tuple[DataFrame, DataFrame]:
    sigs = signatures(bags, cfg)
    return sigs, bands(sigs, cfg)
