"""evalcc stage: cluster fitness metrics (reference: graph.py:349-412).

Per cluster: pairwise sparse weighted Jaccard over member bags; count pairs
below the threshold ("misses"), quadratic loss (sim - t)^2, both also
normalized by C(n,2); singletons contribute zeros (graph.py:358-377). The
reference shipped driver-built vectors through groupByKey + a Python reducer
(graph.py:404-408); here it is groupBy(cluster).applyInPandas with a sparse
NumPy kernel and a plain DataFrame aggregation for the global sums (A7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVAL_SCHEMA = ("cluster_id long, n_members int, pairs long, misses long, "
               "miss_rate double, loss double, loss_rate double")


def _cluster_eval(threshold: float):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        members = pdf.groupby("image_id")
        vecs = {rid: dict(zip(g["feat_hash"], g["weight"].astype(np.float64)))
                for rid, g in members}
        ids = sorted(vecs)
        n = len(ids)
        if n <= 1:
            return pd.DataFrame([{"cluster_id": cid, "n_members": n,
                                  "pairs": 0, "misses": 0, "miss_rate": 0.0,
                                  "loss": 0.0, "loss_rate": 0.0}])
        misses, loss = 0, 0.0
        for i in range(n):
            vi = vecs[ids[i]]
            wi = sum(vi.values())
            for j in range(i + 1, n):
                vj = vecs[ids[j]]
                inter = sum(min(w, vj[k]) for k, w in vi.items() if k in vj)
                union = wi + sum(vj.values()) - inter
                sim = inter / union if union else 0.0
                if sim < threshold:
                    misses += 1
                    loss += (sim - threshold) ** 2
        pairs = n * (n - 1) // 2
        return pd.DataFrame([{"cluster_id": cid, "n_members": n,
                              "pairs": pairs, "misses": misses,
                              "miss_rate": misses / pairs, "loss": loss,
                              "loss_rate": loss / pairs}])
    return fn


def evaluate(clusters: DataFrame, bags: DataFrame,
             threshold: float) -> DataFrame:
    """clusters(cluster_id, image_id) x bags -> per-cluster fitness rows."""
    joined = (clusters.select("cluster_id", "image_id")
              .join(bags, "image_id")
              .select("cluster_id", "image_id", "feat_hash", "weight"))
    return joined.groupBy("cluster_id").applyInPandas(
        _cluster_eval(threshold), schema=EVAL_SCHEMA)


def global_metrics(per_cluster: DataFrame) -> dict:
    """A7 global reduce (graph.py:408-412 log lines, as a dict)."""
    row = per_cluster.agg(
        F.sum("misses").alias("misses"),
        F.sum("loss").alias("loss"),
        F.avg("miss_rate").alias("avg_miss_rate"),
        F.avg("loss_rate").alias("avg_loss_rate"),
        F.count(F.lit(1)).alias("clusters")).first()
    return {k: (float(v) if v is not None else 0.0)
            for k, v in row.asDict().items()}
