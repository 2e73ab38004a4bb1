"""Markdown report rendering (reference S8: query.py:94-106 Jinja templates
query.md.jinja2 / report.md.jinja2, and the dumpcc/dumpcmd table dumps,
graph.py:151-157,340-346).

The reference streamed Jinja2 to stdout from Cassandra lookups; here the
inputs are small collected DataFrames (top-k query hits, cluster listings),
so rendering is plain driver-side string building — the only part of the
engine that is *supposed* to be driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_query_report(query_id: str, hits: DataFrame,
                        top_k: int = 20) -> str:
    """hits(image_id, sim) -> markdown, sorted desc by sim then id
    (query.md.jinja2's `| sort` over items)."""
    rows = (hits.orderBy(F.desc("sim"), F.asc("image_id"))
            .limit(top_k).collect())
    lines = [f"# Similar images of {query_id}", ""]
    if not rows:
        return "\n".join(lines + ["No duplicates found.", ""])
    lines += [f"Total: {len(rows)}", ""]
    lines += [f"* `{r['image_id']}` — similarity {r['sim']:.4f}"
              for r in rows]
    return "\n".join(lines + [""])


def render_cluster_report(clusters: DataFrame, max_clusters: int = 50,
                          id_col: str = "cluster_id") -> str:
    """clusters(cluster_id, image_id) -> markdown listing, largest first
    (report.md.jinja2: communities with >1 member, members listed)."""
    agg = (clusters.groupBy(id_col)
           .agg(F.sort_array(F.collect_list("image_id")).alias("members"),
                F.count(F.lit(1)).alias("n"))
           .filter("n >= 2")
           .orderBy(F.desc("n"), F.asc(id_col))
           .limit(max_clusters)
           .collect())
    lines = ["# Duplicate clusters", "",
             f"Showing {len(agg)} largest clusters.", ""]
    for r in agg:
        lines.append(f"## {r[id_col]} ({r['n']} members)")
        lines += [f"* `{m}`" for m in r["members"]]
        lines.append("")
    return "\n".join(lines)


def dump_cc(cc: DataFrame) -> DataFrame:
    """dumpcc analogue (graph.py:151-157): (cc_id, image_id) sorted."""
    return cc.select("cc_id", "image_id").orderBy("cc_id", "image_id")


def dump_clusters(clusters: DataFrame) -> DataFrame:
    """dumpcmd analogue (graph.py:340-346): non-singleton clusters."""
    return (clusters.select("cluster_id", "image_id")
            .orderBy("cluster_id", "image_id"))
