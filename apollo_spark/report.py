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


def resolve_meta(rows: DataFrame, images: DataFrame) -> DataFrame:
    """Meta resolution (reference query.py:74-92 + the meta table lookup,
    cassandra_utils.py:111-142: sha1 -> (repo, commit, path) rendered as
    URLs): join caption/fmt/w/h onto any DataFrame keyed by image_id. The
    meta projection is column-pruned at the scan (bytes never read); for
    bounded result sets the joined side broadcasts under AQE."""
    meta = images.select("image_id", "caption", "fmt", "w", "h")
    return rows.join(meta, "image_id", "left")


def _meta_suffix(r) -> str:
    """`fmt w×h “caption…”` fragment when meta columns are present."""
    if "caption" not in r.__fields__:
        return ""
    cap = (r["caption"] or "")[:48]
    return f" — {r['fmt']} {r['w']}x{r['h']} “{cap}”"


def render_query_report(query_id: str, hits: DataFrame,
                        top_k: int = 20,
                        images: DataFrame | None = None) -> str:
    """hits(image_id, sim) -> markdown, sorted desc by sim then id
    (query.md.jinja2's `| sort` over items). Pass ``images`` to resolve
    caption/fmt/w/h per hit (the reference's URL rendering analogue)."""
    if images is not None:
        hits = resolve_meta(hits, images)
    rows = (hits.orderBy(F.desc("sim"), F.asc("image_id"))
            .limit(top_k).collect())
    lines = [f"# Similar images of {query_id}", ""]
    if not rows:
        return "\n".join(lines + ["No duplicates found.", ""])
    lines += [f"Total: {len(rows)}", ""]
    lines += [f"* `{r['image_id']}` — similarity {r['sim']:.4f}"
              f"{_meta_suffix(r)}" for r in rows]
    return "\n".join(lines + [""])


def render_cluster_report(clusters: DataFrame, max_clusters: int = 50,
                          id_col: str = "cluster_id",
                          images: DataFrame | None = None) -> str:
    """clusters(cluster_id, image_id) -> markdown listing, largest first
    (report.md.jinja2: communities with >1 member, members listed). Pass
    ``images`` to annotate members with caption/fmt/w/h."""
    cl = clusters.select(id_col, "image_id")
    if images is not None:
        member = F.concat_ws(
            "\t", "image_id", F.coalesce("fmt", F.lit("?")),
            F.concat(F.col("w").cast("string"), F.lit("x"),
                     F.col("h").cast("string")),
            F.substring(F.coalesce("caption", F.lit("")), 1, 48))
        cl = resolve_meta(cl, images).select(
            id_col, member.alias("image_id"))
    agg = (cl.groupBy(id_col)
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
        for m in r["members"]:
            parts = m.split("\t")
            if len(parts) == 4:
                mid, fmt, dims, cap = parts
                lines.append(f"* `{mid}` — {fmt} {dims} “{cap}”")
            else:
                lines.append(f"* `{m}`")
        lines.append("")
    return "\n".join(lines)


def dump_cc(cc: DataFrame) -> DataFrame:
    """dumpcc analogue (graph.py:151-157): (cc_id, image_id) sorted."""
    return cc.select("cc_id", "image_id").orderBy("cc_id", "image_id")


def dump_clusters(clusters: DataFrame) -> DataFrame:
    """dumpcmd analogue (graph.py:340-346): non-singleton clusters."""
    return (clusters.select("cluster_id", "image_id")
            .orderBy("cluster_id", "image_id"))
