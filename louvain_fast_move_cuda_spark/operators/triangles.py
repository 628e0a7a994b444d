"""Triangle counting over the canonical (src < dst) edge list.

Not in the CUDA reference (SURVEY.md §2.11). Classic two-join plan on the
degree-ordered orientation: orient every edge from the lower-(degree, id)
endpoint to the higher one, join wedges (a->b, b->c), then semi-join the
closing edge (a->c). Degree orientation bounds every vertex's out-degree
by O(sqrt(m)) on any graph, which is what keeps the wedge join tractable
on power-law graphs at scale (the hub's 10^6 neighbors never self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def _oriented(graph: GraphTables) -> DataFrame:
    deg = graph.edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    e = (
        graph.edges.filter(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("v").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dd")), "dst")
    )
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    lo_first = e.filter(keep).select(F.col("src").alias("a"), F.col("dst").alias("b"))
    hi_first = e.filter(~keep).select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return lo_first.unionByName(hi_first)


def triangle_count(graph: GraphTables) -> int:
    """Total number of triangles in the undirected graph."""
    o = _oriented(graph).localCheckpoint(eager=True)
    wedges = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e2.b").alias("y"), F.col("e1.b").alias("apex"))
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        o.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    return wedges.join(closing, ["x", "y"], "left_semi").count()


def triangles_per_vertex(graph: GraphTables) -> DataFrame:
    """(id: long, triangles: long) — per-vertex incident triangle counts."""
    o = _oriented(graph).localCheckpoint(eager=True)
    wedges = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e2.b").alias("y"), F.col("e1.b").alias("apex"))
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        o.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    per = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("apex").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        graph.vertices.select("id")
        .join(per, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def clique4_count(graph: GraphTables) -> DataFrame:
    """One row (n_triangles, n_four_cliques) — exact K3 and K4 counts.

    Chiba-Nishizeki-style listing on the same degree orientation as
    :func:`triangle_count`: an oriented triangle (a->b, b->c, a->c)
    lists each K3 once (the orientation is a total order on any
    vertex set); a K4 is counted once as its orientation-minimal
    triangle extended by the orientation-maximal vertex x with all of
    a->x, b->x, c->x present. Out-degrees are O(sqrt(m)) under the
    degree orientation, so both the wedge join and the extension join
    stay hub-safe on power-law graphs — no per-vertex neighborhood
    ever self-joins at hub scale. All counts exact int64.
    """
    o = _oriented(graph).localCheckpoint(eager=True)
    wedges = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = wedges.join(
        o.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
    ).localCheckpoint(eager=True)
    ext = tri.join(
        o.select(F.col("a").alias("c"), F.col("b").alias("x")), "c"
    )
    k4 = (
        ext.join(o.select(F.col("a"), F.col("b").alias("x")), ["a", "x"], "left_semi")
        .join(o.select(F.col("a").alias("b"), F.col("b").alias("x")), ["b", "x"], "left_semi")
    )
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        k4.agg(F.count("*").alias("n_four_cliques"))
    )
