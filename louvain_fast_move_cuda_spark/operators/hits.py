"""HITS (hubs & authorities) over the directed transcript link graph.

Not in the CUDA reference (single-algorithm engine); semantics from
Kleinberg's published algorithm, the directed complement to
operators/pagerank.py::directed_pagerank: reply/tool links carry
direction, and a turn that *initiates* many links (a hub) is a
different signal from a turn many links *point at* (an authority).

Mutual recursion with L1 normalization (divide by the score sum, not
the L2 norm — no sqrt, so the unrolled cross-engine oracle carries the
identical IEEE expression tree): per iteration

    auth'(v) = Σ_{u->v} hub(u);   auth = auth' / Σ auth'
    hub'(u)  = Σ_{u->v} auth(v);  hub  = hub'  / Σ hub'

Fixed-iteration contract (like pagerank_fixed20 / directed_pagerank)
so the oracle pins every superstep; scores are rounded r9 at the END
only (summation-order noise ~1e-16/round, absorbed by r9).

Scale: the distinct link list is materialized once; each half-step is
ONE shuffle join + groupBy, and its normalization scalar doubles as
the half-step's materialization action (lazy localCheckpoint, the
directed_pagerank discipline) — 2 shuffles and 2 scalar actions per
iteration, state is O(V), never a matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(raw_pairs: DataFrame, max_iter: int = 8) -> DataFrame:
    """(id, hub_r9, auth_r9) over the DISTINCT directed pairs ``a -> b``
    (self-loops dropped). Vertices with no in-links have auth exactly
    0.0; no out-links, hub exactly 0.0. Scores are L1-normalized so
    each column sums to 1 (up to roundoff) every iteration.
    """
    if max_iter < 1:
        raise ValueError(f"hits needs max_iter >= 1, got {max_iter}")
    d = (
        raw_pairs.select("a", "b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        d.select(F.col("a").alias("id"))
        .unionByName(d.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = verts.select("id", F.lit(1.0).alias("hub")).localCheckpoint(eager=True)
    auth = None
    for _ in range(max_iter):
        araw = (
            d.join(hub.select(F.col("id").alias("a"), "hub"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum("hub").alias("raw"))
        )
        # norm action materializes araw's lineage cut in one pass
        araw = araw.localCheckpoint(eager=False)
        anorm = araw.agg(F.sum("raw")).collect()[0][0] or 1.0
        auth = verts.join(araw, "id", "left").select(
            "id",
            F.coalesce(F.col("raw") / F.lit(float(anorm)), F.lit(0.0)).alias("auth"),
        )
        hraw = (
            d.join(auth.select(F.col("id").alias("b"), "auth"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.sum("auth").alias("raw"))
        ).localCheckpoint(eager=False)
        hnorm = hraw.agg(F.sum("raw")).collect()[0][0] or 1.0
        hub = verts.join(hraw, "id", "left").select(
            "id",
            F.coalesce(F.col("raw") / F.lit(float(hnorm)), F.lit(0.0)).alias("hub"),
        ).localCheckpoint(eager=False)
    return (
        hub.join(auth, "id")
        .select(
            "id",
            F.round("hub", 9).alias("hub_r9"),
            F.round("auth", 9).alias("auth_r9"),
        )
    )
