"""Deterministic Luby maximal independent set — the classic BSP
symmetry-breaking primitive (Luby 1986), the building block for
distributed coloring / scheduling / correlation-clustering pivots.

Not in the CUDA reference (Louvain-only, /root/reference/main.cu);
added §2.11-style analytics surface. Luby's round: every undecided
vertex draws a priority; a vertex joins the MIS if its priority beats
every undecided neighbor's; MIS neighbors drop out; repeat on the
shrinking remainder. Expected O(log n) rounds under random priorities.

Determinism (the repo's walks.py design center): the priority is a
portable arithmetic mixer over (vertex, round) — no RNG state — and
the per-vertex comparison key packs (priority, id) into ONE int64
(``priority * 2^31 + id``), so the argmax is a plain integer max with
a built-in total-order tie-break, identical in any engine. Vertex ids
must therefore be < 2^31 — guaranteed by the dense relabel at ingest
(sources/edges.py::assign_contiguous_ids); the packing overflows
loudly under ANSI mode otherwise, never silently.

Unlike the walks, the priority here MUST be nonlinear in the vertex
id: reply chains get consecutive ids from the dense relabel, and an
affine mixer is monotone along a consecutive-id path, so only each
run's endpoint would win per round — O(n) rounds on a chain (measured:
a 5000-path stalls past 50 rounds affine, converges in 5 with the
quadratic term). The quadratic ``v*v % P`` term gives neighboring ids
priority gaps that vary per vertex (slope 2v+1 mod P), restoring
Luby's expected O(log n); all intermediates stay < ~1e10, exact int64
in any engine.

Scale: per round ONE edge->priority join + ONE per-vertex integer max
(partial-aggregated) + two semi/anti joins to shrink the frontier;
state is the undecided set, which drops by a constant factor per round
in expectation. ``max_rounds`` follows the k_core contract: the
fixed-round oracle unrolls the same budget, and the engine raises if
the remainder is non-empty at the budget (a partial MIS is not
maximal, so silent truncation would be wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables
from .walks import _M, _P

_PACK = 2147483648  # 2^31 — id space bound for the (priority, id) pack


def _priority(vid, rnd, salt: int):
    """Quadratic portable mixer — nonlinear in vid (see module
    docstring); identical expression in ANSI SQL."""
    return (
        (vid * vid % F.lit(_P)) * F.lit(10007)
        + (vid % F.lit(_P)) * F.lit(97)
        + rnd * F.lit(31)
        + F.lit(salt)
    ) % F.lit(_M)


def maximal_independent_set(
    graph: GraphTables, salt: int = 0, max_rounds: int = 12, checkpointer=None
) -> DataFrame:
    """(id, in_mis) — one deterministic Luby MIS over the symmetric
    graph. Independence and maximality both hold at convergence:
    no edge joins two in_mis vertices, and every out vertex has an
    in_mis neighbor. Raises RuntimeError if ``max_rounds`` BSP rounds
    leave undecided vertices (raise, never truncate: a partial result
    would not be maximal).

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every round durably commits one
    packed state table (kind='und' the undecided set, kind='mis' the
    winners so far; the undecided-by-undecided edge set is re-derived
    by two semi-joins on resume); rounds depend only on (round index,
    undecided set), so a resumed run replays identically — including
    after a budget-exhausted run that raised."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    edges = graph.edges.select("src", "dst")
    und = graph.vertices.select("id").localCheckpoint(eager=True)
    e = edges.localCheckpoint(eager=True)
    mis_parts: list[DataFrame] = []
    start_round = 0
    done = False
    if checkpointer is not None:
        state = checkpointer.load_latest(graph.edges.sparkSession)
        if state is not None:
            it, saved, metric = state
            saved = saved.localCheckpoint(eager=True)
            und = saved.filter(F.col("kind") == "und").select("id")
            mis_parts.append(saved.filter(F.col("kind") == "mis").select("id"))
            start_round = it + 1
            done = bool(metric.get("converged"))
            if not done:
                e = (
                    e.join(und.select(F.col("id").alias("src")), "src", "left_semi")
                    .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
                    .localCheckpoint(eager=True)
                )

    def _save(rnd: int, conv: bool, n_und: int) -> None:
        if checkpointer is None:
            return
        packed = und.select(F.lit("und").alias("kind"), "id")
        for df in mis_parts:
            packed = packed.unionByName(df.select(F.lit("mis").alias("kind"), "id"))
        checkpointer.save(rnd, packed, {"converged": conv, "n_undecided": n_und})

    for r in range(start_round, max_rounds):
        if done:
            break
        key = _priority(F.col("id"), F.lit(r), salt) * F.lit(_PACK) + F.col("id")
        p = und.select("id", key.alias("key"))
        # e is already undecided-by-undecided (shrunk at the end of the
        # previous round), so only the dst side needs its key attached
        nb = (
            e.join(p.select(F.col("id").alias("dst"), F.col("key").alias("kd")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.max("kd").alias("mx"))
        )
        winners = (
            p.join(nb, "id", "left")
            .filter(F.col("mx").isNull() | (F.col("key") > F.col("mx")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        mis_parts.append(winners)
        dropped = (
            e.join(winners.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        und = (
            und.join(winners.unionByName(dropped), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_und = und.count()
        _save(r, n_und == 0, n_und)
        if n_und == 0:
            break
        e = (
            e.join(und.select(F.col("id").alias("src")), "src", "left_semi")
            .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"maximal_independent_set did not converge in {max_rounds} rounds"
        )
    mis = mis_parts[0]
    for df in mis_parts[1:]:
        mis = mis.unionByName(df)
    return graph.vertices.select("id").join(
        mis.withColumn("in_mis", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))
