"""Deterministic Jones-Plassmann greedy graph coloring — the BSP
scheduling/partitioning primitive (Jones & Plassmann 1993), the natural
composition of the repo's Luby MIS machinery with a min-excluded-color
assignment.

Not in the CUDA reference (Louvain-only, /root/reference/main.cu);
added §2.11-style analytics surface. Coloring partitions the link graph
into conflict-free vertex classes — the standard preprocessing for
parallel updates over shared neighborhoods (asynchronous Louvain-style
moves, GNN sampling without read-write races, chromatic scheduling).

Determinism: each vertex draws ONE static priority from the MIS
module's quadratic mixer (round-independent, so the priority order is a
fixed permutation) packed with the id into one int64 — a strict total
order identical in any engine. A vertex colors itself in the round
where its key beats every still-uncolored neighbor's, taking the
smallest color unused by its already-colored neighbors. The classic JP
result makes the output schedule-independent: whatever the round
grouping, the final assignment equals the SEQUENTIAL greedy coloring in
priority order, so engine and oracle agree bit-for-bit round-for-round
AND in the final state.

The min-excluded-color (mex) is computed relationally: distinct colored
-neighbor colors per winner, ranked ascending (rn 0-based), mex =
min(rn where color != rn), else the distinct count — one per-vertex
window whose size is the colored degree (the standard per-key window
caveat, shared with coreness's h-index).

Scale: per round ONE key-max aggregation over the shrinking uncolored
edge set (partial-aggregated integer max, same as MIS), one semi-joined
scan of the winner fringe against the full adjacency for mex, and two
semi/anti joins to shrink the frontier. The uncolored set drops by a
constant factor per round in expectation under the mixer (Luby's
argument). ``max_rounds`` follows the k_core contract: raise on
leftover uncolored vertices (a partial coloring is not a coloring),
oracle unrolls the same budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.edges import GraphTables
from .mis import _PACK, _priority


def greedy_coloring(
    graph: GraphTables, salt: int = 0, max_rounds: int = 16, checkpointer=None
) -> DataFrame:
    """(id, color) — the deterministic Jones-Plassmann greedy coloring
    under the static mixer-priority order; a proper coloring (no edge
    joins two same-colored vertices) with color count <= max degree + 1.
    Raises RuntimeError if ``max_rounds`` rounds leave uncolored
    vertices.

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every round durably commits the
    accumulated (id, color) table; a fresh call resumes from the latest
    committed round (rounds depend only on the colored set and the
    static priorities, so resumed output is identical — and a run that
    RAISED at its budget keeps its committed rounds for the retry)."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    # static priority: the MIS mixer at round 0, packed with the id
    key = _priority(F.col("id"), F.lit(0), salt) * F.lit(_PACK) + F.col("id")
    und = (
        graph.vertices.select("id")
        .select("id", key.alias("ky"))
        .localCheckpoint(eager=True)
    )
    e = edges  # uncolored-by-uncolored subgraph, shrunk per round
    colored: DataFrame | None = None  # accumulated (id, color)
    converged = False
    start_round = 0
    if checkpointer is not None:
        state = checkpointer.load_latest(graph.edges.sparkSession)
        if state is not None:
            it, saved, metric = state
            colored = saved.localCheckpoint(eager=True)
            start_round = it + 1
            converged = bool(metric.get("converged"))
            if not converged:
                und = und.join(colored.select("id"), "id", "left_anti").localCheckpoint(
                    eager=True
                )
                e = (
                    e.join(und.select(F.col("id").alias("src")), "src", "left_semi")
                    .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
                    .localCheckpoint(eager=True)
                )
    for _r in range(start_round, max_rounds):
        if converged:
            break
        nb = (
            e.join(und.select(F.col("id").alias("dst"), F.col("ky").alias("kd")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.max("kd").alias("mx"))
        )
        winners = (
            und.join(nb, "id", "left")
            .filter(F.col("mx").isNull() | (F.col("ky") > F.col("mx")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        if colored is None:
            newly = winners.select("id", F.lit(0).alias("color"))
        else:
            # colors already fixed on the winners' neighborhoods -> mex
            used = (
                edges.join(winners.select(F.col("id").alias("src")), "src", "left_semi")
                .join(
                    colored.select(F.col("id").alias("dst"), "color"), "dst"
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
            )
            w = Window.partitionBy("id").orderBy("color")
            mex = (
                used.withColumn("rn", F.row_number().over(w) - F.lit(1))
                .groupBy("id")
                .agg(
                    F.coalesce(
                        F.min(F.when(F.col("color") != F.col("rn"), F.col("rn"))),
                        F.count("*"),
                    ).alias("color")
                )
            )
            newly = winners.join(mex, "id", "left").select(
                "id", F.coalesce("color", F.lit(0)).alias("color")
            )
        newly = newly.localCheckpoint(eager=True)
        colored = (
            newly if colored is None else colored.unionByName(newly)
        ).localCheckpoint(eager=True)
        und = und.join(newly.select("id"), "id", "left_anti").localCheckpoint(eager=True)
        n_und = und.count()
        converged = n_und == 0
        if checkpointer is not None:
            checkpointer.save(
                _r, colored, {"n_uncolored": n_und, "converged": converged}
            )
        if converged:
            break
        e = (
            e.join(und.select(F.col("id").alias("src")), "src", "left_semi")
            .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    if not converged:
        raise RuntimeError(
            f"greedy_coloring did not converge in {max_rounds} rounds; a partial "
            "coloring is not a coloring. Raise max_rounds."
        )
    return graph.vertices.select("id").join(colored, "id", "left").select(
        "id", F.coalesce("color", F.lit(0)).alias("color")
    )
