"""Deterministic distributed maximal matching — the BSP pairing
primitive (Israeli & Itai 1986's random-proposal scheme with the repo's
portable mixer in place of RNG), the standard building block for
coarsening seeds, load pairing, and scheduling.

Not in the CUDA reference (Louvain-only, /root/reference/main.cu);
added §2.11-style analytics surface. Round: every unmatched vertex
PROPOSES to its unmatched neighbor with the minimum (mixer(neighbor,
round), neighbor) key; mutual proposals become matches; matched
vertices and their incident edges leave; repeat on the shrinking
remainder until no unmatched-unmatched edges remain (maximality: no
edge joins two unmatched vertices at convergence).

Determinism: the proposal key reuses the MIS module's quadratic mixer —
nonlinear in the vertex id (an affine key is monotone along
consecutive-id reply chains, degenerating to one match per round on a
path; measured in mis.py) — packed with the id into one int64, so the
per-vertex argmin is a plain integer min identical in any engine, and
the key re-randomizes each round (Israeli-Itai's progress argument:
mutual-min pairs remove an expected constant fraction of edges).

Scale: per round ONE edge->key join + ONE per-vertex integer min
(partial-aggregated) + one self-join of the (vertex, proposal) table to
find mutual pairs + two semi-joins to shrink the frontier.
``max_rounds`` follows the k_core contract: the engine raises if
unmatched-unmatched edges remain at the budget (a non-maximal matching
silently breaks the caller's cover guarantee), and the fixed-round
oracle unrolls the same budget — rounds past convergence are no-ops on
empty sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables
from .mis import _PACK, _priority


def maximal_matching(
    graph: GraphTables, salt: int = 0, max_rounds: int = 16, checkpointer=None
) -> DataFrame:
    """(u, v) with u < v — one deterministic maximal matching: no vertex
    appears twice, and every edge of the graph touches a matched vertex
    at convergence. Raises RuntimeError if unmatched-unmatched edges
    remain after ``max_rounds`` rounds.

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every round durably commits the
    matched pairs so far (the unmatched-by-unmatched edge set is
    re-derived by two anti-joins on resume); rounds depend only on
    (round index, unmatched set), so a resumed run replays identically."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    matched_parts: list[DataFrame] = []
    converged = False
    start_round = 0
    if checkpointer is not None:
        state = checkpointer.load_latest(graph.edges.sparkSession)
        if state is not None:
            it, saved, metric = state
            saved = saved.localCheckpoint(eager=True)
            matched_parts.append(saved)
            start_round = it + 1
            converged = bool(metric.get("converged"))
            if not converged:
                gone = saved.select(F.col("u").alias("id")).unionByName(
                    saved.select(F.col("v").alias("id"))
                )
                e = (
                    e.join(gone.select(F.col("id").alias("src")), "src", "left_anti")
                    .join(gone.select(F.col("id").alias("dst")), "dst", "left_anti")
                    .localCheckpoint(eager=True)
                )

    def _save(rnd: int, conv: bool) -> None:
        if checkpointer is None:
            return
        if matched_parts:
            packed = matched_parts[0]
            for df in matched_parts[1:]:
                packed = packed.unionByName(df)
        else:
            packed = graph.edges.filter(F.lit(False)).select(
                F.col("src").alias("u"), F.col("dst").alias("v")
            )
        checkpointer.save(rnd, packed, {"converged": conv})

    for r in range(start_round, max_rounds):
        if converged:
            break
        # proposal key of the DST endpoint, re-randomized per round
        kd = _priority(F.col("dst"), F.lit(r), salt) * F.lit(_PACK) + F.col("dst")
        prop = (
            e.select("src", "dst", kd.alias("kd"))
            .groupBy("src")
            .agg(F.min(F.struct(F.col("kd"), F.col("dst"))).alias("m"))
            .select("src", F.col("m.dst").alias("to"))
        )
        # mutual proposals: src -> to and to -> src
        back = prop.select(F.col("src").alias("to"), F.col("to").alias("src"))
        pairs = (
            prop.join(back, ["src", "to"], "left_semi")
            .filter(F.col("src") < F.col("to"))
            .select(F.col("src").alias("u"), F.col("to").alias("v"))
            .localCheckpoint(eager=True)
        )
        if pairs.count() == 0:
            # mutual-min always matches the globally minimal key pair,
            # so an empty round means no unmatched-unmatched edges exist
            converged = True
            _save(r, True)
            break
        matched_parts.append(pairs)
        gone = pairs.select(F.col("u").alias("id")).unionByName(
            pairs.select(F.col("v").alias("id"))
        )
        e = (
            e.join(gone.select(F.col("id").alias("src")), "src", "left_anti")
            .join(gone.select(F.col("id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        _save(r, False)
    if not converged:
        # the final budgeted round can match pairs AND empty the edge
        # set; an empty residual proves maximality (same O(1) confirm
        # as minimum_spanning_forest / the k_core-family peels)
        converged = e.limit(1).count() == 0
    if not converged:
        raise RuntimeError(
            f"maximal_matching did not converge in {max_rounds} rounds; the "
            "partial matching would not be maximal. Raise max_rounds."
        )
    if not matched_parts:
        return graph.edges.filter(F.lit(False)).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
    out = matched_parts[0]
    for df in matched_parts[1:]:
        out = out.unionByName(df)
    return out


def greedy_weighted_matching(
    graph: GraphTables, salt: int = 0, max_rounds: int = 20
) -> DataFrame:
    """(u, v, weight) with u < v — the locally-heaviest-edge matching
    (Preis 1999 / Manne-Bisseling's distributed variant): every
    unmatched vertex proposes along its maximum-key incident edge;
    mutual proposals match; repeat. Guarantees a 1/2-approximation of
    the maximum-weight matching (every matched edge is locally heaviest
    at match time) and maximality.

    The edge key is (weight, mixer(src + dst, round)) packed into one
    int64: weight dominates (cast to int64 — the weighted-merge counts
    are integer-valued; the pack bounds them to < 2^31, checked
    explicitly below rather than trusting session ANSI mode — with ANSI
    off an overflow would silently wrap and reorder proposals), and the
    PER-ROUND mixer breaks weight ties. The tie-break is load-bearing on this data: most merge
    weights are 1, and an id-based tie order is monotone along
    consecutive-id reply chains — one match per round on a path. The
    round-salted mixer re-randomizes ties (Israeli-Itai progress) while
    never reordering distinct weights; the globally maximal key edge is
    always mutual, so an empty round proves maximality.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = graph.edges.select(
        "src", "dst", F.col("weight").cast("long").alias("w")
    ).localCheckpoint(eager=True)
    # explicit w < 2^31 precondition (one cheap scan, like
    # weighted_landmark_distances' negative-weight check): the packed
    # key w * 2^31 + mixer must fit in int64 regardless of ANSI mode
    if e.filter(F.col("w") >= F.lit(_PACK)).limit(1).count() > 0:
        raise ValueError(
            f"greedy_weighted_matching requires integer weights < 2^31 "
            f"(= {_PACK}) so the (weight, tie-break) pack fits in int64"
        )
    matched_parts: list[DataFrame] = []
    converged = False
    for r in range(max_rounds):
        # symmetric edge key: identical from both endpoints' rows
        ek = F.col("w") * F.lit(_PACK) + _priority(
            F.col("src") + F.col("dst"), F.lit(r), salt
        )
        prop = (
            e.select("src", "dst", "w", ek.alias("ek"))
            .groupBy("src")
            .agg(F.max(F.struct("ek", "dst", "w")).alias("m"))
            .select("src", F.col("m.dst").alias("to"), F.col("m.w").alias("w"))
        )
        back = prop.select(F.col("src").alias("to"), F.col("to").alias("src"))
        pairs = (
            prop.join(back, ["src", "to"], "left_semi")
            .filter(F.col("src") < F.col("to"))
            .select(F.col("src").alias("u"), F.col("to").alias("v"), "w")
            .localCheckpoint(eager=True)
        )
        if pairs.count() == 0:
            converged = True
            break
        matched_parts.append(pairs)
        gone = pairs.select(F.col("u").alias("id")).unionByName(
            pairs.select(F.col("v").alias("id"))
        )
        e = (
            e.join(gone.select(F.col("id").alias("src")), "src", "left_anti")
            .join(gone.select(F.col("id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not converged:
        # same budget-edge confirm as maximal_matching
        converged = e.limit(1).count() == 0
    if not converged:
        raise RuntimeError(
            f"greedy_weighted_matching did not converge in {max_rounds} rounds; "
            "the partial matching would not be maximal. Raise max_rounds."
        )
    if not matched_parts:
        return graph.edges.filter(F.lit(False)).select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("weight").cast("long").alias("w"),
        )
    out = matched_parts[0]
    for df in matched_parts[1:]:
        out = out.unionByName(df)
    return out
