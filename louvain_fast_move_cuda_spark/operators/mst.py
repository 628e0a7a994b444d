"""Borůvka minimum spanning forest — the classic BSP graph-contraction
algorithm (Borůvka 1926; the GPU-friendly MST of choice, e.g. Vineet et
al. 2009), over the canonical weighted edge table.

Not in the CUDA reference (Louvain-only, /root/reference/main.cu);
added §2.11-style analytics surface. On the transcript link graph the
MSF is the interaction backbone: the cheapest skeleton that keeps every
conversation/tool community connected, with the weighted-merge weights
(duplicate raw links summed) ranking parallel links.

Determinism (the repo's design center): edges are totally ordered by
the lexicographic key ``(weight, src, dst)`` — distinct edges always
compare differently, so the minimum spanning forest is UNIQUE and the
output is engine-independent: any correct algorithm, any round count,
any partitioning produces the identical edge set. The oracle exploits
this: its fixed-round unroll needs only to run Borůvka to completion,
not to mirror scheduling.

The Borůvka round, BSP-shaped:

1. every component picks its cheapest outgoing edge — ONE partial-
   aggregated integer-ish min (``F.min(struct(weight, src, dst, oc))``
   — associative, map-side combined, no per-key window, so hub
   components cannot skew a shuffle);
2. the picked edges form a pseudo-forest over components whose only
   cycles are mutual-min 2-cycles (a longer cycle would need strictly
   decreasing weights all the way around — impossible under a total
   order), broken by rooting each 2-cycle at its smaller id;
3. the resulting parent forest is contracted by pointer DOUBLING —
   ``ceil(log2(active components))`` self-joins of the (comp, parent)
   table, no data-dependent convergence actions — because a cheapest-
   edge forest can be a chain (an increasing-weight path makes every
   component point to its predecessor), so single-step propagation
   would need O(n) rounds.

Components at least halve per round, so ``max_rounds`` ~ log2(n).
ONE driver action per round (the active-component count, which also
sizes the doubling chain). ``max_rounds`` follows the k_core contract:
the engine raises if cross-component edges remain at the budget (a
truncated run is a spanning forest of the CONTRACTED graph, not of the
input), and the oracle unrolls the same budget — extra rounds past
convergence are no-ops (no cross edges -> nothing chosen), so the
unrolled SQL and the early-stopping engine agree whenever both
converge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def minimum_spanning_forest(
    graph: GraphTables,
    max_rounds: int = 12,
    on_truncate: str = "raise",
    checkpointer=None,
) -> DataFrame:
    """(src, dst, weight) — the unique minimum spanning forest of the
    weighted graph under the ``(weight, src, dst)`` total order; one row
    per forest edge (n_vertices - n_components rows in total).
    Raises RuntimeError if cross-component edges remain after
    ``max_rounds`` Borůvka rounds (pass ``on_truncate='ignore'`` to
    accept the partial forest).

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every round durably commits one
    packed state table (kind='comp' rows carry (id, comp); kind='edge'
    rows carry the forest chosen so far); a fresh call resumes from the
    latest committed round. Rounds depend only on the component map and
    the static edge table, and the MSF is unique under the total order,
    so resumed output is identical."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if on_truncate not in ("raise", "ignore"):
        raise ValueError(f"on_truncate must be 'raise' or 'ignore', got {on_truncate!r}")
    # canonical undirected half (src < dst holds for every symmetric pair)
    edges = (
        graph.edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
        .localCheckpoint(eager=True)
    )
    comp = graph.vertices.select("id", F.col("id").alias("comp"))
    chosen_parts: list[DataFrame] = []
    converged = False
    start_round = 0
    if checkpointer is not None:
        state = checkpointer.load_latest(graph.edges.sparkSession)
        if state is not None:
            it, saved, metric = state
            saved = saved.localCheckpoint(eager=True)
            comp = saved.filter(F.col("kind") == "comp").select(
                F.col("a").alias("id"), F.col("b").alias("comp")
            )
            prior = saved.filter(F.col("kind") == "edge").select(
                F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
            )
            chosen_parts.append(prior)
            start_round = it + 1
            converged = bool(metric.get("converged"))

    def _save(rnd: int, conv: bool, n_active: int) -> None:
        if checkpointer is None:
            return
        packed = comp.select(
            F.lit("comp").alias("kind"),
            F.col("id").alias("a"),
            F.col("comp").alias("b"),
            F.lit(None).cast("double").alias("w"),
        )
        for df in chosen_parts:
            packed = packed.unionByName(
                df.select(
                    F.lit("edge").alias("kind"),
                    F.col("src").alias("a"),
                    F.col("dst").alias("b"),
                    F.col("weight").alias("w"),
                )
            )
        checkpointer.save(rnd, packed, {"converged": conv, "n_active": n_active})

    for _rnd in range(start_round, max_rounds):
        if converged:
            break
        e = (
            edges.join(
                comp.select(F.col("id").alias("src"), F.col("comp").alias("cs")), "src"
            )
            .join(comp.select(F.col("id").alias("dst"), F.col("comp").alias("cd")), "dst")
            .filter(F.col("cs") != F.col("cd"))
        )
        cand = F.struct(
            F.col("weight").alias("w"),
            F.col("src").alias("s"),
            F.col("dst").alias("d"),
            F.col("oc").alias("oc"),
        )
        bi = e.select(
            F.col("cs").alias("c"), F.col("cd").alias("oc"), "weight", "src", "dst"
        ).unionByName(
            e.select(F.col("cd").alias("c"), F.col("cs").alias("oc"), "weight", "src", "dst")
        )
        # cheapest outgoing edge per component: associative struct-min,
        # partial-aggregated — hub components never skew a window sort
        best = bi.groupBy("c").agg(F.min(cand).alias("m")).localCheckpoint(eager=True)
        n_active = best.count()  # the round's ONE driver action
        if n_active == 0:
            converged = True
            _save(_rnd, True, 0)
            break
        chosen_parts.append(
            best.select(
                F.col("m.s").alias("src"),
                F.col("m.d").alias("dst"),
                F.col("m.w").alias("weight"),
            ).distinct()
        )
        # parent pointers; only mutual-min 2-cycles exist (module doc),
        # rooted at the smaller comp id.
        #
        # _lookup below re-expresses the (already unique-keyed) pointer
        # table as a groupBy aggregate before every self-join. This is
        # semantically a no-op but load-bearing: Catalyst's size-only
        # stats visitor estimates a plain join as the PRODUCT of its
        # children's sizeInBytes (a BigInt), and localCheckpoint
        # inherits the child plan's stats — so chained pointer-doubling
        # self-joins SQUARE the estimate each step, and by round ~3 the
        # optimizer spends minutes multiplying million-digit BigInts
        # (measured: 5s -> 16s -> 39s -> 230s per action, JVM pegged in
        # BigInteger.multiplyToomCook3 under
        # SizeInBytesOnlyStatsPlanVisitor.visitJoin). With an Aggregate
        # as the join child the estimate stays flat (measured: constant
        # 4 digits across 8 doublings vs 732 without).
        def _lookup(df, key_as, val_as):
            return df.groupBy(F.col("c").alias(key_as)).agg(F.min("p").alias(val_as))

        ptr = best.select("c", F.col("m.oc").alias("p"))
        look = _lookup(ptr, "bc", "bp")
        ptr = (
            ptr.join(look, ptr["p"] == look["bc"], "left")
            .select(
                "c",
                F.when(F.col("bp") == F.col("c"), F.least("c", "p"))
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer doubling: chain depth <= n_active, so ceil(log2) hops
        # reach every root; extra hops are identity (roots self-point).
        # Checkpoint EVERY hop: the plan references ptr twice per level,
        # so a lazy chain doubles its own node count per hop (2^17
        # leaves at 100k components) before the optimizer ever runs.
        for _d in range(max(1, math.ceil(math.log2(max(2, n_active))))):
            look = _lookup(ptr, "bc", "bp")
            ptr = (
                ptr.join(look, ptr["p"] == look["bc"], "left")
                .select("c", F.coalesce("bp", "p").alias("p"))
                .localCheckpoint(eager=True)
            )
        comp = (
            comp.join(_lookup(ptr, "comp", "p"), "comp", "left")
            .select("id", F.coalesce("p", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        _save(_rnd, False, n_active)
    if not converged and on_truncate == "raise":
        # the budget ran out with the last round still choosing edges;
        # confirm whether that round happened to finish the forest
        e = (
            edges.join(
                comp.select(F.col("id").alias("src"), F.col("comp").alias("cs")), "src"
            )
            .join(comp.select(F.col("id").alias("dst"), F.col("comp").alias("cd")), "dst")
            .filter(F.col("cs") != F.col("cd"))
        )
        if e.limit(1).count() > 0:
            raise RuntimeError(
                f"minimum_spanning_forest did not converge in {max_rounds} rounds; "
                "the partial result spans the contracted graph, not the input. "
                "Raise max_rounds, or pass on_truncate='ignore'."
            )
    if not chosen_parts:
        return edges.filter(F.lit(False)).select("src", "dst", "weight")
    out = chosen_parts[0]
    for df in chosen_parts[1:]:
        out = out.unionByName(df)
    # an MST edge merges its endpoints' components the round it is
    # chosen, so no edge can be chosen twice — plain union, no distinct
    return out
