"""Connected components via alternating large-star / small-star.

Not in the CUDA reference (SURVEY.md §2.11); semantics from the published
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond"), which converges in O(log² n) rounds on any graph — the right
choice at 10^12-edge scale where min-label flooding's O(diameter) rounds
is unbounded.

State is a parent pointer table; both stars are one groupBy-min plus a
join per round, all DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor v>u to min(N(u) ∪ {u})."""
    nbrs = edges.select("src", "dst")  # symmetric: contains both directions
    mins = (
        nbrs.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("mn"))
    )
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each u: connect all neighbors v<=u (and u) to their minimum."""
    nbrs = edges.select("src", "dst").filter(F.col("dst") < F.col("src"))
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    moved = (
        nbrs.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    self_edge = mins.select("src", F.col("mn").alias("dst"))
    return moved.unionByName(self_edge).filter(F.col("src") != F.col("dst")).distinct()


def _local_components(graph: GraphTables) -> DataFrame:
    """Driver-local tail: vectorized min-label pointer jumping.

    The output contract — component = min vertex id reachable — is
    algorithm-independent, so this is exactly the distributed result
    (same rationale as the Louvain local tail: once the edge list fits
    one node, distributed star rounds pay scheduler latency for
    nothing). Edge relaxation (np.minimum.at) + pointer doubling
    converges in O(log n) passes.
    """
    import numpy as np
    import pandas as pd

    spark = graph.edges.sparkSession
    epdf = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).toPandas()
    vpdf = graph.vertices.select("id").toPandas()
    ids = np.sort(vpdf["id"].to_numpy())
    src = np.searchsorted(ids, epdf["src"].to_numpy())
    dst = np.searchsorted(ids, epdf["dst"].to_numpy())
    label = np.arange(len(ids), dtype=np.int64)
    while True:
        old = label
        relaxed = label.copy()
        np.minimum.at(relaxed, src, label[dst])  # pull each neighbor's label
        label = relaxed
        label = np.minimum(label, label[label])  # pointer doubling
        label = np.minimum(label, label[label])
        if np.array_equal(label, old):
            break
    out = pd.DataFrame({"id": ids, "component": ids[label]})
    return spark.createDataFrame(out)


def connected_components(
    graph: GraphTables,
    max_iter: int = 50,
    local_max_edges: int = 5_000_000,
    checkpointer=None,
) -> DataFrame:
    """Returns (id: long, component: long) — component = min vertex id reachable.

    ``local_max_edges``: below this directed-edge count the computation
    runs in the driver (identical output — the label is a graph
    invariant); 0 forces the distributed star rounds.

    ``checkpointer``: optional plans.checkpoint.VertexIterationCheckpointer
    — every star round durably saves the contracted edge set + its
    set-fingerprint; a fresh call resumes from the latest committed
    round (the stars are deterministic set maps, so resumed output is
    identical). Forces the distributed path.
    """
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # decide the local-tail branch BEFORE building the repartitioned +
    # checkpointed distributed edge table: small graphs shouldn't pay a
    # full shuffle + materialization the local path never reads
    if checkpointer is None and local_max_edges > 0 and graph.edges.count() <= local_max_edges:
        return _local_components(graph)
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .repartition(npart, "src")
        .localCheckpoint(eager=True)
    )
    all_vertices = graph.vertices.select("id").localCheckpoint(eager=True)
    prev_fp = None
    start_iter = 0
    converged = False
    if checkpointer is not None:
        state = checkpointer.load_latest(spark)
        if state is not None:
            it, saved, metric = state
            edges = saved.repartition(npart, "src").localCheckpoint(eager=True)
            prev_fp = (metric.get("n"), metric.get("h"))
            start_iter = it + 1
            converged = bool(metric.get("converged"))
    for _it in range(start_iter, max_iter):
        if converged:
            break
        e1 = _large_star(edges)
        e1 = e1.unionByName(e1.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        e2 = _small_star(e1)
        # repartition BEFORE the distinct: HashPartitioning(src) satisfies
        # the dedup's ClusteredDistribution(src, dst) (all rows of one src
        # land together), so the distinct runs in place and the round does
        # ONE full exchange instead of two — and the output is already
        # src-partitioned for the next round's stars (guide §2.4).
        sym = (
            e2.unionByName(e2.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .repartition(npart, "src")
            .distinct()
        )
        if _it == start_iter:
            from ..plans.debug import dump_plan

            dump_plan(sym, "superstep_cc")
        # lazy: materializes inside the convergence-check agg below
        sym = sym.localCheckpoint(eager=False)
        # fixpoint test: the alternating stars converge exactly when the edge
        # set stops changing (Kiveris et al. §3); compare an order-invariant
        # (count, hash-xor) set fingerprint — one agg, vs a full self-join.
        # XOR (not sum): exact, commutative, cannot overflow under ANSI.
        row = sym.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("src", "dst")).alias("h")
        ).collect()[0]
        fp = (row["n"], row["h"])
        edges = sym
        converged = fp == prev_fp
        if checkpointer is not None:
            checkpointer.save(
                _it, edges, {"n": fp[0], "h": fp[1], "converged": converged}
            )
        if converged:
            break
        prev_fp = fp
    parents = (
        edges.filter(F.col("dst") < F.col("src"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("component"))
    )
    return (
        all_vertices.join(parents, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
