"""Landmark BFS distances and harmonic-centrality estimates.

Not in the CUDA reference (Louvain-only, /root/reference/main.cu);
added §2.11-style analytics surface. Exact all-pairs centrality is
O(n·m) and impossible at 10^12 edges; the standard scale technique is
LANDMARKS (pivots): run multi-source BFS from a deterministic seed set
and estimate per-vertex centrality from the landmark distances
(Eppstein-Wang style estimator). Distances are integers, so every
result is bit-reproducible across engines.

Semantics are BOUNDED-RADIUS by contract: ``max_hops`` is part of the
operator's meaning (pairs farther than max_hops are absent, exactly
like the Adamic-Adar hub cap is part of its meaning), so a fixed-round
oracle and an early-stopping engine always agree — frontier expansion
is monotone and stalls only at the true fixpoint.

Scale notes:
* state is |landmarks| × (vertices within radius) rows — the caller
  controls both knobs (seed_mod, max_hops); the classic trade
  (hundreds of landmarks suffice for stable centrality ranks).
* each hop is ONE equi-join of the frontier against the static edge
  table + one anti-join against the visited state — frontier-sized
  work, never graph-sized re-scans.
* lineage: visited/frontier localCheckpoint per hop; the frontier
  count doubles as the convergence action (one action per hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def landmark_distances(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 6
) -> DataFrame:
    """(landmark, vertex, dist) — BFS distance from every landmark
    (vid % seed_mod == 0) to every vertex within ``max_hops`` hops
    (unweighted; dist 0 = the landmark itself). Pairs farther than
    max_hops are absent by contract (bounded-radius semantics)."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    edges = graph.edges.select("src", "dst")
    seeds = (
        graph.vertices.select(F.col("id").alias("landmark"))
        .filter(F.col("landmark") % F.lit(seed_mod) == 0)
        .select("landmark", F.col("landmark").alias("vertex"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    return _bfs_loop(edges, seeds, max_hops)


def _bfs_loop(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Shared multi-source BFS: seeds = (landmark, vertex, dist=0),
    returns (landmark, vertex, dist) within max_hops. One frontier
    expand join + one visited anti-join per hop; the frontier count
    doubles as the hop's materialization action; stops at the true
    fixpoint (expansion is monotone)."""
    visited = seeds
    frontier = seeds
    out = [seeds]
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["vertex"] == edges["src"])
            .select("landmark", F.col("dst").alias("vertex"))
            .distinct()
            .join(visited.select("landmark", "vertex"), ["landmark", "vertex"], "left_anti")
            .select("landmark", "vertex", F.lit(h).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break  # true fixpoint: further hops are identity
        out.append(nxt)
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def harmonic_centrality(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 6
) -> DataFrame:
    """(id, n_landmarks_reached, harmonic_r9) — per-vertex harmonic
    centrality estimated from the landmark sample: Σ_l 1/dist(l, v)
    over landmarks within ``max_hops`` (dist 0 excluded — a landmark
    does not score itself). Vertices reaching no landmark get 0.0
    (explicit row, so downstream joins see every vertex).

    1/dist for integer dist is one IEEE division per term and the sum
    has ≤ |landmarks| terms; r9 rounding absorbs the association-order
    noise of the float sum across engines.
    """
    d = landmark_distances(graph, seed_mod=seed_mod, max_hops=max_hops)
    scores = (
        d.filter(F.col("dist") > 0)
        .groupBy(F.col("vertex").alias("id"))
        .agg(
            F.count("*").alias("n_landmarks_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("dist").cast("double")), 9).alias(
                "harmonic_r9"
            ),
        )
    )
    return (
        graph.vertices.select("id")
        .join(scores, "id", "left")
        .select(
            "id",
            F.coalesce("n_landmarks_reached", F.lit(0)).alias("n_landmarks_reached"),
            F.coalesce("harmonic_r9", F.lit(0.0)).alias("harmonic_r9"),
        )
    )


def closeness_centrality(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 6
) -> DataFrame:
    """(id, n_landmarks_reached, sum_dist, closeness_r9) — per-vertex
    closeness estimated from the landmark sample: reached-count divided
    by the distance sum over landmarks within ``max_hops`` (the
    harmonic twin with the reciprocal OUTSIDE the sum — Wasserman-Faust
    without the reachability rescale, which a bounded-radius sample
    cannot know). sum_dist is an exact integer; the score is ONE IEEE
    division of two integers, so r9 rounding is decorative rather than
    load-bearing. Vertices reaching no landmark get an explicit 0 row.
    """
    d = landmark_distances(graph, seed_mod=seed_mod, max_hops=max_hops)
    scores = (
        d.filter(F.col("dist") > 0)
        .groupBy(F.col("vertex").alias("id"))
        .agg(
            F.count("*").alias("n_landmarks_reached"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )
        .select(
            "id",
            "n_landmarks_reached",
            "sum_dist",
            F.round(
                F.col("n_landmarks_reached").cast("double")
                / F.col("sum_dist").cast("double"),
                9,
            ).alias("closeness_r9"),
        )
    )
    return (
        graph.vertices.select("id")
        .join(scores, "id", "left")
        .select(
            "id",
            F.coalesce("n_landmarks_reached", F.lit(0)).alias("n_landmarks_reached"),
            F.coalesce("sum_dist", F.lit(0)).alias("sum_dist"),
            F.coalesce("closeness_r9", F.lit(0.0)).alias("closeness_r9"),
        )
    )


def _bfs_single(edges: DataFrame, seed: int, max_hops: int) -> DataFrame:
    """(vertex, dist) — bounded-radius BFS from one seed: the shared
    multi-source loop (_bfs_loop) with a single-row seed set, landmark
    column dropped."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame(
        [(int(seed), int(seed), 0)], "landmark long, vertex long, dist int"
    ).localCheckpoint(eager=True)
    return _bfs_loop(edges, seeds, max_hops).select("vertex", "dist")


def double_sweep(graph: GraphTables, max_hops: int = 8) -> DataFrame:
    """One row (start, peak, ecc_start, diameter_lb) — the classic
    double-sweep diameter lower bound: BFS from the lowest vertex id,
    hop to the farthest vertex found (ties -> lowest id), BFS again;
    the second eccentricity lower-bounds the diameter. BOUNDED-RADIUS
    by contract like landmark_distances: legs stop at ``max_hops``, so
    on graphs wider than the budget the bound is simply looser — a
    fixed-round oracle and the early-stopping engine always agree.

    Scale: two frontier BFS loops (one equi-join + one anti-join per
    hop, frontier-sized work) and two 1-row scalar actions.
    """
    edges = graph.edges.select("src", "dst")
    start_row = graph.vertices.agg(F.min("id")).collect()[0][0]
    if start_row is None:
        raise ValueError("double_sweep needs a non-empty graph")
    start = int(start_row)
    d1 = _bfs_single(edges, start, max_hops)
    r1 = d1.agg(
        F.max(F.struct(F.col("dist"), (-F.col("vertex")).alias("nv"))).alias("m")
    ).collect()[0][0]
    ecc_start, peak = int(r1["dist"]), int(-r1["nv"])
    d2 = _bfs_single(edges, peak, max_hops)
    diameter_lb = int(d2.agg(F.max("dist")).collect()[0][0])
    return edges.sparkSession.createDataFrame(
        [(start, peak, ecc_start, diameter_lb)],
        "start long, peak long, ecc_start int, diameter_lb int",
    )


def stress_centrality(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 4
) -> DataFrame:
    """(id, stress) — sampled-source STRESS centrality (Shimbel 1953,
    the integer-exact member of the betweenness family): stress(v) =
    the number of shortest landmark->target paths that pass through v
    as an interior vertex, summed over the deterministic landmark set
    (vid % seed_mod == 0) and over targets within ``max_hops`` of their
    landmark (bounded-radius semantics, exactly like
    landmark_distances).

    Brandes-style two-pass, all-integer: the forward pass runs the
    multi-source BFS carrying sigma(v) = #shortest paths landmark->v
    (per hop: one frontier equi-join + partial-agg sigma sum + one
    anti-join against visited); the backward pass walks the BFS DAG
    levels deepest-first accumulating D(v) = sum over DAG successors w
    of (1 + D(w)) = #shortest-DAG paths starting at v. Then
    stress(v) = Σ_landmarks sigma(v) * D(v). Classic betweenness
    divides per-(s,t) by sigma_st, which leaves the integers — stress
    keeps every quantity an exact int64, which is what makes the
    cross-engine oracle bit-exact (and ANSI mode turns any overflow
    into a loud error rather than a silent wrap; sigma growth is
    bounded by the hop radius the caller sets).

    Scale: state is |landmarks| x (vertices within radius) rows, work
    per hop is frontier-sized in both passes; landmarks and radius are
    the caller's cost knobs (hundreds of landmarks suffice for stable
    centrality ranks — Eppstein-Wang style sampling).
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    edges = graph.edges.select("src", "dst")
    lvl = (
        graph.vertices.select(F.col("id").alias("landmark"))
        .filter(F.col("landmark") % F.lit(seed_mod) == 0)
        .select(
            "landmark",
            F.col("landmark").alias("vertex"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [lvl]
    visited = lvl.select("landmark", "vertex")
    for _h in range(1, max_hops + 1):
        nxt = (
            levels[-1]
            .join(edges, F.col("vertex") == F.col("src"))
            .select("landmark", F.col("dst").alias("nv"), "sigma")
            .groupBy("landmark", F.col("nv").alias("vertex"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["landmark", "vertex"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break  # true fixpoint: every later level is empty
        levels.append(nxt)
        visited = visited.unionByName(
            nxt.select("landmark", "vertex")
        ).localCheckpoint(eager=True)
    # backward pass: D over the BFS DAG, deepest level first (its
    # successors lie beyond the radius, so its D is 0 by contract and
    # its sigma*D contribution is identically 0 — not emitted; the
    # landmark level h=0 is an endpoint, never interior — not computed)
    d_next = levels[-1].select("landmark", "vertex", F.lit(0).cast("long").alias("d"))
    contribs: list[DataFrame] = []
    for h in range(len(levels) - 2, 0, -1):
        cur = levels[h]
        succ = (
            cur.select("landmark", "vertex")
            .join(edges, F.col("vertex") == F.col("src"))
            .select("landmark", "vertex", F.col("dst").alias("w"))
            .join(
                d_next.select("landmark", F.col("vertex").alias("w"), "d"),
                ["landmark", "w"],
            )
            .groupBy("landmark", "vertex")
            .agg(F.sum(F.lit(1) + F.col("d")).alias("d"))
        )
        dh = (
            cur.join(succ, ["landmark", "vertex"], "left")
            .select(
                "landmark",
                "vertex",
                "sigma",
                F.coalesce("d", F.lit(0)).cast("long").alias("d"),
            )
            .localCheckpoint(eager=True)
        )
        contribs.append(
            dh.select("landmark", "vertex", (F.col("sigma") * F.col("d")).alias("c"))
        )
        d_next = dh.select("landmark", "vertex", "d")
    scores = None
    if contribs:
        allc = contribs[0]
        for df in contribs[1:]:
            allc = allc.unionByName(df)
        scores = allc.groupBy(F.col("vertex").alias("id")).agg(
            F.sum("c").alias("stress")
        )
    verts = graph.vertices.select("id")
    if scores is None:
        return verts.select("id", F.lit(0).cast("long").alias("stress"))
    return verts.join(scores, "id", "left").select(
        "id", F.coalesce("stress", F.lit(0)).cast("long").alias("stress")
    )


def effective_diameter(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 6, pct: int = 90
) -> DataFrame:
    """One row (n_pairs, eff_diameter_p{pct}, max_sampled_dist) — the
    classic effective-diameter estimate: the smallest hop count d such
    that >= pct% of the sampled (landmark, vertex) distance pairs lie
    within d, over the deterministic landmark set (the Eppstein-Wang
    sampling that landmark_distances already implements), plus the
    largest sampled distance (a diameter lower bound, double_sweep's
    cheaper cousin). Bounded-radius by contract: pairs farther than
    max_hops are absent, so at radius saturation the estimate is a
    lower bound — same caveat the operator family documents.

    Exact integers end to end: distances histogram (<= max_hops rows,
    so the cumulative window is bounded — not a scale risk), rank =
    ceil(pct/100 * n) identical in both engines, first histogram bucket
    whose cumulative count reaches the rank.
    """
    if not 0 < pct <= 100:
        raise ValueError(f"pct must be in (0, 100], got {pct}")
    from pyspark.sql import Window

    d = landmark_distances(graph, seed_mod=seed_mod, max_hops=max_hops).filter(
        F.col("dist") > 0
    )
    hist = d.groupBy("dist").agg(F.count("*").alias("n"))
    w_all = Window.partitionBy(F.lit(0))
    cum = hist.select(
        "dist",
        F.sum("n").over(w_all.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(w_all).alias("tot"),
        F.max("dist").over(w_all).alias("max_sampled_dist"),
    )
    rank = F.ceil(F.col("tot") * F.lit(pct) / F.lit(100.0))
    return (
        cum.filter(F.col("cum") >= rank)
        .agg(
            F.max("tot").alias("n_pairs"),
            F.min("dist").alias(f"eff_diameter_p{pct}"),
            F.max("max_sampled_dist").alias("max_sampled_dist"),
        )
    )


def weighted_landmark_distances(
    graph: GraphTables, seed_mod: int = 101, max_hops: int = 6, checkpointer=None
) -> DataFrame:
    """(landmark, vertex, dist) — hop-bounded WEIGHTED shortest-path
    distances from every landmark (vid % seed_mod == 0): min total edge
    weight over paths of at most ``max_hops`` links. The weighted twin
    of :func:`landmark_distances`: with the weighted-merge graph's
    integer-valued weights every distance is an exact int64, so the
    fixed-round Bellman-Ford states are engine-exact.

    Round r is the exact Bellman-Ford state (min weight over <= r-hop
    paths); expansion only from rows improved last round (delta
    expansion walks the identical state sequence), ONE shuffle join +
    min-merge per round, early stop at the true fixpoint. Bounded-hop
    semantics as in landmark_distances — ``max_hops`` IS the contract,
    no truncation raise. Negative weights are rejected: with a hop
    bound the DP stays well-defined, but a "distance" that a longer
    path could lower below zero has no useful contract.

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every hop durably commits one packed
    state table (kind='best' the distance map, kind='frontier' last
    hop's improvements); a fresh call resumes the identical Bellman-Ford
    state sequence from the latest committed hop.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = (
        graph.edges.select("src", "dst", F.col("weight").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    if e.filter(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("weighted_landmark_distances requires nonnegative weights")
    best = (
        graph.vertices.select(F.col("id").alias("landmark"))
        .filter(F.col("landmark") % F.lit(seed_mod) == 0)
        .select(
            "landmark",
            F.col("landmark").alias("vertex"),
            F.lit(0).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = best
    start_hop = 0
    fixpoint = False
    if checkpointer is not None:
        state = checkpointer.load_latest(graph.edges.sparkSession)
        if state is not None:
            it, saved, metric = state
            saved = saved.localCheckpoint(eager=True)
            best = saved.filter(F.col("kind") == "best").select(
                "landmark", "vertex", "dist"
            )
            frontier = saved.filter(F.col("kind") == "frontier").select(
                "landmark", "vertex", "dist"
            )
            start_hop = it + 1
            fixpoint = bool(metric.get("fixpoint"))

    def _save(hop: int, fx: bool, n_improved: int) -> None:
        if checkpointer is None:
            return
        packed = best.select(F.lit("best").alias("kind"), "landmark", "vertex", "dist")
        packed = packed.unionByName(
            frontier.select(F.lit("frontier").alias("kind"), "landmark", "vertex", "dist")
        )
        checkpointer.save(hop, packed, {"fixpoint": fx, "n_improved": n_improved})

    for _h in range(start_hop, max_hops):
        if fixpoint:
            break
        cand = (
            frontier.join(e, frontier["vertex"] == e["src"])
            .groupBy("landmark", F.col("dst").alias("vertex"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
        )
        improved = (
            cand.join(
                best.select("landmark", "vertex", F.col("dist").alias("prev")),
                ["landmark", "vertex"],
                "left",
            )
            .filter(F.col("prev").isNull() | (F.col("dist") < F.col("prev")))
            .select("landmark", "vertex", "dist")
            .localCheckpoint(eager=True)
        )
        n_improved = improved.count()
        if n_improved == 0:
            fixpoint = True
            _save(_h, True, 0)
            break  # true fixpoint: further rounds are identity
        best = (
            best.unionByName(improved)
            .groupBy("landmark", "vertex")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
        _save(_h, False, n_improved)
    return best


def ego_networks(
    graph: GraphTables, seed_mod: int = 101, radius: int = 2
) -> DataFrame:
    """(landmark, src, dst) — the INDUCED edge set of every landmark's
    radius-ball: canonical (src < dst) edges whose both endpoints lie
    within ``radius`` hops of the landmark. The subgraph-extraction
    verb: ego networks are the standard unit for neighborhood
    visualization, GNN subgraph batching, and local-structure audits.

    Plan: the shared landmark BFS builds the membership table once;
    the edge list then semi-joins membership on BOTH endpoints keyed by
    (landmark, vertex) — two equi-joins, no per-landmark rescan of the
    graph. Output is Σ_l |E(ball_l)| rows; seed_mod and radius are the
    size knobs (bounded-radius contract as in landmark_distances)."""
    d = landmark_distances(graph, seed_mod=seed_mod, max_hops=radius)
    m = d.select("landmark", "vertex")
    half = graph.edges.filter(F.col("src") < F.col("dst")).select("src", "dst")
    return (
        half.join(m.withColumnRenamed("vertex", "src"), "src")
        .join(m.withColumnRenamed("vertex", "dst"), ["landmark", "dst"], "left_semi")
        .select("landmark", "src", "dst")
    )
