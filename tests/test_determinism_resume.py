"""North-rule invariants: determinism across parallelism levels, resume
from durable checkpoints, per-turn text equality under stable ordering."""

import glob
import math
import os

from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.operators.louvain import louvain
from louvain_fast_move_cuda_spark.plans.checkpoint import SuperstepCheckpointer
from louvain_fast_move_cuda_spark.sources.edges import build_graph
from louvain_fast_move_cuda_spark.sources.transcripts import synthesize_transcripts

from oracle import powerlaw_graph


def _labels(res):
    return sorted((r.orig_id, r.community) for r in res.labels.collect())


def test_louvain_deterministic_across_shuffle_partitions(spark):
    """Canonical tie-break (max ΔQ, then lowest community) must make labels
    independent of partitioning — the sandbox proxy for 'same result at N
    and 4N executors'."""
    edges = powerlaw_graph(n=250, m_attach=2, seed=11)
    raw = spark.createDataFrame(edges, "a long, b long")
    results = []
    for npart in (2, 8):
        g = build_graph(raw, relabel=False)
        res = louvain(g, shuffle_partitions=npart, local_finish_max_edges=0)
        results.append((_labels(res), res.modularity))
    assert results[0][0] == results[1][0]
    assert math.isclose(results[0][1], results[1][1], abs_tol=1e-12)


def test_louvain_arrow_mode_matches_df_mode(spark):
    """Cross-mode agreement — the Spark analogue of the reference running
    HASH and SORT per graph (main.cu:20-39): the CSR-blocked mapInPandas
    kernel and the pure-DataFrame plan must emit identical moves, hence
    identical labels and bit-identical modularity (integer edge weights
    make every partial sum exact in both engines)."""
    edges = powerlaw_graph(n=250, m_attach=2, seed=11)
    raw = spark.createDataFrame(edges, "a long, b long")
    res_df = louvain(build_graph(raw, relabel=False), mode="df", local_finish_max_edges=0)
    res_ar = louvain(build_graph(raw, relabel=False), mode="arrow", local_finish_max_edges=0)
    assert _labels(res_df) == _labels(res_ar)
    assert res_df.modularity == res_ar.modularity
    # ADAPTIVE_SPEED (C3, phaseOptimization.cuh:125-146): df rounds 1..4
    # then arrow — a per-level mix of both engines, same exact agreement
    res_ad = louvain(
        build_graph(raw, relabel=False), mode="adaptive", local_finish_max_edges=0
    )
    assert _labels(res_ad) == _labels(res_df)
    assert res_ad.modularity == res_df.modularity
    # ADAPTIVE_MEMORY (constants.h:13): hash from round 1 while the
    # level's candidate bound fits the memory budget, sort-agg above it.
    # Both budget regimes must agree with the other engines exactly:
    # a huge budget == HASH dispatch, budget 0 == always the df plan.
    for budget in (10**9, 0):
        res_am = louvain(
            build_graph(raw, relabel=False),
            mode="adaptive_memory",
            local_finish_max_edges=0,
            memory_budget_rows=budget,
        )
        assert _labels(res_am) == _labels(res_df), f"budget={budget}"
        assert res_am.modularity == res_df.modularity, f"budget={budget}"


def test_local_finish_matches_distributed(spark):
    """The driver-local NumPy tail (operators/louvain_local.py) is a third
    engine for the same semantics: on integer-weight graphs every partial
    sum is exact and the ΔQ/Q expression trees are identical, so labels
    and modularity must match the distributed plan BIT-FOR-BIT — at full
    local finish (level 0 already fits) and distributed-only."""
    edges = powerlaw_graph(n=250, m_attach=2, seed=11)
    raw = spark.createDataFrame(edges, "a long, b long")
    res_dist = louvain(build_graph(raw, relabel=False), local_finish_max_edges=0)
    res_loc = louvain(build_graph(raw, relabel=False))  # default: local tail
    assert any(mt.get("engine") == "local" for mt in res_loc.metrics)
    assert not any(mt.get("engine") == "local" for mt in res_dist.metrics)
    assert _labels(res_dist) == _labels(res_loc)
    assert res_dist.modularity == res_loc.modularity
    assert res_dist.levels == res_loc.levels
    assert res_dist.n_communities == res_loc.n_communities


def test_resume_from_checkpoint_identical_labels(spark, tmp_path):
    edges = powerlaw_graph(n=150, m_attach=2, seed=4)
    raw = spark.createDataFrame(edges, "a long, b long")
    g = build_graph(raw, relabel=False)
    ckpt_dir = str(tmp_path / "ckpt")

    full = louvain(build_graph(raw, relabel=False), checkpointer=SuperstepCheckpointer(ckpt_dir))
    assert glob.glob(os.path.join(ckpt_dir, "level=*/round=*/_META.json"))

    resumed = louvain(g, checkpointer=SuperstepCheckpointer(ckpt_dir))
    assert _labels(resumed) == _labels(full)
    assert math.isclose(resumed.modularity, full.modularity, abs_tol=1e-12)
    # resume skipped the converged optimization (far fewer rounds than full)
    assert len(resumed.metrics) < len(full.metrics)


def test_torn_checkpoint_is_invisible(spark, tmp_path):
    """A superstep directory without its _META.json commit marker must be
    ignored by resume (torn-write safety)."""
    root = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(root, "level=3", "round=7"))  # no _META.json
    assert SuperstepCheckpointer(root).load_latest(spark) is None


def test_per_turn_text_equality_under_stable_ordering(spark):
    """input_hint invariant: text is a pure function of (conv_id, turn_idx)
    and survives the pipeline under stable ordering, at any parallelism."""
    t1 = synthesize_transcripts(spark, n_convs=200, seed=42).repartition(13)
    t2 = synthesize_transcripts(spark, n_convs=200, seed=42).repartition(2)
    a = [r.text for r in t1.orderBy("conv_id", "turn_idx").collect()]
    b = [r.text for r in t2.orderBy("conv_id", "turn_idx").collect()]
    assert a == b and len(a) > 400
    # role alternates deterministically; ts monotone within conversation
    chk = (
        t1.groupBy("conv_id")
        .agg(
            F.max(F.col("turn_idx")).alias("mx"),
            F.count("*").alias("n"),
            (F.min("ts") < F.max("ts")).alias("mono"),
        )
        .filter(F.col("n") != F.col("mx") + 1)
        .count()
    )
    assert chk == 0


def test_pagerank_lpa_cc_resume_mid_iteration(spark, tmp_path):
    """North rule: every superstep checkpoints so runs resume
    mid-iteration — interrupted-then-resumed output must equal a fresh
    uninterrupted run (exact for integer-label algorithms, 1e-12 for
    PageRank float sums)."""
    import pytest

    from louvain_fast_move_cuda_spark.operators.components import connected_components
    from louvain_fast_move_cuda_spark.operators.labelprop import label_propagation
    from louvain_fast_move_cuda_spark.operators.pagerank import pagerank
    from louvain_fast_move_cuda_spark.plans.checkpoint import VertexIterationCheckpointer

    edges = powerlaw_graph(n=120, m_attach=2, seed=5)
    g = build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)

    # --- pagerank: 3 iterations, then resume to 12 -----------------------
    ck = VertexIterationCheckpointer(str(tmp_path / "pr"), algo="pagerank")
    pagerank(g, max_iter=3, tol=0.0, checkpointer=ck)
    resumed = {r.id: r.rank for r in
               pagerank(g, max_iter=12, tol=0.0, checkpointer=ck).collect()}
    fresh = {r.id: r.rank for r in
             pagerank(g, max_iter=12, tol=0.0, local_max_edges=0).collect()}
    assert resumed.keys() == fresh.keys()
    for k in fresh:
        assert resumed[k] == pytest.approx(fresh[k], abs=1e-12)

    # --- lpa: 1 round, then resume to 5 (bit-identical labels) -----------
    ck = VertexIterationCheckpointer(str(tmp_path / "lpa"), algo="lpa")
    label_propagation(g, max_iter=1, checkpointer=ck).collect()
    resumed = sorted(map(tuple, label_propagation(g, max_iter=5, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, label_propagation(g, max_iter=5, local_max_edges=0).collect()))
    assert resumed == fresh

    # --- cc: 1 star round, then resume (exact labels) --------------------
    ck = VertexIterationCheckpointer(str(tmp_path / "cc"), algo="cc")
    connected_components(g, max_iter=1, checkpointer=ck).collect()
    resumed = sorted(map(tuple, connected_components(g, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, connected_components(g, local_max_edges=0).collect()))
    assert resumed == fresh

    # resuming a CONVERGED checkpoint is a no-op returning the fixpoint
    again = sorted(map(tuple, connected_components(g, checkpointer=ck).collect()))
    assert again == fresh

    # algo tag guards against pointing one algorithm at another's dir
    bad = VertexIterationCheckpointer(str(tmp_path / "cc"), algo="pagerank")
    try:
        pagerank(g, max_iter=2, checkpointer=bad)
        raise AssertionError("expected ValueError for mismatched algo tag")
    except ValueError:
        pass


def test_coloring_msf_resume_mid_iteration(spark, tmp_path):
    """Coloring + MSF resume from a committed round bit-identically —
    including after a budget-exhausted run that RAISED (its committed
    rounds survive for the retry)."""
    import pytest

    from louvain_fast_move_cuda_spark.operators.coloring import greedy_coloring
    from louvain_fast_move_cuda_spark.operators.mst import minimum_spanning_forest
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    edges = powerlaw_graph(n=100, m_attach=2, seed=13)
    g = build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)

    # --- coloring: budget-exhausted run raises but commits its rounds --
    ck = VertexIterationCheckpointer(str(tmp_path / "col"), algo="coloring")
    with pytest.raises(RuntimeError, match="converge"):
        greedy_coloring(g, max_rounds=1, checkpointer=ck)
    resumed = sorted(
        map(tuple, greedy_coloring(g, max_rounds=30, checkpointer=ck).collect())
    )
    fresh = sorted(map(tuple, greedy_coloring(g, max_rounds=30).collect()))
    assert resumed == fresh
    # resuming a CONVERGED checkpoint is a no-op returning the fixpoint
    again = sorted(
        map(tuple, greedy_coloring(g, max_rounds=30, checkpointer=ck).collect())
    )
    assert again == fresh

    # --- msf: 1 round, resume to completion (unique forest) ------------
    wg = build_graph(
        spark.createDataFrame(
            [(a, b, float((a * 7 + b) % 5 + 1)) for a, b in edges],
            "a long, b long, w double",
        ),
        relabel=False,
        weight="w",
    )
    ck = VertexIterationCheckpointer(str(tmp_path / "msf"), algo="msf")
    minimum_spanning_forest(wg, max_rounds=1, on_truncate="ignore", checkpointer=ck)
    resumed = sorted(
        map(tuple, minimum_spanning_forest(wg, checkpointer=ck).collect())
    )
    fresh = sorted(map(tuple, minimum_spanning_forest(wg).collect()))
    assert resumed == fresh


def test_coreness_resume_mid_iteration(spark, tmp_path):
    import pytest

    from louvain_fast_move_cuda_spark.operators.graphstats import coreness
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    # long path: the h-index descent needs many rounds, so 1 round raises
    g = build_graph(
        spark.createDataFrame([(i, i + 1) for i in range(25)], "a long, b long"),
        relabel=False,
    )
    ck = VertexIterationCheckpointer(str(tmp_path / "core"), algo="coreness")
    with pytest.raises(RuntimeError, match="converge"):
        coreness(g, max_rounds=1, checkpointer=ck)
    resumed = sorted(map(tuple, coreness(g, max_rounds=40, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, coreness(g, max_rounds=40).collect()))
    assert resumed == fresh
    again = sorted(map(tuple, coreness(g, max_rounds=40, checkpointer=ck).collect()))
    assert again == fresh


def test_bellman_ford_family_resume_mid_hop(spark, tmp_path):
    """temporal_reachability and weighted_landmark_distances resume the
    identical Bellman-Ford state sequence from a committed hop."""
    from louvain_fast_move_cuda_spark.operators.distances import (
        weighted_landmark_distances,
    )
    from louvain_fast_move_cuda_spark.operators.temporal import temporal_reachability
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    import random

    rng = random.Random(53)
    links = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(100, 200))
        for _ in range(150)
    ]
    links = [(a, b, t) for a, b, t in links if a != b]
    seeds = [(v, v, 100 + v) for v in range(0, 40, 6)]
    ldf = spark.createDataFrame(links, "a long, b long, ts_us long")
    sdf = spark.createDataFrame(seeds, "landmark long, vertex long, arr_us long")
    ck = VertexIterationCheckpointer(str(tmp_path / "tr"), algo="temporal")
    temporal_reachability(ldf, sdf, max_hops=1, checkpointer=ck).collect()
    resumed = sorted(
        map(tuple, temporal_reachability(ldf, sdf, max_hops=5, checkpointer=ck).collect())
    )
    fresh = sorted(map(tuple, temporal_reachability(ldf, sdf, max_hops=5).collect()))
    assert resumed == fresh

    edges = powerlaw_graph(n=90, m_attach=2, seed=19)
    wg = build_graph(
        spark.createDataFrame(
            [(a, b, float((a + 2 * b) % 4 + 1)) for a, b in edges],
            "a long, b long, w double",
        ),
        relabel=False,
        weight="w",
    )
    ck = VertexIterationCheckpointer(str(tmp_path / "wd"), algo="wdist")
    weighted_landmark_distances(wg, seed_mod=11, max_hops=1, checkpointer=ck).collect()
    resumed = sorted(
        map(
            tuple,
            weighted_landmark_distances(
                wg, seed_mod=11, max_hops=5, checkpointer=ck
            ).collect(),
        )
    )
    fresh = sorted(
        map(tuple, weighted_landmark_distances(wg, seed_mod=11, max_hops=5).collect())
    )
    assert resumed == fresh


def test_peel_family_resume_mid_round(spark, tmp_path):
    """k_core and s_core resume the identical monotone peel from a
    committed round (the survivor edge set is the whole state)."""
    from louvain_fast_move_cuda_spark.operators.graphstats import k_core, s_core
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    # long path: peels one layer per round from each end
    path = [(i, i + 1) for i in range(30)]
    g = build_graph(spark.createDataFrame(path, "a long, b long"), relabel=False)
    ck = VertexIterationCheckpointer(str(tmp_path / "kc"), algo="k_core")
    k_core(g, k=2, max_rounds=3, on_truncate="ignore", checkpointer=ck).collect()
    resumed = sorted(map(tuple, k_core(g, k=2, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, k_core(g, k=2).collect()))
    assert resumed == fresh == []  # a path has an empty 2-core

    wg = build_graph(
        spark.createDataFrame(
            [(a, b, float(b % 3 + 1)) for a, b in path], "a long, b long, w double"
        ),
        relabel=False,
        weight="w",
    )
    ck = VertexIterationCheckpointer(str(tmp_path / "sc"), algo="s_core")
    s_core(wg, s=3, max_rounds=2, on_truncate="ignore", checkpointer=ck).collect()
    resumed = sorted(map(tuple, s_core(wg, s=3, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, s_core(wg, s=3).collect()))
    assert resumed == fresh


def test_k_truss_resume_mid_round(spark, tmp_path):
    from louvain_fast_move_cuda_spark.operators.graphstats import k_truss
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    edges = powerlaw_graph(n=120, m_attach=3, seed=11)
    g = build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)
    ck = VertexIterationCheckpointer(str(tmp_path / "kt"), algo="k_truss")
    k_truss(g, k=3, max_rounds=1, on_truncate="ignore", checkpointer=ck).collect()
    resumed = sorted(map(tuple, k_truss(g, k=3, checkpointer=ck).collect()))
    fresh = sorted(map(tuple, k_truss(g, k=3).collect()))
    assert resumed == fresh


def test_mis_resume_mid_round(spark, tmp_path):
    import pytest

    from louvain_fast_move_cuda_spark.operators.mis import maximal_independent_set
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    edges = powerlaw_graph(n=130, m_attach=2, seed=3)
    g = build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)
    ck = VertexIterationCheckpointer(str(tmp_path / "mis"), algo="mis")
    with pytest.raises(RuntimeError, match="converge"):
        maximal_independent_set(g, max_rounds=1, checkpointer=ck)
    resumed = sorted(
        map(tuple, maximal_independent_set(g, max_rounds=12, checkpointer=ck).collect())
    )
    fresh = sorted(map(tuple, maximal_independent_set(g, max_rounds=12).collect()))
    assert resumed == fresh
    again = sorted(
        map(tuple, maximal_independent_set(g, max_rounds=12, checkpointer=ck).collect())
    )
    assert again == fresh


def test_matching_resume_mid_round(spark, tmp_path):
    import pytest

    from louvain_fast_move_cuda_spark.operators.matching import maximal_matching
    from louvain_fast_move_cuda_spark.plans.checkpoint import (
        VertexIterationCheckpointer,
    )

    g = build_graph(
        spark.createDataFrame([(i, i + 1) for i in range(50)], "a long, b long"),
        relabel=False,
    )
    ck = VertexIterationCheckpointer(str(tmp_path / "match"), algo="matching")
    with pytest.raises(RuntimeError, match="converge"):
        maximal_matching(g, max_rounds=1, checkpointer=ck)
    resumed = sorted(
        map(tuple, maximal_matching(g, max_rounds=16, checkpointer=ck).collect())
    )
    fresh = sorted(map(tuple, maximal_matching(g, max_rounds=16).collect()))
    assert resumed == fresh
