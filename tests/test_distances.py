"""Landmark BFS distances / harmonic centrality vs brute-force BFS."""

from collections import defaultdict, deque

from louvain_fast_move_cuda_spark.operators.distances import (
    harmonic_centrality,
    landmark_distances,
)
from louvain_fast_move_cuda_spark.sources.edges import build_graph

from oracle import powerlaw_graph


def _adj(edges):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    return nbrs


def _gt(spark, edges):
    return build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)


def _bfs(nbrs, s, cap):
    dist = {s: 0}
    q = deque([s])
    while q:
        v = q.popleft()
        if dist[v] == cap:
            continue
        for w in nbrs[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def test_landmark_distances_match_bfs(spark):
    edges = powerlaw_graph(n=150, m_attach=2, seed=23)
    nbrs = _adj(edges)
    cap = 3
    got = defaultdict(dict)
    for r in landmark_distances(_gt(spark, edges), seed_mod=10, max_hops=cap).collect():
        got[r.landmark][r.vertex] = r.dist
    lms = [v for v in nbrs if v % 10 == 0]
    assert sorted(got.keys()) == sorted(lms)
    for lm in lms:
        assert got[lm] == _bfs(nbrs, lm, cap)


def test_landmark_distances_early_stop_equals_large_cap(spark):
    """A path graph of diameter 4: max_hops=10 early-stops at the true
    fixpoint and equals the exact BFS (bounded-radius cap inert)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    nbrs = _adj(edges)
    got = {(r.landmark, r.vertex): r.dist
           for r in landmark_distances(_gt(spark, edges), seed_mod=4, max_hops=10).collect()}
    want = {}
    for lm in (0, 4):
        for v, d in _bfs(nbrs, lm, 10).items():
            want[(lm, v)] = d
    assert got == want


def test_harmonic_centrality_matches_bfs_sum(spark):
    edges = powerlaw_graph(n=120, m_attach=2, seed=29)
    nbrs = _adj(edges)
    cap = 4
    got = {r.id: (r.n_landmarks_reached, r.harmonic_r9)
           for r in harmonic_centrality(_gt(spark, edges), seed_mod=9, max_hops=cap).collect()}
    lms = [v for v in nbrs if v % 9 == 0]
    dists = {lm: _bfs(nbrs, lm, cap) for lm in lms}
    for v in nbrs:
        terms = [1.0 / dists[lm][v] for lm in lms if v in dists[lm] and dists[lm][v] > 0]
        assert got[v][0] == len(terms)
        assert abs(got[v][1] - sum(terms)) < 1e-8


def test_double_sweep_path_and_truncation(spark):
    from louvain_fast_move_cuda_spark.operators.distances import double_sweep
    from louvain_fast_move_cuda_spark.sources.edges import build_graph

    # path 0-1-2-3-4: sweep from 0 finds peak 4 at dist 4; second leg
    # confirms diameter 4
    path = [(i, i + 1) for i in range(4)]
    g = build_graph(spark.createDataFrame(path, "a long, b long"), relabel=False)
    r = double_sweep(g, max_hops=8).collect()[0]
    assert (r.start, r.peak, r.ecc_start, r.diameter_lb) == (0, 4, 4, 4)
    # bounded radius: max_hops=2 truncates both legs; peak = lowest id
    # at the cut distance (vertex 2), whose 2-hop eccentricity is 2
    r2 = double_sweep(g, max_hops=2).collect()[0]
    assert (r2.peak, r2.ecc_start, r2.diameter_lb) == (2, 2, 2)
    # star: center 0 -> any leaf at dist 1 (tie -> lowest leaf), true
    # diameter 2 recovered by the second sweep
    star = [(0, i) for i in range(1, 5)]
    gs = build_graph(spark.createDataFrame(star, "a long, b long"), relabel=False)
    rs = double_sweep(gs, max_hops=8).collect()[0]
    assert (rs.start, rs.peak, rs.ecc_start, rs.diameter_lb) == (0, 1, 1, 2)


def _stress_brute(nbrs, landmarks, max_hops):
    """Exact bounded-radius stress: for each landmark, build the BFS
    DAG within max_hops, count sigma (paths from s) and D (DAG paths
    leaving v) and accumulate sigma*D for interior vertices."""
    stress = defaultdict(int)
    for s in landmarks:
        dist = _bfs(nbrs, s, max_hops)
        sigma = defaultdict(int)
        sigma[s] = 1
        by_level = defaultdict(list)
        for v, dv in dist.items():
            by_level[dv].append(v)
        for h in range(1, max(by_level) + 1 if by_level else 0):
            for v in by_level[h]:
                sigma[v] = sum(
                    sigma[u] for u in nbrs[v] if dist.get(u) == h - 1
                )
        dmemo = {}
        for h in sorted(by_level, reverse=True):
            for v in by_level[h]:
                dmemo[v] = sum(
                    1 + dmemo[w]
                    for w in nbrs[v]
                    if dist.get(w) == h + 1
                )
        for v, dv in dist.items():
            if dv >= 1:
                stress[v] += sigma[v] * dmemo[v]
    return stress


def test_stress_centrality_matches_brute_force(spark):
    from louvain_fast_move_cuda_spark.operators.distances import stress_centrality

    edges = powerlaw_graph(n=150, m_attach=2, seed=17)
    nbrs = _adj(edges)
    verts = sorted(nbrs)
    landmarks = [v for v in verts if v % 13 == 0]
    want = _stress_brute(nbrs, landmarks, max_hops=4)
    got = {
        r.id: r.stress
        for r in stress_centrality(_gt(spark, edges), seed_mod=13, max_hops=4).collect()
    }
    assert set(got) == set(verts)
    for v in verts:
        assert got[v] == want.get(v, 0), f"vertex {v}: {got[v]} != {want.get(v, 0)}"
    # interior mass exists on a powerlaw graph with a 4-hop radius
    assert sum(got.values()) > 0


def test_stress_centrality_path_graph(spark):
    """Hand case: path 0-1-2-3, landmark {0}. Shortest paths from 0:
    through 1 as interior: 0-1-2 and 0-1-3 (2); through 2: 0-..-3 (1)."""
    from louvain_fast_move_cuda_spark.operators.distances import stress_centrality

    g = _gt(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r.id: r.stress
        for r in stress_centrality(g, seed_mod=4, max_hops=4).collect()
    }
    assert got == {0: 0, 1: 2, 2: 1, 3: 0}


def test_effective_diameter_path_graph(spark):
    from louvain_fast_move_cuda_spark.operators.distances import effective_diameter

    # path 0-..-9, landmark {0}: sampled dists from 0 are 1..9
    edges = [(i, i + 1) for i in range(9)]
    r = effective_diameter(_gt(spark, edges), seed_mod=10, max_hops=9, pct=90).collect()[0]
    # ceil(0.9 * 9) = 9 -> the 9th smallest dist is 9
    assert (r.n_pairs, r.eff_diameter_p90, r.max_sampled_dist) == (9, 9, 9)
    r50 = effective_diameter(_gt(spark, edges), seed_mod=10, max_hops=9, pct=50).collect()[0]
    # ceil(0.5 * 9) = 5 -> dist 5
    assert (r50.n_pairs, r50.eff_diameter_p50, r50.max_sampled_dist) == (9, 5, 9)


def test_closeness_centrality_matches_bfs_sum(spark):
    from louvain_fast_move_cuda_spark.operators.distances import closeness_centrality

    edges = powerlaw_graph(n=120, m_attach=2, seed=29)
    nbrs = _adj(edges)
    cap = 4
    got = {r.id: (r.n_landmarks_reached, r.sum_dist, r.closeness_r9)
           for r in closeness_centrality(_gt(spark, edges), seed_mod=9, max_hops=cap).collect()}
    lms = [v for v in nbrs if v % 9 == 0]
    dists = {lm: _bfs(nbrs, lm, cap) for lm in lms}
    for v in nbrs:
        terms = [dists[lm][v] for lm in lms if v in dists[lm] and dists[lm][v] > 0]
        assert got[v][0] == len(terms)
        assert got[v][1] == sum(terms)
        want = round(len(terms) / sum(terms), 9) if terms else 0.0
        assert abs(got[v][2] - want) < 1e-12


def test_weighted_landmark_distances_matches_dp(spark):
    import random

    from louvain_fast_move_cuda_spark.operators.distances import (
        weighted_landmark_distances,
    )
    from louvain_fast_move_cuda_spark.sources.edges import build_graph

    rng = random.Random(47)
    n, H = 80, 4
    edges = []
    seen = set()
    for _ in range(220):
        a, b = rng.randrange(n), rng.randrange(n)
        key = (min(a, b), max(a, b))
        if a == b or key in seen:
            continue
        seen.add(key)
        edges.append((a, b, float(rng.randrange(1, 9))))
    g = build_graph(
        spark.createDataFrame(edges, "a long, b long, w double"),
        relabel=False,
        weight="w",
    )
    # hop-bounded Bellman-Ford replay (symmetric edges)
    sym = [(a, b, int(w)) for a, b, w in edges] + [(b, a, int(w)) for a, b, w in edges]
    want = {(l, l): 0 for l in range(0, n, 9)}
    for _ in range(H):
        nxt = dict(want)
        for a, b, w in sym:
            for (l, v), dv in want.items():
                if v == a and dv + w < nxt.get((l, b), 10**9):
                    nxt[(l, b)] = dv + w
        want = nxt
    got = {
        (r.landmark, r.vertex): r.dist
        for r in weighted_landmark_distances(g, seed_mod=9, max_hops=H).collect()
    }
    assert got == want


def test_weighted_landmark_distances_rejects_negative(spark):
    import pytest

    from louvain_fast_move_cuda_spark.operators.distances import (
        weighted_landmark_distances,
    )
    from louvain_fast_move_cuda_spark.sources.edges import build_graph

    g = build_graph(
        spark.createDataFrame([(0, 1, -2.0)], "a long, b long, w double"),
        relabel=False,
        weight="w",
    )
    with pytest.raises(ValueError, match="nonnegative"):
        weighted_landmark_distances(g)
