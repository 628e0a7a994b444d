"""Deterministic walks / neighbor sampling / link-prediction /
community-metrics operators vs brute-force single-process oracles."""

from collections import defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.operators.graphstats import (
    community_metrics,
    jaccard_similarity,
)
from louvain_fast_move_cuda_spark.operators.pagerank import (
    pagerank,
    personalized_pagerank,
)
from louvain_fast_move_cuda_spark.operators.walks import (
    _M,
    _P,
    index_neighbors,
    random_walks,
    sample_neighbors,
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


def _mix_py(a, b, c, salt=0):
    return ((a % _P) * 10007 + (b % _P) * 97 + c * 31 + salt) % _M


def test_index_neighbors_dense_ranks(spark):
    edges = powerlaw_graph(n=120, m_attach=3, seed=3)
    nbrs = _adj(edges)
    idx = index_neighbors(_gt(spark, edges)).collect()
    per_src = defaultdict(list)
    for r in idx:
        per_src[r.src].append((r.idx, r.dst, r.deg))
    for v, rows in per_src.items():
        rows.sort()
        assert [i for i, _, _ in rows] == list(range(len(rows)))
        assert [d for _, d, _ in rows] == sorted(nbrs[v])
        assert all(dg == len(nbrs[v]) for _, _, dg in rows)


def test_random_walks_match_python_replay(spark):
    edges = powerlaw_graph(n=150, m_attach=2, seed=9)
    nbrs = {v: sorted(ns) for v, ns in _adj(edges).items()}
    got = random_walks(_gt(spark, edges), length=6, seed_mod=3, salt=5).collect()
    walks = defaultdict(dict)
    for r in got:
        walks[r.walk_id][r.step] = r.vertex
    seeds = [v for v in nbrs if v % 3 == 0]
    assert sorted(walks.keys()) == sorted(seeds)
    for w in seeds:
        cur = w
        assert walks[w][0] == w
        for s in range(1, 7):
            ns = nbrs[cur]
            cur = ns[_mix_py(cur, w, s, 5) * len(ns) // _M]
            assert walks[w][s] == cur, (w, s)


def test_random_walks_isolated_seed_emits_step0_only(spark):
    g = _gt(spark, [(0, 1), (1, 2)])
    # vertex table from edges only -> add an isolated vertex by hand
    iso = g.vertices.sparkSession.createDataFrame([(99, 0.0)], "id long, k double")
    g.vertices = g.vertices.unionByName(iso)
    rows = random_walks(g, length=4, seed_mod=99).collect()
    per_walk = defaultdict(list)
    for r in rows:
        per_walk[r.walk_id].append(r.step)
    assert sorted(per_walk[99]) == [0]  # stub walk, no neighbors
    assert sorted(per_walk[0]) == [0, 1, 2, 3, 4]


def test_sample_neighbors_bounded_and_exact(spark):
    edges = powerlaw_graph(n=200, m_attach=4, seed=13)
    nbrs = _adj(edges)
    got = sample_neighbors(_gt(spark, edges), k=3, salt=1).collect()
    per_src = defaultdict(list)
    for r in got:
        assert r.dst in nbrs[r.src]
        per_src[r.src].append((r.sample_rank, r.dst))
    for v, rows in per_src.items():
        rows.sort()
        assert len(rows) == min(3, len(nbrs[v]))
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        # the chosen subset is the mixer-order prefix
        want = sorted(nbrs[v], key=lambda d: (_mix_py(v, d, 0, 1), d))[:3]
        assert [d for _, d in rows] == want


def test_sample_neighbors_pre_thin_is_subset(spark):
    edges = powerlaw_graph(n=200, m_attach=4, seed=13)
    nbrs = _adj(edges)
    thin = sample_neighbors(_gt(spark, edges), k=3, salt=1, pre_thin=2).collect()
    for r in thin:
        assert r.dst in nbrs[r.src]
        assert _mix_py(r.src, r.dst, 0, 1) % 2 == 0
        assert 1 <= r.sample_rank <= 3


def test_jaccard_matches_bruteforce(spark):
    edges = powerlaw_graph(n=150, m_attach=3, seed=21)
    nbrs = _adj(edges)
    # cap high enough to be inert on this graph -> exact textbook Jaccard
    cap = max(len(ns) for ns in nbrs.values())
    got = {(r.u, r.v): (r.common_neighbors, r.jaccard_r9) for r in
           jaccard_similarity(_gt(spark, edges), max_apex_degree=cap).collect()}
    want = {}
    for u, v in combinations(sorted(nbrs), 2):
        if v in nbrs[u]:
            continue
        c = len(nbrs[u] & nbrs[v])
        if c >= 1:
            want[(u, v)] = (c, c / len(nbrs[u] | nbrs[v]))
    assert set(got) == set(want)
    for k, (c, j) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - j) < 1e-8


def test_jaccard_hub_cap_discounts_star_center(spark):
    # star: center 0 with leaves 1..10, plus an off-star edge 1-2
    edges = [(0, i) for i in range(1, 11)] + [(1, 2)]
    got = jaccard_similarity(_gt(spark, edges), max_apex_degree=5).collect()
    # center deg=10 > cap -> no wedge through it survives; (1,2) adjacent
    assert got == []


def test_community_metrics_bruteforce(spark):
    edges = powerlaw_graph(n=100, m_attach=2, seed=5)
    nbrs = _adj(edges)
    g = _gt(spark, edges)
    labels = g.vertices.select("id", (F.col("id") % 4).alias("community"))
    got = {r.community: r for r in community_metrics(g, labels).collect()}
    two_m = 2.0 * len(edges)
    for c in range(4):
        members = {v for v in nbrs if v % 4 == c}
        vol = float(sum(len(nbrs[v]) for v in members))
        internal = float(
            sum(1 for v in members for w in nbrs[v] if w in members)
        )  # directed count
        cut = vol - internal
        denom = min(vol, two_m - vol)
        r = got[c]
        assert r.n_vertices == len(members)
        assert r.volume == vol
        assert r.internal_weight == internal
        assert r.cut == cut
        if denom > 0:
            assert abs(r.conductance_r9 - cut / denom) < 1e-8
        else:
            assert r.conductance_r9 == 0.0


def test_community_metrics_whole_graph_conductance_zero(spark):
    g = _gt(spark, [(0, 1), (1, 2), (2, 0)])
    labels = g.vertices.select("id", F.lit(0).cast("long").alias("community"))
    rows = community_metrics(g, labels).collect()
    assert len(rows) == 1
    assert rows[0].cut == 0.0 and rows[0].conductance_r9 == 0.0


def test_personalized_pagerank_localizes_and_sums_to_one(spark):
    # two triangle components; seeds only in the first
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    g = _gt(spark, edges)
    seeds = g.vertices.select("id").filter(F.col("id") < 3)
    pr = {r.id: r.rank for r in personalized_pagerank(g, seeds, max_iter=30).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    for v in (10, 11, 12):
        assert pr[v] == 0.0  # unreachable from seeds
    for v in (0, 1, 2):
        assert abs(pr[v] - 1.0 / 3.0) < 1e-9  # symmetry


def test_personalized_pagerank_uniform_seeds_match_pagerank(spark):
    """With ALL vertices as seeds, PPR == standard PageRank (same
    fixed-iteration count) up to the expression-tree rounding delta."""
    edges = powerlaw_graph(n=80, m_attach=2, seed=17)
    g = _gt(spark, edges)
    ppr = {r.id: r.rank for r in
           personalized_pagerank(g, g.vertices.select("id"), max_iter=20).collect()}
    pr = {r.id: r.rank for r in
          pagerank(g, max_iter=20, tol=0.0, local_max_edges=0).collect()}
    assert set(ppr) == set(pr)
    for v in pr:
        assert abs(ppr[v] - pr[v]) < 1e-12


def test_skipgram_pairs_bruteforce(spark):
    from louvain_fast_move_cuda_spark.operators.walks import skipgram_pairs

    edges = powerlaw_graph(n=120, m_attach=2, seed=31)
    nbrs = {v: sorted(ns) for v, ns in _adj(edges).items()}
    g = _gt(spark, edges)
    walks_df = random_walks(g, length=5, seed_mod=4, salt=2)
    got = {(r.center, r.context): r.n_cooc
           for r in skipgram_pairs(walks_df, window=2).collect()}
    # replay the corpus in python, then count pairs the textbook way
    corpus = []
    for w in (v for v in nbrs if v % 4 == 0):
        walk, cur = [w], w
        for s in range(1, 6):
            cur = nbrs[cur][_mix_py(cur, w, s, 2) * len(nbrs[cur]) // _M]
            walk.append(cur)
        corpus.append(walk)
    want = defaultdict(int)
    for walk in corpus:
        for i, c in enumerate(walk):
            for j in range(max(0, i - 2), min(len(walk), i + 3)):
                if j != i:
                    want[(c, walk[j])] += 1
    assert got == dict(want)


def test_weighted_random_walks_match_python_replay(spark):
    """Weight-proportional steps: replay the inverse-CDF choice in
    python over a multigraph (duplicate links merge into weight 2)."""
    from louvain_fast_move_cuda_spark.operators.walks import weighted_random_walks
    from louvain_fast_move_cuda_spark.sources.edges import (
        canonicalize_edges,
        symmetrize,
        vertex_weights,
    )
    from louvain_fast_move_cuda_spark.sources.edges import GraphTables

    base = powerlaw_graph(n=100, m_attach=2, seed=41)
    dup = base + base[::3]  # every 3rd link doubled
    raw = spark.createDataFrame(dup, "a long, b long").withColumn("w", F.lit(1.0))
    edges = symmetrize(canonicalize_edges(raw, weight="w"))
    verts = vertex_weights(edges)
    m = edges.agg(F.sum("weight")).collect()[0][0] / 2.0
    g = GraphTables(edges=edges, vertices=verts, m=m, n_nodes=verts.count())

    got = weighted_random_walks(g, length=5, seed_mod=5, salt=3).collect()
    walks = defaultdict(dict)
    for r in got:
        walks[r.walk_id][r.step] = r.vertex

    # python adjacency with integer weights
    wadj = defaultdict(dict)
    for a, b in dup:
        if a != b:
            lo, hi = min(a, b), max(a, b)
            wadj[lo][hi] = wadj[lo].get(hi, 0) + 1
            wadj[hi][lo] = wadj[hi].get(lo, 0) + 1
    for w in sorted(walks):
        assert w % 5 == 0
        cur = w
        assert walks[w][0] == w
        for s in range(1, 6):
            ns = sorted(wadj[cur].items())
            tot = sum(wt for _, wt in ns)
            target = _mix_py(cur, w, s, 3) * tot // _M
            acc = 0
            for d, wt in ns:
                if acc <= target < acc + wt:
                    cur = d
                    break
                acc += wt
            assert walks[w][s] == cur, (w, s)


def test_weighted_walks_reject_fractional_weights(spark):
    import pytest as _pytest

    from louvain_fast_move_cuda_spark.operators.walks import index_weighted_neighbors
    from louvain_fast_move_cuda_spark.sources.edges import GraphTables

    e = spark.createDataFrame(
        [(0, 1, 0.5), (1, 0, 0.5)], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(0, 0.5), (1, 0.5)], "id long, k double")
    g = GraphTables(edges=e, vertices=v, m=0.5, n_nodes=2)
    with _pytest.raises(ValueError, match="integer-valued"):
        index_weighted_neighbors(g)


def _simulate_n2v(adj_w, seeds, length, salt, ret_w, near_w, far_w):
    """Pure-python replay of node2vec_walks' integer arithmetic.
    adj_w: dict src -> sorted list of (dst, w_int)."""
    rows = []
    for w0 in seeds:
        prev, cur = w0, w0
        rows.append((w0, 0, w0))
        for s in range(1, length + 1):
            nbrs = adj_w.get(cur, [])
            if not nbrs:
                break
            h = _mix_py(cur, w0, s, salt)
            bws = []
            prev_nbrs = {d for d, _ in adj_w.get(prev, [])}
            for dst, wi in nbrs:
                if dst == prev:
                    a = ret_w
                elif dst in prev_nbrs:
                    a = near_w
                else:
                    a = far_w
                bws.append(a * wi)
            t = h * sum(bws) // _M
            cum = 0
            nxt = None
            for (dst, _), bw in zip(nbrs, bws):
                if cum <= t < cum + bw:
                    nxt = dst
                    break
                cum += bw
            rows.append((w0, s, nxt))
            prev, cur = cur, nxt
    return sorted(rows)


def test_node2vec_walks_match_python_replay(spark):
    from louvain_fast_move_cuda_spark.operators.walks import node2vec_walks

    base = powerlaw_graph(n=120, m_attach=2, seed=5)
    # duplicate a third of the links so merged weights are non-unit and
    # the bias multiplies real multiplicities
    edges = base + [e for i, e in enumerate(base) if i % 3 == 0]
    g = _gt(spark, edges)
    adj_w = defaultdict(list)
    for r in g.edges.collect():
        adj_w[r.src].append((r.dst, int(r.weight)))
    for v in adj_w:
        adj_w[v].sort()
    seeds = sorted(v for v in {a for a, _ in edges} | {b for _, b in edges} if v % 5 == 0)
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            g, length=6, seed_mod=5, salt=3, ret_w=1, near_w=2, far_w=4
        ).collect()
    )
    want = _simulate_n2v(adj_w, seeds, 6, 3, 1, 2, 4)
    assert got == want


def test_node2vec_bias_weights_validated(spark):
    import pytest

    from louvain_fast_move_cuda_spark.operators.walks import node2vec_walks

    g = _gt(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError):
        node2vec_walks(g, far_w=0)
    with pytest.raises(ValueError):
        node2vec_walks(g, length=0)


def test_node2vec_first_step_is_plain_weighted(spark):
    """With prev = cur at step 1, every candidate is a neighbor of prev
    and the return branch cannot fire, so step 1 must match
    weighted_random_walks' step 1 whenever near_w == 1 scales biases
    away (ret_w=near_w=far_w=1 == plain weighted walk end-to-end)."""
    from louvain_fast_move_cuda_spark.operators.walks import node2vec_walks
    from louvain_fast_move_cuda_spark.operators.walks import weighted_random_walks

    edges = powerlaw_graph(n=80, m_attach=2, seed=11)
    g = _gt(spark, edges)
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            g, length=4, seed_mod=3, salt=1, ret_w=1, near_w=1, far_w=1
        ).collect()
    )
    want = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in weighted_random_walks(g, length=4, seed_mod=3, salt=1).collect()
    )
    assert got == want
