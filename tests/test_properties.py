"""Property-based invariants (hypothesis) over randomized small inputs.

Each property is a structural guarantee the operators advertise, checked
on adversarially-random graphs/streams rather than the hand or replay
cases the unit tests pin. Example counts are small (Spark jobs per
example) and deadlines off — the properties, not the volume, carry the
value here.
"""

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.sources.edges import build_graph

_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edges_strategy(max_n=30):
    return st.lists(
        st.tuples(st.integers(0, max_n), st.integers(0, max_n)),
        min_size=1,
        max_size=80,
    ).filter(lambda es: any(a != b for a, b in es))


def _gt(spark, edges):
    return build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)


@given(edges=_edges_strategy(), salt=st.integers(0, 1000))
@_SET
def test_mis_independent_and_maximal(spark, edges, salt):
    from louvain_fast_move_cuda_spark.operators.mis import maximal_independent_set

    g = _gt(spark, edges)
    got = {r.id: r.in_mis for r in maximal_independent_set(g, salt=salt).collect()}
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    for a, b in edges:
        if a != b:
            assert not (got[a] and got[b]), f"edge ({a},{b}) inside MIS"
    for v, m in got.items():
        if not m and nbrs[v]:
            assert any(got[w] for w in nbrs[v]), f"{v} has no MIS neighbor"


@given(
    tokens=st.lists(st.integers(-50, 50), min_size=1, max_size=300),
    depth=st.integers(2, 4),
    width=st.integers(4, 32),
)
@_SET
def test_cms_overestimate_never_negative(spark, tokens, depth, width):
    from louvain_fast_move_cuda_spark.operators.sketch import (
        cms_buckets,
        cms_point_queries,
    )

    tok = spark.createDataFrame([(t,) for t in tokens], "h long")
    b = cms_buckets(tok, depth=depth, width=width)
    for r in cms_point_queries(b, top_n=5).collect():
        assert r.overestimate >= 0
        assert r.cms_est == r.true_cnt + r.overestimate


@given(hashes=st.lists(st.integers(-(2 ** 60), 2 ** 60), min_size=1, max_size=400))
@_SET
def test_kmv_exact_below_k_and_dup_invariant(spark, hashes):
    from louvain_fast_move_cuda_spark.operators.sketch import kmv_distinct

    tok = spark.createDataFrame([(h,) for h in hashes], "h long")
    r1 = kmv_distinct(tok, k=64).collect()[0]
    n_distinct = len(set(hashes))
    assert r1.n_exact == n_distinct
    if n_distinct < 64:
        assert r1.kmv_est == float(n_distinct) and r1.rel_err == 0.0
    r2 = kmv_distinct(tok.union(tok), k=64).collect()[0]
    assert (r2.kth_h, r2.kmv_est) == (r1.kth_h, r1.kmv_est)


@given(
    values=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=300,
    ),
    k=st.integers(4, 64),
)
@_SET
def test_quantile_sketch_rank_interval_consistent(spark, values, k):
    from louvain_fast_move_cuda_spark.operators.sketch import quantile_sketch

    hv = spark.createDataFrame(
        [(i * 2654435761 % 104729, float(v)) for i, v in enumerate(values)],
        "h long, value double",
    )
    svals = sorted(values)
    n = len(values)
    for r in quantile_sketch(hv, k=k).collect():
        assert r.n == n
        # the exact rank interval really is the estimate's rank range
        assert r.rank_lo == sum(1 for v in svals if v < r.est_value)
        assert r.rank_hi == sum(1 for v in svals if v <= r.est_value)
        # within_bound is the advertised predicate on the unrounded
        # error; rank_err is its r9 rounding, so only assert away from
        # the boundary (a 5e-10 band) where rounding cannot flip it
        bound = 2.0 / float(k) ** 0.5
        if r.rank_err < bound - 1e-9:
            assert r.within_bound
        elif r.rank_err > bound + 1e-9:
            assert not r.within_bound


@given(edges=_edges_strategy(), salt=st.integers(0, 1000))
@_SET
def test_coloring_proper_and_bounded(spark, edges, salt):
    from louvain_fast_move_cuda_spark.operators.coloring import greedy_coloring

    g = _gt(spark, edges)
    got = {r.id: r.color for r in greedy_coloring(g, salt=salt, max_rounds=40).collect()}
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    for a, b in edges:
        if a != b:
            assert got[a] != got[b], f"edge ({a},{b}) monochromatic"
    for v, ns in nbrs.items():
        assert 0 <= got[v] <= len(ns), f"{v} colored past the greedy bound"


@given(edges=_edges_strategy())
@_SET
def test_coreness_bounds_and_kcore_consistency(spark, edges):
    from louvain_fast_move_cuda_spark.operators.graphstats import coreness

    g = _gt(spark, edges)
    got = {r.id: r.coreness for r in coreness(g, max_rounds=40).collect()}
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    for v, ns in nbrs.items():
        assert 0 <= got[v] <= len(ns)
        # a vertex's core number is at most 1 + the count of neighbors
        # with core number >= its own (h-index fixpoint property)
        c = got[v]
        if c > 0:
            assert sum(1 for w in ns if got[w] >= c) >= c


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25), st.integers(1, 9)),
        min_size=1,
        max_size=70,
    ).filter(lambda es: any(a != b for a, b, _ in es))
)
@_SET
def test_msf_is_spanning_forest_of_minimum_weight(spark, edges):
    from louvain_fast_move_cuda_spark.operators.mst import minimum_spanning_forest

    g = build_graph(
        spark.createDataFrame(
            [(a, b, float(w)) for a, b, w in edges], "a long, b long, w double"
        ),
        relabel=False,
        weight="w",
    )
    rows = minimum_spanning_forest(g, max_rounds=16).collect()
    got = {(r.src, r.dst) for r in rows}
    # weights of the canonical merged graph (duplicates sum)
    wsum = defaultdict(float)
    verts = set()
    for a, b, w in edges:
        if a != b:
            wsum[(min(a, b), max(a, b))] += float(w)
            verts.update((a, b))

    # union-find over the chosen edges: acyclic + spans each component
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in got:
        rs, rd = find(s), find(d)
        assert rs != rd, f"cycle through ({s},{d})"
        parent[rs] = rd
    # same number of components as the input graph (Kruskal count)
    kp = {v: v for v in verts}

    def kfind(x):
        while kp[x] != x:
            kp[x] = kp[kp[x]]
            x = kp[x]
        return x

    n_merges = 0
    total = 0.0
    for (a, b), w in sorted(wsum.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = kfind(a), kfind(b)
        if ra != rb:
            kp[ra] = rb
            n_merges += 1
            total += w
    assert len(got) == n_merges
    assert abs(sum(wsum[e] for e in got) - total) < 1e-9


@given(edges=_edges_strategy(max_n=14))
@_SET
def test_triad_census_total_and_bruteforce(spark, edges):
    """Census totals C(n,3) and every class matches the O(n^3) oracle."""
    from itertools import combinations

    from louvain_fast_move_cuda_spark.operators.triads import (
        TRIAD_LOOKUP,
        TRIAD_TYPES,
        _BIT,
        triad_census,
    )

    es = {(a, b) for a, b in edges if a != b}
    used = sorted({v for e in es for v in e})
    df = spark.createDataFrame(sorted(es), "a long, b long")
    got = {r["triad_type"]: r["n"] for r in triad_census(df).collect()}
    n = len(used)
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
    want = Counter()
    for t in combinations(used, 3):
        m = {v: i for i, v in enumerate(t)}
        p = sum(_BIT[(m[a], m[b])] for (a, b) in es if a in m and b in m)
        want[TRIAD_LOOKUP[p]] += 1
    for ty in TRIAD_TYPES:
        assert got.get(ty, 0) == want.get(ty, 0), ty


@given(edges=_edges_strategy(max_n=25))
@_SET
def test_densest_subgraph_trace_invariants(spark, edges):
    """Strictly shrinking peel; the flagged best is the max density."""
    from louvain_fast_move_cuda_spark.operators.graphstats import densest_subgraph

    g = _gt(spark, edges)
    rows = sorted(densest_subgraph(g).collect(), key=lambda r: r["round"])
    assert rows, "non-empty graph must emit at least one round"
    ns = [r["n_vertices"] for r in rows]
    assert ns == sorted(ns, reverse=True) and len(set(ns)) == len(ns)
    dens = [r["density_r9"] for r in rows]
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    assert best[0]["density_r9"] == max(dens)
    for r in rows:
        assert 2 * r["n_edges"] <= r["n_vertices"] * (r["n_vertices"] - 1)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120), min_size=1, max_size=8
    ),
    window=st.integers(2, 10),
    stride=st.integers(1, 10),
)
@_SET
def test_chunk_documents_covers_every_token(spark, texts, window, stride):
    """Every token position lands in >= 1 chunk; sizes/starts consistent."""
    from louvain_fast_move_cuda_spark.operators.curation import chunk_documents

    stride = min(stride, window)  # overlap contract: stride <= window
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(df, window=window, stride=stride).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for i, text in enumerate(texts):
        toks = [t for t in text.split() if t]
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert chunks, "every doc emits at least one chunk"
        covered = set()
        for r in chunks:
            assert r["start_tok"] == r["chunk_idx"] * stride
            assert r["n_toks"] == len(toks[r["start_tok"]:r["start_tok"] + window])
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_toks"]))
        assert covered == set(range(len(toks)))
