"""Jones-Plassmann coloring vs the sequential greedy it must equal."""

from collections import defaultdict

import pytest

from louvain_fast_move_cuda_spark.operators.coloring import greedy_coloring
from louvain_fast_move_cuda_spark.operators.mis import _PACK
from louvain_fast_move_cuda_spark.operators.walks import _M, _P
from louvain_fast_move_cuda_spark.sources.edges import build_graph

from oracle import powerlaw_graph


def _key(v, salt=0):
    return (((v * v % _P) * 10007 + (v % _P) * 97 + salt) % _M) * _PACK + v


def _sequential_greedy(n, edges, salt=0):
    """Greedy coloring in descending mixer-key order — the JP invariant."""
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    color = {}
    for v in sorted(range(n), key=lambda v: -_key(v, salt)):
        used = {color[u] for u in nbrs[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def _gt(spark, edges):
    return build_graph(spark.createDataFrame(edges, "a long, b long"), relabel=False)


def test_coloring_equals_sequential_greedy(spark):
    n = 150
    edges = powerlaw_graph(n=n, m_attach=3, seed=23)
    got = {r.id: r.color for r in greedy_coloring(_gt(spark, edges)).collect()}
    assert got == _sequential_greedy(n, edges)
    # properness + the greedy bound
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for v, ns in nbrs.items():
        assert all(got[v] != got[u] for u in ns)
        assert got[v] <= len(ns)


def test_coloring_nonconvergence_raises(spark):
    g = _gt(spark, [(i, i + 1) for i in range(40)])
    with pytest.raises(RuntimeError, match="converge"):
        greedy_coloring(g, max_rounds=1)
    got = {r.id: r.color for r in greedy_coloring(g).collect()}
    assert set(got.values()) <= {0, 1, 2}  # greedy on a path needs <= 3 colors
