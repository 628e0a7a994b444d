"""Borůvka MSF vs a pure-python Kruskal under the same total order."""

import random

import pytest

from louvain_fast_move_cuda_spark.operators.mst import minimum_spanning_forest
from louvain_fast_move_cuda_spark.sources.edges import build_graph


def _wgt(spark, edges):
    return build_graph(
        spark.createDataFrame(edges, "a long, b long, w double"),
        relabel=False,
        weight="w",
    )


def _kruskal(n, edges):
    """Unique MSF under the (weight, src, dst) total order."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted((w, min(a, b), max(a, b)) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_msf_matches_kruskal_with_ties(spark):
    rng = random.Random(17)
    n = 120
    # two sparse clusters + a few bridges; duplicate weights on purpose
    # (the tie-break (weight, src, dst) must pick the same edges)
    edges = []
    seen = set()
    for _ in range(400):
        a, b = rng.randrange(n // 2), rng.randrange(n // 2)
        if rng.random() < 0.5:
            a, b = a + n // 2, b + n // 2
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        edges.append((a, b, float(rng.randrange(1, 8))))
    edges.append((0, n // 2, 50.0))
    got = {
        (r.src, r.dst, r.weight) for r in minimum_spanning_forest(_wgt(spark, edges)).collect()
    }
    assert got == _kruskal(n, edges)


def test_msf_forest_on_disconnected_graph(spark):
    # two components -> n - 2 forest edges, never a bridge invented
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0), (3, 4, 1.0), (4, 5, 9.0)]
    got = {
        (r.src, r.dst, r.weight) for r in minimum_spanning_forest(_wgt(spark, edges)).collect()
    }
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (3, 4, 1.0), (4, 5, 9.0)}


def test_msf_multi_round_and_truncation_guard(spark):
    # two light triangles joined by one heavy bridge: round 1 merges the
    # triangles internally, only round 2 can choose the bridge
    edges = [
        (0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0),
        (3, 4, 4.0), (4, 5, 5.0), (3, 5, 6.0),
        (2, 3, 10.0),
    ]
    g = _wgt(spark, edges)
    with pytest.raises(RuntimeError, match="converge"):
        minimum_spanning_forest(g, max_rounds=1)
    partial = minimum_spanning_forest(g, max_rounds=1, on_truncate="ignore").collect()
    assert len(partial) == 4  # both triangles spanned, bridge missing
    full = {(r.src, r.dst, r.weight) for r in minimum_spanning_forest(g).collect()}
    assert full == _kruskal(6, edges)
