"""Directed triad census vs an independent brute-force oracle."""

import random
from collections import Counter
from itertools import combinations, permutations

from louvain_fast_move_cuda_spark.operators.triads import (
    TRIAD_LOOKUP,
    TRIAD_TYPES,
    _BIT,
    triad_census,
)


def _brute_census(edges, nodes):
    """O(n^3) label-and-count over ALL triples — no subtraction identities."""
    es = set(edges)
    c = Counter()
    for t in combinations(sorted(nodes), 3):
        m = {v: i for i, v in enumerate(t)}
        p = sum(
            _BIT[(m[a], m[b])] for (a, b) in es if a in m and b in m
        )
        c[TRIAD_LOOKUP[p]] += 1
    return c


def test_lookup_table_invariants():
    assert len(TRIAD_LOOKUP) == 64
    assert set(TRIAD_LOOKUP) == set(TRIAD_TYPES)
    # permutation-closed: relabeling nodes never changes the class
    # swapping nodes 0,1: 0->1 <-> 1->0, 0->2 <-> 1->2, 2->0 <-> 2->1
    inv = {0: 1, 1: 0, 2: 4, 3: 5, 4: 2, 5: 3}
    for p in range(64):
        bits = [(p >> i) & 1 for i in range(6)]
        q = sum(bits[inv[i]] << i for i in range(6))
        assert TRIAD_LOOKUP[p] == TRIAD_LOOKUP[q]
    # edge-count consistency: type digits sum to the pattern popcount
    for p in range(64):
        name = TRIAD_LOOKUP[p]
        n_mut, n_asym = int(name[0]), int(name[1])
        assert 2 * n_mut + n_asym == bin(p).count("1")


def test_census_matches_bruteforce(spark):
    rng = random.Random(11)
    nodes = list(range(15))
    edges = set()
    while len(edges) < 40:
        a, b = rng.sample(nodes, 2)
        edges.add((a, b))
    used = sorted({v for e in edges for v in e})
    want = _brute_census(edges, used)
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {r["triad_type"]: r["n"] for r in triad_census(df).collect()}
    assert len(got) == 16
    for t in TRIAD_TYPES:
        assert got.get(t, 0) == want.get(t, 0), (t, got.get(t), want.get(t))
    n = len(used)
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_census_handles_duplicates_and_loops(spark):
    # duplicates and self-loops must be invisible
    base = [(0, 1), (1, 0), (1, 2), (3, 4)]
    noisy = base + [(0, 1), (1, 2), (2, 2), (0, 0)]
    df_b = spark.createDataFrame(base, "a long, b long")
    df_n = spark.createDataFrame(noisy, "a long, b long")
    cb = {r["triad_type"]: r["n"] for r in triad_census(df_b).collect()}
    cn = {r["triad_type"]: r["n"] for r in triad_census(df_n).collect()}
    assert cb == cn
    # hand check: nodes {0..4}, mutual 0-1, asym 1->2, asym 3->4
    want = _brute_census(set(base), [0, 1, 2, 3, 4])
    for t in TRIAD_TYPES:
        assert cb.get(t, 0) == want.get(t, 0)


def test_max_center_degree_undercounts_monotonically(spark):
    rng = random.Random(3)
    edges = {(0, i) for i in range(1, 9)} | {
        tuple(rng.sample(range(1, 9), 2)) for _ in range(6)
    }
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    full = {r["triad_type"]: r["n"] for r in triad_census(df).collect()}
    capped = {
        r["triad_type"]: r["n"]
        for r in triad_census(df, max_center_degree=3).collect()
    }
    # connected-triad counts can only drop under the cap
    for t in TRIAD_TYPES:
        if t not in ("003", "012", "102"):
            assert capped.get(t, 0) <= full.get(t, 0)
