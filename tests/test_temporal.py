"""Temporal rollup + sessionization vs brute-force oracles."""

import datetime as dt
from collections import defaultdict

from louvain_fast_move_cuda_spark.operators.temporal import sessionize, tumbling_rollup


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_tumbling_rollup_hourly(spark):
    base = dt.datetime(2024, 3, 1, 10, 59, 59)
    rows = [
        (0, base, 1, "a", 1.5),
        (1, base + dt.timedelta(seconds=1), 1, "a", 2.0),  # next hour
        (2, base + dt.timedelta(seconds=2), 2, "a", 3.0),
        (3, base + dt.timedelta(hours=2), 1, "b", 4.0),
    ]
    out = {(r.window_start, r.event_type): (r.n_events, r.n_users, r.sum_value_r9)
           for r in tumbling_rollup(_mk_events(spark, rows), "1 hour").collect()}
    assert out[(dt.datetime(2024, 3, 1, 10), "a")] == (1, 1, 1.5)
    assert out[(dt.datetime(2024, 3, 1, 11), "a")] == (2, 2, 5.0)
    assert out[(dt.datetime(2024, 3, 1, 12), "b")] == (1, 1, 4.0)


def test_sessionize_gap_boundaries(spark):
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        # user 1: second event exactly AT the 30-min gap (not >) -> same session
        (0, t0, 1, "a", 0.0),
        (1, t0 + dt.timedelta(minutes=30), 1, "a", 0.0),
        # third event 30 min + 1 us later -> NEW session
        (2, t0 + dt.timedelta(minutes=60, microseconds=1), 1, "a", 0.0),
        # user 2: single event
        (3, t0, 2, "a", 0.0),
    ]
    got = {(r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
           for r in sessionize(_mk_events(spark, rows), gap_minutes=30).collect()}
    assert got[(1, 0)] == (2, t0, t0 + dt.timedelta(minutes=30))
    assert got[(1, 2)][0] == 1
    assert got[(2, 3)][0] == 1
    assert len(got) == 3


def test_sessionize_random_vs_bruteforce(spark):
    import random

    rng = random.Random(17)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(20):
        t = t0
        for _ in range(rng.randint(1, 40)):
            t = t + dt.timedelta(seconds=rng.randint(1, 4000))
            rows.append((eid, t, u, "x", 0.0))
            eid += 1
    by_user = defaultdict(list)
    for r in rows:
        by_user[r[2]].append(r)
    want = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r[1], r[0]))
        cur = []
        for r in evs:
            if cur and (r[1] - cur[-1][1]).total_seconds() * 1e6 > 1800 * 1e6:
                want[(u, cur[0][0])] = len(cur)
                cur = []
            cur.append(r)
        if cur:
            want[(u, cur[0][0])] = len(cur)
    got = {(r.user_id, r.session_id): r.n_events
           for r in sessionize(_mk_events(spark, rows), gap_minutes=30).collect()}
    assert got == want


def test_tool_transitions_per_conversation_hops(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import tool_transitions

    t = spark.createDataFrame(
        [
            # conv A: grep -> edit -> grep (two hops), non-tool turn ignored
            ("A", 0, "user", "x", "grep"),
            ("A", 1, "assistant", "y", None),
            ("A", 2, "tool", "z", "edit"),
            ("A", 3, "tool", "w", "grep"),
            # conv B: single tool turn -> no hop; hops never cross convs
            ("B", 0, "tool", "q", "edit"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {(r.tool, r.next_tool): r.n_transitions for r in tool_transitions(t).collect()}
    assert got == {("grep", "edit"): 1, ("edit", "grep"): 1}


def test_role_transitions_counts_all_hops(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import role_transitions

    t = spark.createDataFrame(
        [
            # conv A: user -> assistant -> tool -> assistant (3 hops)
            ("A", 0, "user", "x", None),
            ("A", 1, "assistant", "y", None),
            ("A", 2, "tool", "z", "grep"),
            ("A", 3, "assistant", "w", None),
            # conv B: user -> assistant; single-turn conv C has no hop
            ("B", 0, "user", "q", None),
            ("B", 1, "assistant", "r", None),
            ("C", 0, "user", "s", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {(r.role, r.next_role): r.n_links for r in role_transitions(t).collect()}
    assert got == {
        ("user", "assistant"): 2,
        ("assistant", "tool"): 1,
        ("tool", "assistant"): 1,
    }


def test_conv_stats_by_hand(spark):
    import datetime as dt

    from louvain_fast_move_cuda_spark.operators.temporal import conv_stats

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    t = spark.createDataFrame(
        [
            ("A", 0, "user", "x", None, t0),
            ("A", 1, "assistant", "y", "grep", t0 + dt.timedelta(seconds=90)),
            ("A", 2, "user", "z", None, t0 + dt.timedelta(seconds=100)),
            ("B", 0, "user", "q", None, t0),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    got = {r.conv_id: r for r in conv_stats(t).collect()}
    assert (got["A"].n_turns, got["A"].n_tool_turns, got["A"].n_roles) == (3, 1, 2)
    assert got["A"].duration_us == 100_000_000
    assert (got["B"].n_turns, got["B"].n_tool_turns, got["B"].duration_us) == (1, 0, 0)


def test_funnel_strict_ordering(spark):
    t0 = dt.datetime(2024, 3, 1)

    from louvain_fast_move_cuda_spark.operators.temporal import funnel_counts

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1 completes in order
        (0, at(0), 1, "view", 0.0), (1, at(1), 1, "click", 0.0), (2, at(2), 1, "purchase", 0.0),
        # user 2 clicks BEFORE viewing -> stalls at view
        (3, at(1), 2, "click", 0.0), (4, at(2), 2, "view", 0.0),
        # user 3 purchase simultaneous with click -> strict > excludes it
        (5, at(0), 3, "view", 0.0), (6, at(1), 3, "click", 0.0), (7, at(1), 3, "purchase", 0.0),
        # user 4 never views -> not in funnel at all
        (8, at(0), 4, "purchase", 0.0),
    ]
    got = {r.step: (r.stage, r.n_users) for r in funnel_counts(_mk_events(spark, rows)).collect()}
    assert got == {"view": (0, 3), "click": (1, 2), "purchase": (2, 1)}
    # a stage nobody reaches still emits its row with n_users = 0
    got0 = {r.step: (r.stage, r.n_users)
            for r in funnel_counts(_mk_events(spark, rows),
                                   steps=("view", "click", "signup")).collect()}
    assert got0["signup"] == (2, 0)


def test_retention_cohorts_periods(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import retention_cohorts

    day = dt.timedelta(days=1)
    t0 = dt.datetime(2024, 1, 4)  # period boundaries are epoch-anchored
    rows = [
        # user 1: first in period P, active again 7 and 14 days later
        (0, t0, 1, "x", 0.0), (1, t0 + 7 * day, 1, "x", 0.0), (2, t0 + 14 * day, 1, "x", 0.0),
        # duplicate activity inside one period counts once
        (3, t0 + 7 * day + dt.timedelta(hours=1), 1, "x", 0.0),
        # user 2: same cohort, never returns
        (4, t0 + day, 2, "x", 0.0),
    ]
    got = {(r.cohort_period, r.offset_periods): r.n_users
           for r in retention_cohorts(_mk_events(spark, rows), period_days=7).collect()}
    base = (t0 - dt.datetime(1970, 1, 1)) // dt.timedelta(days=7)
    assert got == {(base, 0): 2, (base, 1): 1, (base, 2): 1}


def test_tool_cooccurrence_distinct_within_conv(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import tool_cooccurrence

    t = spark.createDataFrame(
        [
            # conv A uses grep twice + edit: the pair counts ONCE
            ("A", 0, "tool", "x", "grep"),
            ("A", 1, "tool", "y", "grep"),
            ("A", 2, "tool", "z", "edit"),
            # conv B: edit + grep again, plus a lone bash in C
            ("B", 0, "tool", "q", "edit"),
            ("B", 1, "tool", "r", "grep"),
            ("C", 0, "tool", "s", "bash"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {(r.tool_a, r.tool_b): r.n_convs for r in tool_cooccurrence(t).collect()}
    assert got == {("edit", "grep"): 2}


def test_events_cube_rollup_levels(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import events_cube

    t0 = dt.datetime(2024, 3, 1, 5, 0, 0)
    rows = [
        (0, t0, 1, "a", 1.0),
        (1, t0 + dt.timedelta(hours=2), 1, "a", 2.0),       # same day
        (2, t0 + dt.timedelta(days=1), 2, "a", 4.0),        # next day
        (3, t0, 1, "b", 8.0),
    ]
    out = events_cube(_mk_events(spark, rows)).collect()
    leafs = {(r.event_type, r.day_us): r.n_events for r in out if r.gid == 0}
    day0 = int((dt.datetime(2024, 3, 1) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    day1 = day0 + 86_400_000_000
    assert leafs == {("a", day0): 2, ("a", day1): 1, ("b", day0): 1}
    subtot = {r.event_type: (r.n_events, r.sum_value_r9) for r in out if r.gid == 1}
    assert subtot == {"a": (3, 7.0), "b": (1, 8.0)}
    grand = [r for r in out if r.gid == 3]
    assert len(grand) == 1 and grand[0].n_events == 4 and grand[0].sum_value_r9 == 15.0


def test_value_quantiles_exact_order_statistics(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import value_quantiles_by_type

    t0 = dt.datetime(2024, 3, 1)
    rows = [(i, t0, 1, "a", float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [(10, t0, 1, "b", 5.0)]
    # NULL values are excluded before ranking and from n
    rows += [(11, t0, 1, "a", None)]
    got = {(r.event_type, r.q): r.value
           for r in value_quantiles_by_type(_mk_events(spark, rows), quantiles=(25, 50, 75, 100)).collect()}
    # type a (n=4): rank ceil(q*4/100) -> 1,2,3,4
    assert got[("a", 25)] == 10.0 and got[("a", 50)] == 20.0
    assert got[("a", 75)] == 30.0 and got[("a", 100)] == 40.0
    # singleton group: every quantile is the one value
    assert all(got[("b", q)] == 5.0 for q in (25, 50, 75, 100))


def test_rolling_activity_range_frame_ties(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import rolling_activity

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (0, t0, 1, "x", 0.0),
        (1, t0 + dt.timedelta(days=3), 1, "x", 0.0),
        # exactly at the 7-day edge from event 0 -> still inside (RANGE inclusive)
        (2, t0 + dt.timedelta(days=7), 1, "x", 0.0),
        # 1 us past the edge from event 0 -> drops event 0
        (3, t0 + dt.timedelta(days=7, microseconds=1), 1, "x", 0.0),
        # equal-timestamp peers both count each other
        (4, t0, 2, "x", 0.0),
        (5, t0, 2, "x", 0.0),
    ]
    got = {r.event_id: r.n_prev for r in rolling_activity(_mk_events(spark, rows), days=7).collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 3, 4: 2, 5: 2}


def test_tool_latency_gap_to_next_turn(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import tool_latency

    t0 = dt.datetime(2024, 3, 1)
    t = spark.createDataFrame(
        [
            ("A", 0, "tool", "x", "grep", t0),
            ("A", 1, "assistant", "y", None, t0 + dt.timedelta(seconds=2)),
            ("A", 2, "tool", "z", "grep", t0 + dt.timedelta(seconds=10)),
            ("A", 3, "user", "w", None, t0 + dt.timedelta(seconds=15)),
            # conv-final tool turn: no next turn -> excluded
            ("B", 0, "tool", "q", "edit", t0),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    got = {r.tool: (r.n_calls, r.sum_gap_us, r.max_gap_us)
           for r in tool_latency(t).collect()}
    assert got == {"grep": (2, 7_000_000, 5_000_000)}


def test_role_degree_stats_cross_join_graph(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import role_degree_stats
    from louvain_fast_move_cuda_spark.sources.edges import (
        assign_contiguous_ids,
        build_graph,
    )

    t = spark.createDataFrame(
        [
            ("A", 0, "user", "x", None),
            ("A", 1, "assistant", "y", None),
            ("A", 2, "user", "z", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    ids = assign_contiguous_ids(t, ["conv_id", "turn_idx"], id_col="vid")
    # path 0-1-2 over the vids: degrees 1, 2, 1
    g = build_graph(
        spark.createDataFrame([(0, 1), (1, 2)], "a long, b long"), relabel=False
    )
    got = {r.role: (r.n_turns, r.sum_degree, r.max_degree)
           for r in role_degree_stats(t, ids, g).collect()}
    assert got == {"user": (2, 2, 1), "assistant": (1, 2, 2)}


def test_temporal_reachability_matches_dp(spark):
    import random

    from louvain_fast_move_cuda_spark.operators.temporal import temporal_reachability

    rng = random.Random(41)
    n = 60
    links = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(100, 200))
        for _ in range(250)
    ]
    links = [(a, b, t) for a, b, t in links if a != b]
    seeds = [(v, v, 100 + v) for v in range(0, n, 7)]
    H = 4
    # hop-bounded earliest-arrival DP (Wu et al. 2014)
    arr = {(l, v): t for l, v, t in seeds}
    for _ in range(H):
        nxt = dict(arr)
        for a, b, t in links:
            for (l, v), av in arr.items():
                if v == a and t >= av and t < nxt.get((l, b), 10**9):
                    nxt[(l, b)] = t
        arr = nxt
    got = {
        (r.landmark, r.vertex): r.arr_us
        for r in temporal_reachability(
            spark.createDataFrame(links, "a long, b long, ts_us long"),
            spark.createDataFrame(seeds, "landmark long, vertex long, arr_us long"),
            max_hops=H,
        ).collect()
    }
    assert got == arr


def test_temporal_reachability_respects_time_order(spark):
    from louvain_fast_move_cuda_spark.operators.temporal import temporal_reachability

    # 0 -t10-> 1 -t5-> 2: the second link fires BEFORE the first, so a
    # path 0->1->2 is not time-respecting; 2 must be unreachable from 0
    links = [(0, 1, 10), (1, 2, 5)]
    seeds = [(0, 0, 0)]
    got = {
        (r.landmark, r.vertex): r.arr_us
        for r in temporal_reachability(
            spark.createDataFrame(links, "a long, b long, ts_us long"),
            spark.createDataFrame(seeds, "landmark long, vertex long, arr_us long"),
            max_hops=5,
        ).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 10}


def test_transition_entropy_known_distributions(spark):
    import math

    from louvain_fast_move_cuda_spark.operators.temporal import transition_entropy

    def mk(rows):
        return spark.createDataFrame(
            [(c, i, r, "", None, None) for c, i, r in rows],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )

    # one deterministic hop type -> H = 0
    det = mk([("c1", 0, "u"), ("c1", 1, "a"), ("c2", 0, "u"), ("c2", 1, "a")])
    r = transition_entropy(det).collect()[0]
    assert (r["n_links"], r["n_states"]) == (2, 1)
    assert r["entropy_nats_r9"] == 0.0 and r["norm_entropy_r9"] == 0.0

    # two hop types, 50/50 -> H = ln 2, normalized 1
    uni = mk([("c1", 0, "u"), ("c1", 1, "a"), ("c2", 0, "a"), ("c2", 1, "u")])
    r = transition_entropy(uni).collect()[0]
    assert (r["n_links"], r["n_states"]) == (2, 2)
    assert abs(r["entropy_nats_r9"] - math.log(2)) < 1e-6
    assert abs(r["norm_entropy_r9"] - 1.0) < 1e-6

    # skewed 3:1 -> H = ln4 - (3 ln3)/4 via the micro-nat replay
    sk = mk(
        [("c1", 0, "u"), ("c1", 1, "a"), ("c1", 2, "a"), ("c1", 3, "a"), ("c1", 4, "u")]
    )
    r = transition_entropy(sk).collect()[0]
    assert (r["n_links"], r["n_states"]) == (4, 3)
    s = 2 * round(math.log(2) * 1e6)  # cells: u->a (1), a->a (2), a->u (1)
    want = round((round(math.log(4) * 1e6) - s / 4) / 1e6, 9)
    assert r["entropy_nats_r9"] == want


def test_tool_bridging_cross_conv_fraction(spark):
    from datetime import datetime

    from louvain_fast_move_cuda_spark.operators.temporal import tool_bridging

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        # tool A: c1 -> c1 -> c2 (one within, one cross)
        ("c1", 0, "u", "", "A", ts(1)),
        ("c1", 1, "u", "", "A", ts(2)),
        ("c2", 0, "u", "", "A", ts(3)),
        # tool B: only one use -> no links
        ("c1", 2, "u", "", "B", ts(4)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r["tool"]: r for r in tool_bridging(df).collect()}
    assert got["A"]["n_links"] == 2 and got["A"]["n_cross_conv"] == 1
    assert got["A"]["cross_frac_r9"] == 0.5
    assert "B" not in got


def test_response_time_quantiles_exact_ranks(spark):
    from datetime import datetime

    from louvain_fast_move_cuda_spark.operators.temporal import (
        response_time_quantiles,
    )

    rows = []
    # 4 user->assistant gaps of 1, 2, 3, 4 seconds in separate convs
    for i, gap in enumerate([1, 2, 3, 4]):
        rows.append((f"c{i}", 0, "user", "", None, datetime(2026, 1, 1, 0, 0, 0)))
        rows.append((f"c{i}", 1, "assistant", "", None, datetime(2026, 1, 1, 0, 0, gap)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r["q"]: r for r in response_time_quantiles(df, quantiles=(50, 90, 99)).collect()}
    # n=4: p50 -> rank ceil(2)=2 -> 2s; p90 -> rank 4 -> 4s; p99 -> rank 4
    assert got[50]["gap_us"] == 2_000_000
    assert got[90]["gap_us"] == 4_000_000
    assert got[99]["gap_us"] == 4_000_000
    assert all(r["n"] == 4 for r in got.values())
