"""Temporal rollups over the events/transcripts stream: tumbling-window
aggregation and gap-based sessionization.

These are the batch twins of the Structured Streaming surface
(streaming/ingest.py): the same `F.window` / session-gap semantics a
`readStream` pipeline would use with watermarks, expressed over the
static table so they are exactly oracle-checkable. Not in the CUDA
reference (Louvain-only); they cover the standard event-time operators
a transcript pipeline needs (hourly activity rollups, conversation
sessionization by inactivity gap).

Scale notes: both are single-shuffle plans. The rollup is a plain
groupBy on (window, event_type) — partial aggregation map-side, no
skew risk beyond event_type hotspots, which AQE handles. The
sessionizer is one window function over (user_id, ts) ordering — one
range-partitioned sort, no driver state, no UDFs.

Float determinism for oracles: sums of `value` are rounded (9
decimals) because summation order differs across engines; counts and
min/max are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_rollup(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, n_users, sum_value_r9) per
    tumbling event-time window — the batch form of the streaming
    windowed aggregation.
    """
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 9).alias("sum_value_r9"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "n_users", "sum_value_r9")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end) —
    classic gap-based sessions: a new session starts whenever a user's
    inter-event gap exceeds ``gap_minutes``.

    Plan: lag() for the gap flag, a running sum for the session index —
    two window functions over ONE (user_id, ts, event_id) sort, then a
    groupBy. session_id = first event_id of the session (stable,
    engine-independent).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond integers on both sides of the oracle comparison — a
    # seconds cast would truncate fractional parts differently per engine.
    # Parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros needs a
    # zoned timestamp, and UTC keeps the integers equal to epoch_us(ntz)
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "new_sess",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn("sess_no", F.sum("new_sess").over(w))
    return (
        numbered.groupBy("user_id", "sess_no")
        .agg(
            F.min("event_id").alias("session_id"),
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_id", "n_events", "session_start", "session_end")
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """(tool, next_tool, n_transitions) — first-order Markov transition
    counts between consecutive tool-using turns WITHIN a conversation:
    for each conv, order the tool turns by turn_idx and count each
    (tool -> next tool) hop. The transcript-native view of agent
    behavior ("which tool follows which"), and the input to any
    tool-sequence model.

    Plan: one filter, one lead() window over (conv_id, turn_idx), one
    groupBy — a single sort shuffle on conv_id (conversations are
    bounded, so no partition skew), then a partial-aggregated count on
    the tiny (tool, next_tool) key space.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    hops = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .withColumn("next_tool", F.lead("tool").over(w))
        .filter(F.col("next_tool").isNotNull())
    )
    return hops.groupBy("tool", "next_tool").agg(
        F.count("*").alias("n_transitions")
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """(role, next_role, n_links) — role mixing over the reply links:
    for consecutive turns within a conversation, count each
    (role -> next role) hop. The transcript twin of degree
    assortativity: it shows whether the reply chain alternates roles
    (user->assistant->user) or stalls (assistant->assistant tool
    cascades). Same single-window plan as tool_transitions, without
    the tool filter.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    hops = (
        transcripts.select("conv_id", "turn_idx", "role")
        .withColumn("next_role", F.lead("role").over(w))
        .filter(F.col("next_role").isNotNull())
    )
    return hops.groupBy("role", "next_role").agg(F.count("*").alias("n_links"))


def conv_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_tool_turns, n_roles, duration_us) — the
    per-conversation shape profile: depth, tool usage, role variety and
    wall-clock span. One groupBy on conv_id; count(tool) skips null
    (non-tool) turns, duration is exact integer micros.
    """
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.countDistinct("role").alias("n_roles"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def funnel_counts(
    events: DataFrame, steps: tuple = ("view", "click", "purchase")
) -> DataFrame:
    """(stage, step, n_users) — ordered-funnel analysis: a user reaches
    stage i when an event of type ``steps[i]`` occurs STRICTLY after
    the user's stage-(i-1) reach time (first qualifying occurrence
    counts). The classic product-analytics funnel.

    Scale: one groupBy per stage plus an equi-join on user_id against
    the previous stage's (user, t) table — every shuffle is on
    user_id, so the per-stage tables stay co-partitioned; no window
    over whole event histories, no per-user collect.
    """
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    ev = events.select("user_id", "event_type", us.alias("us"))
    prev = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t"))
    )

    def stage_row(df, i, step):
        # ungrouped agg: a stage nobody reaches still emits its row
        # with n_users = 0 (the oracle's ungrouped count does too)
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("stage"), F.lit(step).alias("step"), "n_users"
        )

    out = stage_row(prev, 0, steps[0])
    for i, step in enumerate(steps[1:], start=1):
        prev = (
            ev.filter(F.col("event_type") == step)
            .join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .filter(F.col("us") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("us").alias("t"))
        )
        out = out.unionByName(stage_row(prev, i, step))
    return out


def retention_cohorts(events: DataFrame, period_days: int = 7) -> DataFrame:
    """(cohort_period, offset_periods, n_users) — cohort retention:
    users bucketed by the period of their FIRST event; for each
    (cohort, period-offset) cell, the count of cohort users active in
    that period. Periods are fixed ``period_days`` windows counted from
    the epoch (integer division of unix micros — exact, engine-
    independent).

    Scale: one groupBy for first-seen, one distinct on (user, period),
    one user_id equi-join, one final groupBy — all shuffles on
    user_id or on the tiny (cohort, offset) key space.
    """
    period_us = period_days * 86_400_000_000
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    ev = events.select("user_id", us.alias("us")).select(
        "user_id", F.expr(f"us div {period_us}").alias("p")
    )
    first = ev.groupBy("user_id").agg(F.min("p").alias("cohort_period"))
    active = ev.distinct()  # (user, period) pairs — offset rows stay unique
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_period",
            (F.col("p") - F.col("cohort_period")).alias("offset_periods"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def tool_cooccurrence(transcripts: DataFrame) -> DataFrame:
    """(tool_a, tool_b, n_convs) — unordered tool pairs co-used within
    at least one conversation, with the count of conversations sharing
    them. The bipartite (conversation x tool) projection — which tools
    travel together.

    Scale: distinct (conv, tool) first (per-conv tool sets are bounded
    by the tool vocabulary, so the within-conv self-join is O(k²) per
    conversation, never corpus-quadratic), then one groupBy on the tiny
    pair key space.
    """
    tc = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
    )
    a = tc.select("conv_id", F.col("tool").alias("tool_a"))
    b = tc.select("conv_id", F.col("tool").alias("tool_b"))
    return (
        a.join(b, "conv_id")
        .filter(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count("*").alias("n_convs"))
    )


def events_cube(events: DataFrame) -> DataFrame:
    """(event_type, day_us, gid, n_events, sum_value_r9) — the OLAP
    rollup over (event_type, day): leaf cells plus per-type subtotals
    plus the grand total, one pass (Spark expands grouping sets
    map-side; no repeated scans). ``gid`` is the grouping bitmask
    (0 leaf, 1 day rolled up, 3 grand total) so rolled-up nulls are
    distinguishable from null data; value sums are r9-rounded
    (summation order differs per engine), counts exact.
    """
    day_us = F.unix_micros(
        F.to_utc_timestamp(F.date_trunc("day", F.col("ts")), "UTC")
    )
    return (
        events.select("event_type", day_us.alias("day_us"), "value")
        .rollup("event_type", "day_us")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 9).alias("sum_value_r9"),
        )
        .select("event_type", "day_us", "gid", "n_events", "sum_value_r9")
    )


def value_quantiles_by_type(
    events: DataFrame, quantiles: tuple = (25, 50, 75, 90, 99)
) -> DataFrame:
    """(event_type, q, n, value) — EXACT per-group type-1 quantiles of
    ``value``: the element at rank ceil(q/100 * n_group) in the group's
    sort order. Exact order statistics, never percentile_approx (its
    sketch error is engine-specific); the selected value is a raw
    parquet double passed through untouched, so the compare is
    bit-exact.

    Plan: one row_number window per group (parallel across groups; a
    single hot group serializes into one task — the standard per-key
    window caveat), a group-size agg, and a broadcast-sized
    (group x quantile) target join. Unlike length_quantiles this sorts
    real rows, not a bounded distinct-value space — the right tool when
    values are near-unique doubles.

    NULL values are excluded before ranking (quantiles are over the
    observed values; engines disagree on default NULL sort order, so
    leaving them in would shift every rank) and ``n`` counts non-null
    rows only.
    """
    nn = events.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = nn.select("event_type", "value", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    ng = nn.groupBy("event_type").agg(F.count("*").alias("n"))
    qdf = events.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles], "q int"
    )
    targets = ng.crossJoin(F.broadcast(qdf)).withColumn(
        "target",
        F.floor((F.col("q").cast("long") * F.col("n") + F.lit(99)) / F.lit(100)).cast(
            "long"
        ),
    )
    return (
        ranked.join(
            F.broadcast(targets),
            (ranked.event_type == targets.event_type) & (F.col("rn") == F.col("target")),
        )
        .select(ranked.event_type, "q", "n", "value")
    )


def rolling_activity(events: DataFrame, days: int = 7) -> DataFrame:
    """(event_id, n_prev) — for each event, the count of same-user
    events in the trailing ``days`` window INCLUDING the current
    instant: a RANGE frame over unix micros, so equal-timestamp peers
    are in every peer's frame (value-based frames are engine-
    independent; a ROWS frame would depend on tie order). One window
    shuffle on user_id; exact integers.
    """
    period_us = days * 86_400_000_000
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-period_us, 0)
    )
    return (
        events.select("event_id", "user_id", us.alias("us"))
        .withColumn("n_prev", F.count("*").over(w))
        .select("event_id", "n_prev")
    )


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """(tool, n_calls, sum_gap_us, max_gap_us) — for each tool turn, the
    gap to the NEXT turn in its conversation (how long until the tool's
    output is consumed); aggregated per tool in exact integer micros.
    One lead() window + one tiny-key groupBy.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    rows = (
        transcripts.select("conv_id", "turn_idx", "tool", us.alias("us"))
        .withColumn("next_us", F.lead("us").over(w))
        .filter(F.col("tool").isNotNull() & F.col("next_us").isNotNull())
    )
    gap = F.col("next_us") - F.col("us")
    return rows.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.sum(gap).alias("sum_gap_us"),
        F.max(gap).alias("max_gap_us"),
    )


def role_degree_stats(transcripts: DataFrame, ids: DataFrame, graph) -> DataFrame:
    """(role, n_turns, sum_degree, max_degree) — the link graph joined
    back to transcript attributes: per ROLE, how connected its turns
    are (weighted degree; unit weights make it an exact integer). The
    A-x-B cross: graph structure keyed by a transcript column. Two
    doc-id-style equi-joins (vid, then (conv, turn)) + one tiny-key
    groupBy.
    """
    deg = graph.vertices.select(
        F.col("id").alias("vid"), F.col("k").cast("long").alias("d")
    )
    j = ids.join(deg, "vid").join(
        transcripts.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"]
    )
    return j.groupBy("role").agg(
        F.count("*").alias("n_turns"),
        F.sum("d").alias("sum_degree"),
        F.max("d").alias("max_degree"),
    )


def events_pivot(
    events: DataFrame,
    types: tuple = ("click", "error", "purchase", "signup", "view"),
) -> DataFrame:
    """(user_id, n_<type>...) — the classic pivot/crosstab: per-user
    event counts spread into one column per event type. The pivot value
    list is EXPLICIT (never inferred) — at scale an inferred pivot is
    an extra distinct scan and a nondeterministic column order; absent
    cells coalesce to 0.
    """
    p = events.groupBy("user_id").pivot("event_type", list(types)).agg(
        F.count(F.lit(1))
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


def derive_temporal_links(transcripts: DataFrame, ids: DataFrame) -> DataFrame:
    """(a, b, ts_us) — the DIRECTED transcript links with event time:
    the same reply + tool-invocation derivation as the static graph
    (sources/edges.py::derive_edges_from_transcripts), keeping direction
    and stamping each link with the TARGET turn's timestamp (the moment
    the link comes into existence). Feed to
    :func:`temporal_reachability`. ``ids`` is the (conv_id, turn_idx,
    vid) map from transcript_graph."""
    t = transcripts.join(ids, ["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "tool", "vid",
        F.unix_micros(F.to_utc_timestamp("ts", "UTC")).alias("ts_us"),
    )
    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    reply = (
        t.withColumn("b", F.lead("vid").over(w_conv))
        .withColumn("bts", F.lead("ts_us").over(w_conv))
        .filter(F.col("b").isNotNull())
        .select(F.col("vid").alias("a"), "b", F.col("bts").alias("ts_us"))
    )
    w_tool = Window.partitionBy("tool").orderBy("ts_us", "conv_id", "turn_idx")
    tool = (
        t.filter(F.col("tool").isNotNull())
        .withColumn("b", F.lead("vid").over(w_tool))
        .withColumn("bts", F.lead("ts_us").over(w_tool))
        .filter(F.col("b").isNotNull())
        .select(F.col("vid").alias("a"), "b", F.col("bts").alias("ts_us"))
    )
    return reply.unionByName(tool)


def temporal_reachability(
    links: DataFrame, seeds: DataFrame, max_hops: int = 6, checkpointer=None
) -> DataFrame:
    """(landmark, vertex, arr_us) — hop-bounded EARLIEST-ARRIVAL times
    over a temporal graph (Wu et al. 2014, "Path Problems in Temporal
    Graphs"): arr(v) = the minimum, over time-respecting paths of at
    most ``max_hops`` links whose timestamps never decrease and whose
    first link is no earlier than the seed's own arr_us, of the last
    link's timestamp. Information in a transcript flows only forward in
    time — static reachability overstates influence; this is the
    operator that does not.

    Round r computes the exact Bellman-Ford state arr_r (min over
    <= r-hop paths): expansion only from rows improved last round
    (delta expansion reaches the identical state sequence — any new
    <= r+1-hop improvement extends an improvement of round r), ONE
    shuffle join + min-merge per round, early stop at the true fixpoint
    (idempotent, so a fixed-round oracle unroll agrees whenever it
    unrolls >= the rounds the engine ran). Bounded-radius semantics as
    in landmark_distances — no truncation raise; ``max_hops`` IS the
    contract.

    ``links``: (a, b, ts_us) directed; ``seeds``: (landmark, vertex,
    arr_us) start rows, normally vertex = landmark and arr_us = the
    landmark turn's own timestamp. All state is int64 — engine-exact.

    ``checkpointer``: optional plans.checkpoint
    .VertexIterationCheckpointer — every hop durably commits one packed
    state table (kind='best' carries the arrival map, kind='frontier'
    last hop's improvements); a fresh call resumes the identical
    Bellman-Ford state sequence from the latest committed hop.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = links.select("a", "b", "ts_us").localCheckpoint(eager=True)
    best = seeds.select("landmark", "vertex", "arr_us").localCheckpoint(eager=True)
    frontier = best
    start_hop = 0
    fixpoint = False
    if checkpointer is not None:
        state = checkpointer.load_latest(links.sparkSession)
        if state is not None:
            it, saved, metric = state
            saved = saved.localCheckpoint(eager=True)
            best = saved.filter(F.col("kind") == "best").select(
                "landmark", "vertex", "arr_us"
            )
            frontier = saved.filter(F.col("kind") == "frontier").select(
                "landmark", "vertex", "arr_us"
            )
            start_hop = it + 1
            fixpoint = bool(metric.get("fixpoint"))

    def _save(hop: int, fx: bool, n_improved: int) -> None:
        if checkpointer is None:
            return
        packed = best.select(F.lit("best").alias("kind"), "landmark", "vertex", "arr_us")
        packed = packed.unionByName(
            frontier.select(
                F.lit("frontier").alias("kind"), "landmark", "vertex", "arr_us"
            )
        )
        checkpointer.save(hop, packed, {"fixpoint": fx, "n_improved": n_improved})

    for _h in range(start_hop, max_hops):
        if fixpoint:
            break
        cand = (
            frontier.join(e, frontier["vertex"] == e["a"])
            .filter(F.col("ts_us") >= F.col("arr_us"))
            .groupBy("landmark", F.col("b").alias("vertex"))
            .agg(F.min("ts_us").alias("arr_us"))
        )
        improved = (
            cand.join(
                best.select(
                    "landmark", "vertex", F.col("arr_us").alias("prev_us")
                ),
                ["landmark", "vertex"],
                "left",
            )
            .filter(F.col("prev_us").isNull() | (F.col("arr_us") < F.col("prev_us")))
            .select("landmark", "vertex", "arr_us")
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
            .agg(F.min("arr_us").alias("arr_us"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
        _save(_h, False, n_improved)
    return best


def transition_entropy(transcripts: DataFrame) -> DataFrame:
    """One row (n_links, n_states, entropy_nats_r9, norm_entropy_r9) —
    the Shannon entropy of the (role -> next_role) hop distribution:
    how predictable the dialogue flow is (0 = one deterministic hop
    type, ln(n_states) = uniform over all observed hop types), plus
    the [0, 1]-normalized variant.

    Shuffle-order-proof by the micro-nat identity

        H = ln(N) - (1/N) * sum_cells c * ln(c)

    where each distinct cell's ln(c) is rounded to integer MICRO-nats
    (one double expression, bit-identical in any engine) and the
    c*ln(c) products are summed as exact int64 over the tiny
    transition matrix — the same textstats trick rarity/bigram-LM use.
    The outer ln(N) is a single scalar expression, safe as-is.
    """
    cells = role_transitions(transcripts)
    unats = F.round(
        F.log(F.col("n_links").cast("double")) * F.lit(1000000.0)
    ).cast("long")
    agg = cells.agg(
        F.coalesce(F.sum("n_links"), F.lit(0)).alias("n"),
        F.count("*").alias("k"),
        F.coalesce(F.sum(F.col("n_links") * unats), F.lit(0)).alias("s"),
    )
    # outer ln(N) in micro-nats as well, so a fully concentrated
    # distribution (one cell, c == N) gives H exactly 0: its inner term
    # is N * round(ln N * 1e6) and the two roundings cancel bit-exactly
    nnats = F.round(
        F.log(F.col("n").cast("double")) * F.lit(1000000.0)
    ).cast("long")
    h = (
        nnats.cast("double")
        - F.col("s").cast("double") / F.col("n").cast("double")
    ) / F.lit(1000000.0)
    return agg.select(
        F.col("n").alias("n_links"),
        F.col("k").alias("n_states"),
        F.when(F.col("n") > 0, F.round(h, 9)).alias("entropy_nats_r9"),
        F.when(
            F.col("k") >= 2,
            F.round(h / F.log(F.col("k").cast("double")), 9),
        )
        .otherwise(F.when(F.col("n") > 0, F.lit(0.0)))
        .alias("norm_entropy_r9"),
    )


def tool_bridging(transcripts: DataFrame) -> DataFrame:
    """(tool, n_links, n_cross_conv, cross_frac_r9) — which tools stitch
    the transcript graph ACROSS conversations: per tool, how many of
    its chain links (consecutive uses in global time order) connect
    turns of two different conversations. High cross_frac tools are the
    graph's long-range edges — exactly the links that merge components
    and give Louvain its inter-conversation communities.

    One window (the same per-tool chain derive_edges_from_transcripts
    uses) + a tiny-key groupBy; all integers, one r9 division.
    """
    w = Window.partitionBy("tool").orderBy("ts", "conv_id", "turn_idx")
    hops = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("tool", "conv_id", "ts", "turn_idx")
        .withColumn("next_conv", F.lead("conv_id").over(w))
        .filter(F.col("next_conv").isNotNull())
    )
    return hops.groupBy("tool").agg(
        F.count("*").alias("n_links"),
        F.coalesce(
            F.sum(F.when(F.col("conv_id") != F.col("next_conv"), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_cross_conv"),
    ).select(
        "tool",
        "n_links",
        "n_cross_conv",
        F.round(F.col("n_cross_conv") / F.col("n_links"), 9).alias("cross_frac_r9"),
    )


def response_time_quantiles(
    transcripts: DataFrame,
    from_role: str = "user",
    to_role: str = "assistant",
    quantiles: tuple = (50, 90, 99),
) -> DataFrame:
    """(q, n, gap_us) — EXACT type-1 quantiles of the response latency
    between consecutive (from_role -> to_role) turns within a
    conversation: THE dialogue-quality metric (p50/p90/p99 of how long
    the assistant took to follow a user turn). Gaps are exact integer
    micros; rank ties break on (conv_id, turn_idx) so the selected
    element is engine-unique; never percentile_approx.
    """
    wc = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    hops = (
        transcripts.select("conv_id", "turn_idx", "role", us.alias("us"))
        .withColumn("next_role", F.lead("role").over(wc))
        .withColumn("next_us", F.lead("us").over(wc))
        .filter(
            (F.col("role") == from_role)
            & (F.col("next_role") == to_role)
            & F.col("next_us").isNotNull()
        )
        .select("conv_id", "turn_idx", (F.col("next_us") - F.col("us")).alias("gap_us"))
    )
    w = Window.orderBy("gap_us", "conv_id", "turn_idx")
    ranked = hops.withColumn("rn", F.row_number().over(w))
    n = hops.agg(F.count("*").alias("n"))
    qdf = transcripts.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles], "q int"
    )
    targets = qdf.crossJoin(F.broadcast(n)).select(
        "q",
        "n",
        F.greatest(F.lit(1), F.ceil(F.col("q") / 100.0 * F.col("n")).cast("long")).alias("rn"),
    )
    return targets.join(ranked.select("rn", "gap_us"), "rn").select("q", "n", "gap_us")
