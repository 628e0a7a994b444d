"""Structured Streaming ingest (streaming/ingest.py).

Invariant: edges derived incrementally — across micro-batches AND across
stream restarts — equal the batch derivation over the same rows. The
tool-chain operator's cross-batch state lives in the streaming
checkpoint's state store, so running the ingest twice (new files landed
in between) is the strongest probe: batch 2 must chain from batch 1's
last turn per tool, recovered from disk.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.sources.transcripts import synthesize_transcripts
from louvain_fast_move_cuda_spark.streaming.ingest import (
    reply_edges_stream,
    run_edge_ingest,
    turn_rates_stream,
)


def _edge_set(df):
    return {
        (r.a_conv, r.a_idx, r.b_conv, r.b_idx) for r in df.collect()
    }


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthesize_transcripts(spark, n_convs=40, seed=9).localCheckpoint(eager=True)


def test_incremental_ingest_matches_batch_derivation(spark, transcripts, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ck_dir = str(tmp / "in"), str(tmp / "out"), str(tmp / "ck")

    # two landings split on event time (conv_seq drives ts in the
    # synthesizer, so batch-1 rows all precede batch-2 rows)
    part1 = transcripts.filter(F.col("conv_id").isin([f"c{i}" for i in range(20)]))
    part2 = transcripts.exceptAll(part1)
    part1.coalesce(1).write.mode("append").parquet(in_dir)
    run_edge_ingest(spark, in_dir, out_dir, ck_dir)
    part2.coalesce(1).write.mode("append").parquet(in_dir)
    run_edge_ingest(spark, in_dir, out_dir, ck_dir)  # resume: processes only the new file

    got_reply = _edge_set(spark.read.parquet(f"{out_dir}/reply"))
    got_tool = _edge_set(spark.read.parquet(f"{out_dir}/tool"))

    want_reply = {
        (r.conv_id, r.turn_idx - 1, r.conv_id, r.turn_idx)
        for r in transcripts.filter(F.col("turn_idx") > 0).collect()
    }
    w_tool = Window.partitionBy("tool").orderBy("ts", "conv_id", "turn_idx")
    want_tool = _edge_set(
        transcripts.filter(F.col("tool").isNotNull())
        .select(
            F.col("conv_id").alias("a_conv"), F.col("turn_idx").alias("a_idx"),
            F.lead("conv_id").over(w_tool).alias("b_conv"),
            F.lead("turn_idx").over(w_tool).alias("b_idx"),
            "tool", "ts",
        )
        .filter(F.col("b_conv").isNotNull())
    )
    assert got_reply == want_reply
    assert got_tool == want_tool
    assert len(got_tool) > 0  # the stateful path actually ran


def test_reply_stream_is_stateless_projection(spark, transcripts):
    """reply_edges_stream is a pure projection — applying it to the static
    frame must equal the (conv, i-1)->(conv, i) rule directly."""
    got = _edge_set(reply_edges_stream(transcripts))
    want = {
        (r.conv_id, r.turn_idx - 1, r.conv_id, r.turn_idx)
        for r in transcripts.filter(F.col("turn_idx") > 0).collect()
    }
    assert got == want


def test_turn_rates_window_counts(spark, transcripts):
    """The watermarked windowed agg has batch-equivalent window semantics."""
    got = {
        (r.window_start, r.conv_id): r.n_turns
        for r in turn_rates_stream(transcripts).collect()
    }
    want = {
        (r.ws, r.conv_id): r.n
        for r in transcripts.groupBy(
            F.window("ts", "1 hour").getField("start").alias("ws"), "conv_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == transcripts.count()


def test_streaming_dedup_state_survives_restart(spark, tmp_path_factory):
    """First-seen dedup across TWO separate stream runs sharing one
    checkpoint: a dup landing in run 2 of content first seen in run 1
    must be flagged from the state store, not re-counted as first."""
    from louvain_fast_move_cuda_spark.streaming.dedup_stream import run_dedup_ingest

    tmp = tmp_path_factory.mktemp("dedupstream")
    in_dir, out_dir, ck_dir = str(tmp / "in"), str(tmp / "out"), str(tmp / "ck")

    batch1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "ALPHA   beta")]
    batch2 = [(3, "gamma delta"), (4, "fresh content"), (5, "alpha beta")]
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_dedup_ingest(spark, in_dir, out_dir, ck_dir)
    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_dedup_ingest(spark, in_dir, out_dir, ck_dir)

    got = {r.doc_id: (r.is_first, r.seen_before) for r in spark.read.parquet(out_dir).collect()}
    assert got[0] == (1, 0)
    assert got[1] == (1, 0)
    assert got[2] == (0, 1)  # normalization: case + whitespace collapse
    assert got[3] == (0, 1)  # cross-run dup, recovered from the state store
    assert got[4] == (1, 0)
    assert got[5] == (0, 2)  # third sighting of 'alpha beta' across runs


def test_streaming_sessions_state_survives_restart(spark, tmp_path_factory):
    """Gap-sessionization across TWO stream runs sharing one checkpoint:
    run-2 events within the gap of run-1's last event must keep run-1's
    session id (carried state), events past the gap start a new one."""
    from louvain_fast_move_cuda_spark.streaming.session_stream import (
        run_session_ingest,
    )

    tmp = tmp_path_factory.mktemp("sessstream")
    in_dir, out_dir, ck_dir = str(tmp / "in"), str(tmp / "out"), str(tmp / "ck")
    m = 60 * 1_000_000  # one minute in micros

    # user 1: two events 10 min apart (one session)
    batch1 = [(0, 1, 0 * m), (1, 1, 10 * m)]
    # run 2: event at +20 min continues the session; +90 min breaks it;
    # user 2 appears for the first time
    batch2 = [(2, 1, 30 * m), (3, 1, 120 * m), (4, 2, 0 * m)]
    spark.createDataFrame(
        batch1, "event_id long, user_id long, us long"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_session_ingest(spark, in_dir, out_dir, ck_dir)
    spark.createDataFrame(
        batch2, "event_id long, user_id long, us long"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_session_ingest(spark, in_dir, out_dir, ck_dir)

    got = {r.event_id: r.session_id for r in spark.read.parquet(out_dir).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}


def test_incremental_cc_matches_batch_and_survives_restart(spark, tmp_path_factory):
    """streaming/cc_stream.py: labels maintained by per-batch contraction
    equal the batch CC labels bit-exactly (component = min reachable vid,
    a graph invariant), including across a stream restart with new files
    landed in between — the durable state is the committed labels
    snapshot + the streaming checkpoint."""
    from louvain_fast_move_cuda_spark.operators.components import (
        connected_components,
    )
    from louvain_fast_move_cuda_spark.sources.edges import build_graph
    from louvain_fast_move_cuda_spark.streaming.cc_stream import (
        read_labels,
        run_incremental_cc,
    )
    from oracle import powerlaw_graph

    tmp = tmp_path_factory.mktemp("ccstream")
    in_dir, labels_dir, ck_dir = str(tmp / "in"), str(tmp / "lab"), str(tmp / "ck")
    import os as _os
    _os.makedirs(in_dir, exist_ok=True)

    edges = sorted({(min(a, b), max(a, b))
                    for a, b in powerlaw_graph(n=300, m_attach=2, seed=11)
                    if a != b})
    # 4 chunk files; merges MUST span chunks for the contraction to be
    # exercised (a powerlaw graph sliced by edge order guarantees it)
    chunks = [edges[i::4] for i in range(4)]

    def land(i, chunk):
        spark.createDataFrame(chunk, "src long, dst long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/stage{i}")
        part = [f for f in _os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")][0]
        _os.rename(f"{tmp}/stage{i}/{part}", f"{in_dir}/{i:03d}.parquet")
        _os.utime(f"{in_dir}/{i:03d}.parquet", (1_700_000_000 + i,) * 2)

    land(0, chunks[0])
    land(1, chunks[1])
    run_incremental_cc(spark, in_dir, labels_dir, ck_dir)  # drains 2 batches
    mid = {(r.id, r.component) for r in read_labels(spark, labels_dir).collect()}
    g_mid = build_graph(
        spark.createDataFrame(chunks[0] + chunks[1], "a long, b long"),
        relabel=False,
    )
    want_mid = {(r.id, r.component)
                for r in connected_components(g_mid).collect()
                if r.id in {x for p in mid for x in (p[0],)}}
    assert mid == {p for p in want_mid}

    land(2, chunks[2])
    land(3, chunks[3])
    run_incremental_cc(spark, in_dir, labels_dir, ck_dir)  # RESTART: resumes
    got = {(r.id, r.component) for r in read_labels(spark, labels_dir).collect()}
    g_all = build_graph(
        spark.createDataFrame(edges, "a long, b long"), relabel=False
    )
    want = {(r.id, r.component) for r in connected_components(g_all).collect()}
    assert got == want  # bit-exact: same min-vid invariant, incl. vertices


def test_incremental_triangles_match_batch_and_survive_restart(spark, tmp_path_factory):
    """streaming/triangle_stream.py: per-batch deltas attribute every
    triangle to the batch whose edge completed it, totals equal the
    batch count, and state (append-only edge batches) survives a stream
    restart with new files landing in between."""
    from louvain_fast_move_cuda_spark.operators.triangles import triangle_count
    from louvain_fast_move_cuda_spark.sources.edges import build_graph
    from louvain_fast_move_cuda_spark.streaming.triangle_stream import (
        read_triangle_counts,
        run_incremental_triangles,
    )
    from oracle import powerlaw_graph

    import os as _os

    tmp = tmp_path_factory.mktemp("tristream")
    in_dir, state_dir, ck_dir = str(tmp / "in"), str(tmp / "st"), str(tmp / "ck")
    _os.makedirs(in_dir, exist_ok=True)

    edges = sorted({(min(a, b), max(a, b))
                    for a, b in powerlaw_graph(n=200, m_attach=3, seed=23)
                    if a != b})
    quarter = (len(edges) + 3) // 4
    chunks = [edges[i * quarter:(i + 1) * quarter] for i in range(4)]

    def land(i, chunk):
        spark.createDataFrame(chunk, "src long, dst long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/stage{i}")
        part = [f for f in _os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")][0]
        _os.rename(f"{tmp}/stage{i}/{part}", f"{in_dir}/{i:03d}.parquet")
        _os.utime(f"{in_dir}/{i:03d}.parquet", (1_700_000_000 + i,) * 2)

    land(0, chunks[0])
    land(1, chunks[1])
    run_incremental_triangles(spark, in_dir, state_dir, ck_dir)
    land(2, chunks[2])
    land(3, chunks[3])
    run_incremental_triangles(spark, in_dir, state_dir, ck_dir)  # RESTART

    rows = {r.batch_ord: r for r in read_triangle_counts(spark, state_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # per-batch deltas == batch-count differences over the prefixes
    prefix_counts = []
    for k in range(1, 5):
        pref = [e for c in chunks[:k] for e in c]
        g = build_graph(spark.createDataFrame(pref, "a long, b long"), relabel=False)
        prefix_counts.append(triangle_count(g))
    for k in range(1, 5):
        want_delta = prefix_counts[k - 1] - (prefix_counts[k - 2] if k > 1 else 0)
        assert rows[k].delta_triangles == want_delta, k
        assert rows[k].total_triangles == prefix_counts[k - 1], k
        assert rows[k].n_new_edges == len(chunks[k - 1]), k


def test_incremental_hll_matches_batch_and_survives_restart(spark, tmp_path_factory):
    """streaming/hll_stream.py: the maintained register snapshot is
    BIT-EQUAL to the batch hll_registers over the union of all landed
    rows (max-merge erases batch boundaries), estimates match the batch
    hll_distinct columns exactly, and state survives a stream restart
    with new files landing in between — including re-deliveries (a
    duplicated chunk), which max-merge idempotence must absorb."""
    from pyspark.sql import functions as F

    from louvain_fast_move_cuda_spark.operators.sketch import (
        hll_distinct,
        hll_registers,
    )
    from louvain_fast_move_cuda_spark.streaming.hll_stream import (
        read_estimates,
        read_registers,
        run_incremental_hll,
    )

    import os as _os

    tmp = tmp_path_factory.mktemp("hllstream")
    in_dir, state_dir, ck_dir = str(tmp / "in"), str(tmp / "st"), str(tmp / "ck")
    _os.makedirs(in_dir, exist_ok=True)

    gc = ["event_type", "key_col"]
    rows = [("a", "k", f"u{i}") for i in range(2500)] + [
        ("b", "k", f"u{i % 30}") for i in range(600)
    ]
    quarter = (len(rows) + 3) // 4
    chunks = [rows[i * quarter:(i + 1) * quarter] for i in range(4)]
    # chunk 3 re-delivers chunk 1's rows verbatim alongside its own:
    # idempotence of the register max-merge under at-least-once replay
    chunks[3] = chunks[3] + chunks[1]

    def land(i, chunk):
        spark.createDataFrame(
            chunk, "event_type string, key_col string, k string"
        ).select(
            "event_type", "key_col", F.xxhash64("k").alias("h")
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/stage{i}")
        part = [f for f in _os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")][0]
        _os.rename(f"{tmp}/stage{i}/{part}", f"{in_dir}/{i:03d}.parquet")
        _os.utime(f"{in_dir}/{i:03d}.parquet", (1_700_000_000 + i,) * 2)

    land(0, chunks[0])
    land(1, chunks[1])
    run_incremental_hll(spark, in_dir, state_dir, ck_dir)
    land(2, chunks[2])
    land(3, chunks[3])
    run_incremental_hll(spark, in_dir, state_dir, ck_dir)  # RESTART

    keyed = spark.createDataFrame(
        [r for c in chunks for r in c],
        "event_type string, key_col string, k string",
    ).select("event_type", "key_col", F.xxhash64("k").alias("h"))

    maintained = {
        (r.event_type, r.key_col, r.idx): r.m
        for r in read_registers(spark, state_dir).collect()
    }
    batch = {
        (r.event_type, r.key_col, r.idx): r.m
        for r in hll_registers(keyed, gc).collect()
    }
    assert maintained == batch  # bit-equal state, not just close estimates

    est = {
        (r.event_type, r.key_col): r
        for r in read_estimates(spark, state_dir).collect()
    }
    truth = {
        (r.event_type, r.key_col): r for r in hll_distinct(keyed, gc).collect()
    }
    assert set(est) == set(truth)
    for k in est:
        assert (
            est[k].s_scaled,
            est[k].n_zero_registers,
            est[k].raw_est,
            est[k].hll_est,
        ) == (
            truth[k].s_scaled,
            truth[k].n_zero_registers,
            truth[k].raw_est,
            truth[k].hll_est,
        ), k
        assert truth[k].within_bound, k


def test_incremental_cms_matches_batch_and_survives_restart(spark, tmp_path_factory):
    """streaming/cms_stream.py: the maintained cell table equals the
    batch count over all landed rows (counts are linear), and the
    snapshot-by-batch-id contract keeps the NON-idempotent sum-merge
    exactly-once across a stream restart."""
    from pyspark.sql import functions as F

    from louvain_fast_move_cuda_spark.operators.sketch import cms_buckets, cms_table
    from louvain_fast_move_cuda_spark.streaming.cms_stream import (
        read_cells,
        run_incremental_cms,
    )

    import os as _os

    tmp = tmp_path_factory.mktemp("cmsstream")
    in_dir, state_dir, ck_dir = str(tmp / "in"), str(tmp / "st"), str(tmp / "ck")
    _os.makedirs(in_dir, exist_ok=True)

    rows = [(f"t{i % 97}",) for i in range(4000)]
    quarter = 1000
    chunks = [rows[i * quarter:(i + 1) * quarter] for i in range(4)]

    def land(i, chunk):
        b = cms_buckets(
            spark.createDataFrame(chunk, "t string").select(
                F.xxhash64("t").alias("h")
            ),
            depth=4,
            width=64,
        ).select("h", F.col("row_idx").cast("long").alias("row_idx"), "bucket")
        b.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/stage{i}")
        part = [f for f in _os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")][0]
        _os.rename(f"{tmp}/stage{i}/{part}", f"{in_dir}/{i:03d}.parquet")
        _os.utime(f"{in_dir}/{i:03d}.parquet", (1_700_000_000 + i,) * 2)

    land(0, chunks[0])
    land(1, chunks[1])
    run_incremental_cms(spark, in_dir, state_dir, ck_dir)
    mid = {
        (r.row_idx, r.bucket): r.cnt for r in read_cells(spark, state_dir).collect()
    }
    assert sum(mid.values()) == 2000 * 4  # two batches, depth 4
    land(2, chunks[2])
    land(3, chunks[3])
    run_incremental_cms(spark, in_dir, state_dir, ck_dir)  # RESTART

    all_b = cms_buckets(
        spark.createDataFrame(rows, "t string").select(F.xxhash64("t").alias("h")),
        depth=4,
        width=64,
    )
    want = {
        (r.row_idx, r.bucket): r.cnt for r in cms_table(all_b).collect()
    }
    got = {
        (r.row_idx, r.bucket): r.cnt for r in read_cells(spark, state_dir).collect()
    }
    assert got == want  # exactly-once: no double counting across restart
