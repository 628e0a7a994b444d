"""Transcript sources.

The engine's primary input (BASELINE.json ``input_hint``) is an
Iceberg-style table of multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string (nullable), ts:timestamp

Two providers:

* :func:`synthesize_transcripts` — fully deterministic Spark-side
  generator (no driver-side materialization; scales to any row count).
* :func:`transcripts_from_events` — adapts the driver test table
  ``events`` (event_id, ts, user_id, event_type, value, props) into the
  transcript shape so oracle-checkable queries can run on shared data.

Per-turn ``text`` is a pure function of (conv_id, turn_idx) so the
north-rule "per-turn text equality under stable (conv_id, turn_idx)
ordering" is exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOOL_VOCAB = ["search", "browser", "python", "sql", "calculator", "files", "email", "maps"]


def _u01(*cols, seed: int) -> F.Column:
    """Deterministic pseudo-uniform in [0,1) from xxhash64 (stable across runs/parallelism)."""
    h = F.xxhash64(*cols, F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 64,
    tool_rate: float = 0.25,
) -> DataFrame:
    """Deterministic synthetic transcripts with power-law conversation lengths.

    Length ~ 2 + Pareto(alpha=2) capped at ``max_turns`` (mirrors the
    power-law family of the reference's bundled test graph
    ``graph-power-law-10000-2-99-1.edge``). Entirely Spark-side: a
    ``spark.range`` + ``explode(sequence(...))`` — no collect, no UDF.
    """
    alpha = 2.0
    convs = (
        spark.range(n_convs)
        .withColumn("u", _u01(F.col("id"), seed=seed))
        .withColumn(
            "n_turns",
            F.least(
                F.lit(max_turns),
                (F.lit(2) + F.floor(F.pow(F.lit(1.0) - F.col("u"), F.lit(-1.0 / alpha)) - F.lit(1.0))).cast("int"),
            ),
        )
    )
    turns = convs.select(
        F.col("id").alias("conv_seq"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    tu = _u01(F.col("conv_seq"), F.col("turn_idx"), seed=seed + 1)
    tool_pick = F.pmod(F.xxhash64("conv_seq", "turn_idx", F.lit(seed + 2)), F.lit(len(TOOL_VOCAB)))
    return turns.select(
        F.concat(F.lit("c"), F.col("conv_seq")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.concat(F.lit("turn-"), F.col("conv_seq"), F.lit("-"), F.col("turn_idx")).alias("text"),
        F.when(
            (F.col("turn_idx") % 2 == 1) & (tu < F.lit(tool_rate)),
            F.element_at(F.array(*[F.lit(t) for t in TOOL_VOCAB]), (tool_pick + 1).cast("int")),
        ).alias("tool"),
        (F.timestamp_seconds(F.lit(1700000000) + F.col("conv_seq") * 86400 + F.col("turn_idx") * 30)).alias("ts"),
    )


def transcript_graph(
    spark: SparkSession, sf_dir: str, reply_only: bool = False
):
    """Build the canonical transcript-derived graph over ALL turn vertices.

    Vertices are turns with contiguous vids ranked by (conv_id, turn_idx) —
    already dense, so no second relabel pass (the reference's min_id rebase,
    graph.cuh:66-76, is a no-op here); turns that appear in no edge are
    kept as isolated vertices with k=0.

    Returns (transcripts, ids, GraphTables) where ids = (conv_id, turn_idx,
    vid). With ``reply_only`` the graph uses only within-conversation reply
    links (components == conversations — an exact SQL-checkable oracle).
    """
    from .edges import (
        GraphTables,
        assign_contiguous_ids,
        canonicalize_edges,
        symmetrize,
        vertex_weights,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # materialize the derived transcripts once: the relabel's range
    # shuffle SAMPLES its input before exchanging it, and previously both
    # passes (plus the map-back join) re-ran the events window from the
    # parquet scan. The lazy checkpoint materializes inside the sampling
    # job; everything after reads executor-resident rows.
    t = transcripts_from_events(events).localCheckpoint(eager=False)
    # (conv_id, turn_idx) is unique by construction (row_number within
    # user), so the relabel skips its dedup shuffle AND carries the full
    # transcript row through its one range shuffle (carry_all) — the old
    # plan joined the vid map back onto t, re-exchanging both sides.
    # At cluster scale these would be durable intermediate tables;
    # localCheckpoint is the single-app equivalent (executor-resident,
    # lineage-free).
    tv = assign_contiguous_ids(
        t, ["conv_id", "turn_idx"], id_col="vid",
        assume_distinct=True, carry_all=True,
    ).localCheckpoint(eager=True)
    ids = tv.select("conv_id", "turn_idx", "vid")

    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    reply = (
        tv.withColumn("b", F.lead("vid").over(w_conv))
        .filter(F.col("b").isNotNull())
        .select(F.col("vid").alias("a"), "b")
    )
    raw = reply
    if not reply_only:
        w_tool = Window.partitionBy("tool").orderBy("ts", "conv_id", "turn_idx")
        tool = (
            tv.filter(F.col("tool").isNotNull())
            .withColumn("b", F.lead("vid").over(w_tool))
            .filter(F.col("b").isNotNull())
            .select(F.col("vid").alias("a"), "b")
        )
        raw = reply.unionByName(tool)

    edges = symmetrize(canonicalize_edges(raw).localCheckpoint(eager=True))
    verts = (
        ids.select(F.col("vid").alias("id"))
        .join(vertex_weights(edges), "id", "left")
        .select("id", F.coalesce("k", F.lit(0.0)).alias("k"))
    )
    # ONE action for both host scalars (the modularity_fused pattern):
    # m from the edge sum, n from the (checkpointed) vid table — vids are
    # dense over ALL turns, so ids.count() == verts.count() without
    # evaluating the verts join here
    agg = (
        edges.agg(F.sum("weight").alias("w2"))
        .crossJoin(ids.agg(F.count("*").alias("n")))
        .collect()[0]
    )
    m = float(agg["w2"]) / 2.0 if agg["w2"] is not None else 0.0
    n_nodes = int(agg["n"])
    return t, ids, GraphTables(edges=edges, vertices=verts, m=m, n_nodes=n_nodes)


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """View the driver ``events`` table as transcripts.

    conv_id = user_id, turn order = (ts, event_id) within user; role/tool
    derive from event_type. Deterministic and expressible in ANSI SQL, so
    the DuckDB oracle can mirror it exactly.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("value") > 50.0, F.col("event_type")).alias("tool"),
        F.col("ts"),
    )
