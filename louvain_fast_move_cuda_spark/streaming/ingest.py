"""Structured Streaming ingest: incremental transcript -> edge derivation.

The reference is a batch engine (no streaming anywhere in its 17 files);
this module is engine surface we add for the 10^12-turn deployment,
where transcripts land continuously and the edge table must grow
incrementally instead of being re-derived from scratch.

Design:

* **Reply edges are stateless.** A turn (conv_id, i>0) always links to
  its predecessor (conv_id, i-1) — pure projection on the stream, no
  window function, no state store. (The batch path's ``lead()`` over
  contiguous turn indices produces exactly these pairs, which is what
  makes the invariant testable: stream-derived edges == batch-derived
  edges on the same rows.)
* **Tool chains are stateful.** "Each tool-using turn links to the
  previous turn using the same tool" needs the last-seen turn per tool
  across micro-batches: a custom stateful operator via
  ``applyInPandasWithState`` keyed by tool, state = the last (ts,
  conv_id, turn_idx) triple. Within a batch rows are sorted by
  (ts, conv_id, turn_idx) and chain-linked vectorized; the state row
  links the chain across batches. Arrow-batched — no per-row Python in
  the hot loop beyond the pandas group dispatch.
* **Late data** is handled where it semantically matters: the windowed
  turn-rate aggregation uses an event-time watermark; the tool chain
  documents its arrival-order semantics (a row arriving after a newer
  row was processed chains after it — same behavior as the batch job
  run on data sorted by arrival).

Edges stream out in the raw-pair schema (a/b as (conv_id, turn_idx)
composite keys); the batch layer's canonicalize/relabel applies
downstream (vertex ids are assigned when a graph snapshot is built).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

EDGE_SCHEMA = StructType(
    [
        StructField("a_conv", StringType()),
        StructField("a_idx", IntegerType()),
        StructField("b_conv", StringType()),
        StructField("b_idx", IntegerType()),
        StructField("kind", StringType()),
    ]
)

_TOOL_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
    ]
)


def read_transcript_stream(spark, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based transcript stream (each landed parquet file = new turns)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def reply_edges_stream(turns: DataFrame) -> DataFrame:
    """Stateless reply links: (conv, i-1) -> (conv, i) for every i > 0."""
    return turns.filter(F.col("turn_idx") > 0).select(
        F.col("conv_id").alias("a_conv"),
        (F.col("turn_idx") - 1).cast("int").alias("a_idx"),
        F.col("conv_id").alias("b_conv"),
        F.col("turn_idx").alias("b_idx"),
        F.lit("reply").alias("kind"),
    )


def _tool_chain_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Chain-link one tool's turns across micro-batches.

    State = last emitted (ts_us, conv_id, turn_idx). Rows inside the
    batch are sorted by (ts_us, conv_id, turn_idx) — the same total
    order as the batch derivation's window — and linked pairwise with a
    vectorized shift; the stored state row prepends the chain.
    """
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        yield pd.DataFrame(
            {
                "a_conv": pd.Series(dtype="object"),
                "a_idx": pd.Series(dtype="int32"),
                "b_conv": pd.Series(dtype="object"),
                "b_idx": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="object"),
            }
        )
        return
    rows = rows.sort_values(["ts_us", "conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    prev = rows.shift(1)
    if state.exists:
        last_ts, last_conv, last_idx = state.get
        prev.loc[0, "conv_id"] = last_conv
        prev.loc[0, "turn_idx"] = last_idx
    out = pd.DataFrame(
        {
            "a_conv": prev["conv_id"],
            "a_idx": prev["turn_idx"],
            "b_conv": rows["conv_id"],
            "b_idx": rows["turn_idx"],
            "kind": "tool",
        }
    ).dropna(subset=["a_conv"])
    out["a_idx"] = out["a_idx"].astype("int32")
    out["b_idx"] = out["b_idx"].astype("int32")
    tail = rows.iloc[-1]
    state.update((int(tail["ts_us"]), str(tail["conv_id"]), int(tail["turn_idx"])))
    yield out


def tool_edges_stream(turns: DataFrame) -> DataFrame:
    """Stateful tool-invocation links via applyInPandasWithState.

    Keyed by tool; each micro-batch extends the per-tool chain from the
    remembered last turn. Output mode 'append' (edges are immutable
    facts once emitted).
    """
    keyed = (
        turns.filter(F.col("tool").isNotNull())
        .select(
            "tool",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "conv_id",
            "turn_idx",
        )
        .groupBy("tool")
    )
    return keyed.applyInPandasWithState(
        _tool_chain_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=_TOOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def turn_rates_stream(turns: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked per-conversation turn rate (late data beyond the
    watermark is dropped; in-watermark stragglers update their window)."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            "conv_id",
            "n_turns",
        )
    )


def run_edge_ingest(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive both edge streams to parquet sinks (exactly-once via the
    streaming checkpoint; restarts resume from the last committed batch).

    ``max_files_per_trigger`` splits an availableNow backlog into one
    micro-batch per N files — the driver-oracle query uses 1 so the
    tool-chain state is genuinely carried ACROSS batches, not exercised
    in a single big batch.
    """
    turns = read_transcript_stream(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger
    )
    queries = []
    for name, df in (
        ("reply", reply_edges_stream(turns)),
        ("tool", tool_edges_stream(turns)),
    ):
        writer = (
            df.writeStream.format("parquet")
            .option("path", f"{output_dir}/{name}")
            .option("checkpointLocation", f"{checkpoint_dir}/{name}")
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())
    for q in queries:
        q.awaitTermination()
