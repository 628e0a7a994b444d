"""Streaming incremental HyperLogLog: grouped distinct-count sketches
maintained over an unbounded keyed-hash stream.

Batch grouped count-distinct (and the batch HLL in operators/sketch.py)
re-scans the accumulated corpus; on a continuous ingest the engine
instead maintains the per-group REGISTER TABLE — <= 256 one-byte
registers per group, the textbook mergeable HLL state — and folds each
micro-batch in by elementwise max. Per-batch work scales with the
ARRIVING rows plus O(groups * 256) for the merge; never with the
accumulated stream. Not in the CUDA reference (batch Louvain only);
added streaming surface alongside cc_stream.py / triangle_stream.py.

Correctness invariant (the whole point of HLL's max-merge algebra):
the maintained register table after any prefix of batches is BIT-EQUAL
to the batch ``hll_registers`` over the union of those batches' rows —
max is associative, commutative, and idempotent, so batch boundaries,
replay order, and at-least-once re-deliveries are all invisible in the
final state. The driver oracle exploits this: the streaming snapshot's
``hll_summarize`` must equal the batch SQL recompute exactly.

Durable state follows cc_stream's snapshot contract: each batch writes
the full merged register table under ``state_dir/regs/batch=<id>``
(_SUCCESS-gated, idempotent overwrite on foreachBatch replay; a batch
reads the latest committed snapshot with a STRICTLY smaller id). The
snapshot is tiny — 256 rows/group regardless of stream size — which is
exactly why this sketch is the 100 TB answer to "distinct users per
event type, updated continuously": the state that would be a
set-of-all-hashes for exact dedup is a fixed-size register file here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.sketch import hll_registers, hll_summarize
from .cc_stream import _latest_committed

KEYED_STREAM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("key_col", StringType()),
        StructField("h", LongType()),
    ]
)

_GROUP_COLS = ("event_type", "key_col")


def _regs_schema(group_cols: Sequence[str]) -> str:
    gc = ", ".join(f"{c} string" for c in group_cols)
    return f"{gc}, idx long, m int"


def read_registers(
    spark: SparkSession,
    state_dir: str,
    group_cols: Sequence[str] = _GROUP_COLS,
    before_batch: int | None = None,
) -> DataFrame:
    """Latest committed register snapshot (strictly before
    ``before_batch`` if given); empty table if none committed yet."""
    regs_dir = f"{state_dir}/regs"
    b = _latest_committed(
        regs_dir, 2**62 if before_batch is None else before_batch
    )
    if b is None:
        return spark.createDataFrame([], _regs_schema(group_cols))
    return spark.read.parquet(f"{regs_dir}/batch={b}")


def merge_registers(
    prev: DataFrame, batch: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Elementwise max of two register tables — HLL's merge operator.
    Absent rows mean register value 0, so union + groupBy max is the
    full outer max without a join."""
    gc = list(group_cols)
    return (
        prev.select(*gc, "idx", "m")
        .unionByName(batch.select(*gc, "idx", "m"))
        .groupBy(*gc, "idx")
        .agg(F.max("m").alias("m"))
    )


def _hll_step(state_dir: str, group_cols: Sequence[str]):
    gc = list(group_cols)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = read_registers(spark, state_dir, gc, before_batch=batch_id)
        merged = merge_registers(
            prev, hll_registers(batch_df, gc), gc
        ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/regs/batch={batch_id}"
        )

    return step


def run_incremental_hll(
    spark: SparkSession,
    in_dir: str,
    state_dir: str,
    ck_dir: str,
    group_cols: Sequence[str] = _GROUP_COLS,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
) -> None:
    """Replay the keyed-hash file stream through the register
    maintainer; blocks until drained. Re-running with the same
    ``ck_dir`` resumes from the streaming checkpoint and committed
    snapshots."""
    reader = (
        spark.readStream.schema(KEYED_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    writer = reader.writeStream.foreachBatch(
        _hll_step(state_dir, group_cols)
    ).option("checkpointLocation", ck_dir)
    q = (
        writer.trigger(availableNow=True).start()
        if available_now
        else writer.start()  # pragma: no cover - continuous mode
    )
    q.awaitTermination()


def read_estimates(
    spark: SparkSession,
    state_dir: str,
    group_cols: Sequence[str] = _GROUP_COLS,
) -> DataFrame:
    """(group_cols..., n_zero_registers, s_scaled, raw_est, hll_est) —
    the maintained sketch finalized from the latest committed register
    snapshot."""
    return hll_summarize(
        read_registers(spark, state_dir, group_cols), group_cols
    )
