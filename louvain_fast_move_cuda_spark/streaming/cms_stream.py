"""Streaming incremental count-min sketch: a frequency summary
maintained over an unbounded token-hash stream.

The CMS cell table is mergeable by elementwise SUM (counts are linear),
the additive twin of hll_stream's max-merge: per micro-batch the
maintainer counts the ARRIVING bucket rows and adds them onto the
committed cell table. State is d*w cells forever (4*256 here, one
parquet snapshot per batch, _SUCCESS-gated); per-batch work scales with
the arriving rows plus O(d*w) for the merge — never with the
accumulated stream. Not in the CUDA reference; added streaming surface
alongside cc_stream.py / triangle_stream.py / hll_stream.py.

Unlike max-merge, sum-merge is NOT idempotent under re-delivery — the
snapshot-by-batch-id contract is what makes at-least-once replays safe:
a replayed batch reads the snapshot with a STRICTLY smaller id and
overwrites its own, so its rows are counted exactly once no matter how
often foreachBatch re-runs it.

Correctness invariant (linearity of counts): the maintained cell table
after any prefix of batches equals the batch ``cms_table`` over the
union of those batches' rows — the driver oracle exploits this by
recomputing the cell counts over the whole materialized bucket table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .cc_stream import _latest_committed

BUCKET_STREAM_SCHEMA = StructType(
    [
        StructField("h", LongType()),
        StructField("row_idx", LongType()),
        StructField("bucket", LongType()),
    ]
)

_CELL_SCHEMA = "row_idx long, bucket long, cnt long"


def read_cells(
    spark: SparkSession, state_dir: str, before_batch: int | None = None
) -> DataFrame:
    """Latest committed cell-table snapshot (strictly before
    ``before_batch`` if given); empty table if none committed yet."""
    cells_dir = f"{state_dir}/cells"
    b = _latest_committed(
        cells_dir, 2**62 if before_batch is None else before_batch
    )
    if b is None:
        return spark.createDataFrame([], _CELL_SCHEMA)
    return spark.read.parquet(f"{cells_dir}/batch={b}")


def merge_cells(prev: DataFrame, batch_rows: DataFrame) -> DataFrame:
    """prev cell table + the batch's (row_idx, bucket) occurrence counts
    — union + groupBy sum (counts are linear, so this IS the CMS merge
    operator)."""
    batch_cells = batch_rows.groupBy("row_idx", "bucket").agg(
        F.count("*").alias("cnt")
    )
    return (
        prev.select("row_idx", "bucket", "cnt")
        .unionByName(batch_cells)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _cms_step(state_dir: str):
    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = read_cells(spark, state_dir, before_batch=batch_id)
        merged = merge_cells(prev, batch_df).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/cells/batch={batch_id}"
        )

    return step


def run_incremental_cms(
    spark: SparkSession,
    in_dir: str,
    state_dir: str,
    ck_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
) -> None:
    """Replay the bucket-row file stream through the cell maintainer;
    blocks until drained. Re-running with the same ``ck_dir`` resumes
    from the streaming checkpoint and committed snapshots."""
    reader = (
        spark.readStream.schema(BUCKET_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    writer = reader.writeStream.foreachBatch(_cms_step(state_dir)).option(
        "checkpointLocation", ck_dir
    )
    q = (
        writer.trigger(availableNow=True).start()
        if available_now
        else writer.start()  # pragma: no cover - continuous mode
    )
    q.awaitTermination()
