"""Streaming exact dedup: first-seen-wins across micro-batches.

Batch dedup (operators/dedup.py::exact_dedup) re-groups the whole
corpus; at continuous-ingest scale the pipeline instead needs to decide
PER ARRIVING DOC whether its content was already seen — a stateful
streaming operator with O(1) state per distinct content
(applyInPandasWithState keyed by the normalized-text hash, state =
(first_doc, n_seen)). The emitted per-doc verdicts are immutable facts
(append mode), and replaying the stream after a restart resumes from
the checkpoint with the same state — both properties the driver oracle
and the restart pytest pin.

Output per input doc: (doc_id, is_first, seen_before) — is_first = 1
iff the content was never seen before this row in stream order;
seen_before = how many earlier docs carried the same content. With a
doc_id-ordered replay, stream order == doc_id order, so a batch SQL
window (row_number over content groups) is the exact oracle.
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
)

from ..operators.dedup import _normalized

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_doc", LongType()),
        StructField("n_seen", LongType()),
    ]
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("is_first", IntegerType()),
        StructField("seen_before", LongType()),
    ]
)


def _dedup_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One content group's arrivals in one micro-batch: rows are ordered
    by doc_id (the replay's stream order within a batch), counted on top
    of the remembered n_seen, and the state row carries the running
    count to the next batch."""
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "is_first": pd.Series(dtype="int32"),
                "seen_before": pd.Series(dtype="int64"),
            }
        )
        return
    rows = rows.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    if state.exists:
        first_doc, n_seen = state.get
        first_doc, n_seen = int(first_doc), int(n_seen)
    else:
        first_doc, n_seen = int(rows["doc_id"].iloc[0]), 0
    seen_before = n_seen + rows.index.to_numpy()
    out = pd.DataFrame(
        {
            "doc_id": rows["doc_id"].astype("int64"),
            "is_first": (seen_before == 0).astype("int32"),
            "seen_before": seen_before.astype("int64"),
        }
    )
    state.update((first_doc, n_seen + len(rows)))
    yield out


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Stateful first-seen dedup over a streaming (doc_id, text) frame.

    The normalized text is hashed JVM-side (xxhash64) BEFORE grouping so
    the shuffle key and the state key are 8 bytes, not the document —
    at 100 TB the state store holds one (hash -> 16-byte) row per
    distinct content, never text.
    """
    keyed = docs.select(
        F.xxhash64(_normalized(F.col("text"))).alias("h"), "doc_id"
    ).groupBy("h")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_ingest(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive the dedup stream to a parquet sink (exactly-once via the
    streaming checkpoint; restarts resume from the last committed
    batch, carrying the per-content counts forward)."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    writer = (
        dedup_stream(docs)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    writer.start().awaitTermination()
