"""Streaming gap-sessionization: per-user session assignment across
micro-batches.

Batch sessionization (operators/temporal.py::sessionize) windows the
whole history; at continuous-ingest scale the pipeline instead needs to
decide PER ARRIVING EVENT which session it belongs to — a stateful
streaming operator with O(1) state per user (applyInPandasWithState
keyed by user_id, state = (last_ts_us, cur_session_id)). A session
breaks when the gap to the user's previous event exceeds the threshold;
the session id is the first event_id of the session — the same stable
label the batch operator emits, so with a time-ordered replay the batch
window over (user_id, ts, event_id) is the exact oracle.

Emitted rows are immutable per-event facts (append mode); restarting
the stream resumes from the checkpoint with the carried (last_ts,
session) state — a session spanning a restart keeps its id.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("us", LongType()),
    ]
)

_SESS_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("cur_session", LongType()),
    ]
)

SESS_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("session_id", LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000


def _session_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One user's arrivals in one micro-batch, ordered by (us, event_id):
    vectorized gap flags -> cumsum group index; group 0 continues the
    carried session when the carried gap also holds."""
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        yield pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "session_id": pd.Series(dtype="int64"),
            }
        )
        return
    rows = rows.sort_values(["us", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    us = rows["us"].to_numpy()
    prev = rows["us"].shift(1).to_numpy()
    if state.exists:
        last_us, cur_session = (int(v) for v in state.get)
        prev[0] = last_us
    else:
        cur_session = None  # no carried session: row 0 always starts one
        prev[0] = float("nan")
    new_sess = pd.isna(prev) | ((us - prev) > _GAP_US)
    grp = new_sess.cumsum()  # 0 = continues the carried session
    firsts = rows.groupby(grp)["event_id"].transform("first").to_numpy()
    session_id = firsts.copy()
    if cur_session is not None:
        session_id[grp == 0] = cur_session
    out = pd.DataFrame(
        {
            "event_id": rows["event_id"].astype("int64"),
            "session_id": pd.Series(session_id, dtype="int64"),
        }
    )
    state.update((int(us[-1]), int(session_id[-1])))
    yield out


def session_stream(events: DataFrame) -> DataFrame:
    """Stateful gap-sessionization over a streaming (event_id, user_id,
    us) frame; state is 16 bytes per user regardless of history length."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_session_ingest(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """File-source replay -> session_stream -> exactly-once parquet sink."""
    src = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = session_stream(src)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q.awaitTermination()
    return q
