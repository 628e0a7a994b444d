"""Streaming incremental triangle counting: new-edge-attributed deltas.

Batch triangle counting (operators/triangles.py) re-joins the whole
edge table; on a continuously-growing link graph the engine instead
maintains the cumulative triangle count with per-batch work that scales
with the ARRIVING edges times their endpoint degrees — never with the
accumulated edge count. Not in the CUDA reference (batch Louvain only);
added streaming surface alongside cc_stream.py.

Counting rule (exactly-once attribution): a canonical triangle
a < b < c is the join e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) of the canonical
(src < dst) half-edge table — each triangle appears exactly once in
that pattern. With E = edges before the batch and A = the batch's new
edges (F = E ∪ A), the triangles gained by the batch split DISJOINTLY
by the first new slot:

    case 1: e1 ∈ A               (e2, e3 ∈ F)
    case 2: e1 ∈ E, e2 ∈ A       (e3 ∈ F)
    case 3: e1 ∈ E, e2 ∈ E, e3 ∈ A

Every case starts its join from A, so each is |A|-bounded: case 1 fans
A out along F, case 2 fans A back along E, case 3 closes A against two
E hops. No case ever enumerates the wedges of E alone.

Durable state is APPEND-ONLY: each batch writes only its deduped new
edges under ``state_dir/edges/batch=<id>`` (delta-sized, the natural
Iceberg append at 100 TB — bucketing E by src keeps the A ⋈ E joins
partition-pruned there) and a one-row counts table under
``state_dir/counts/batch=<id>``. Both are _SUCCESS-gated and keyed by
batch id, so foreachBatch's at-least-once replays overwrite themselves
idempotently; a batch reads only strictly-smaller committed batch ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc_stream import EDGE_STREAM_SCHEMA, _latest_committed


def _committed_batches(d: str, before_batch: int) -> list[int]:
    out = []
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if not name.startswith("batch="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b < before_batch and os.path.exists(os.path.join(d, name, "_SUCCESS")):
            out.append(b)
    return sorted(out)


def _read_batches(
    spark: SparkSession, d: str, batches: list[int], schema: str
) -> DataFrame:
    if not batches:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*[f"{d}/batch={b}" for b in batches])


def new_triangles(prev: DataFrame, new: DataFrame) -> int:
    """Triangles of prev ∪ new that use >= 1 new edge, counted once.

    Both inputs are canonical half-edge tables (src < dst, deduped,
    disjoint). Three disjoint |new|-bounded joins (see module doc)."""
    full = prev.unionByName(new)

    def j(e1, e2, close):
        wedges = (
            e1.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .join(
                e2.select(F.col("src").alias("b"), F.col("dst").alias("c")),
                "b",
            )
        )
        return wedges.join(
            close.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
            "left_semi",
        ).count()

    c1 = j(new, full, full)          # e1 new
    c2 = j(prev, new, full)          # e1 old, e2 new
    c3_base = (
        new.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        .join(prev.select(F.col("src").alias("a"), F.col("dst").alias("b")), "a")
        .join(
            prev.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )                                # e3 new, e1 AND e2 old
    return c1 + c2 + c3_base.count()


def _tri_step(state_dir: str):
    edges_dir = f"{state_dir}/edges"
    counts_dir = f"{state_dir}/counts"

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev_ids = _committed_batches(edges_dir, batch_id)
        prev = _read_batches(
            spark, edges_dir, prev_ids, "src long, dst long"
        ).localCheckpoint(eager=True)
        canon = (
            batch_df.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
        )
        new = canon.join(prev, ["src", "dst"], "left_anti").localCheckpoint(
            eager=True
        )
        delta = new_triangles(prev, new)
        n_new = new.count()
        new.write.mode("overwrite").parquet(f"{edges_dir}/batch={batch_id}")
        spark.createDataFrame(
            [(batch_id + 1, n_new, delta)],
            "batch_ord long, n_new_edges long, delta_triangles long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{counts_dir}/batch={batch_id}"
        )

    return step


def read_triangle_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """(batch_ord, n_new_edges, delta_triangles, total_triangles) — one
    row per committed batch, totals as a running sum in batch order."""
    from pyspark.sql import Window

    counts_dir = f"{state_dir}/counts"
    latest = _latest_committed(counts_dir, 2**62)
    if latest is None:
        return spark.createDataFrame(
            [],
            "batch_ord long, n_new_edges long, delta_triangles long, "
            "total_triangles long",
        )
    rows = _read_batches(
        spark,
        counts_dir,
        _committed_batches(counts_dir, 2**62),
        "batch_ord long, n_new_edges long, delta_triangles long",
    )
    w = Window.orderBy("batch_ord").rowsBetween(Window.unboundedPreceding, 0)
    return rows.select(
        "batch_ord",
        "n_new_edges",
        "delta_triangles",
        F.sum("delta_triangles").over(w).alias("total_triangles"),
    )


def run_incremental_triangles(
    spark: SparkSession,
    in_dir: str,
    state_dir: str,
    ck_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
) -> None:
    """Replay the edge-file stream through the incremental triangle
    maintainer; blocks until drained. Re-running with the same ``ck_dir``
    resumes from the streaming checkpoint and the committed state."""
    reader = (
        spark.readStream.schema(EDGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    writer = reader.writeStream.foreachBatch(_tri_step(state_dir)).option(
        "checkpointLocation", ck_dir
    )
    q = (
        writer.trigger(availableNow=True).start()
        if available_now
        else writer.start()  # pragma: no cover - continuous mode
    )
    q.awaitTermination()
