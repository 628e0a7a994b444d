"""Durable per-superstep checkpointing with per-partition lineage metrics.

North-rule requirement: every superstep checkpoints vertex-state and
coarsened-graph tables so runs resume mid-iteration. The reference keeps
all state resident on one GPU (community.h); at 10^12-turn scale state
must instead round-trip through a table format. We write parquet
(Iceberg-shaped layout: one directory per superstep + a JSON manifest
committed last, so a torn write is never visible to resume).

Layout:
    <root>/level=<L>/round=<R>/{edges_state,vertices,labels,frontier}/
    <root>/level=<L>/round=<R>/_META.json     (commit marker, written last)

_META.json records q, q_level_start, timestamps and per-partition row
counts of the edge state (lineage/metrics per north_rule).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SuperstepState:
    edges_state: DataFrame
    vertices: DataFrame
    labels: DataFrame
    frontier: DataFrame | None
    level: int
    round: int
    q: float
    q_level_start: float
    metric: dict | None = None  # the saved round's {n_moves, dq, ...} — resume
    # uses it to decide whether the inner loop had already terminated


class SuperstepCheckpointer:
    def __init__(self, root: str, record_partition_metrics: bool = True):
        self.root = root
        self.record_partition_metrics = record_partition_metrics
        os.makedirs(root, exist_ok=True)

    def _dir(self, level: int, rnd: int) -> str:
        return os.path.join(self.root, f"level={level}", f"round={rnd}")

    def save(
        self,
        level: int,
        rnd: int,
        edges_state: DataFrame,
        vertices: DataFrame,
        labels: DataFrame,
        frontier: DataFrame | None,
        q: float,
        q_level_start: float,
        metric: dict | None = None,
    ) -> None:
        d = self._dir(level, rnd)
        edges_state.write.mode("overwrite").parquet(os.path.join(d, "edges_state"))
        vertices.write.mode("overwrite").parquet(os.path.join(d, "vertices"))
        labels.write.mode("overwrite").parquet(os.path.join(d, "labels"))
        has_frontier = frontier is not None
        if has_frontier:
            frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
        meta = {
            "level": level,
            "round": rnd,
            "q": q,
            "q_level_start": q_level_start,
            "has_frontier": has_frontier,
            "ts": time.time(),
            "metric": metric or {},
        }
        if self.record_partition_metrics:
            parts = (
                edges_state.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            meta["edges_state_partitions"] = {int(r["pid"]): int(r["count"]) for r in parts}
        tmp = os.path.join(d, "_META.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(d, "_META.json"))  # atomic commit marker

    def load_latest(self, spark: SparkSession) -> SuperstepState | None:
        best = None
        if not os.path.isdir(self.root):
            return None
        for lv in os.listdir(self.root):
            if not lv.startswith("level="):
                continue
            level = int(lv.split("=")[1])
            for rd in os.listdir(os.path.join(self.root, lv)):
                if not rd.startswith("round="):
                    continue
                rnd = int(rd.split("=")[1])
                meta_path = os.path.join(self.root, lv, rd, "_META.json")
                if os.path.exists(meta_path) and (best is None or (level, rnd) > best):
                    best = (level, rnd)
        if best is None:
            return None
        level, rnd = best
        d = self._dir(level, rnd)
        with open(os.path.join(d, "_META.json")) as f:
            meta = json.load(f)
        frontier = (
            spark.read.parquet(os.path.join(d, "frontier")) if meta.get("has_frontier") else None
        )
        return SuperstepState(
            edges_state=spark.read.parquet(os.path.join(d, "edges_state")),
            vertices=spark.read.parquet(os.path.join(d, "vertices")),
            labels=spark.read.parquet(os.path.join(d, "labels")),
            frontier=frontier,
            level=level,
            round=rnd,
            q=float(meta["q"]),
            q_level_start=float(meta["q_level_start"]),
            metric=meta.get("metric") or {},
        )


class VertexIterationCheckpointer:
    """Durable per-iteration checkpointing for the single-table algorithms
    (PageRank ranks, LPA labels, CC's contracted edge set).

    Same commit discipline as SuperstepCheckpointer: one directory per
    iteration, state parquet first, JSON manifest (with algo tag,
    convergence metric and per-partition row counts) renamed into place
    last — a torn write is never visible to resume.

    Layout:
        <root>/iter=<I>/state/
        <root>/iter=<I>/_META.json
    """

    def __init__(self, root: str, algo: str, record_partition_metrics: bool = True):
        self.root = root
        self.algo = algo
        self.record_partition_metrics = record_partition_metrics
        os.makedirs(root, exist_ok=True)

    def _dir(self, iteration: int) -> str:
        return os.path.join(self.root, f"iter={iteration}")

    def save(self, iteration: int, state: DataFrame, metric: dict | None = None) -> None:
        d = self._dir(iteration)
        state.write.mode("overwrite").parquet(os.path.join(d, "state"))
        meta = {
            "algo": self.algo,
            "iteration": iteration,
            "ts": time.time(),
            "metric": metric or {},
        }
        if self.record_partition_metrics:
            parts = (
                state.groupBy(F.spark_partition_id().alias("pid")).count().collect()
            )
            meta["state_partitions"] = {int(r["pid"]): int(r["count"]) for r in parts}
        tmp = os.path.join(d, "_META.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(d, "_META.json"))  # atomic commit marker

    def load_latest(self, spark: SparkSession):
        """-> (iteration, state DataFrame, metric dict) or None."""
        best = None
        if not os.path.isdir(self.root):
            return None
        for it in os.listdir(self.root):
            if not it.startswith("iter="):
                continue
            iteration = int(it.split("=")[1])
            meta_path = os.path.join(self.root, it, "_META.json")
            if os.path.exists(meta_path) and (best is None or iteration > best):
                best = iteration
        if best is None:
            return None
        d = self._dir(best)
        with open(os.path.join(d, "_META.json")) as f:
            meta = json.load(f)
        if meta.get("algo") != self.algo:
            raise ValueError(
                f"checkpoint dir {self.root!r} belongs to algo {meta.get('algo')!r}, "
                f"not {self.algo!r}"
            )
        return best, spark.read.parquet(os.path.join(d, "state")), meta.get("metric") or {}
