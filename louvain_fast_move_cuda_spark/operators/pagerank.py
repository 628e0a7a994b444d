"""Weighted PageRank over the directed-symmetric edge table.

Not in the CUDA reference (SURVEY.md §2.11 — mandated by the north rule);
semantics from the published algorithm. One superstep is a single
shuffle: contributions = edges ⋈ ranks on src (rank/out-weight scaled by
edge weight), then groupBy(dst).sum. Lineage is truncated per iteration
with localCheckpoint; convergence on L1 delta.

The symmetric graph has no dangling vertices (every vertex has out-edges),
so no dangling redistribution term is needed — asserted by construction in
sources.edges.build_graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def pagerank(
    graph: GraphTables,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-10,
) -> DataFrame:
    """Returns (id: long, rank: double); Σ rank = 1."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n = graph.vertices.count()
    # share_(src->dst) = w / k_src  (static per edge: precompute once)
    shares = (
        graph.edges.join(
            graph.vertices.select(F.col("id").alias("src"), F.col("k").alias("k_src")), "src"
        )
        .select("src", "dst", (F.col("weight") / F.col("k_src")).alias("share"))
        .repartition(npart, "src")
        .localCheckpoint(eager=True)
    )
    ranks = graph.vertices.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
    base = (1.0 - alpha) / n
    for _ in range(max_iter):
        contribs = (
            shares.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("in_sum"))
        )
        new_ranks = (
            graph.vertices.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("in_sum"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=False)  # materializes inside the L1 action
        )
        l1 = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if l1 is not None and float(l1) < tol:
            break
    return ranks
