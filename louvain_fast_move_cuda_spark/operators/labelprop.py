"""Synchronous label propagation (LPA) over the symmetric edge table.

Not in the CUDA reference (SURVEY.md §2.11); published algorithm
(Raghavan et al. 2007), synchronous variant for determinism: every round,
each vertex adopts the label with the largest incident weight among its
neighbors, ties broken toward the smallest label (the same canonical
tie-break as the Louvain argmax — max(struct(weight, -label))).

One round = one join (labels onto edge dst) + one groupBy(node, label)
+ one argmax groupBy(node): the same shuffle skeleton as a Louvain
superstep (SURVEY.md §2.4 A3/A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import GraphTables


def label_propagation(graph: GraphTables, max_iter: int = 10) -> DataFrame:
    """Returns (id: long, label: long). Stops early at a fixpoint."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = (
        graph.edges.select("src", "dst", F.col("weight").alias("w"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(npart, "dst")
        .localCheckpoint(eager=True)
    )
    labels = graph.vertices.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        votes = (
            edges.join(labels.select(F.col("id").alias("dst"), "label"), "dst")
            .groupBy("src", "label")
            .agg(F.sum("w").alias("wsum"))
        )
        new_labels = (
            votes.groupBy("src")
            .agg(F.max(F.struct(F.col("wsum"), (-F.col("label")).alias("nl"))).alias("b"))
            .select(F.col("src").alias("id"), (-F.col("b.nl")).alias("label"))
        )
        new_labels = (
            graph.vertices.select("id")
            .join(new_labels, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
            .localCheckpoint(eager=False)  # materializes inside the change count
        )
        n_changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    return labels
