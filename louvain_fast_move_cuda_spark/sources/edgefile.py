"""Raw whitespace-separated edge-file ingest (`.edge` / edge-list text).

The reference ingests its test graphs from plain text files —
``GraphHost(name, weighted, skip_line)`` (graph.cu:17-87): optionally
skip ``skip_line`` header lines, then read ``a b`` int pairs, dedup
canonically, unit weights. Its weighted branch is an unimplemented TODO
(graph.cu:32-34, 61-62); here weighted parsing is completed as a third
whitespace token merged by sum, matching the engine's weighted
canonicalization (sources/edges.py).

Spark-first: ``spark.read.text`` → split/try_cast/filter — every line
parses independently, so the scan distributes over any number of file
splits and the parse stays whole-stage-codegen (no Python). Blank and
comment lines (`#`, `%` — common in SNAP/KONECT dumps) are dropped
declaratively. ``skip_lines`` (exact reference semantics: drop the
first N physical lines of every input file) is the one place needing a
file-order concept DataFrames don't usually model; since round 4 it is
fully JVM-side too: the hidden ``_metadata`` column gives each row its
file and the byte offset of the split it was read from, so a file's
head rows are exactly the rows of its offset-0 split, numbered in read
order by ``monotonically_increasing_id`` (strictly increasing within a
scan partition). Only head splits pass through the per-file window;
every other split streams straight to the parser with no shuffle and
no Python anywhere (the round-3 version pumped every line through an
RDD generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import GraphTables, build_graph

_COMMENT_PREFIXES = ("#", "%")


def read_edge_file(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    skip_lines: int = 0,
) -> DataFrame:
    """Parse an edge-list text file to raw (a: long, b: long[, weight]).

    ``weighted``: parse a third whitespace-separated token as a double
    weight (default 1.0 when the token is missing on a line).
    ``skip_lines``: drop exactly the first N lines of each input file
    (the reference's header skip, graph.cu:21-23).

    Lines that are blank, comments (# / %), or fail integer parsing are
    dropped — the same lines the reference's ``f >> a >> b`` loop never
    yields.
    """
    lines = spark.read.text(path)
    if skip_lines > 0:
        # PER-FILE header skip, fully JVM-side. _metadata.file_block_start
        # is the byte offset of the split a row was read from: a file's
        # first skip_lines lines live in its offset-0 split (headers are
        # assumed to fit the first split — < maxPartitionBytes, trivially
        # true for real edge-file headers; every non-empty file HAS an
        # offset-0 split, so nothing can silently under-skip). Within one
        # scan partition monotonically_increasing_id increases in read
        # order and a split's rows are contiguous, so a row_number per
        # (file) over the head-split rows IS the in-file line number.
        # Only head splits shuffle (bounded by maxPartitionBytes x
        # n_files); tail splits union straight through — no Python, no
        # RDD, whole-stage codegen end to end.
        tagged = spark.read.text(path).select(
            "value",
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.file_block_start").alias("_bs"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        head = tagged.filter(F.col("_bs") == 0)
        tail = tagged.filter(F.col("_bs") != 0).select("value")
        w = Window.partitionBy("_fp").orderBy("_mid")
        head_kept = (
            head.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > skip_lines)
            .select("value")
        )
        lines = head_kept.unionByName(tail)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = (
        lines.filter(F.trim("value") != "")
        .filter(~F.substring(F.trim("value"), 1, 1).isin(*_COMMENT_PREFIXES))
        .select(
            F.try_element_at(toks, F.lit(1)).try_cast("long").alias("a"),
            F.try_element_at(toks, F.lit(2)).try_cast("long").alias("b"),
            *(
                [
                    F.coalesce(
                        F.try_element_at(toks, F.lit(3)).try_cast("double"), F.lit(1.0)
                    ).alias("weight")
                ]
                if weighted
                else []
            ),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    return parsed


def edge_file_graph(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    skip_lines: int = 0,
    relabel: bool = True,
) -> GraphTables:
    """End-to-end: edge-list text file → canonical symmetric GraphTables.

    ``relabel=False`` keeps original vertex ids (valid when they are
    already dense 0-based, like the reference's bundled power-law
    graphs); True applies the contiguous dense relabel.
    """
    raw = read_edge_file(spark, path, weighted=weighted, skip_lines=skip_lines)
    return build_graph(raw, relabel=relabel, weight="weight" if weighted else None)
