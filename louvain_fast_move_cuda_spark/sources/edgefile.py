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
first N physical lines of every input file) is the one imperative bit:
line position is a file-order concept DataFrames don't model, so it
reads via the Hadoop text format whose record key IS the in-file byte
offset, and drops the first N records of each file's offset-0 split —
still streaming, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
        # PER-FILE header skip. spark.read.text exposes neither the file
        # nor the byte offset a partition starts at, so go to the Hadoop
        # text input format directly: each record is (byte offset within
        # its file, line) and each partition is one FileSplit of ONE
        # file — the split whose first record sits at offset 0 holds
        # that file's head. Dropping the first N records of exactly
        # those splits skips N lines of EVERY input file (directory and
        # glob paths included), not just one of them. Headers are
        # assumed to fit the file's first split (< maxPartitionBytes —
        # trivially true for real edge-file headers). Still fully
        # streaming: nothing is collected.
        sc = spark.sparkContext
        n_skip = skip_lines
        pairs = sc.newAPIHadoopFile(
            path,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )

        def drop_head(it):
            is_head_split = None
            for i, (off, line) in enumerate(it):
                if is_head_split is None:
                    is_head_split = off == 0
                if is_head_split and i < n_skip:
                    continue
                yield (line,)

        lines = spark.createDataFrame(
            pairs.mapPartitions(drop_head, preservesPartitioning=True),
            lines.schema,
        )
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
