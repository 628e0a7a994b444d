"""Iceberg table sink for checkpoint state — used when the runtime has
the Iceberg Spark extension on the classpath, with a transparent
parquet fallback otherwise.

The north rule names Iceberg as the checkpoint table format. This
sandbox's Spark distribution ships no `iceberg-spark-runtime` jar (and
has no network to fetch one), so `SuperstepCheckpointer` /
`VertexIterationCheckpointer` default to the parquet + atomic-manifest
layout in checkpoint.py — same commit discipline (data first, marker
last), same resume contract. This module is the production seam: on a
cluster submitted with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
        --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
        --conf spark.sql.catalog.ckpt=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.ckpt.type=hadoop \\
        --conf spark.sql.catalog.ckpt.warehouse=<path> ...

`iceberg_available()` flips true and `write_state` / `read_state`
become real Iceberg table commits: each superstep is one atomic
`writeTo(...).createOrReplace()` snapshot, per-partition lineage comes
from the table's own `.files` metadata instead of a hand-rolled JSON,
and resume reads the latest committed snapshot. Both backends expose
the same (algo, step) -> DataFrame contract, so swapping the
checkpointers' parquet reads/writes for these functions is a local
change inside plans/ — no algorithm code touches the storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "ckpt") -> bool:
    """True iff an Iceberg catalog named ``catalog`` is configured AND the
    Iceberg classes are on the JVM classpath."""
    conf = spark.conf
    impl = None
    try:
        impl = conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl or "iceberg" not in impl.lower():
        return False
    try:
        # classpath probe — raises if the runtime jar is absent
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def table_name(catalog: str, algo: str, step: int) -> str:
    return f"{catalog}.checkpoints.{algo}_step_{step}"


def write_state(
    df: DataFrame, catalog: str, algo: str, step: int
) -> str:
    """Atomically commit one superstep's state as an Iceberg snapshot.

    createOrReplace is a single metadata swap: a reader either sees the
    previous committed snapshot or the new one, never a torn write —
    the same invariant checkpoint.py enforces with its manifest rename.
    """
    name = table_name(catalog, algo, step)
    df.writeTo(name).using("iceberg").createOrReplace()
    return name


def read_state(spark: SparkSession, catalog: str, algo: str, step: int) -> DataFrame:
    return spark.read.table(table_name(catalog, algo, step))


def partition_lineage(spark: SparkSession, catalog: str, algo: str, step: int):
    """Per-file row counts from Iceberg's own metadata tables (replaces
    the _META.json 'state_partitions' map): (file_path, record_count)."""
    name = table_name(catalog, algo, step)
    return spark.sql(
        f"SELECT file_path, record_count FROM {name}.files"
    )
