"""Table profiling: per-column null/distinct statistics.

The ANALYZE-style data-quality profile every warehouse runs before
trusting a table. One output row per profiled column: (column, n_rows,
n_nulls, n_distinct) — all exact integers (exact count(DISTINCT), not
approx_count_distinct, whose HLL sketch is engine-specific and could
never cross-check).

Scale: one aggregate pass PER COLUMN, unioned — deliberately not one
multi-distinct aggregate (Spark plans that as an Expand that multiplies
every input row by the number of distinct aggs). Each per-column pass
is a parquet scan pruned to that single column plus a two-stage
distinct count; passes are independent and pipeline through the
scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column (all
    columns by default). n_distinct counts distinct NON-NULL values."""
    cols = columns if columns is not None else df.columns
    out = None
    for c in cols:
        one = df.select(F.col(c).alias("v")).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_nulls"),
            F.countDistinct("v").alias("n_distinct"),
        ).select("column", "n_rows", "n_nulls", "n_distinct")
        out = one if out is None else out.unionByName(one)
    return out
