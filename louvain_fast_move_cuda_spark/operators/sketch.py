"""Count-min sketch over the token stream — deterministic, cross-engine
checkable.

The classic sublinear frequency summary: a d x w integer matrix where
row r counts tokens by ``bucket_r = pmod(xxhash64(h, r), w)``. Unlike
HLL/CMS library implementations (engine-private hash mixes), every
quantity here is a deterministic integer derived from the SAME xxhash64
primitive the repo's dedup family materializes, so the whole pipeline
downstream of the hash — bucket counting, the min-over-rows point
query, and the CMS >= true-count overestimate guarantee — is an exact
side-by-side check.

Scale: building the sketch is one explode(d) + groupBy on (row,
bucket) — d*w cells of state regardless of corpus size (the entire
point of the sketch); point queries join the queried tokens' buckets
against the cell table (broadcast-sized for any practical d*w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_buckets(tok: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """(h, row_idx, bucket) — each token-hash occurrence mapped to its
    bucket in every sketch row."""
    cols = [
        F.pmod(F.xxhash64("h", F.lit(r)), F.lit(width)).alias(f"b{r}")
        for r in range(depth)
    ]
    return tok.select("h", F.posexplode(F.array(*cols)).alias("row_idx", "bucket"))


def cms_table(buckets: DataFrame) -> DataFrame:
    """(row_idx, bucket, cnt) — the sketch matrix as rows."""
    return buckets.groupBy("row_idx", "bucket").agg(F.count("*").alias("cnt"))


def cms_point_queries(buckets: DataFrame, top_n: int = 20) -> DataFrame:
    """(h, true_cnt, cms_est, overestimate) for the ``top_n`` most
    frequent token hashes (ties -> lowest hash): cms_est = min over
    rows of the token's cell counts; the sketch guarantees
    overestimate = cms_est - true_cnt >= 0.
    """
    d = int(buckets.agg(F.countDistinct("row_idx")).collect()[0][0])
    true_cnt = (
        buckets.filter(F.col("row_idx") == 0)
        .groupBy("h")
        .agg(F.count("*").alias("true_cnt"))
    )
    top = true_cnt.orderBy(F.desc("true_cnt"), F.asc("h")).limit(top_n)
    cells = cms_table(buckets)
    # each queried token's bucket per row (one row per (h, row_idx))
    qb = (
        buckets.join(F.broadcast(top.select("h")), "h")
        .select("h", "row_idx", "bucket")
        .distinct()
    )
    est = (
        qb.join(cells, ["row_idx", "bucket"])
        .groupBy("h")
        .agg(F.min("cnt").alias("cms_est"), F.count("*").alias("n_rows_seen"))
        .filter(F.col("n_rows_seen") == d)
        .drop("n_rows_seen")
    )
    return (
        top.join(est, "h")
        .select(
            "h",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
        )
    )
