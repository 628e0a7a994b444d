"""Sublinear sketches over hash streams — deterministic, cross-engine
checkable: count-min (frequency), KMV/bottom-k (distinct count), and a
hash-min sample quantile sketch (order statistics). Each one carries
its own exactly-computed ground truth so the sketch's error guarantee
is part of the checked output.

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


def kmv_distinct(tok: DataFrame, k: int = 1024) -> DataFrame:
    """One row: (n_exact, k_used, n_in_k, kth_h, kmv_est, rel_err,
    within_bound) — K-minimum-values (bottom-k / Theta-style) distinct
    sketch over an (…, h) hash stream.

    The sketch state is the k smallest DISTINCT hash values — O(k)
    regardless of stream size, mergeable by union+re-top-k (how a
    1000-executor run combines per-partition sketches; Spark's
    TakeOrdered does exactly that merge here, no full sort). The kth
    smallest signed-64 hash maps to position v = h/2^64 + 0.5 in (0,1);
    the classic unbiased estimator is (k-1)/v. When the stream holds
    fewer than k distinct hashes the sketch degenerates to an exact
    count (it holds every value), so kmv_est = n_in_k.

    Like cms_point_queries, the exact distinct count is ALSO computed
    (one two-stage count-distinct — the expensive truth the sketch
    replaces at 100 TB) so the relative-error guarantee is a checked
    output column, not a claim: within_bound pins |est-n|/n <= 8/sqrt(k)
    (~8 standard errors of the KMV estimator; deterministic given the
    hash function). Every downstream quantity is the same IEEE
    expression tree in ANSI SQL, so the DuckDB oracle matches bit-exactly.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct needs k >= 2, got {k}")
    dh = tok.select("h").distinct()
    kth = (
        dh.orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth_h"), F.count("*").alias("n_in_k"))
    )
    stats = dh.agg(F.count("*").alias("n_exact"))
    two64 = 18446744073709551616.0
    v = F.col("kth_h") / F.lit(two64) + F.lit(0.5)
    est = F.when(F.col("n_in_k") < k, F.col("n_in_k").cast("double")).otherwise(
        F.lit(float(k - 1)) / v
    )
    rel = F.when(F.col("n_exact") == 0, F.lit(0.0)).otherwise(
        F.abs(est - F.col("n_exact")) / F.col("n_exact")
    )
    bound = 8.0 / float(k) ** 0.5
    return stats.crossJoin(kth).select(
        "n_exact",
        F.lit(k).alias("k_used"),
        "n_in_k",
        "kth_h",
        F.round(est, 9).alias("kmv_est"),
        F.round(rel, 9).alias("rel_err"),
        (rel <= F.lit(bound)).alias("within_bound"),
    )


def quantile_sketch(
    hv: DataFrame, k: int = 1024, quantiles: tuple = (25, 50, 75, 90, 99)
) -> DataFrame:
    """(q_pct, est_value, n, rank_lo, rank_hi, rank_err, within_bound)
    — approximate quantiles from a deterministic hash-min sample, with
    the sample's rank error against the FULL data computed exactly.

    ``hv``: (h, value) with h a row-key hash (the materialized bridge)
    and value non-null. The sample is the k rows with the smallest
    (h, value) — a uniform-without-replacement sample that is a pure
    function of the data (no RNG), built by TakeOrdered (per-partition
    top-k + driver merge, never a full sort). est for quantile q is the
    type-1 order statistic of the sample at rank ceil(q/100 * s_n).

    The check pass joins the (<= |quantiles|)-row estimate table back
    to the full data ONCE (broadcast + conditional sums) to compute the
    estimate's exact rank interval [rank_lo+1, rank_hi] and the rank
    error as a fraction of n; within_bound pins it to 2/sqrt(k) (~the
    DKW envelope for a size-k sample). At 100 TB the sample pass and
    the check pass are each one scan; production callers drop the check
    and keep the first scan only.
    """
    if k < 1:
        raise ValueError(f"quantile_sketch needs k >= 1, got {k}")
    from pyspark.sql import Window

    spark = hv.sparkSession
    s = hv.orderBy("h", "value").limit(k)
    # k rows at most: a global window here is bounded, not a scale risk
    w_all = Window.partitionBy(F.lit(0))
    samp = s.select(
        "value",
        F.row_number().over(w_all.orderBy("value", "h")).alias("r"),
        F.count("*").over(w_all).alias("s_n"),
    )
    qdf = spark.createDataFrame([(int(q),) for q in quantiles], "q_pct int")
    target_r = F.greatest(
        F.lit(1), F.ceil(F.col("q_pct") / F.lit(100.0) * F.col("s_n"))
    )
    est = (
        qdf.crossJoin(samp)
        .filter(F.col("r") == target_r)
        .select("q_pct", F.col("value").alias("est_value"))
    )
    checked = (
        hv.crossJoin(F.broadcast(est))
        .groupBy("q_pct", "est_value")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") < F.col("est_value")).cast("long")).alias("rank_lo"),
            F.sum((F.col("value") <= F.col("est_value")).cast("long")).alias("rank_hi"),
        )
    )
    t = F.ceil(F.col("q_pct") / F.lit(100.0) * F.col("n"))
    err = (
        F.when(t < F.col("rank_lo") + 1, (F.col("rank_lo") + 1 - t) / F.col("n"))
        .when(t > F.col("rank_hi"), (t - F.col("rank_hi")) / F.col("n"))
        .otherwise(F.lit(0.0))
    )
    bound = 2.0 / float(k) ** 0.5
    return checked.select(
        "q_pct",
        "est_value",
        "n",
        "rank_lo",
        "rank_hi",
        F.round(err, 9).alias("rank_err"),
        (err <= F.lit(bound)).alias("within_bound"),
    )
