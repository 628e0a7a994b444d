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

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# HLL geometry: 2^8 = 256 registers; hashes are clamped to [0, 2^61) so
# every bit op below is plain nonneg integer arithmetic (identical in
# Spark SQL and DuckDB -- no engine-specific shift/sign semantics), and
# the scaled register sum stays inside BIGINT (256 * 2^54 = 2^62).
HLL_M = 256
_HLL_CLAMP = 2**61
_HLL_BODY_BITS = 53  # body = clamped hash without its low 8 index bits
_HLL_SCALE = 2**54  # sum(2^(54 - M_j)) == 2^54 * sum(2^-M_j), exactly


def hll_rank_sql(body: str, max_rank: int = _HLL_BODY_BITS) -> str:
    """Trailing-zero rank (position of the lowest set bit, 1-based) of a
    non-negative integer column as a CASE ladder of ``%`` tests -- the
    SAME SQL text evaluates on Spark (via F.expr) and DuckDB, so the
    geometric rank variable needs no engine bit-op parity argument.
    body == 0 (all 53 bits zero) gets the saturating rank max_rank+1."""
    branches = " ".join(
        f"WHEN {body} % {2 ** r} = {2 ** (r - 1)} THEN {r}"
        for r in range(1, max_rank + 1)
    )
    return f"CASE {branches} ELSE {max_rank + 1} END"


def hll_raw_est_sql(s: str) -> str:
    """alpha_256 * m^2 / sum(2^-M_j) with the register sum carried as the
    scaled BIGINT ``s`` = 2^54 * sum(2^-M_j): one double division total,
    every other factor an exact literal -- shared text for both engines."""
    # E-notation literals: both Spark and DuckDB parse plain decimal
    # literals as DECIMAL and disagree on decimal division; 0.7213E0
    # etc. are DOUBLE in both, so the whole tree is IEEE754
    return (
        "(0.7213E0 / (1.0E0 + 1.079E0 / 256.0E0)) * 65536.0E0"
        f" * 18014398509481984.0E0 / CAST({s} AS DOUBLE)"
    )


def hll_est_sql(s: str, zeros: str) -> str:
    """Raw estimate with Flajolet's small-range correction: linear
    counting m*ln(m/V) when the raw estimate <= 2.5m and V = empty
    registers > 0. The single ln() is the one non-division float op;
    callers round to 9 decimals (magnitude <= 256*ln(256) ~ 1420, so a
    cross-libm ulp cannot move the rounded value)."""
    raw = hll_raw_est_sql(s)
    return (
        f"CASE WHEN {raw} <= 640.0E0 AND {zeros} > 0 "
        f"THEN 256.0E0 * ln(256.0E0 / CAST({zeros} AS DOUBLE)) "
        f"ELSE {raw} END"
    )


def hll_registers(keyed: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """(group_cols..., idx, m) — the per-group HLL register table:
    register index = low 8 bits of the clamped hash, register value =
    max trailing-zero rank of the remaining bits over the group's
    occurrences. Only OCCUPIED registers are emitted (m >= 1 always; an
    absent (group, idx) row means register value 0), so the table is
    <= 256 rows per group. This IS the sketch's mergeable state: the
    register table of a union of streams is the elementwise max of the
    per-stream tables — the property both the partition-parallel batch
    path and the streaming maintainer (streaming/hll_stream.py) rely
    on."""
    gc = list(group_cols)
    u = F.pmod(F.col("h"), F.lit(_HLL_CLAMP))
    parts = keyed.select(*gc, u.alias("u")).select(
        *gc,
        (F.col("u") % F.lit(HLL_M)).alias("idx"),
        F.expr(f"(u - u % {HLL_M}) DIV {HLL_M}").alias("body"),
    )
    return (
        parts.withColumn("rank", F.expr(hll_rank_sql("body")))
        .groupBy(*gc, "idx")
        .agg(F.max("rank").alias("m"))
    )


def hll_summarize(regs: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """(group_cols..., n_zero_registers, s_scaled, raw_est, hll_est) —
    finalize a register table from ``hll_registers`` (or a max-merge of
    such tables) into the cardinality estimate. The register sum is
    carried as the exact scaled BIGINT sum(2^(54 - m)) with absent
    registers contributing 2^54; the only float ops are the one raw-
    estimate division and the small-range-branch ln, both r9-rounded."""
    gc = list(group_cols)
    term = F.expr(
        "CAST(18014398509481984.0E0 / power(2.0E0, CAST(m AS DOUBLE)) AS BIGINT)"
    )
    per = regs.groupBy(*gc).agg(
        F.sum(term).alias("s_obs"), F.count("*").alias("nreg")
    )
    j = per.select(
        *gc,
        (F.lit(HLL_M) - F.col("nreg")).alias("n_zero_registers"),
        (
            F.col("s_obs") + (F.lit(HLL_M) - F.col("nreg")) * F.lit(_HLL_SCALE)
        ).alias("s_scaled"),
    )
    raw = F.expr(hll_raw_est_sql("s_scaled"))
    est = F.expr(hll_est_sql("s_scaled", "n_zero_registers"))
    return j.select(
        *gc,
        "n_zero_registers",
        "s_scaled",
        F.round(raw, 9).alias("raw_est"),
        F.round(est, 9).alias("hll_est"),
    )


def hll_distinct(keyed: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Per-group HyperLogLog distinct-count sketch with the exact truth
    alongside: (group_cols..., n_exact, n_zero_registers, s_scaled,
    raw_est, hll_est, rel_err, within_bound).

    ``keyed``: group columns + ``h`` (xxhash64 of the sketched key --
    the materialized bridge, like cms/kmv). Register index = the hash's
    low 8 bits, register value = max over occurrences of the
    trailing-zero rank of the remaining bits: P(rank = r) = 2^-r, the
    textbook HLL geometric observable, but built from the SAME xxhash64
    primitive the repo's whole dedup/sketch family uses, so the DuckDB
    oracle replays every step bit-for-bit (the only float ops are one
    division and, on the small-range branch, one ln, both rounded to 9
    decimals).

    Sketch state is 256 registers x 1 byte per group -- mergeable by
    elementwise max, which is exactly what the groupBy(group, idx) max
    does across partitions (map-side partial max, then one 256-row-per-
    group shuffle). n_exact is the expensive two-stage count-distinct
    the sketch replaces at 100 TB, kept here so the estimator's error
    guarantee is a checked output column: within_bound pins
    |est - n| / n <= 0.26 (4 standard errors at m=256, sigma =
    1.04/sqrt(m) = 0.065; the linear-counting branch is strictly
    tighter). Like kmv_distinct, production callers drop the n_exact
    scan and keep the one sketch pass.
    """
    gc = list(group_cols)
    summ = hll_summarize(hll_registers(keyed, gc), gc)
    exact = keyed.groupBy(*gc).agg(F.countDistinct("h").alias("n_exact"))
    j = exact.join(summ, gc)
    # rel_err from the UNROUNDED estimate (re-derived exactly from the
    # integer state columns), matching the oracle's computation order
    est = F.expr(hll_est_sql("s_scaled", "n_zero_registers"))
    rel = F.when(F.col("n_exact") == 0, F.lit(0.0)).otherwise(
        F.abs(est - F.col("n_exact")) / F.col("n_exact")
    )
    return j.select(
        *gc,
        "n_exact",
        "n_zero_registers",
        "s_scaled",
        "raw_est",
        "hll_est",
        F.round(rel, 9).alias("rel_err"),
        (rel <= F.lit(0.26)).alias("within_bound"),
    )


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


def kmv_intersect(a: DataFrame, b: DataFrame, k: int = 1024) -> DataFrame:
    """One row: KMV set-operation estimates between two hash streams —
    (n_a, n_b, n_inter_exact, n_union_exact, k_used, tau, n_in_k,
    common_in_k, union_est, jaccard_est, inter_est, jacc_err,
    within_bound).

    The classic bottom-k set-similarity estimator (the theta-sketch
    intersection): sketch each stream as its k smallest distinct hashes,
    re-sketch the union of the two sketches (bottom-k again -> threshold
    tau = its max), and count survivors present in BOTH input sketches.
    jaccard_est = common_in_k / n_in_k is an unbiased Jaccard estimate;
    multiplied by the union's KMV cardinality estimate it yields the
    intersection size — the primitive behind sketch-based overlap audits
    (e.g. train/eval contamination screens) where the exact distinct
    intersection is a full shuffle of both corpora.

    State is O(k) per stream and mergeable (union + re-top-k), so at
    100 TB each side's sketch is a per-partition top-k + driver merge
    (TakeOrdered), and the set algebra runs on 3k rows. The exact
    n_inter/n_union (the expensive truth) are computed alongside so the
    estimator's error is a checked column: within_bound pins
    |jaccard_est - jaccard_exact| <= 4/sqrt(k) (~8 standard errors of
    the bottom-k Jaccard estimator). Deterministic given the hash; every
    float is a division of integer-valued doubles -> bit-exact oracle.
    """
    if k < 2:
        raise ValueError(f"kmv_intersect needs k >= 2, got {k}")
    da = a.select("h").distinct()
    db = b.select("h").distinct()
    ka = da.orderBy("h").limit(k)
    kb = db.orderBy("h").limit(k)
    ku = ka.unionAll(kb).distinct().orderBy("h").limit(k)
    kstats = ku.agg(F.max("h").alias("tau"), F.count("*").alias("n_in_k"))
    common = ku.join(ka, "h").join(kb, "h").agg(
        F.count("*").alias("common_in_k")
    )
    na = da.agg(F.count("*").alias("n_a"))
    nb = db.agg(F.count("*").alias("n_b"))
    ni = da.join(db, "h").agg(F.count("*").alias("n_inter_exact"))
    j = na.crossJoin(nb).crossJoin(ni).crossJoin(kstats).crossJoin(common)
    two64 = 18446744073709551616.0
    v = F.col("tau") / F.lit(two64) + F.lit(0.5)
    u_est = F.when(
        F.col("n_in_k") < k, F.col("n_in_k").cast("double")
    ).otherwise(F.lit(float(k - 1)) / v)
    j_est = F.when(F.col("n_in_k") == 0, F.lit(0.0)).otherwise(
        F.col("common_in_k") / F.col("n_in_k")
    )
    n_union = (F.col("n_a") + F.col("n_b") - F.col("n_inter_exact")).alias(
        "n_union_exact"
    )
    j_exact = F.when(
        F.col("n_a") + F.col("n_b") - F.col("n_inter_exact") == 0, F.lit(0.0)
    ).otherwise(
        F.col("n_inter_exact")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter_exact"))
    )
    err = F.abs(j_est - j_exact)
    bound = 4.0 / float(k) ** 0.5
    return j.select(
        "n_a",
        "n_b",
        "n_inter_exact",
        n_union,
        F.lit(k).alias("k_used"),
        "tau",
        "n_in_k",
        "common_in_k",
        F.round(u_est, 9).alias("union_est"),
        F.round(j_est, 9).alias("jaccard_est"),
        F.round(j_est * u_est, 9).alias("inter_est"),
        F.round(err, 9).alias("jacc_err"),
        (err <= F.lit(bound)).alias("within_bound"),
    )


def bloom_membership(build_pos: DataFrame, probe_pos: DataFrame) -> DataFrame:
    """One row: Bloom-filter membership screen of a probe key set
    against a build key set — (n_build, n_probe, n_true_members,
    n_bloom_positive, n_false_pos, n_false_neg, fp_rate,
    fp_bound_theoretical, no_false_negatives).

    ``build_pos`` / ``probe_pos``: (h, row_idx, bucket) tables from
    ``cms_buckets`` over each side's DISTINCT hash set — Bloom probe
    positions ARE CMS bucket coordinates (k salted xxhash64 rehashes
    into [0, m)), so the filter reuses the repo's one hash primitive
    and the materialized-bridge oracle pattern.

    The filter itself is the build side's distinct ``bucket`` set
    (<= m rows regardless of corpus size — at the default m = 2^20
    that is a <= 8 MB broadcast, which is exactly how a 1000-executor
    semi-join prefilter ships it); a probe key is bloom-positive iff
    ALL its distinct positions hit the set. The exact membership truth
    (distinct-hash semi-join — the shuffle the filter avoids at scale)
    is computed alongside: n_false_neg MUST be 0 (the Bloom hard
    guarantee, a checked column), and fp_rate is reported against the
    standard (1 - e^(-k*n/m))^k expectation. Deterministic given the
    hash, so the rate is a stable checked output, not a flaky sample.
    """
    bits = build_pos.select("bucket").distinct()
    build_keys = build_pos.select("h").distinct()
    # per probe key: every distinct position must be present in the set
    ppos = probe_pos.select("h", "bucket").distinct()
    hits = ppos.join(bits, "bucket")
    per_key = (
        ppos.groupBy("h")
        .agg(F.count("*").alias("n_pos"))
        .join(
            hits.groupBy("h").agg(F.count("*").alias("n_hit")), "h", "left"
        )
        .select(
            "h",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos")).alias(
                "positive"
            ),
        )
    )
    truth = per_key.join(
        build_keys.withColumn("member", F.lit(True)), "h", "left"
    ).select("h", "positive", F.coalesce("member", F.lit(False)).alias("member"))
    nb = build_keys.agg(F.count("*").alias("n_build"))
    agg = truth.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.col("member").cast("long")).alias("n_true_members"),
        F.sum(F.col("positive").cast("long")).alias("n_bloom_positive"),
        F.sum((F.col("positive") & ~F.col("member")).cast("long")).alias(
            "n_false_pos"
        ),
        F.sum((~F.col("positive") & F.col("member")).cast("long")).alias(
            "n_false_neg"
        ),
    )
    j = nb.crossJoin(agg)
    nonmembers = F.col("n_probe") - F.col("n_true_members")
    fp = F.when(nonmembers == 0, F.lit(0.0)).otherwise(
        F.col("n_false_pos") / nonmembers
    )
    # standard Bloom FP expectation for k=4, m=2^20 (the q_bloom
    # geometry) — informative, r9-rounded; the HARD invariant is
    # no_false_negatives
    bound = F.expr(
        "power(1.0E0 - exp(0.0E0 - (4.0E0 * CAST(n_build AS DOUBLE))"
        " / 1048576.0E0), 4.0E0)"
    )
    return j.select(
        "n_build",
        "n_probe",
        "n_true_members",
        "n_bloom_positive",
        "n_false_pos",
        "n_false_neg",
        F.round(fp, 9).alias("fp_rate"),
        F.round(bound, 9).alias("fp_bound_theoretical"),
        (F.col("n_false_neg") == 0).alias("no_false_negatives"),
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


def cms_heavy_hitters(buckets: DataFrame, threshold: int) -> DataFrame:
    """(h, true_cnt, cms_est, is_true_hh, no_underestimate) — every
    token hash whose COUNT-MIN estimate reaches ``threshold``, with its
    exact count alongside.

    The canonical sketch-as-prefilter pattern: the candidate set is
    found from the d*w cell table (broadcast-sized) plus one
    distinct-positions join, and only CANDIDATES pay the exact count —
    at 100 TB the full per-token exact count is the shuffle the sketch
    avoids, and CMS's one-sided error makes the screen SOUND:
    cms_est >= true_cnt always, so every true heavy hitter is in the
    candidate set (no false negatives — ``no_underestimate`` is the
    checked per-row invariant, bloom_membership's pattern for
    frequency). ``is_true_hh`` marks which candidates survive the exact
    verify; the false-positive tail is the price of d*w bits of state.
    """
    cells = cms_table(buckets)
    est = (
        buckets.select("h", "row_idx", "bucket")
        .distinct()
        .join(cells, ["row_idx", "bucket"])
        .groupBy("h")
        .agg(F.min("cnt").alias("cms_est"))
    )
    cand = est.filter(F.col("cms_est") >= F.lit(threshold))
    true_cnt = (
        buckets.filter(F.col("row_idx") == 0)
        .join(cand.select("h"), "h", "left_semi")
        .groupBy("h")
        .agg(F.count("*").alias("true_cnt"))
    )
    return cand.join(true_cnt, "h").select(
        "h",
        "true_cnt",
        "cms_est",
        (F.col("true_cnt") >= F.lit(threshold)).alias("is_true_hh"),
        (F.col("cms_est") >= F.col("true_cnt")).alias("no_underestimate"),
    )
