"""As-of join and interval join vs hand oracles (operators/joins.py).

No CUDA-reference counterpart; the driver gate re-checks both against
ANSI-SQL formulations (window running-last / inequality join) at sf0.01.
"""

import pytest
from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.operators.joins import asof_join, interval_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 10),  # after r-ties at ts=100 -> highest seq wins
            (1, 99, 11),   # before every right row -> null match
            (1, 250, 12),  # latest right at-or-before is ts=200
            (2, 500, 13),  # other key: only key-2 right rows visible
        ],
        "user_id long, ts_us long, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 1, 5.0),
            (1, 100, 2, 6.0),   # equal-ts tie: seq=2 wins
            (1, 200, 3, None),  # null payload value must NOT tear
            (2, 400, 4, 8.0),
        ],
        "user_id long, ts_us long, event_id long, value double",
    )
    return left, right


def test_asof_join_ties_nulls_and_keys(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts_us", seq="event_id",
        payload=["value"], prefix="m_",
    )
    got = {r.event_id: (r.m_event_id, r.m_ts_us, r.m_value) for r in out.collect()}
    assert got[10] == (2, 100, 6.0)  # equal ts counts as prior; highest seq
    assert got[11] == (None, None, None)
    # struct-atomic match: value is the matched row's NULL, not a stale 6.0
    assert got[12] == (3, 200, None)
    assert got[13] == (4, 400, 8.0)
    assert out.count() == left.count()


def test_asof_join_single_shuffle_no_range_join(spark):
    left, right = _sides(spark)
    df = asof_join(
        left, right, on="user_id", ts="ts_us", seq="event_id", payload=["value"]
    )
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # exactly one exchange: the window's hashpartitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_boundaries_exactly_once(spark):
    facts = spark.createDataFrame(
        [(0, 100), (1, 150), (2, 200), (3, 201), (4, 99)],
        "fid long, ts long",
    )
    ivs = spark.createDataFrame(
        [(10, 100, 200), (11, 150, 150)], "iid long, s long, e long"
    )
    out = interval_join(facts, ivs, fact_ts="ts", start="s", end="e", bucket=7)
    got = sorted((r.fid, r.iid) for r in out.collect())
    # inclusive both ends; 99 and 201 excluded; each true pair once
    assert got == [(0, 10), (1, 10), (1, 11), (2, 10)]


def test_interval_join_max_buckets_guard(spark):
    facts = spark.createDataFrame([(0, 5)], "fid long, ts long")
    ivs = spark.createDataFrame([(1, 0, 10_000)], "iid long, s long, e long")
    with pytest.raises(ValueError, match="max_buckets"):
        interval_join(facts, ivs, "ts", "s", "e", bucket=2, max_buckets=16)


def test_interval_join_matches_naive_inequality(spark):
    # deterministic pseudo-random micro-case, checked against the naive
    # inequality join computed on the same session
    facts = spark.range(200).select(
        F.col("id").alias("fid"), ((F.col("id") * 37) % 1000).alias("ts")
    )
    ivs = spark.range(40).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 53) % 900).alias("s"),
        (((F.col("id") * 53) % 900) + (F.col("id") % 60)).alias("e"),
    )
    fast = sorted(
        (r.fid, r.iid)
        for r in interval_join(facts, ivs, "ts", "s", "e", bucket=32).collect()
    )
    naive = sorted(
        (r.fid, r.iid)
        for r in facts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
        .collect()
    )
    assert fast == naive and len(fast) > 0
