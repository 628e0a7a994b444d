"""Temporal join operators: as-of join and interval (range) join.

Not in the CUDA reference (it is a single-algorithm engine); these are
the two join shapes every event/transcript pipeline needs and naive
SQL expresses only as inequality joins — which Spark executes as
BroadcastNestedLoopJoin (a scale-killer). Both operators here are
re-expressed as pure equi-join / window plans:

* :func:`asof_join` — "latest right row at-or-before each left row per
  key" via the union-and-running-last trick: tag both inputs, union,
  ONE window per key ordered by (ts, tag, seq), running ``last``
  (ignore-nulls) of a right-payload struct. One shuffle total, no
  range predicate, no per-key collect. The struct keeps the matched
  payload atomic (per-column running-last could tear a match whose
  payload contains genuine nulls).

* :func:`interval_join` — "facts contained in intervals" via bucket
  decomposition: each interval explodes to the fixed-width buckets it
  covers, each fact maps to its single bucket, and the match is an
  equi-join on bucket followed by the exact containment filter. A
  contained fact's bucket is by construction among its interval's
  buckets, and a fact has exactly ONE bucket, so every true pair
  appears exactly once — no distinct needed. Equi-join means shuffle
  hash join / AQE, never a nested-loop cross product.

Scale notes: asof_join shuffles once on the key (a hot key serializes
into one task — same caveat as any per-key window; salt upstream if a
single key exceeds a partition). interval_join's explode factor is
``interval_span / bucket`` — pick the bucket near the typical interval
length so the factor stays O(1); ``max_buckets`` fails loudly instead
of materializing a pathological explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    seq: str,
    payload: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    ``ts`` and ``seq`` must be numeric columns present UNDER THE SAME
    NAME in both inputs (rename upstream if they differ); ``ts`` is the
    join time (e.g. unix micros) and ``seq`` a per-side unique
    tiebreaker (an event id — only the order among same-key same-ts
    right rows matters).
    At equal ``ts`` the right row is considered prior (tag sorts right
    rows first), and among equal-ts right rows the highest ``seq``
    wins — a total, engine-independent order. Returns every left row
    (schema of ``left``) plus ``{prefix}{ts}``, ``{prefix}{seq}`` and
    ``{prefix}{c}`` for each payload column, all null when no right
    row precedes.
    """
    pay_cols = [seq, ts, *[c for c in payload if c not in (seq, ts)]]
    carry = [c for c in left.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(ts).alias("__ts"),
        F.col(seq).alias("__seq"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c).alias(c) for c in pay_cols]).alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
    )
    lft = left.select(
        F.col(on),
        F.col(ts).alias("__ts"),
        F.col(seq).alias("__seq"),
        F.lit(1).alias("__tag"),
        F.lit(None)
        .cast(r.schema["__pay"].dataType)
        .alias("__pay"),
        *[F.col(c) for c in carry],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lft.unionByName(r).withColumn(
        "__m", F.last("__pay", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__tag") == 1).select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in pay_cols],
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start: str,
    end: str,
    bucket: int,
    max_buckets: int = 1024,
) -> DataFrame:
    """Inner-join facts to the intervals containing them:
    ``start <= fact_ts <= end`` (inclusive both ends), all columns of
    both inputs carried through (names must not collide).

    ``fact_ts``/``start``/``end`` are non-negative numerics on one
    scale (unix micros); ``bucket`` is the decomposition width in the
    same unit. Each true (fact, interval) pair appears exactly once.
    Intervals wider than ``max_buckets * bucket`` raise at plan build
    rather than exploding unboundedly — widen the bucket instead.
    """
    span = intervals.select(
        # exact per-interval explode factor: the sequence below yields
        # (end div b) - (start div b) + 1 rows
        F.expr(f"{end} div {bucket} - {start} div {bucket} + 1").alias("b")
    ).agg(F.max("b"))
    worst = span.collect()[0][0]
    if worst is not None and worst > max_buckets:
        raise ValueError(
            f"interval covers up to {worst} buckets > max_buckets={max_buckets}; "
            f"raise `bucket` (currently {bucket})"
        )
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {bucket}"), F.expr(f"{end} div {bucket}")
            )
        ),
    )
    fx = facts.withColumn("__bkt", F.expr(f"{fact_ts} div {bucket}"))
    return (
        fx.join(iv, "__bkt")
        .filter((F.col(fact_ts) >= F.col(start)) & (F.col(fact_ts) <= F.col(end)))
        .drop("__bkt")
    )
