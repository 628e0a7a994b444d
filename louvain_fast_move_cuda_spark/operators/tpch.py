"""Classic TPC-H-style relational analytics over the warehouse tables.

Not in the CUDA reference (graph-only engine); these exercise the
multi-table join/aggregate surface every analytics engine needs, over
the driver's TPC-H-ish tables (lineitem/orders/customer/supplier/
nation/region). Declarative DataFrame plans — Catalyst owns join
order, AQE owns the physical strategy; the only explicit hints are
broadcasts of the guaranteed-tiny dims (region, nation).

Float determinism for the cross-engine oracles: the money columns are
2-decimal by construction, so the revenue aggregates run in EXACT
fixed-point integer arithmetic — cents for prices, basis points for
the discount/tax factors: ``rev_e4 = Σ ep_cents * (100 - disc_pct)``,
``charge_e6 = Σ ep_cents * (100 - disc_pct) * (100 + tax_pct)`` — all
under 2^60 at any SF here, summation-order-proof by construction.
Averages (small magnitude, noise ~1e-13) are r9-rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) pricing summary of lines
    shipped at-or-before ``cutoff``. One filter + one groupBy — pure
    map-side partial aggregation; the shuffle carries |flags×statuses|
    rows per partition."""
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    d_p = F.round(F.col("l_discount") * 100).cast("long")
    t_p = F.round(F.col("l_tax") * 100).cast("long")
    disc_e4 = ep_c * (F.lit(100) - d_p)
    charge_e6 = disc_e4 * (F.lit(100) + t_p)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(ep_c).alias("sum_base_price_c"),
            F.sum(disc_e4).alias("sum_disc_price_e4"),
            F.sum(charge_e6).alias("sum_charge_e6"),
            F.round(F.avg("l_quantity"), 9).alias("avg_qty_r9"),
            F.round(F.avg("l_extendedprice"), 9).alias("avg_price_r9"),
            F.round(F.avg("l_discount"), 9).alias("avg_disc_r9"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1996-03-15",
) -> DataFrame:
    """TPC-H Q3 (sans LIMIT): revenue of unshipped orders for one market
    segment — orders placed before ``date`` with lines shipped after it.
    The canonical top-N is omitted deliberately: selecting rows by a
    float rank is not engine-stable at ties, while the full group set
    compares exactly; callers sort client-side.

    Plan: two fact joins on their natural keys (custkey, orderkey) —
    co-partitioned shuffle joins AQE can size — with the filters pushed
    below each join."""
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(date).cast("timestamp"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(date).cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_e4).alias("revenue_e4"))
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5: per-nation revenue where customer and supplier share
    the nation, one region, one order-date year. Six-table join;
    region and nation ride explicit broadcasts (guaranteed tiny), the
    c_nationkey = s_nationkey constraint closes the loop after the
    supplier join so Catalyst keeps every step an equi-join."""
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == region_name)
        .groupBy("n_name")
        .agg(F.sum(revenue_e4).alias("revenue_e4"))
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    discount_pct: int = 6,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6: revenue increase from eliminating selected discounts —
    one filter + one global sum. The discount band is expressed in
    integer basis points (``discount_pct`` ± 1) so the predicate is
    exact, and the revenue Σ ep_cents·disc_pct runs in fixed-point e4
    like Q1. The whole query is a single scan with every predicate
    pushed to parquet; the shuffle carries ONE partial row per
    partition."""
    d_p = F.round(F.col("l_discount") * 100).cast("long")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * d_p
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_quantity") < F.lit(max_qty))
        )
        .filter(
            (d_p >= F.lit(discount_pct - 1)) & (d_p <= F.lit(discount_pct + 1))
        )
        .agg(
            F.coalesce(F.sum(rev_e4), F.lit(0)).alias("revenue_e4"),
            F.count("*").alias("n_lines"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 250,
) -> DataFrame:
    """TPC-H Q18: customers whose single orders exceed ``min_qty`` total
    quantity. The HAVING subquery is one partial-aggregated groupBy on
    the fact table; only the (tiny) qualifying order-key set joins back
    to orders/customer — broadcast-sized by construction at any SF,
    because qualifying orders are the extreme tail. All quantities are
    integers; o_totalprice bridges as exact cents."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(min_qty))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("o_totalprice_c"),
            "sum_qty",
        )
    )
