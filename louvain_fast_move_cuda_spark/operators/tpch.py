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


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation1: str = "NATION_1",
    nation2: str = "NATION_2",
    date_lo: str = "1995-01-01",
    date_hi: str = "1996-12-31",
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year — lines a
    supplier in one nation shipped to a customer in the other (either
    direction), within the date window.

    Plan: the nation dim broadcasts into both the supplier and customer
    sides; the two fact joins shuffle on their natural keys (orderkey,
    custkey); the date filter pushes to the lineitem scan. Revenue in
    exact e4 fixed-point."""
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    ))
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit(date_hi).cast("timestamp"))
        )
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, "s_nationkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, "c_nationkey")
        .filter(
            ((F.col("supp_nation") == nation1) & (F.col("cust_nation") == nation2))
            | ((F.col("supp_nation") == nation2) & (F.col("cust_nation") == nation1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue_e4).alias("revenue_e4"))
    )


def returned_item_reporting(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_lo: str = "1995-10-01",
    date_hi: str = "1996-01-01",
) -> DataFrame:
    """TPC-H Q10 (sans LIMIT 20): revenue lost to returned lineitems
    (l_returnflag = 'R') per customer for one quarter of orders. The
    top-N is omitted for the same reason as Q3 — ranking by a float
    aggregate is tie-unstable; the full group set compares exactly.

    Plan: nation broadcasts; orders filters on the quarter BEFORE
    joining lineitem; revenue in exact e4 fixed-point."""
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("n_name"),
            )),
            "c_nationkey",
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(revenue_e4).alias("revenue_e4"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "5-LOW"
) -> DataFrame:
    """TPC-H Q13 (adapted: the spec excludes orders by an o_comment
    pattern; this schema carries no comment column, so the exclusion
    filter is one order priority class instead — same plan shape):
    distribution of customers by order count, INCLUDING zero-order
    customers via the left join.

    Plan: one left join shuffled on custkey, two cascaded counts — the
    second groupBy is on the tiny order-count domain."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderpriority") != exclude_priority)
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def promotion_effect(
    lineitem: DataFrame,
    part: DataFrame,
    promo_type: str = "ECONOMY",
    date_lo: str = "1995-09-01",
    date_hi: str = "1995-10-01",
) -> DataFrame:
    """TPC-H Q14 (adapted: p_type here is a 6-value class column, so
    the PROMO%% prefix family is one class): one row — the share of one
    month's revenue from promo-class parts. Both sums are exact e4
    ints; the ratio is the only float, r9-rounded.

    Plan: part projects to (partkey, is-promo flag) and broadcasts if
    small (Catalyst/AQE decide); the month filter pushes to the
    lineitem scan."""
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(part.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(
            revenue_e4.alias("rev_e4"),
            (F.col("p_type") == promo_type).cast("long").alias("is_promo"),
        )
    )
    return j.agg(
        F.sum(F.col("rev_e4") * F.col("is_promo")).alias("promo_revenue_e4"),
        F.sum("rev_e4").alias("total_revenue_e4"),
        F.round(
            F.lit(100.0)
            * F.sum(F.col("rev_e4") * F.col("is_promo")).cast("double")
            / F.sum("rev_e4").cast("double"),
            9,
        ).alias("promo_pct_r9"),
    )


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over one quarter.
    Revenue is an exact e4 int, so the max-equality selection is
    deterministic (the spec's tie case returns all maxima, same here).

    Plan: one quarter-filtered groupBy on suppkey, a 1-row max
    aggregate broadcast back as the selection filter, one broadcast-
    sized supplier join."""
    revenue_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue_e4).alias("total_revenue_e4"))
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue_e4") == F.col("mx"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), "s_name", "total_revenue_e4"
        )
    )
