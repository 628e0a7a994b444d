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


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    max_size: int = 15,
    p_type_val: str = "SMALL",
) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp table in this schema — the
    part-supplier catalog is the DISTINCT (l_partkey, l_suppkey) pairs
    observed in lineitem, and the supply-cost proxy is s_acctbal in
    exact cents): for every part of one size/type class supplied from
    one region, the minimum-cost supplier(s), ties returned like the
    spec's.

    Plan: ONE distinct on the fact table's (partkey, suppkey) — the
    only big shuffle; part/supplier/nation/region all broadcast; the
    per-part min is a partial-aggregated groupBy joined back on exact
    cents equality (float-free, engine-stable)."""
    acct_c = F.round(F.col("s_acctbal") * 100).cast("long")
    supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == region_name)
        .select("s_suppkey", "s_name", "n_name", acct_c.alias("s_acctbal_c"))
    )
    parts = part.filter(
        (F.col("p_size") <= max_size) & (F.col("p_type") == p_type_val)
    ).select("p_partkey", "p_brand")
    catalog = (
        lineitem.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .distinct()
        .join(F.broadcast(parts), "p_partkey")
        .join(F.broadcast(supp), "s_suppkey")
    )
    best = (
        catalog.groupBy("p_partkey")
        .agg(F.min("s_acctbal_c").alias("min_acctbal_c"))
        .select(
            F.col("p_partkey").alias("bp_partkey"),
            "min_acctbal_c",
        )
    )
    return (
        catalog.join(
            best,
            (F.col("p_partkey") == F.col("bp_partkey"))
            & (F.col("s_acctbal_c") == F.col("min_acctbal_c")),
        )
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal_c")
    )


def order_priority_checking(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 (adapted: no commit/receipt dates in this schema — the
    spec's "late line" EXISTS predicate becomes a returned line,
    l_returnflag = 'R'): orders placed in one quarter that have at
    least one such line, counted per priority.

    Plan: the EXISTS is a left-semi join from the quarter-filtered
    orders to the flag-filtered lineitem — no duplication, no distinct;
    the final groupBy is on the 5-value priority domain."""
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    )
    late = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        q.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def national_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    nation_name: str = "NATION_1",
    region_name: str = "ASIA",
    p_type_val: str = "STANDARD",
    date_lo: str = "1995-01-01",
    date_hi: str = "1996-12-31",
) -> DataFrame:
    """TPC-H Q8: the share of one nation's suppliers in a region's
    order revenue for one part class, per order year. Numerator and
    denominator are exact e4 ints; only the final share is a float,
    r9-rounded.

    Plan: part filters then broadcasts into the lineitem scan (the
    biggest early kill); orders/customer shuffle on their keys; both
    nation lookups broadcast."""
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_regionkey").alias("c_regionkey"),
        )
    )
    j = (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_type") == p_type_val).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, "s_nationkey")
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate").filter(
            (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit(date_hi).cast("timestamp"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, "c_nationkey")
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("c_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == region_name)
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev_e4.alias("rev_e4"),
            (F.col("supp_nation") == nation_name).cast("long").alias("is_nat"),
        )
    )
    return j.groupBy("o_year").agg(
        F.sum(F.col("rev_e4") * F.col("is_nat")).alias("nation_revenue_e4"),
        F.sum("rev_e4").alias("total_revenue_e4"),
        F.round(
            F.sum(F.col("rev_e4") * F.col("is_nat")).cast("double")
            / F.sum("rev_e4").cast("double"),
            9,
        ).alias("mkt_share_r9"),
    )


def product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    p_type_val: str = "PROMO",
) -> DataFrame:
    """TPC-H Q9 (adapted: no ps_supplycost — the cost proxy is 10% of
    p_retailprice, exact in cents): profit per supplier nation per
    order year on one part class. amount_e4 = rev_e4 − qty·retail_c·10
    is an exact integer in both engines.

    Plan: part class filter broadcasts into the fact scan; orders joins
    only to provide the year; nation broadcasts."""
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    cost_e4 = (
        F.col("l_quantity").cast("long")
        * F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(10)
    )
    return (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_type") == p_type_val).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("s_nationkey"), "n_name"
            )),
            "s_nationkey",
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev_e4 - cost_e4).alias("profit_e4"))
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    nations: tuple = ("NATION_1", "NATION_2", "NATION_3"),
    fraction_bp: int = 1,
) -> DataFrame:
    """TPC-H Q11 (adapted: no partsupp — a part's "stock value" is the
    exact-cents Σ qty·p_retailprice over the lines shipped by suppliers
    of the given nations): parts whose value exceeds ``fraction_bp``
    basis points (1bp = 1/10000) of the total.

    Plan: supplier+nation broadcast-filter the fact scan; one groupBy
    on partkey; the HAVING threshold is a 1-row broadcast scalar
    compared in exact integer arithmetic (value·10000 > total·bp)."""
    val_c = F.col("l_quantity").cast("long") * F.round(
        F.col("p_retailprice") * 100
    ).cast("long")
    nat = F.broadcast(
        nation.filter(F.col("n_name").isin(*nations)).select(
            F.col("n_nationkey").alias("s_nationkey")
        )
    )
    per_part = (
        lineitem.join(
            F.broadcast(
                supplier.join(nat, "s_nationkey", "left_semi").select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(part.select("p_partkey", "p_retailprice"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(F.sum(val_c).alias("value_c"))
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * F.lit(10000) > F.col("total_c") * F.lit(fraction_bp))
        .select("p_partkey", "value_c")
    )


def shipping_priority_classes(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 (adapted: no l_shipmode / receipt dates — the mode
    split is the 3-value l_returnflag, the "late" window predicate is
    the shipdate year): per flag, how many high- vs low-priority orders
    had lines shipped in the window.

    Plan: one shuffle join on orderkey, conditional counts in one
    partial-aggregated groupBy on the 3-value flag domain."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).alias("high_line_count"),
            F.sum(F.lit(1) - hi).alias("low_line_count"),
        )
    )


def parts_supplier_relationship(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    brand_excl: str = "Brand#1",
    type_excl: str = "PROMO",
    sizes: tuple = (3, 9, 14, 19, 23, 36, 45, 49),
) -> DataFrame:
    """TPC-H Q16 (adapted: the catalog is lineitem's distinct
    (partkey, suppkey) pairs; the spec's complaint-supplier NOT IN is
    suppliers with negative account balance): distinct supplier count
    per (brand, type, size) over an 8-size class, excluding one brand
    and one type.

    Plan: part filter broadcasts into the distinct-pair build; the
    complaint exclusion is a broadcast anti-join; count_distinct rides
    one shuffle keyed by the (brand,type,size) group."""
    parts = F.broadcast(
        part.filter(
            (F.col("p_brand") != brand_excl)
            & (F.col("p_type") != type_excl)
            & (F.col("p_size").isin(*sizes))
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = F.broadcast(
        supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        lineitem.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .distinct()
        .join(parts, "p_partkey")
        .join(complaints, "s_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#2"
) -> DataFrame:
    """TPC-H Q17: yearly revenue that would be lost by dropping small
    orders — lines of one brand with quantity below 20% of that part's
    average quantity. The correlated avg is compared EXACTLY:
    qty < 0.2·(Σq/n)  ⇔  5·qty·n < Σq in integers — no float in the
    predicate; the /7 yearly average is the only float, r9-rounded.

    Plan: the per-part (Σq, n) aggregate is partial-aggregated then
    broadcast back into the brand-filtered scan."""
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    branded = lineitem.join(
        F.broadcast(
            part.filter(F.col("p_brand") == brand).select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    stats = branded.groupBy("p_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count("*").alias("n_q"),
    )
    small = branded.join(F.broadcast(stats), "p_partkey").filter(
        F.col("l_quantity").cast("long") * F.lit(5) * F.col("n_q") < F.col("sum_q")
    )
    return small.agg(
        F.coalesce(F.sum(ep_c), F.lit(0)).alias("total_price_c"),
        F.count("*").alias("n_lines"),
        F.round(
            F.coalesce(F.sum(ep_c), F.lit(0)).cast("double") / F.lit(700.0), 9
        ).alias("avg_yearly_r9"),
    )


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 (adapted: the container/shipmode legs of each disjunct
    drop — not in this schema; the brand × size-band × quantity-band
    OR-of-ANDs structure is intact): revenue from three
    brand/size/quantity windows.

    Plan: ONE join on partkey with the 3-way disjunction as the join
    residual; Catalyst pushes the shared (size ≤ 15, qty ≤ 30)
    envelope to both scans."""
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        lineitem.filter(q <= 30)
        .join(
            F.broadcast(
                part.filter(s <= 15).select("p_partkey", "p_brand", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            F.coalesce(F.sum(rev_e4), F.lit(0)).alias("revenue_e4"),
            F.count("*").alias("n_lines"),
        )
    )


def potential_part_promotion(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    p_type_val: str = "PROMO",
    region_name: str = "EUROPE",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 (adapted: no ps_availqty — a supplier "has excess
    stock" when its year's shipped quantity of the part class exceeds
    HALF the average over the region's active suppliers): suppliers in
    one region with above-half-average shipped volume of one part
    class. The threshold compares exactly: 2·q·n > Σq in integers.

    Plan: part-class and region supplier sets broadcast into the
    year-filtered scan; one groupBy on suppkey; the global (Σq, n)
    scalar broadcasts back."""
    region_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_type") == p_type_val).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(region_supp.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    scalar = per_supp.agg(
        F.sum("qty").alias("tot_q"), F.count("*").alias("n_supp")
    )
    return (
        per_supp.join(F.broadcast(scalar))
        .filter(F.col("qty") * F.lit(2) * F.col("n_supp") > F.col("tot_q"))
        .join(F.broadcast(region_supp), "s_suppkey")
        .select("s_suppkey", "s_name", "n_name", "qty")
    )


def suppliers_kept_waiting(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q21 (adapted: the late-delivery predicate is a returned
    line, l_returnflag = 'R', like Q4): per supplier of one region, the
    number of finished ('F') multi-supplier orders where THIS supplier
    was the only one with a returned line. The spec's EXISTS /
    NOT-EXISTS pair is computed as per-order distinct-supplier counts —
    one aggregation instead of two correlated self-joins, identical
    semantics.

    Plan: one shuffle join lineitem×orders(F), one groupBy per order
    computing (n_suppliers, n_returning_suppliers), then the returning
    (order, supplier) pairs filter against it; supplier/nation/region
    broadcast at the end."""
    base = (
        lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    per_order = base.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    ret_pairs = (
        base.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    region_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        ret_pairs.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(
            F.broadcast(region_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


def global_sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    nationkeys: tuple = (1, 3, 5, 13, 17, 21, 23),
    priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q22 (adapted: no c_phone — the spec's country-code
    substring is c_nationkey over a 7-key set; every customer here has
    orders, so the spec's "no orders" NOT EXISTS is "no ``priority``
    orders"): customers of those nations with no urgent orders and an
    account balance above the positive average of the group, counted
    and summed per nation. The
    above-average predicate compares exactly: bal_c·n > Σbal_c in
    cents-integers; balances aggregate as exact cents.

    Plan: the positive-average scalar broadcasts; the "no orders" NOT
    EXISTS is a left-anti join on custkey; final groupBy on the 7-key
    domain."""
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pool = customer.filter(F.col("c_nationkey").isin(*nationkeys)).select(
        "c_custkey", "c_nationkey", bal_c.alias("bal_c")
    )
    scalar = pool.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_pos_c"), F.count("*").alias("n_pos")
    )
    return (
        pool.join(F.broadcast(scalar))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos_c"))
        .join(
            orders.filter(F.col("o_orderpriority") == priority).select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
    )
