"""TPC-H-style relational queries vs hand oracles (operators/tpch.py).

The driver gate re-checks all three against canonical SQL in DuckDB at
sf0.01; these pin the fixed-point arithmetic and plan shapes on tiny
hand data.
"""

import datetime as dt

from pyspark.sql import functions as F

from louvain_fast_move_cuda_spark.operators.tpch import (
    local_supplier_volume,
    pricing_summary,
    shipping_priority,
)


def test_pricing_summary_fixed_point_by_hand(spark):
    d = dt.datetime(1998, 1, 1)
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 2.0, 10.00, 0.05, 0.02, "A", "F", d),
            (2, 1, 1, 1, 3.0, 20.50, 0.00, 0.10, "A", "F", d),
            # past the cutoff -> excluded
            (3, 1, 1, 1, 1.0, 99.99, 0.00, 0.00, "A", "F", dt.datetime(1999, 1, 1)),
            (4, 1, 1, 1, 5.0, 1.01, 0.10, 0.00, "R", "O", d),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    )
    got = {(r.l_returnflag, r.l_linestatus): r for r in pricing_summary(li).collect()}
    af = got[("A", "F")]
    # cents: 1000 + 2050; disc e4: 1000*95 + 2050*100; charge e6 adds tax
    assert (af.sum_qty, af.count_order) == (5, 2)
    assert af.sum_base_price_c == 3050
    assert af.sum_disc_price_e4 == 1000 * 95 + 2050 * 100
    assert af.sum_charge_e6 == 1000 * 95 * 102 + 2050 * 100 * 110
    ro = got[("R", "O")]
    assert ro.sum_disc_price_e4 == 101 * 90
    assert ro.avg_disc_r9 == 0.1


def _mini_warehouse(spark):
    d96 = dt.datetime(1996, 6, 1)
    cust = spark.createDataFrame(
        [(1, "c1", 10, 0.0, "BUILDING"), (2, "c2", 20, 0.0, "AUTOMOBILE")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(100, 1, "O", 1.0, dt.datetime(1996, 3, 1), "1-URGENT"),
         (200, 2, "O", 1.0, d96, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp_ntz, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (100, 1, 7, 1, 1.0, 10.00, 0.00, 0.0, "N", "O", dt.datetime(1996, 4, 1)),
            (100, 1, 8, 2, 1.0, 30.00, 0.50, 0.0, "N", "O", dt.datetime(1996, 5, 1)),
            # shipped BEFORE the Q3 date -> excluded there
            (100, 1, 7, 3, 1.0, 70.00, 0.00, 0.0, "N", "O", dt.datetime(1996, 1, 1)),
            (200, 1, 9, 1, 1.0, 50.00, 0.10, 0.0, "N", "O", d96),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    )
    supp = spark.createDataFrame(
        [(7, "s7", 10, 0.0), (8, "s8", 30, 0.0), (9, "s9", 20, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 1), (20, "INDIA", 1), (30, "FRANCE", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(1, "ASIA"), (2, "EUROPE")], "r_regionkey long, r_name string"
    )
    return cust, orders, li, supp, nation, region


def test_shipping_priority_filters(spark):
    cust, orders, li, *_ = _mini_warehouse(spark)
    rows = shipping_priority(cust, orders, li).collect()
    # only order 100 (BUILDING cust, ordered before, shipped after);
    # line 3 shipped before the date is excluded from revenue
    assert len(rows) == 1
    r = rows[0]
    assert r.l_orderkey == 100
    assert r.revenue_e4 == 1000 * 100 + 3000 * 50


def test_local_supplier_volume_nation_loop(spark):
    out = {r.n_name: r.revenue_e4
           for r in local_supplier_volume(*_mini_warehouse(spark)).collect()}
    # order 100: line via s7 (nation 10 = cust nation) counts for JAPAN;
    # line via s8 (FRANCE, EUROPE) fails both the loop and the region.
    # order 200: s9 nation 20 = cust 2 nation -> INDIA.
    assert out == {"JAPAN": 1000 * 100 + 7000 * 100, "INDIA": 5000 * 90}


def test_forecast_revenue_change_band_and_bounds(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import forecast_revenue_change

    d = dt.datetime(1996, 6, 1)
    rows = [
        # in band (5-7%), qty < 24 -> counted
        (1, 1, 1, 1, 10.0, 100.00, 0.06, 0.0, "A", "F", d),
        (2, 1, 1, 1, 23.0, 50.00, 0.05, 0.0, "A", "F", d),
        # discount out of band -> excluded
        (3, 1, 1, 1, 10.0, 100.00, 0.08, 0.0, "A", "F", d),
        # quantity at the bound -> excluded (strict <)
        (4, 1, 1, 1, 24.0, 100.00, 0.06, 0.0, "A", "F", d),
        # outside the date window -> excluded
        (5, 1, 1, 1, 10.0, 100.00, 0.06, 0.0, "A", "F", dt.datetime(1997, 6, 1)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    r = forecast_revenue_change(li).collect()[0]
    assert r.n_lines == 2
    assert r.revenue_e4 == 10000 * 6 + 5000 * 5  # cents * pct


def test_large_volume_customers_having_threshold(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import large_volume_customers

    d = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 200.0, 1.0, 0.0, 0.0, "A", "F", d),
         (1, 2, 1, 2, 60.0, 1.0, 0.0, 0.0, "A", "F", d),
         (2, 1, 1, 1, 250.0, 1.0, 0.0, 0.0, "A", "F", d)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(1, 7, "O", 1234.56, d, "1-URGENT"), (2, 8, "O", 99.99, d, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(7, "Alice", 1, 0.0, "BUILDING"), (8, "Bob", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    got = large_volume_customers(cust, orders, li, min_qty=250).collect()
    # order 1 sums to 260 (> 250); order 2 is exactly 250 -> excluded
    assert len(got) == 1
    r = got[0]
    assert (r.c_name, r.o_orderkey, r.sum_qty, r.o_totalprice_c) == ("Alice", 1, 260, 123456)


def _mini_warehouse2(spark):
    d = dt.datetime
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 1), (2, "NATION_2", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 1, 0.0), (11, "S11", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(20, "C20", 2, 5.0, "BUILDING"), (21, "C21", 1, 6.0, "AUTO"),
         (22, "C22", 0, 7.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(100, 20, "O", 1.0, d(1995, 11, 1), "1-URGENT"),
         (101, 21, "O", 2.0, d(1995, 11, 2), "5-LOW"),
         (102, 20, "O", 3.0, d(1997, 1, 1), "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [  # (okey, pkey, skey, ln, qty, ep, disc, tax, rf, ls, ship)
            (100, 1, 10, 1, 1.0, 10.00, 0.10, 0.0, "R", "O", d(1995, 11, 10)),
            (100, 2, 11, 2, 1.0, 20.00, 0.00, 0.0, "N", "O", d(1995, 11, 11)),
            (101, 1, 10, 1, 1.0, 40.00, 0.00, 0.0, "R", "O", d(1996, 2, 1)),
            (102, 2, 11, 1, 1.0, 80.00, 0.50, 0.0, "R", "O", d(1997, 2, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    )
    part = spark.createDataFrame(
        [(1, "P1", "B1", "ECONOMY", 1, 1.0), (2, "P2", "B2", "SMALL", 2, 2.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    return nation, supplier, customer, orders, lineitem, part


def test_volume_shipping_directions_and_window(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import volume_shipping

    nation, supplier, customer, orders, lineitem, part = _mini_warehouse2(spark)
    rows = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue_e4
        for r in volume_shipping(
            supplier, lineitem, orders, customer, nation
        ).collect()
    }
    # line (100,1): supp N1 -> cust N2, 1995, 1000*90; line (100,2): supp
    # N2 -> cust N2 (same nation, excluded); line (101,1): supp N1 ->
    # cust N1 excluded; (102): shipped 1997, outside window
    assert rows == {("NATION_1", "NATION_2", 1995): 1000 * 90}


def test_returned_item_reporting_quarter_and_flag(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import returned_item_reporting

    nation, supplier, customer, orders, lineitem, part = _mini_warehouse2(spark)
    rows = {r.c_custkey: r for r in returned_item_reporting(
        customer, orders, lineitem, nation
    ).collect()}
    # order 100 (1995-11, cust 20): only line 1 is 'R' -> 1000*90; order
    # 101 in quarter but its 'R' line belongs to cust 21 -> 4000*100;
    # order 102 outside the quarter
    assert rows[20].revenue_e4 == 1000 * 90 and rows[20].n_name == "NATION_2"
    assert rows[21].revenue_e4 == 4000 * 100
    assert set(rows) == {20, 21}


def test_customer_order_distribution_zero_and_exclusion(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import (
        customer_order_distribution,
    )

    nation, supplier, customer, orders, lineitem, part = _mini_warehouse2(spark)
    rows = {r.c_count: r.custdist for r in customer_order_distribution(
        customer, orders
    ).collect()}
    # cust 20 has orders 100+102 (both non-5-LOW) -> c_count 2; cust 21's
    # only order is 5-LOW -> 0; cust 22 has none -> 0
    assert rows == {2: 1, 0: 2}


def test_promotion_effect_ratio(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import promotion_effect

    nation, supplier, customer, orders, lineitem, part = _mini_warehouse2(spark)
    r = promotion_effect(
        lineitem, part, date_lo="1995-11-01", date_hi="1995-12-01"
    ).collect()[0]
    # in window: line (100,1) promo 1000*90, line (100,2) non-promo 2000*100
    assert r.promo_revenue_e4 == 90000 and r.total_revenue_e4 == 290000
    assert abs(r.promo_pct_r9 - round(100.0 * 90000 / 290000, 9)) == 0.0


def test_top_supplier_max_and_ties(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import top_supplier

    nation, supplier, customer, orders, lineitem, part = _mini_warehouse2(spark)
    got = top_supplier(
        supplier, lineitem, date_lo="1995-11-01", date_hi="1996-03-01"
    ).collect()
    # window revenue: S10 = 1000*90 + 4000*100 = 490000, S11 = 2000*100
    assert [(r.s_suppkey, r.total_revenue_e4) for r in got] == [(10, 490000)]
    # exact-int tie -> both suppliers returned
    li2 = lineitem.filter(F.col("l_orderkey") == 100)  # 90000 vs 200000
    got2 = top_supplier(supplier, li2, date_lo="1995-11-01", date_hi="1996-03-01")
    assert got2.count() == 1 and got2.collect()[0].s_suppkey == 11


def _mini_parts(spark):
    return spark.createDataFrame(
        [
            (1, "p1", "Brand#1", "SMALL", 5, 950.00),
            (2, "p2", "Brand#2", "SMALL", 10, 900.00),
            (3, "p3", "Brand#2", "PROMO", 20, 999.90),
            (4, "p4", "Brand#3", "STANDARD", 14, 910.00),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


def test_min_cost_supplier_ties_and_region(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import min_cost_supplier

    _, _, li, supp, nation, region = _mini_warehouse(spark)
    part = _mini_parts(spark)
    # suppliers s7/s8/s9 shipped part 1 (li rows); only s8 sits in
    # EUROPE (FRANCE); part 1 is size-5 SMALL -> qualifies
    rows = min_cost_supplier(
        part, supp, nation, region, li, region_name="EUROPE",
        max_size=15, p_type_val="SMALL",
    ).collect()
    assert [(r.p_partkey, r.s_name, r.n_name, r.s_acctbal_c) for r in rows] == [
        (1, "s8", "FRANCE", 0)
    ]
    # in ASIA both s7 (acctbal 0) and s9 (acctbal 0) supply part 1 ->
    # the exact-cents min keeps BOTH tie rows, spec-style
    asia = min_cost_supplier(
        part, supp, nation, region, li, region_name="ASIA",
        max_size=15, p_type_val="SMALL",
    ).collect()
    assert sorted(r.s_name for r in asia) == ["s7", "s9"]


def test_order_priority_checking_semi_join(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import order_priority_checking

    import datetime as dt
    orders = spark.createDataFrame(
        [
            (1, 1, "F", 1.0, dt.datetime(1996, 2, 1), "1-URGENT"),
            (2, 1, "F", 1.0, dt.datetime(1996, 2, 2), "1-URGENT"),
            (3, 1, "F", 1.0, dt.datetime(1996, 2, 3), "5-LOW"),
            # outside the window
            (4, 1, "F", 1.0, dt.datetime(1997, 2, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    li = spark.createDataFrame(
        # order 1 has TWO returned lines (semi-join must not double-
        # count); order 2 has none; order 3 has one; order 4 returned
        # but out of window
        [(1, "R"), (1, "R"), (2, "N"), (3, "R"), (4, "R")],
        "l_orderkey long, l_returnflag string",
    )
    out = {r.o_orderpriority: r.order_count
           for r in order_priority_checking(orders, li).collect()}
    assert out == {"1-URGENT": 1, "5-LOW": 1}


def test_small_quantity_revenue_exact_avg_predicate(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import small_quantity_revenue

    import datetime as dt
    d = dt.datetime(1996, 1, 1)
    part = _mini_parts(spark)
    # part 2 (Brand#2): quantities 1, 10, 19 -> sum=30, n=3, avg=10;
    # qty < 2 qualifies (5*1*3=15 < 30; 5*10*3=150 >= 30)
    li = spark.createDataFrame(
        [
            (1, 2, 1, 1, 1.0, 11.00, 0.0, 0.0, "N", "O", d),
            (2, 2, 1, 1, 10.0, 99.00, 0.0, 0.0, "N", "O", d),
            (3, 2, 1, 1, 19.0, 99.00, 0.0, 0.0, "N", "O", d),
            # Brand#3 part -> out of scope entirely
            (4, 4, 1, 1, 1.0, 99.00, 0.0, 0.0, "N", "O", d),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    )
    r = small_quantity_revenue(li, part, brand="Brand#2").collect()[0]
    assert (r.total_price_c, r.n_lines) == (1100, 1)
    assert r.avg_yearly_r9 == round(1100 / 700.0, 9)


def test_suppliers_kept_waiting_sole_returner(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import suppliers_kept_waiting

    _, _, _, supp, nation, region = _mini_warehouse(spark)
    orders = spark.createDataFrame(
        [(1, 1, "F", 1.0, None, "5-LOW"), (2, 1, "F", 1.0, None, "5-LOW"),
         (3, 1, "O", 1.0, None, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            # order 1: s7 returns, s8 present, s8 does NOT return -> s7 waits
            (1, 7, "R"), (1, 8, "N"),
            # order 2: both return -> nobody counts (n_ret_supp = 2)
            (2, 7, "R"), (2, 9, "R"),
            # order 3: status O -> excluded
            (3, 7, "R"), (3, 8, "N"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    rows = suppliers_kept_waiting(
        supp, li, orders, nation, region, region_name="ASIA"
    ).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("s7", 1)]


def test_global_sales_opportunity_exact_avg(spark):
    from louvain_fast_move_cuda_spark.operators.tpch import global_sales_opportunity

    cust = spark.createDataFrame(
        [
            (1, "c1", 1, 100.00, "X"),   # above avg, no urgent orders -> counted
            (2, "c2", 1, 10.00, "X"),    # below avg
            (3, "c3", 1, 90.00, "X"),    # above avg but HAS an urgent order
            (4, "c4", 2, 500.00, "X"),   # nation not in set
            (5, "c5", 1, -50.00, "X"),   # negative: excluded from avg pool
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 3, "O", 1.0, None, "1-URGENT"), (2, 1, "O", 1.0, None, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    # pool nations {1}: positive balances 100, 10, 90 -> avg 66.67;
    # above: c1 (100), c3 (90); c3 drops on the urgent anti-join
    rows = global_sales_opportunity(cust, orders, nationkeys=(1,)).collect()
    assert [(r.c_nationkey, r.numcust, r.totacctbal_c) for r in rows] == [
        (1, 1, 10000)
    ]
