"""Relational / analytical operators (SURVEY.md §2.2).

TPC-H-style queries over the test tables, written DataFrame-first so
Catalyst handles pushdown, join reordering, and partial aggregation.
Every aggregate/computed column is aliased identically to its oracle
SQL (driver hash-compares by sorted column name). Doubles are rounded
to 2 decimals in both engines to absorb summation-order noise.

Scale notes (100 TB):
- dim tables (region, nation, supplier at dim-scale) are broadcast
  explicitly; fact-fact joins shuffle on their keys with AQE skew
  splitting enabled (session.py).
- every query filters/projects on the base scan so parquet pushdown
  and column pruning apply (asserted in tests/test_plans.py).
- top-N queries use orderBy+limit which Spark executes as a
  TakeOrderedAndProject (per-partition heap + driver merge, no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_mapreduce_server_spark.catalog import load_tables


def _r2(c):
    return F.round(c, 2)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy filter + wide group-agg (flagship).

    Partial (map-side) aggregation makes this shuffle only 4 grouped
    rows per partition regardless of input size.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    l = t["lineitem"]
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    charge = disc_price * (1 + l.l_tax)
    return (
        l.filter(l.l_shipdate <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(charge)).alias("sum_charge"),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
            _r2(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter + 3-way join + top-10.

    customer(filtered) is small -> broadcast into orders; the
    orders⋈lineitem join shuffles on orderkey. Deterministic top-10 via
    unique tiebreak (o_orderkey).
    """
    t = load_tables(spark, sf_dir, register_views=False)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r2(F.sum(li.l_extendedprice * (1 - li.l_discount))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join with co-located supplier/customer nation.

    region+nation broadcast (tiny dims); the customer⋈orders⋈lineitem
    ⋈supplier chain shuffles on its keys and AQE picks broadcast for
    the supplier side when the runtime size allows.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"]
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"]
    cust = t["customer"]
    supp = t["supplier"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(li.l_extendedprice * (1 - li.l_discount))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: tight filter + single sum; filters push to parquet."""
    t = load_tables(spark, sf_dir, register_views=False)
    l = t["lineitem"]
    return (
        l.filter(
            (l.l_shipdate >= F.lit("1996-01-01").cast("timestamp"))
            & (l.l_shipdate < F.lit("1997-01-01").cast("timestamp"))
            & (l.l_discount >= 0.05)
            & (l.l_discount <= 0.07)
            & (l.l_quantity < 24)
        )
        .agg(_r2(F.sum(l.l_extendedprice * l.l_discount)).alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue by customer, top 20."""
    t = load_tables(spark, sf_dir, register_views=False)
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t["customer"]
    nation = t["nation"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_r2(F.sum(li.l_extendedprice * (1 - li.l_discount))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS -> left-semi join, count by priority."""
    t = load_tables(spark, sf_dir, register_views=False)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t["lineitem"]
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(li.l_shipdate > orders.o_orderdate)
    semi = orders.join(late.select("l_orderkey").distinct(), orders.o_orderkey == F.col("l_orderkey"), "left_semi")
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join (customers who never ordered)."""
    t = load_tables(spark, sf_dir, register_views=False)
    cust = t["customer"]
    orders = t["orders"]
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def q_market_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join + segment rollforward: revenue and order counts."""
    t = load_tables(spark, sf_dir, register_views=False)
    cust = t["customer"]
    orders = t["orders"]
    li = t["lineitem"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            _r2(F.sum(li.l_extendedprice * (1 - li.l_discount))).alias("revenue"),
            F.countDistinct(orders.o_orderkey).alias("order_count"),
            F.count("*").alias("lineitem_count"),
        )
        .orderBy("c_mktsegment")
    )


def q_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank: highest-spend customer per nation.

    Spend aggregates first (shuffle on custkey), then a per-nation
    window; the rank window reuses the nation partitioning.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    from pyspark.sql.window import Window

    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(_r2(F.sum("o_totalprice")).alias("total_spend"))
    )
    cust = t["customer"].join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    joined = spend.join(cust, spend.o_custkey == cust.c_custkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("n_name", "c_custkey", "c_name", "total_spend")
        .orderBy("n_name")
    )


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) daily revenue — unbounded-preceding window.

    Daily pre-aggregation shrinks the window input to one row per day,
    so the single-partition cumulative window is over days, not orders.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    from pyspark.sql.window import Window

    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", "o_orderdate").alias("order_day"))
        .agg(_r2(F.sum("o_totalprice")).alias("day_revenue"))
    )
    w = Window.orderBy("order_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("running_revenue", _r2(F.sum("day_revenue").over(w)))
        .orderBy("order_day")
    )


def q_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame moving average + lag/lead per event type."""
    t = load_tables(spark, sf_dir, register_views=False)
    from pyspark.sql.window import Window

    ev = t["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wf = w.rowsBetween(-3, 0)
    return (
        ev.select(
            "event_id",
            "event_type",
            "ts",
            _r2(F.col("value")).alias("value_r"),
            # 4dp, not 2: a 4-row avg of 2-decimal values terminates at
            # 4 decimals, so no engine-dependent .xx5 rounding boundary.
            F.round(F.avg("value").over(wf), 4).alias("moving_avg"),
            _r2(F.lag("value", 1).over(w)).alias("prev_value"),
            _r2(F.lead("value", 1).over(w)).alias("next_value"),
        )
        .orderBy("event_type", "ts", "event_id")
    )


def q_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation): subtotal + grand-total grouping sets."""
    t = load_tables(spark, sf_dir, register_views=False)
    cust = (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        cust.rollup("r_name", "n_name")
        .agg(F.count("*").alias("customer_count"), _r2(F.sum("c_acctbal")).alias("total_balance"))
        .orderBy("r_name", "n_name")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per return flag."""
    t = load_tables(spark, sf_dir, register_views=False)
    l = t["lineitem"]
    return (
        l.groupBy("l_returnflag")
        .agg(
            _r2(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50_price"),
            _r2(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90_price"),
            _r2(F.expr("percentile(l_extendedprice, 0.99)")).alias("p99_price"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


def q_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier balances."""
    t = load_tables(spark, sf_dir, register_views=False)
    cb = t["customer"].groupBy("c_nationkey").agg(_r2(F.sum("c_acctbal")).alias("customer_balance"))
    sb = t["supplier"].groupBy("s_nationkey").agg(_r2(F.sum("s_acctbal")).alias("supplier_balance"))
    j = cb.join(sb, cb.c_nationkey == sb.s_nationkey, "full_outer")
    return (
        j.select(
            F.coalesce(cb.c_nationkey, sb.s_nationkey).alias("nationkey"),
            "customer_balance",
            "supplier_balance",
        )
        .orderBy("nationkey")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type (rows-only check:
    approximate results are engine-specific by design)."""
    t = load_tables(spark, sf_dir, register_views=False)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count("*").alias("events"),
        )
        .orderBy("event_type")
    )
