"""Relational query library over the driver-provided star schema.

Each query is written declaratively with the DataFrame API so Catalyst
handles predicate pushdown, column pruning, join reordering and (with
AQE) runtime skew handling. Broadcast-hint policy: only bounded-size
relations get an explicit ``broadcast()`` — the constant-cardinality
dims (region, nation) and *filtered projections* whose size is bounded
by a selective predicate (e.g. q3's segment-filtered custkey slice).
Tables that scale with SF (customer, supplier, part) are NEVER
force-broadcast unfiltered: at the 100 TB analog a forced broadcast of
customer is a multi-GB build side replicated to every executor (driver
OOM / build-side OOM). Their join strategy is left to parquet size
stats + AQE, which auto-broadcasts while small and switches to shuffle
joins past ``spark.sql.autoBroadcastJoinThreshold``.
tests/test_plan_quality.py::test_no_forced_broadcast_of_scaling_tables
locks this policy.

Numeric discipline (cross-engine determinism): floating-point SUM is
order-dependent, and Spark's partial aggregation order differs from any
single-threaded oracle. Every monetary/quantity aggregate therefore
accumulates in DECIMAL (exact, associative) and casts to DOUBLE only at
the end — both here and in the paired DuckDB oracle SQL — so results are
bit-identical regardless of partitioning. This is also the right call at
100 TB: decimal partial aggregates make results reproducible across
reruns and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

DEC = "decimal(18,4)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (SURVEY §2.4 aggregation family).

    Scan-heavy single groupBy: partial (map-side) aggregation means the
    shuffle carries only |flags|x|statuses| rows per task — this plan is
    flat with data size growth.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    dec = lambda c: F.col(c).cast(DEC)  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top orders by revenue for one market segment.

    customer is small relative to orders/lineitem → broadcast; the only
    shuffle is orders⋈lineitem + the final aggregation, both on
    o_orderkey, so AQE can reuse the exchange.
    """
    t = load_tables(spark, sf_dir)
    cut = F.lit("1996-03-15 00:00:00").cast("timestamp")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].where(F.col("o_orderdate") < cut).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    dec = lambda c: F.col(c).cast(DEC)  # noqa: E731
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey AS orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where supplier and customer share
    a nation. Only the true dims (region, region-filtered nation) carry a
    broadcast hint; customer and supplier scale with SF, so their join
    strategy is left to stats + AQE (auto-broadcast while they fit,
    shuffle join beyond the threshold — a forced broadcast would OOM the
    build side at the 100 TB analog). The large shuffle is orders⋈lineitem.
    """
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    dec = lambda c: F.col(c).cast(DEC)  # noqa: E731
    nation = t["nation"].join(
        F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    orders = t["orders"].where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    j = (
        orders.join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top customers by revenue lost to returns."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    dec = lambda c: F.col(c).cast(DEC)  # noqa: E731
    orders = t["orders"].where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT
  c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def window_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage (SURVEY §2.7 declares the reference has
    none — we add it): rank each customer's orders by totalprice, keep
    top 3 per customer with c_custkey < 100 for a bounded result.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("o_custkey", "rnk")
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
  FROM orders WHERE o_custkey < 100
) WHERE rnk <= 3
ORDER BY o_custkey, rnk
"""


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup over the event stream table (batch form;
    the streaming variant lives in ``streaming/``). The exact
    COUNT(DISTINCT user_id) dominates the shuffle: map-side partial
    dedup collapses to one row per (hour, type, user) COMBINATION, not
    per group — SHUFFLE.md measures it at ~2.5 MiB on a ~3 MiB input,
    the expected cost of exactness. The 100 TB path for this rollup is
    the HLL sketch twin (events_daily_users_sketch), whose shuffle is
    O(groups x registers).
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("uniq_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS uniq_users
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def semi_anti_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join coverage (the reference's picklist membership check
    J4 is semantically an anti-join — SURVEY §2.3): parts never ordered,
    counted per brand.
    """
    t = load_tables(spark, sf_dir)
    bulk = t["lineitem"].where(F.col("l_quantity") >= 48).select("l_partkey")
    return (
        t["part"]
        .join(bulk, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("never_bulk_ordered"))
        .orderBy("p_brand")
    )


SEMI_ANTI_SQL = """
SELECT p_brand, COUNT(*) AS never_bulk_ordered
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
GROUP BY p_brand
ORDER BY p_brand
"""


def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage (absent in reference, SURVEY §2.7):
    ROLLUP over (orderstatus, orderpriority)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""

RELATIONAL_QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "window_customer_order_rank": (window_customer_order_rank, WINDOW_RANK_SQL),
    "events_hourly_rollup": (events_hourly_rollup, EVENTS_HOURLY_SQL),
    "semi_anti_join_parts": (semi_anti_join_parts, SEMI_ANTI_SQL),
    "rollup_order_priority": (rollup_order_priority, ROLLUP_SQL),
}
