"""Second wave of relational coverage: subquery shapes (EXISTS / IN /
correlated scalar), HAVING over large aggregates, ratio aggregates —
each paired with a DuckDB oracle under the same decimal-in/double-out
discipline as plans/relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

DEC = "decimal(18,4)"


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late lineitem (EXISTS →
    left-semi join), counted by priority."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    orders = t["orders"].where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    late = t["lineitem"].select("l_orderkey").where(F.col("l_quantity") >= 30)
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 30)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + single aggregate (the pushdown
    showcase: every predicate reaches the parquet scan)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: conditional aggregate ratio over a join."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    li = t["lineitem"].where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    j = li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    disc = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0).cast(DEC))
    return j.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
         THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: HAVING over a large groupBy feeding a join."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


Q18_SQL = """
SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 50
"""


def q17_brand_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery: lineitems below 20%
    of their part's average quantity (decorrelated as a join on the
    per-part aggregate — what Catalyst does to the subquery anyway)."""
    t = load_tables(spark, sf_dir)
    part_avg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"))
    )
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#2").select("p_partkey")
    li = t["lineitem"].join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    j = li.join(part_avg, F.col("l_partkey") == F.col("pk"))
    return j.where(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#2'
  AND l1.l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
  )
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by year (synthetic nation names NATION_0..24)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(
            (
                (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")
            )
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    disc = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
     OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag window coverage: per-customer days between consecutive
    orders, top spenders only."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t["orders"].where(F.col("o_custkey") < 50)
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey, gap_days FROM (
  SELECT o_custkey, o_orderkey,
         CAST(date_diff('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS INT) AS gap_days
  FROM orders WHERE o_custkey < 50
) WHERE gap_days IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""




def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark has no built-in for, composed from
    existing DataFrame ops (the union + window-last trick): each event
    picks the customer's most recent order with o_orderdate <= ts.

    Plan: tag orders kind=0 and events kind=1, union, ONE shuffle on the
    customer key, and a running last_value(ignorenulls) over
    (time, kind) ordering — no range-join explosion, no per-row
    subquery. Ties at equal timestamps are deterministic: orders dedupe
    to max(o_orderkey) per (cust, date) first, and kind=0 sorts before
    the event at the same instant (inclusive as-of). The DuckDB oracle
    is a native ASOF LEFT JOIN over the same deduped order set."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    orders = (
        t["orders"]
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    o = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = t["events"].where(F.col("user_id") < 50).select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("asof_orderkey"),
        F.col("event_id"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = o.unionByName(e).withColumn(
        "last_orderkey", F.last("asof_orderkey", ignorenulls=True).over(w)
    ).withColumn(
        "last_orderdate",
        F.last(F.when(F.col("kind") == 0, F.col("t")), ignorenulls=True).over(w),
    )
    return (
        u.where(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("last_orderkey").alias("asof_orderkey"),
            F.date_format("last_orderdate", "yyyy-MM-dd HH:mm:ss").alias("asof_orderdate"),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH o AS (
  SELECT o_custkey AS k, o_orderdate AS t, MAX(o_orderkey) AS asof_orderkey
  FROM orders GROUP BY 1, 2
), e AS (
  SELECT event_id, user_id, ts FROM events WHERE user_id < 50
)
SELECT e.event_id,
       e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       o.asof_orderkey,
       strftime(o.t, '%Y-%m-%d %H:%M:%S') AS asof_orderdate
FROM e ASOF LEFT JOIN o ON e.user_id = o.k AND e.ts >= o.t
ORDER BY event_id
"""




def events_activity_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join — per event, how many of the SAME user's
    events fall in the trailing 2-hour window [ts - 2h, ts) (the
    classic sessionless activity-density feature).

    Scale shape: a naive range join on (key, range) degenerates to a
    per-key cartesian; this uses HOUR-BUCKET BLOCKING — each candidate
    event explodes into the 3 hour buckets it can serve ([u, u+2h]
    spans at most 3 hour marks), the join is a pure equi-join on
    (user_id, hour), and the exact interval predicate filters after.
    Candidate fan-out is bounded at 3× regardless of key skew, and the
    equi-join keeps Spark on a hash/sort-merge join instead of
    BroadcastNestedLoop. DuckDB oracle is the plain range self-join."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id") < 30).select("event_id", "user_id", "ts")
    probe = ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    cand = ev.select(
        F.col("user_id"),
        F.col("ts").alias("other_ts"),
    ).withColumn(
        "hour",
        F.explode(
            F.expr(
                "transform(sequence(0, 2), h -> date_trunc('hour', other_ts) + make_interval(0, 0, 0, 0, h, 0, 0))"
            )
        ),
    )
    j = probe.join(cand, ["user_id", "hour"]).where(
        (F.col("other_ts") >= F.col("ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("other_ts") < F.col("ts"))
    )
    return (
        j.groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_recent_events"))
        .orderBy("event_id")
    )


EVENTS_WINDOW_SQL = """
SELECT e.event_id, e.user_id, COUNT(*) AS n_recent_events
FROM (SELECT event_id, user_id, ts FROM events WHERE user_id < 30) e
JOIN (SELECT user_id, ts AS other_ts FROM events WHERE user_id < 30) o
  ON e.user_id = o.user_id
 AND o.other_ts >= e.ts - INTERVAL 2 HOUR
 AND o.other_ts <  e.ts
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


RELATIONAL2_QUERIES: dict[str, tuple] = {
    "q4_order_priority_exists": (q4_order_priority_exists, Q4_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q17_brand_avg_quantity": (q17_brand_avg_quantity, Q17_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "customer_order_gaps": (customer_order_gaps, ORDER_GAPS_SQL),
    "events_asof_orders": (events_asof_orders, ASOF_SQL),
    "events_activity_window": (events_activity_window, EVENTS_WINDOW_SQL),
}
