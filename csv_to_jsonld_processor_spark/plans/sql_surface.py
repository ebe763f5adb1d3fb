"""The SQL entry surface: `spark.sql(...)` over registered temp views.

`sql_shared_dialect` is deliberately ONE query text executed VERBATIM
by both engines — the registered Spark query runs it through
`spark.sql`, and the driver's oracle runs the *same constant* through
DuckDB. Any divergence in parsing, decimal arithmetic, timestamp
literals, or grouping semantics between the two SQL front-ends shows
up as a hash mismatch. This is the "a user can bring their SQL"
guarantee, complementing the DataFrame-built plans everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import load_tables

# shared ANSI subset: identical text must parse and agree in Spark SQL
# and DuckDB (timestamp literals, DECIMAL(18,4) discipline, grouping)
SHARED_DIALECT_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(SHARED_DIALECT_SQL)


# --- the rest of the shared surface: one archetype per SQL feature ---------
# (verbatim-text rule as above; round-4 VERDICT asked the surface to grow
# from one query to the main TPC-H archetypes)

# 3-way join + group + order/limit (the Q3 shipping-priority shape)
SHARED_JOIN_AGG_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# window function: top-3 customers by order total per nation
SHARED_WINDOW_SQL = """
WITH rev AS (
  SELECT c_nationkey AS nationkey, c_custkey AS custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_custkey
)
SELECT nationkey, custkey, total, rnk FROM (
  SELECT nationkey, custkey, total,
         CAST(ROW_NUMBER() OVER (PARTITION BY nationkey
                                 ORDER BY total DESC, custkey ASC) AS INT) AS rnk
  FROM rev
) ranked
WHERE rnk <= 3
ORDER BY nationkey, rnk
"""


# uncorrelated scalar subquery (the Q11/Q17 above-the-mean shape);
# the mean is decimal-summed, never a raw-double AVG
SHARED_SUBQUERY_SQL = """
SELECT s_nationkey AS nationkey, COUNT(*) AS n_above,
       CAST(MIN(s_suppkey) AS BIGINT) AS min_suppkey
FROM supplier
WHERE CAST(s_acctbal AS DOUBLE) >
      (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
       FROM supplier)
GROUP BY s_nationkey
ORDER BY nationkey
"""


# explicit GROUPING SETS with GROUPING() disambiguation of the NULL
# produced by a super-aggregate row vs a NULL in the data
SHARED_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""


# set operators: urgent-ordering BUILDING customers minus the ones who
# also placed a low-priority order
SHARED_SETOPS_SQL = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
) s
ORDER BY custkey
"""


def _shared_sql_query(sql: str, *tables: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = load_tables(spark, sf_dir)
        for name in tables:
            t[name].createOrReplaceTempView(name)
        return spark.sql(sql)

    return run


SQL_SURFACE_QUERIES: dict[str, tuple] = {
    "sql_shared_dialect": (sql_shared_dialect, SHARED_DIALECT_SQL),
    "sql_shared_join_agg": (
        _shared_sql_query(SHARED_JOIN_AGG_SQL, "customer", "orders", "lineitem"),
        SHARED_JOIN_AGG_SQL,
    ),
    "sql_shared_window": (
        _shared_sql_query(SHARED_WINDOW_SQL, "customer", "orders"),
        SHARED_WINDOW_SQL,
    ),
    "sql_shared_subquery": (
        _shared_sql_query(SHARED_SUBQUERY_SQL, "supplier"),
        SHARED_SUBQUERY_SQL,
    ),
    "sql_shared_setops": (
        _shared_sql_query(SHARED_SETOPS_SQL, "customer", "orders"),
        SHARED_SETOPS_SQL,
    ),
    "sql_shared_grouping_sets": (
        _shared_sql_query(SHARED_GROUPING_SETS_SQL, "orders"),
        SHARED_GROUPING_SETS_SQL,
    ),
}
