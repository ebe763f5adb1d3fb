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


SQL_SURFACE_QUERIES: dict[str, tuple] = {
    "sql_shared_dialect": (sql_shared_dialect, SHARED_DIALECT_SQL),
}
