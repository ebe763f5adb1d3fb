"""Third wave of relational coverage — four TPC-H-derived shapes that
exercise optimizer features the earlier waves don't (reference parity:
these go beyond the reference's fixed CSV pipeline, filling the §2.7
added-operator-classes axis):

- q13: LEFT OUTER join preserved through aggregation (customers with
  zero orders must survive into the distribution).
- q16: anti-join exclusion + COUNT(DISTINCT) over a derived
  part-supplier relation.
- q19: OR-of-conjunctions disjunctive predicate — Catalyst must keep
  the common `p_partkey = l_partkey` equi-join condition out of the
  disjunction and push the per-branch range filters into the scans.
- q22: scalar aggregate subquery (decimal-exact average) + NOT EXISTS
  anti-join with a correlated date filter.

Same decimal-in/double-out discipline as plans/relational.py; schema
deviations from stock TPC-H (no phone / shipmode / partsupp / comment
columns in the synthetic tables) are adapted to the columns that exist
and noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

DEC = "decimal(18,4)"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: how many customers placed k orders, for every k
    INCLUDING ZERO — the left-outer-join-through-aggregation shape (an
    inner join would silently drop the order-less bucket). The stock
    query's `o_comment NOT LIKE` filter becomes an o_orderpriority
    exclusion (no comment column in the synthetic schema).

    Scale: customer ⋈ orders shuffles on custkey; both aggregations are
    partial-agg friendly; the second groupBy is on |distinct k| rows."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls: 0 for order-less
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (brand, type, size) for
    selected sizes, excluding a brand and excluding "complaint"
    suppliers (adapted: s_acctbal < 0 plays the complaints filter; the
    part-supplier relation is derived as DISTINCT (l_partkey, l_suppkey)
    from lineitem since the synthetic schema has no partsupp table).

    Scale: the derived relation is one dropDuplicates shuffle; the
    supplier exclusion is a broadcast anti-join (supplier is
    dimension-sized); COUNT(DISTINCT) expands to a two-phase exact
    aggregate."""
    t = load_tables(spark, sf_dir)
    rel = t["lineitem"].select("l_partkey", "l_suppkey").dropDuplicates()
    part = t["part"].where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    complaints = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        rel.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under an OR of three brand/size/quantity
    conjunctions. The plan test to eyeball: the `l_partkey = p_partkey`
    equi-join must NOT degrade to a nested-loop under the disjunction
    (Catalyst extracts the common join key), and per-branch ranges
    should still prune."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return j.where(b1 | b2 | b3).agg(
        F.sum(disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q19_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


DORMANT_CUTOFF = "2000-07-01 00:00:00"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: positive-balance customers richer than the
    average positive balance who placed NO order since {DORMANT_CUTOFF}
    (NOT EXISTS anti-join with a correlated date filter), grouped by
    nation. The stock phone-prefix grouping becomes c_nationkey (no
    phone column). The scalar average uses the decimal-sum / count
    construction so it is one exact double in both engines (a plain
    AVG(double) is partitioning-order-dependent).

    Scale: the scalar aggregate is one partial-agg scan broadcast as a
    literal-sized build side; the anti-join shuffles only the filtered
    recent-orders keys."""
    t = load_tables(spark, sf_dir)
    pos = t["customer"].where(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        t["orders"]
        .where(F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pos.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > 0
  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style — the hardest subquery shape: per finished order,
    a supplier whose line shipped late (> orderdate + 90 days; the
    synthetic schema has no commit/receipt dates) counts as "waiting"
    only if the order HAD other suppliers (EXISTS) and NONE of them were
    also late (NOT EXISTS). Row semantics match stock Q21: one count per
    late line, not per distinct order.

    Spark shape: both correlated subqueries decorrelate to one
    left-semi and one left-anti join against DISTINCT (order, supplier)
    pair relations — equi on orderkey with the supplier inequality as
    the hash-join residual, never a nested loop. Three shuffles total
    (two pair dedups + the final group)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    pairs = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("p_ok"), F.col("l_suppkey").alias("p_sk"))
        .dropDuplicates()
    )
    # NOT EXISTS side needs late lines of ANY order status — mirror the
    # stock query, where only l1's order is status-filtered
    late_any = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select(F.col("l_orderkey").alias("lp_ok"), F.col("l_suppkey").alias("lp_sk"))
        .dropDuplicates()
    )
    w = late.join(
        pairs,
        (F.col("l_orderkey") == F.col("p_ok")) & (F.col("l_suppkey") != F.col("p_sk")),
        "left_semi",
    ).join(
        late_any,
        (F.col("l_orderkey") == F.col("lp_ok")) & (F.col("l_suppkey") != F.col("lp_sk")),
        "left_anti",
    )
    return (
        w.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


MKT_REGION = "ASIA"
MKT_NATION = "NATION_7"  # an ASIA nation (regionkey 2)
MKT_PTYPE = "STANDARD"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: {MKT_NATION}'s share of {MKT_PTYPE}-part revenue
    sold to {MKT_REGION}-region customers, per order year — the
    double-dimension-chain shape: nation⋈region on the CUSTOMER side
    picks the market, nation on the SUPPLIER side labels the share
    numerator, and the conditional ratio aggregates per year.

    Scale: nation/region are true dimensions (broadcast hint);
    customer/supplier/part scale with SF, so their joins carry NO
    forced-broadcast hint (the plan-quality lint forbids it) — AQE
    picks broadcast at test scale and shuffle at 100 TB."""
    t = load_tables(spark, sf_dir)
    nat = t["nation"].select("n_nationkey", "n_name", "n_regionkey")
    region_nations = nat.join(
        F.broadcast(t["region"].where(F.col("r_name") == MKT_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = t["customer"].join(
        F.broadcast(region_nations), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = t["supplier"].join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    li = t["lineitem"].join(
        t["part"].where(F.col("p_type") == MKT_PTYPE).select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    j = (
        li.join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("vol"), "supp_nation")
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == MKT_NATION, F.col("vol")).otherwise(F.lit(0).cast(DEC))).cast("double")
                / F.sum("vol").cast("double"),
                6,
            ).alias("mkt_share"),
            F.sum("vol").cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = '{MKT_NATION}'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = '{MKT_PTYPE}'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '{MKT_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


EXCESS_BRAND = "Brand#5"
EXCESS_MULT = 2.0  # flag a supplier shipping > 2x its fair share of a part


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested-aggregate shape (adapted: no partsupp
    table, so "supply share" is derived from shipped quantities): a
    supplier is flagged per {EXCESS_BRAND} part where its shipped
    quantity exceeds {EXCESS_MULT}× its FAIR share (part total ÷ number
    of suppliers shipping that part) — the aggregate-vs-aggregate-of-
    same-relation comparison that stock Q20 does with availqty vs half
    the shipped sum. The fair-share form is scale-invariant: a fixed
    fraction threshold goes degenerate as supplier count grows with SF
    (measured: >0.2 of total matches zero rows at every SF). Output:
    suppliers with the count of parts they dominate.

    Scale: two partial aggregations over the same filtered scan (per
    (part, supplier) and per part), equi-joined on partkey — |parts|-
    sized join, no subquery re-scan of lineitem."""
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].where(F.col("p_brand") == EXCESS_BRAND).select("p_partkey")
    li = t["lineitem"].join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty_ps")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty_p"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    flagged = (
        per_ps.join(per_p, F.col("l_partkey") == F.col("pk"))
        .where(F.col("qty_ps") > EXCESS_MULT * F.col("qty_p") / F.col("n_supp"))
    )
    return (
        flagged.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), "s_name")
    )


Q20_SQL = f"""
WITH li AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{EXCESS_BRAND}'
), per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_ps
  FROM li GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_p,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM li GROUP BY l_partkey
)
SELECT s_name, COUNT(*) AS n_dominated_parts
FROM per_ps JOIN per_p ON l_partkey = pk
JOIN supplier ON l_suppkey = s_suppkey
WHERE qty_ps > {EXCESS_MULT} * qty_p / n_supp
GROUP BY s_name
ORDER BY n_dominated_parts DESC, s_name
"""


REV_LO = "1997-01-01 00:00:00"
REV_HI = "1997-04-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) whose quarterly revenue equals
    the MAXIMUM over all suppliers — the aggregate-of-aggregate scalar
    shape (stock Q15's revenue view + MAX subquery). Revenue is
    decimal-accumulated then compared as the identical double on both
    engines, so the equality join against the max is exact.

    Scale: one partial-agg pass builds the per-supplier revenue; the
    max is a 1-row broadcast; ties all surface (no arbitrary LIMIT 1)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit(REV_LO).cast("timestamp")
    hi = F.lit(REV_HI).cast("timestamp")
    rev = (
        t["lineitem"]
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.round("total_revenue", 4).alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{REV_LO}' AND l_shipdate < TIMESTAMP '{REV_HI}'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name, ROUND(total_revenue, 4) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY suppkey
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping sets including
    the per-priority-only slice ROLLUP can't produce (completes the
    grouping-sets coverage next to rollup_order_priority)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


COST_FACTOR = "0.8"  # cost basis = 0.8 x retail price (no ps_supplycost table)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation and order year over
    PROMO-type parts — the widest join fan in the suite (lineitem ⋈
    part ⋈ supplier ⋈ nation ⋈ orders). Profit = discounted price −
    quantity × {COST_FACTOR} × p_retailprice (cost basis adapted from
    retail price; the synthetic schema has no partsupp/supplycost).
    All money terms decimal-accumulated, double at the end.

    Scale: part filter prunes before the fact join; supplier+nation are
    unhinted (AQE broadcasts at test scale, shuffles at 100 TB — the
    no-forced-broadcast lint applies); the final group is
    |nations × years|."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey", "p_retailprice")
    nat = t["nation"].select("n_nationkey", "n_name")
    # cost basis pre-quantized to DECIMAL(18,4): 0.8 x a 2-decimal
    # retail price has <=3 decimals, so the narrowing cast is exact and
    # the downstream products stay inside precision 38 in BOTH engines
    # (a triple decimal product overflows 38 and silently degrades to
    # double arithmetic in DuckDB — the known precision-38 gotcha)
    cost_unit = (F.lit(COST_FACTOR).cast(DEC) * F.col("p_retailprice").cast(DEC)).cast(DEC)
    profit = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        - F.col("l_quantity").cast(DEC) * cost_unit
    )
    j = (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"].select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
              - CAST(l_quantity AS DECIMAL(18,4))
                * CAST(CAST({COST_FACTOR} AS DECIMAL(18,4))
                       * CAST(p_retailprice AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value deciles: ntile(10) over (acctbal, custkey) — the
    deterministic total order makes tile boundaries identical
    cross-engine — with per-decile decimal-exact balance sums and
    percent_rank/cume_dist of each decile's top customer thrown in for
    the rank-function family coverage. One window shuffle + one
    partial-agg."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    d = t["customer"].select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_balance"),
            F.max("pr").alias("max_percent_rank"),
            F.max("cd").alias("max_cume_dist"),
        )
        .orderBy("decile")
    )


CUSTOMER_DECILES_SQL = """
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance,
       MAX(pr) AS max_percent_rank,
       MAX(cd) AS max_cume_dist
FROM (
  SELECT c_custkey, c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile,
         ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS pr,
         ROUND(CUME_DIST() OVER (ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS cd
  FROM customer
)
GROUP BY decile ORDER BY decile
"""


RELATIONAL3_QUERIES: dict[str, tuple] = {
    "customer_value_deciles": (customer_value_deciles, CUSTOMER_DECILES_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "cube_order_stats": (cube_order_stats, CUBE_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q16_supplier_part_counts": (q16_supplier_part_counts, Q16_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
}
