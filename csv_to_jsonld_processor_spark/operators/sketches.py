"""Sketch aggregates — the approximate ops a 100 TB rollup actually
ships (HyperLogLog distinct counts, approximate quantiles), made
driver-checkable despite being probabilistic.

The oracle trick: a sketch's raw estimate differs between engines (Spark
HLL++ vs DuckDB's HLL — different registers, different bias tables), so
the estimate itself can never hash-match. Instead each engine computes
ITS OWN sketch **and** the exact aggregate in one pass, and the query
RETURNS the exact value plus a boolean ``within_tol`` asserting the
engine's sketch landed inside the tolerance band. Output is then
deterministic and identical across engines — while still executing the
real sketch machinery on both sides, so a broken sketch (or a tolerance
regression) flips a boolean and fails the hash gate.

Scale shape: this is the whole point of sketches — per-group HLL state
is O(registers) regardless of group size, so the shuffle carries
kilobytes per (day) instead of the full user-id set a COUNT(DISTINCT)
repartition needs. The exact twin here is the VERIFICATION HARNESS, not
the production plan; at 100 TB you run the sketch alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

HLL_RSD = 0.02  # Spark approx_count_distinct relative standard deviation
HLL_TOL = 0.05  # pass band: |approx - exact| / exact <= 5% (>2.5 sigma)
PCTL_ACCURACY = 10_000  # Spark approx_percentile accuracy knob
PCTL_TOL = 0.02  # asymptotic band: approx within 2% of the rank-exact value
PCTL_SMALL_N = 0.5  # + PCTL_SMALL_N/sqrt(n) small-sample widening (t-digest
# error at n~200 was measured at 2.5%; the widening decays to nothing at scale)


def events_daily_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day user reach: exact COUNT(DISTINCT user_id) alongside an
    HLL++ estimate (rsd={HLL_RSD}), returning the exact count and the
    in-engine tolerance verdict. See module docstring for why the
    estimate itself is not (and cannot be) in the output contract."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("_approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "day",
            F.col("exact_users").cast("long").alias("exact_users"),
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(HLL_TOL)
            ).alias("within_tol"),
        )
        .orderBy("day")
    )


EVENTS_SKETCH_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n_events,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= COUNT(DISTINCT user_id) * {HLL_TOL} AS within_tol
FROM events
GROUP BY 1 ORDER BY day
"""


def _tol(n_col: F.Column) -> F.Column:
    """Rank-aware pass band: PCTL_TOL + PCTL_SMALL_N/sqrt(n)."""
    return F.lit(PCTL_TOL) + F.lit(PCTL_SMALL_N) / F.sqrt(n_col.cast("double"))


def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles: rank-exact p50/p90 (the output
    contract) plus each engine's own approximate-quantile sketch
    verified against them in-plan. Spark's approx_percentile
    (Greenwald-Khanna) vs DuckDB's approx_quantile (t-digest) — both
    must land within {PCTL_TOL:.0%} of the exact rank statistic.

    The exact percentile uses the same deterministic definition in both
    engines: the SMALLEST value whose cumulative rank reaches the
    target fraction (rank/ n >= p over a (value, tiebreak) total order) —
    no interpolation, so the doubles compare bit-exactly."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_type", "value")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "rn_salt")
    ranked = (
        ev.withColumn("rn_salt", F.xxhash64("value"))  # deterministic tiebreak
        .withColumn("_rk", F.row_number().over(w))
    )
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        ranked.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("_rk") >= F.ceil(F.col("_n") * 0.5), F.col("value"))).alias(
                "p50_exact"
            ),
            F.min(F.when(F.col("_rk") >= F.ceil(F.col("_n") * 0.9), F.col("value"))).alias(
                "p90_exact"
            ),
            F.max("_n").alias("_n"),
        )
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9], PCTL_ACCURACY).alias("_ap")
    )
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            F.round("p50_exact", 6).alias("p50"),
            F.round("p90_exact", 6).alias("p90"),
            (
                (
                    F.abs(F.col("_ap")[0] - F.col("p50_exact"))
                    <= F.abs(F.col("p50_exact")) * _tol(F.col("_n"))
                )
                & (
                    F.abs(F.col("_ap")[1] - F.col("p90_exact"))
                    <= F.abs(F.col("p90_exact")) * _tol(F.col("_n"))
                )
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


EVENTS_QUANTILE_SKETCH_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, hash(value)) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), exact AS (
  SELECT event_type,
         MIN(CASE WHEN rk >= ceil(n * 0.5) THEN value END) AS p50_exact,
         MIN(CASE WHEN rk >= ceil(n * 0.9) THEN value END) AS p90_exact,
         MAX(n) AS n
  FROM ranked GROUP BY 1
), approx AS (
  SELECT event_type,
         approx_quantile(value, 0.5) AS a50,
         approx_quantile(value, 0.9) AS a90
  FROM events GROUP BY 1
)
SELECT e.event_type AS event_type,
       ROUND(p50_exact, 6) AS p50,
       ROUND(p90_exact, 6) AS p90,
       (abs(a50 - p50_exact) <= abs(p50_exact) * ({PCTL_TOL} + {PCTL_SMALL_N} / sqrt(n))
        AND abs(a90 - p90_exact) <= abs(p90_exact) * ({PCTL_TOL} + {PCTL_SMALL_N} / sqrt(n))) AS within_tol
FROM exact e JOIN approx a ON e.event_type = a.event_type
ORDER BY event_type
"""


# --- Count-Min Sketch heavy hitters -----------------------------------------
#
# Unlike HLL/t-digest, a CMS built from DETERMINISTIC hash rows is
# bit-identical in any engine — so here the sketch itself is in the
# output contract, no tolerance boolean needed. Construction is pure
# relational algebra: each item contributes D (row, bucket) pairs, the
# counter matrix is ONE partial-aggregated groupBy (D·W counters — the
# shuffle carries a fixed-size matrix regardless of corpus size, the
# whole point at 100 TB), and a point estimate is min over D counters.
# The CMS guarantee (estimate >= exact, always) is part of the output.

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOP_N = 10


def _cms_bucket_sql(d: int, item: str) -> str:
    """Engine-shared bucket hash: first 8 md5 hex chars of 'd:item' as
    u32 mod width — same text works in Spark SQL (conv) and the DuckDB
    oracle builds the identical value via 0x-cast."""
    return f"CAST(CONV(SUBSTRING(MD5(CONCAT('{d}:', {item})), 1, 8), 16, 10) AS BIGINT) % {CMS_WIDTH}"


def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the event stream via Count-Min Sketch: the
    top-{CMS_TOP_N} users by exact event count, each with its CMS
    point estimate (min over {CMS_DEPTH} deterministic hash rows of a
    {CMS_DEPTH}x{CMS_WIDTH} counter matrix) and the error the sketch's
    collision bound produced. ``never_under`` pins the CMS one-sided
    guarantee in-plan."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(F.col("user_id").cast("string").alias("item"))
    pairs = F.array(
        *[
            F.expr(f"struct({d} AS d, {_cms_bucket_sql(d, 'item')} AS bucket)")
            for d in range(CMS_DEPTH)
        ]
    )
    counters = (
        ev.select(F.explode(pairs).alias("p"))
        .groupBy("p.d", "p.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        ev.groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("exact_n"), F.asc("item"))),
        )
        .where(F.col("rk") <= CMS_TOP_N)
    )
    probes = top.select(
        "item",
        "exact_n",
        "rk",
        F.explode(
            F.array(
                *[
                    F.expr(f"struct({d} AS d, {_cms_bucket_sql(d, 'item')} AS bucket)")
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("item", "exact_n", "rk", "p.d", "p.bucket")
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("item", "exact_n", "rk")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            F.col("item").cast("long").alias("user_id"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_n")).cast("long").alias("overcount"),
            (F.col("cms_estimate") >= F.col("exact_n")).alias("never_under"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("rk")
    )


def _cms_oracle_bucket(d: int, item: str) -> str:
    return f"CAST(('0x' || substr(md5('{d}:' || {item}), 1, 8)) AS BIGINT) % {CMS_WIDTH}"


EVENTS_CMS_SQL = f"""
WITH items AS (
  SELECT CAST(user_id AS VARCHAR) AS item FROM events
), pairs AS (
  {" UNION ALL ".join(f"SELECT item, {d} AS d, {_cms_oracle_bucket(d, 'item')} AS bucket FROM items" for d in range(CMS_DEPTH))}
), counters AS (
  SELECT d, bucket, COUNT(*) AS c FROM pairs GROUP BY d, bucket
), top AS (
  SELECT item, COUNT(*) AS exact_n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, item ASC) AS rk
  FROM items GROUP BY item
  QUALIFY rk <= {CMS_TOP_N}
), probes AS (
  {" UNION ALL ".join(f"SELECT item, exact_n, rk, {d} AS d, {_cms_oracle_bucket(d, 'item')} AS bucket FROM top" for d in range(CMS_DEPTH))}
)
SELECT CAST(p.item AS BIGINT) AS user_id,
       CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(MIN(c.c) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.c) - p.exact_n AS BIGINT) AS overcount,
       MIN(c.c) >= p.exact_n AS never_under,
       CAST(p.rk AS INT) AS rk
FROM probes p JOIN counters c ON c.d = p.d AND c.bucket = p.bucket
GROUP BY p.item, p.exact_n, p.rk
ORDER BY rk
"""


# --- Bloom-filter semi-join reduction ---------------------------------------

BLOOM_M = 3968  # filter bits: 64 words × 62 usable bits (bit 63 would
# overflow a signed shift in DuckDB, bit 62 is left unused for symmetry)
BLOOM_K = 3  # hash functions
BLOOM_B = 62  # usable bits per 64-bit word


def _bloom_pos_sql(i: int, key: str) -> str:
    """DuckDB: bit position i for key (identical algebra to the Spark side)."""
    return f"CAST(('0x' || substr(md5('b{i}:' || {key}), 1, 8)) AS BIGINT) % {BLOOM_M}"


def orders_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction — the runtime-filter move that
    makes selective star joins survive 100 TB: a {BLOOM_M}-bit filter
    built from the SELECTIVE dim side (1996 URGENT orders) is pushed to
    the fact scan, so lineitem rows whose key cannot join are dropped
    BEFORE the join shuffle instead of after it. Spark's own
    runtime-bloom rewrite does exactly this when statistics justify it;
    building the filter explicitly makes the mechanism deterministic
    (md5-derived positions), so both engines construct bit-identical
    words and the whole pruning pipeline — build, probe, false-positive
    accounting — is hash-gateable rather than approximate.

    Output (one row): true/passed/false-positive key counts, probe-row
    reduction, and the filter's realized false-positive rate in basis
    points — the number that tells an operator whether {BLOOM_M} bits
    are enough at the next scale-up.

    Scale shape: the build side aggregates k positions per key into
    ≤{BLOOM_M // BLOOM_B} (word, mask) rows via map-side-combined BIT_OR —
    kilobytes, broadcast; the probe side fans each key to its k
    (word, bit) checks and joins the broadcast words — no shuffle of
    the fact table at all; the final counts are one partial-aggregated
    summary. False positives are COUNTED exactly by anti-checking
    passed keys against the true key set (gate-scale verification; at
    100 TB the count is replaced by the FPR formula)."""
    t = load_tables(spark, sf_dir)
    sel = (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select(F.col("o_orderkey").cast("string").alias("key"))
        .distinct()
    )

    def pos(i: int, key):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"b{i}:"), key)), 1, 8), 16, 10).cast(
                "long"
            )
            % BLOOM_M
        )

    def fanout(df):
        return df.select(
            "key",
            F.explode(
                F.array(*[pos(i, F.col("key")) for i in range(BLOOM_K)])
            ).alias("p"),
        ).select(
            "key",
            F.expr("p div 62").cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(p % 62 AS INT))").alias("mask"),
        )

    words = fanout(sel).groupBy("word").agg(F.bit_or("mask").alias("wmask"))
    probe_keys = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    passed = (
        fanout(probe_keys.select("key"))
        .join(F.broadcast(words), "word")
        .where(F.expr("(wmask & mask) != 0"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == BLOOM_K)
        .select("key")
    )
    truth = sel.withColumn("is_true", F.lit(1))
    stats = (
        probe_keys.join(passed.withColumn("is_pass", F.lit(1)), "key", "left")
        .join(F.broadcast(truth), "key", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
            F.sum("n_rows").cast("long").alias("n_probe_rows"),
            F.sum(F.coalesce(F.col("is_pass"), F.lit(0))).cast("long").alias("n_pass_keys"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).cast("long").alias("n_true_keys"),
            F.sum(F.expr("n_rows * coalesce(is_pass, 0)")).cast("long").alias("n_pass_rows"),
        )
    )
    return stats.select(
        "n_probe_keys",
        "n_probe_rows",
        "n_true_keys",
        "n_pass_keys",
        (F.col("n_pass_keys") - F.col("n_true_keys")).alias("n_false_pos_keys"),
        "n_pass_rows",
        F.expr(
            "CAST((n_pass_keys - n_true_keys) * 10000"
            " DIV (n_probe_keys - n_true_keys) AS BIGINT)"
        ).alias("fpr_bp"),
    )


ORDERS_BLOOM_SQL = f"""
WITH sel AS (
  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key FROM orders
  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
    AND o_orderpriority = '1-URGENT'),
build AS (
  SELECT p // 62 AS word, BIT_OR(1::BIGINT << CAST(p % 62 AS INT)) AS wmask
  FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql(i, 'key')} AS p FROM sel" for i in range(BLOOM_K))}
  ) GROUP BY 1),
probe_keys AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS key, COUNT(*) AS n_rows
  FROM lineitem GROUP BY 1),
probe_fan AS (
  {" UNION ALL ".join(f"SELECT key, {_bloom_pos_sql(i, 'key')} AS p FROM probe_keys" for i in range(BLOOM_K))}
),
passed AS (
  SELECT key FROM (
    SELECT f.key, COUNT(*) AS n_hit
    FROM (SELECT key, p // 62 AS word, 1::BIGINT << CAST(p % 62 AS INT) AS mask
          FROM probe_fan) f
    JOIN build b ON f.word = b.word
    WHERE (b.wmask & f.mask) != 0
    GROUP BY f.key)
  WHERE n_hit = {BLOOM_K}),
stats AS (
  SELECT COUNT(*) AS n_probe_keys,
         SUM(pk.n_rows) AS n_probe_rows,
         SUM(CASE WHEN p.key IS NOT NULL THEN 1 ELSE 0 END) AS n_pass_keys,
         SUM(CASE WHEN s.key IS NOT NULL THEN 1 ELSE 0 END) AS n_true_keys,
         SUM(CASE WHEN p.key IS NOT NULL THEN pk.n_rows ELSE 0 END) AS n_pass_rows
  FROM probe_keys pk
  LEFT JOIN passed p ON pk.key = p.key
  LEFT JOIN sel s ON pk.key = s.key)
SELECT CAST(n_probe_keys AS BIGINT) AS n_probe_keys,
       CAST(n_probe_rows AS BIGINT) AS n_probe_rows,
       CAST(n_true_keys AS BIGINT) AS n_true_keys,
       CAST(n_pass_keys AS BIGINT) AS n_pass_keys,
       CAST(n_pass_keys - n_true_keys AS BIGINT) AS n_false_pos_keys,
       CAST(n_pass_rows AS BIGINT) AS n_pass_rows,
       CAST((n_pass_keys - n_true_keys) * 10000 // (n_probe_keys - n_true_keys) AS BIGINT)
         AS fpr_bp
FROM stats
"""


def events_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed rank selection — the exact twin the
    approx-quantile sketch above is measured against, as its own
    scalable operator: per event_type, the lower median (and p90) of
    value, computed WITHOUT sorting the data.

    Plan: quantize to integer cents, ONE partial-aggregated groupBy
    collapses the scan to the (type, cents) DOMAIN histogram, a
    cumulative window over that bounded domain finds the smallest value
    whose running count reaches the rank.  The global sort touches
    |distinct cents| rows per group — bounded by the value domain, not
    the event count — the same domain-compression trick as
    parts_skyline.  Rank definition (smallest v with cum ≥ ⌈n/2⌉, no
    interpolation) is engine-neutral; quantization makes the groupBy
    key exact cross-engine (both engines round the same IEEE double)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    hist = (
        t["events"]
        .groupBy(F.col("event_type"), cents.alias("vc"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("vc") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("event_type")
    ranked = hist.select(
        "event_type", "vc",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(tot).alias("n"),
    )
    med_rank = F.ceil(F.col("n") / 2)
    p90_rank = F.ceil(F.col("n") * 9 / 10)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min(F.when(F.col("cum") >= med_rank, F.col("vc")))
            .cast("long").alias("median_cents"),
            F.min(F.when(F.col("cum") >= p90_rank, F.col("vc")))
            .cast("long").alias("p90_cents"),
        )
        .orderBy("event_type")
    )


EVENTS_EXACT_MEDIAN_SQL = """
WITH hist AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, vc,
         SUM(c) OVER (PARTITION BY event_type ORDER BY vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN vc END) AS BIGINT)
         AS median_cents,
       CAST(MIN(CASE WHEN cum >= CEIL(n * 9 / 10.0) THEN vc END) AS BIGINT)
         AS p90_cents
FROM ranked GROUP BY event_type ORDER BY event_type
"""


KANON_BUCKET = 2000  # acctbal bucket width forming the numeric QI


def customer_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a training-
    data pipeline runs before releasing quasi-identified records
    (complements the per-document PII scan): with quasi-identifiers
    (nation, account-balance bucket) and market segment as the
    sensitive attribute, report the equivalence-class-size histogram
    with, per size, how many classes, how many rows, and the WORST
    (minimum) sensitive-value diversity.  The dataset's k is the
    smallest class_size row; rows in small classes are the
    re-identification surface a release would have to suppress or
    generalize.

    Scale shape: ONE partial-aggregated groupBy on the QI key (carrying
    a countDistinct of the sensitive attribute), then a bounded
    second aggregation over the class-size domain — no row-level data
    ever shuffles twice."""
    t = load_tables(spark, sf_dir)
    qi = t["customer"].select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / KANON_BUCKET).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    )
    classes = qi.groupBy("c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("c_mktsegment").alias("l_div"),
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("l_div").cast("long").alias("min_l_diversity"),
        )
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            "n_classes",
            (F.col("n_classes") * F.col("class_size")).cast("long").alias("n_rows"),
            "min_l_diversity",
        )
        .orderBy("class_size")
    )


CUSTOMER_KANON_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, CAST(FLOOR(c_acctbal / {KANON_BUCKET}) AS BIGINT)
           AS bal_bucket,
         COUNT(*) AS class_size,
         COUNT(DISTINCT c_mktsegment) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT CAST(class_size AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) * class_size AS BIGINT) AS n_rows,
       CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
FROM classes GROUP BY class_size ORDER BY class_size
"""


SKETCH_QUERIES: dict[str, tuple] = {
    "customer_kanonymity": (customer_kanonymity, CUSTOMER_KANON_SQL),
    "events_exact_median": (events_exact_median, EVENTS_EXACT_MEDIAN_SQL),
    "orders_bloom_semijoin": (orders_bloom_semijoin, ORDERS_BLOOM_SQL),
    "events_daily_users_sketch": (events_daily_users_sketch, EVENTS_SKETCH_SQL),
    "events_value_quantile_sketch": (events_value_quantile_sketch, EVENTS_QUANTILE_SKETCH_SQL),
    "events_heavy_hitters_cms": (events_heavy_hitters_cms, EVENTS_CMS_SQL),
}
