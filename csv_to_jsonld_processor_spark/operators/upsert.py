"""MERGE/upsert — the lakehouse CDC pattern (refresh crawls, entity
re-resolution, dimension updates). Spark has no batch MERGE INTO against
plain parquet, so the operator expresses the same semantics as ONE
full-outer join keyed on the merge key:

    result column  = coalesce(delta value, base value)
    row provenance = inserted (delta only) / updated (both, any column
                     differs) / unchanged (base only, or both-equal)

Scale shape: one shuffle on the merge key for the join (or zero with
bucketed base+delta tables — see tests/test_bucketed_join.py); the
provenance tags are row-local column algebra. At lakehouse scale the
same plan runs under Delta/Iceberg MERGE INTO; this operator is the
engine-native equivalent with identical row-level semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_tables

DEC = "decimal(18,4)"


def merge_upsert(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Full-outer merge of ``delta`` into ``base`` on ``key``. Returns
    the merged table plus a ``_merge_status`` column
    (inserted/updated/unchanged). Column set = base's columns; delta
    must carry the same schema."""
    cols = base.columns
    b = base.select([F.col(c).alias(f"_b_{c}") for c in cols])
    d = delta.select([F.col(c).alias(f"_d_{c}") for c in cols])
    j = b.join(d, b[f"_b_{key}"] == d[f"_d_{key}"], "full_outer")

    changed = F.lit(False)
    for c in cols:
        if c != key:
            changed = changed | ~F.col(f"_b_{c}").eqNullSafe(F.col(f"_d_{c}"))
    status = (
        F.when(F.col(f"_b_{key}").isNull(), F.lit("inserted"))
        .when(F.col(f"_d_{key}").isNull(), F.lit("unchanged"))
        .when(changed, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out = [
        F.coalesce(F.col(f"_d_{c}"), F.col(f"_b_{c}")).alias(c) for c in cols
    ]
    return j.select(*out, status.alias("_merge_status"))


def customer_upsert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated MERGE: a deterministic delta against customer —
    every custkey % 7 == 0 gets +100 on acctbal (update), every
    custkey % 13 == 0 is re-delivered UNCHANGED (idempotent replay —
    must land as 'unchanged', the case naive upserts miscount), and a
    shifted copy of custkey % 11 == 0 arrives with key + 10_000_000
    (insert). Per-nation provenance counts + post-merge decimal balance
    prove row-level merge semantics end-to-end."""
    t = load_tables(spark, sf_dir)
    base = t["customer"].select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    updates = base.where(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    replays = base.where(F.col("c_custkey") % 13 == 0)
    inserts = base.where(F.col("c_custkey") % 11 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 10_000_000
    )
    delta = updates.unionAll(replays).unionAll(inserts)
    # replayed rows that are ALSO updates would duplicate the key: drop
    # replays that collide with an update (update wins, deterministic)
    delta = (
        delta.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("c_custkey").orderBy(F.desc("c_acctbal"))
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    merged = merge_upsert(base, delta, "c_custkey")
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("_merge_status") == "inserted", 1).otherwise(0))
            .cast("long")
            .alias("n_inserted"),
            F.sum(F.when(F.col("_merge_status") == "updated", 1).otherwise(0))
            .cast("long")
            .alias("n_updated"),
            F.sum(F.when(F.col("_merge_status") == "unchanged", 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("balance_after"),
        )
        .orderBy("c_nationkey")
    )


CUSTOMER_UPSERT_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
), updates AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM base WHERE c_custkey % 7 = 0
), replays AS (
  SELECT * FROM base WHERE c_custkey % 13 = 0
), inserts AS (
  SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM base WHERE c_custkey % 11 = 0
), delta_all AS (
  SELECT * FROM updates UNION ALL SELECT * FROM replays UNION ALL SELECT * FROM inserts
), delta AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY c_acctbal DESC) AS rn
    FROM delta_all
  ) WHERE rn = 1
), merged AS (
  SELECT COALESCE(d.c_custkey, b.c_custkey) AS c_custkey,
         COALESCE(d.c_nationkey, b.c_nationkey) AS c_nationkey,
         COALESCE(d.c_acctbal, b.c_acctbal) AS c_acctbal,
         CASE WHEN b.c_custkey IS NULL THEN 'inserted'
              WHEN d.c_custkey IS NULL THEN 'unchanged'
              WHEN d.c_acctbal IS DISTINCT FROM b.c_acctbal
                OR d.c_name IS DISTINCT FROM b.c_name
                OR d.c_nationkey IS DISTINCT FROM b.c_nationkey
                OR d.c_mktsegment IS DISTINCT FROM b.c_mktsegment THEN 'updated'
              ELSE 'unchanged' END AS status
  FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
)
SELECT c_nationkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN status = 'inserted' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
       CAST(SUM(CASE WHEN status = 'updated' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance_after
FROM merged GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --- incremental aggregate-view maintenance ---------------------------------

IVM_BATCHES = 3


def merge_rollup(mv: DataFrame, delta_agg: DataFrame) -> DataFrame:
    """Merge a new batch's partial aggregate into the materialized
    rollup: union + ONE re-aggregation on the view key. Correct only
    because every maintained aggregate is a commutative monoid
    (SUM/COUNT/MIN/MAX merge losslessly from partials); COUNT DISTINCT
    is deliberately absent — it is not mergeable from scalars and needs
    a per-key state sketch (HLL, see events_daily_users_sketch) or the
    raw key set."""
    return (
        mv.unionByName(delta_agg)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast(DEC).alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def _rollup_agg(events: DataFrame) -> DataFrame:
    return events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast(DEC).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the (day, event_type) rollup —
    the never-recompute-the-history pattern: the event stream arrives
    as {IVM_BATCHES} batches (md5-hash split, deterministic), each
    batch is aggregated ALONE and merged into the running materialized
    view via ``merge_rollup``. The registered output is the final MV;
    the DuckDB oracle computes the same rollup FROM SCRATCH over all
    events — so the hash gate proves the incremental fold is lossless,
    which is the entire correctness obligation of IVM. Money-typed
    sums ride DECIMAL(18,4) end-to-end (order-independent), so the
    batch split cannot flip a ULP.

    Scale shape: each batch merge shuffles only |MV| + |batch-agg|
    partial rows on the view key (map-side combined) — at 100 TB/day
    the MV is thousands of rows while the day's raw events are
    billions; recomputing from scratch would re-shuffle the full
    history every refresh. Batch splitting here is a column predicate
    on the same scan; in production each batch is its own arriving
    partition/file set."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % IVM_BATCHES
    mv = None
    for b in range(IVM_BATCHES):
        delta = _rollup_agg(ev.where(bucket == b))
        mv = delta if mv is None else merge_rollup(mv, delta).localCheckpoint()
    return mv.select(
        "day",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("day", "event_type")


EVENTS_IVM_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


UPSERT_QUERIES: dict[str, tuple] = {
    "customer_upsert_stats": (customer_upsert_stats, CUSTOMER_UPSERT_SQL),
    "events_incremental_rollup": (events_incremental_rollup, EVENTS_IVM_SQL),
}
