"""Structured Streaming variants of the batch event operators.

The reference is batch-only (SURVEY §2.7 declares streaming absent);
these are the additive capabilities: tumbling-window rollups with
watermarked late-data handling, and session windows. Each streaming op
has a batch twin so tests can assert stream == batch on a bounded input
(the unit of correctness for Structured Streaming's incremental
execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"
SESSION_GAP_SEC = 30 * 60


def hourly_rollup_batch(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_rollup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup: late rows beyond the watermark
    are dropped; append-mode emits each window once it is final."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Session windows per user (built-in session_window): bounds emitted
    as min/max event time so batch, stream, and the SQL oracle agree."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(stream: DataFrame, watermark: str = "2 hours", gap: str = SESSION_GAP) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def run_stream_over_dir(
    spark: SparkSession,
    input_dir: str,
    transform,
    schema: str,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """File-source stream → transform → memory sink, drained to
    completion (availableNow) — the test harness for stream==batch.

    Default complete mode: on a *bounded* drain, append mode can never
    emit windows younger than the final watermark (no future data will
    close them), so stream==batch holds only in complete mode. In
    production (unbounded input) the same queries run in append mode and
    windows finalize as the watermark passes them."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# --- batch sessionization as a driver-gated query -------------------------


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_tables

    t = load_tables(spark, sf_dir)
    s = sessionize_batch(t["events"].where(F.col("user_id") < 20))
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


EVENTS_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL {SESSION_GAP_SEC} SECOND
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 20
), s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

STREAMING_QUERIES: dict[str, tuple] = {
    "events_sessionization": (events_sessionization, EVENTS_SESSION_SQL),
}
