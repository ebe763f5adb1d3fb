"""Structured Streaming == batch on bounded input (availableNow drain),
plus watermark late-data semantics."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.session import get_spark

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


@pytest.fixture(scope="module")
def spark():
    return get_spark("streaming", cpus=8)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _norm(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_hourly_rollup_stream_equals_batch(spark, events_dir):
    from csv_to_jsonld_processor_spark.streaming.events import (
        hourly_rollup_batch,
        hourly_rollup_stream,
        run_stream_over_dir,
    )

    batch = hourly_rollup_batch(spark.read.parquet(events_dir))
    stream = run_stream_over_dir(
        spark, events_dir, hourly_rollup_stream, EVENTS_SCHEMA, "rollup_mem"
    )
    cols = ["window_start", "event_type", "n_events"]
    assert _norm(stream, cols) == _norm(batch, cols)


def test_sessionize_stream_equals_batch(spark, events_dir):
    from pyspark.sql import functions as F

    from csv_to_jsonld_processor_spark.streaming.events import (
        run_stream_over_dir,
        sessionize_batch,
        sessionize_stream,
    )

    src = spark.read.parquet(events_dir).where(F.col("user_id") < 10)
    batch = sessionize_batch(src)

    def xform(stream):
        return sessionize_stream(stream.where(F.col("user_id") < 10))

    stream = run_stream_over_dir(spark, events_dir, xform, EVENTS_SCHEMA, "sessions_mem")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _norm(stream, cols) == _norm(batch, cols)
