"""Sketch aggregates: HLL distinct + approx quantiles verified in-plan
against exact twins (see operators/sketches.py module docstring for the
cross-engine oracle design)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.session import get_spark

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    return get_spark("sketches", cpus=8)


def test_hll_within_tolerance_every_group(spark):
    from csv_to_jsonld_processor_spark.operators.sketches import events_daily_users_sketch

    rows = events_daily_users_sketch(spark, SF).collect()
    assert len(rows) == 30
    assert all(r.within_tol for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_quantile_sketch_within_band_and_exact_is_rank_exact(spark):
    """within_tol holds for every event type, and the 'exact' column is
    truly the rank statistic: recompute p50/p90 by sorting the values in
    plain Python and compare bit-exactly."""
    import math

    from csv_to_jsonld_processor_spark.operators.sketches import (
        events_value_quantile_sketch,
    )
    from csv_to_jsonld_processor_spark.session import load_tables

    got = {r.event_type: r for r in events_value_quantile_sketch(spark, SF).collect()}
    assert got and all(r.within_tol for r in got.values())

    vals = {}
    for r in load_tables(spark, SF)["events"].select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, xs in vals.items():
        xs.sort()
        p50 = round(xs[math.ceil(len(xs) * 0.5) - 1], 6)
        p90 = round(xs[math.ceil(len(xs) * 0.9) - 1], 6)
        assert (got[et].p50, got[et].p90) == (p50, p90), et


def test_cms_never_underestimates_and_is_tight_here(spark):
    """The Count-Min guarantee (estimate >= exact, always) must hold for
    every probed item, and at 500 users x 4x64 counters the top-10
    estimates should be within the classic eps*N bound."""
    from csv_to_jsonld_processor_spark.operators.sketches import (
        CMS_WIDTH,
        events_heavy_hitters_cms,
    )

    rows = events_heavy_hitters_cms(spark, SF).collect()
    assert len(rows) == 10
    assert all(r.never_under for r in rows)
    n_total = 10_000  # sf0.01 events table size
    for r in rows:
        assert r.cms_estimate == r.exact_n + r.overcount
        assert r.overcount <= (2.0 * n_total) / CMS_WIDTH  # e/W * N style bound
