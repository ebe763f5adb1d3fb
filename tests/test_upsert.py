"""merge_upsert row-level semantics: insert / update / unchanged
provenance, idempotent replays, and NULL-safe change detection (a
NULL→NULL column must not read as a change; NULL→value must)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from csv_to_jsonld_processor_spark.session import get_spark

    return get_spark("upsert", cpus=4)


def test_merge_upsert_provenance_and_null_safety(spark):
    from csv_to_jsonld_processor_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", None), (2, "b", 10.0), (3, "c", 30.0), (4, "d", None)],
        "k int, name string, val double",
    )
    delta = spark.createDataFrame(
        [
            (2, "b", 10.0),   # identical replay -> unchanged
            (3, "c", 99.0),   # value change -> updated
            (4, "d", 5.0),    # NULL -> value  -> updated
            (5, "e", 1.0),    # new key        -> inserted
        ],
        "k int, name string, val double",
    )
    rows = {
        r.k: (r.name, r.val, r._merge_status)
        for r in merge_upsert(base, delta, "k").collect()
    }
    assert rows[1] == ("a", None, "unchanged")  # not in delta
    assert rows[2] == ("b", 10.0, "unchanged")  # idempotent replay
    assert rows[3] == ("c", 99.0, "updated")
    assert rows[4] == ("d", 5.0, "updated")     # NULL -> value is a change
    assert rows[5] == ("e", 1.0, "inserted")
    assert len(rows) == 5


def test_merge_upsert_properties_randomized(spark):
    """Seeded randomized property check over small key spaces: merged
    keys = base ∪ delta; delta rows always win; provenance is exactly
    determined by key membership + row equality."""
    import random

    from csv_to_jsonld_processor_spark.operators.upsert import merge_upsert

    for seed in range(5):
        rng = random.Random(seed)
        keys = range(12)
        base = {k: (f"n{rng.randint(0, 3)}", float(rng.randint(0, 3))) for k in keys if rng.random() < 0.7}
        delta = {k: (f"n{rng.randint(0, 3)}", float(rng.randint(0, 3))) for k in keys if rng.random() < 0.7}
        bdf = spark.createDataFrame(
            [(k, *v) for k, v in base.items()], "k int, name string, val double"
        )
        ddf = spark.createDataFrame(
            [(k, *v) for k, v in delta.items()], "k int, name string, val double"
        )
        got = {r.k: (r.name, r.val, r._merge_status) for r in merge_upsert(bdf, ddf, "k").collect()}

        assert set(got) == set(base) | set(delta), f"seed {seed}: key set wrong"
        for k, (name, val, status) in got.items():
            expect_row = delta.get(k, base.get(k))
            assert (name, val) == expect_row, f"seed {seed} k={k}: delta must win"
            if k in delta and k not in base:
                assert status == "inserted"
            elif k not in delta:
                assert status == "unchanged"
            else:
                assert status == ("updated" if delta[k] != base[k] else "unchanged"), (
                    f"seed {seed} k={k}"
                )
