"""Driver-sample rotation: the correctness harness samples a 50-prefix
of queries() in dict order, so never-yet-verified queries MUST sort
before already-green ones (round-3 verdict: fixture_triples sat at
index 83 for two rounds and was never re-sampled)."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def _verified_names() -> set:
    repo = os.path.dirname(os.path.abspath(entry.__file__))
    out = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("rows_match") and row.get("hash_match"):
                    out.add(name)
    return out


def test_stale_queries_sort_first():
    names = list(entry.queries().keys())
    verified = _verified_names()
    flags = [n in verified for n in names]
    # once the first verified name appears, everything after is verified:
    # the order is exactly (stale..., verified...)
    if True in flags:
        first_green = flags.index(True)
        assert all(flags[first_green:]), "stale query sorted after a verified one"
    # the driver's 50-prefix sample window must never waste a slot on a
    # verified query while stale ones wait: either every stale query
    # fits in the window, or the window is entirely stale (the overflow
    # is queued next — least-recently-verified ordering picks it up)
    n_stale = flags.count(False)
    window = flags[:50]
    assert n_stale <= 50 or not any(window), (
        f"{n_stale} stale queries but the 50-slot window still contains "
        "a verified one"
    )


def test_rotation_is_least_recently_verified():
    """The sort key is each query's LATEST green round — verified
    queries must appear in non-decreasing last-green order, so the
    window keeps cycling instead of freezing once everything has been
    green once (round-4 ADVICE)."""
    import re

    repo = os.path.dirname(os.path.abspath(entry.__file__))
    last_green = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("rows_match") and row.get("hash_match"):
                    last_green[name] = max(last_green.get(name, 0), rnd)
    rounds = [last_green.get(n, 0) for n in entry.queries()]
    assert rounds == sorted(rounds), "queries not in least-recently-verified order"
    # and the most-recently-sampled round's queries sit at the BACK
    if last_green:
        assert rounds[-1] == max(last_green.values())


def test_oracle_keys_match_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 100  # round-4 surface: every entry oracled
    assert set(q) == set(o)  # no weaker rows-only entries
