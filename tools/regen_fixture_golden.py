"""Regenerate tests/golden/fixture_triples.csv from the INDEPENDENT
reference-semantics oracle (tests/oracle_reference.py — not the Spark
engine). Run only when reference semantics are intentionally re-derived;
the driver's fixture_triples hash gate pins this file.

Usage: python tools/regen_fixture_golden.py
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    from csv_to_jsonld_processor_spark.plans.fixture_queries import (
        FIXTURES,
        _load_fixture_manifest,
    )
    from csv_to_jsonld_processor_spark.vocabulary import compile_vocabulary
    from oracle_reference import oracle_triples

    manifest = _load_fixture_manifest()
    vocab = compile_vocabulary(manifest, FIXTURES)
    rows = sorted(oracle_triples(manifest, vocab, FIXTURES))
    out = REPO / "tests" / "golden" / "fixture_triples.csv"
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["subj", "pred", "obj", "obj_kind"])
        w.writerows(rows)
    print(f"{len(rows)} triples -> {out}")


if __name__ == "__main__":
    main()
