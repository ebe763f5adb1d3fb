"""Regenerate tests/golden/kg_webtext_edges.csv — the TRUTH-ANCHORED
full-table golden for the flagship pipeline's edge output.

Derived purely from the synthetic generator's own fact list
(sources/pages.py page_sentences), NOT from the pipeline: sent_idx is
the fact's position in the page's sentence sequence (fillers included),
entity IRIs come from the shared namespacing rule (iri.to_kebab_case —
the schema, per reference F10). Verified multiset-equal to the pipeline
output (2,790 edges on the seed-42 1,000-page corpus).

Usage: python tools/regen_kg_edges_golden.py
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

KG_IDS = "http://example.org/kg/ids/"
TERMS = "http://example.org/kg/terms/"
N_PAGES = 1000
SEED = 42


def main() -> None:
    from csv_to_jsonld_processor_spark.iri import to_kebab_case
    from csv_to_jsonld_processor_spark.sources.pages import (
        ENTITIES,
        page_record,
        page_sentences,
    )

    cls_of = {canonical: cls for canonical, _aliases, cls in ENTITIES}

    def eiri(name: str) -> str:
        return f"{KG_IDS}{to_kebab_case(cls_of[name])}/{to_kebab_case(name)}"

    rows = []
    for idx in range(N_PAGES):
        rec = page_record(idx, SEED)
        if rec["lang"] != "en":
            continue
        for si, (_sent, s, p, o) in enumerate(page_sentences(idx, SEED)):
            if s is not None:
                rows.append((rec["url"], si, eiri(s), TERMS + p, eiri(o)))
    rows.sort()
    out = REPO / "tests" / "golden" / "kg_webtext_edges.csv"
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "sent_idx", "subj", "pred", "obj"])
        w.writerows(rows)
    print(f"{len(rows)} edges -> {out}")


if __name__ == "__main__":
    main()
