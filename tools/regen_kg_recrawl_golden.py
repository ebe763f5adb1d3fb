"""Regenerate tests/golden/kg_incremental_recrawl.csv — the
TRUTH-ANCHORED full-table golden for the POST-RECRAWL corpus edges.

The post-recrawl corpus is the seed-42 1,000-page corpus with pages
idx % 10 == 3 re-crawled under content seed 43 (same url/lang, new
facts — sources/pages.py recrawled_page_record). Derived purely from
the generator's fact lists, never from the pipeline, exactly like
tools/regen_kg_edges_golden.py.

Usage: python tools/regen_kg_recrawl_golden.py
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
BASE_SEED = 42
CONTENT_SEED = 43
MOD, RESIDUE = 10, 3


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
        rec = page_record(idx, BASE_SEED)  # identity: url + lang
        if rec["lang"] != "en":
            continue
        seed = CONTENT_SEED if idx % MOD == RESIDUE else BASE_SEED
        for si, (_sent, s, p, o) in enumerate(page_sentences(idx, seed)):
            if s is not None:
                rows.append((rec["url"], si, eiri(s), TERMS + p, eiri(o)))
    rows.sort()
    out = REPO / "tests" / "golden" / "kg_incremental_recrawl.csv"
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "sent_idx", "subj", "pred", "obj"])
        w.writerows(rows)
    print(f"{len(rows)} edges -> {out}")


if __name__ == "__main__":
    main()
