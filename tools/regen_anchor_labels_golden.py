"""Regenerate tests/golden/kg_anchor_labels.csv — the TRUTH-ANCHORED
golden for canonical-label election over the flagship pipeline's
linked mentions.

Derived purely from the synthetic generator's own fact list
(sources/pages.py page_facts: the subject/object alias picked for each
fact sentence), NOT from the pipeline: for every English page, each
fact contributes one subject-surface and one object-surface occurrence
to its canonical entity. The elected anchor label per entity is the
most frequent surface, ties broken by lexicographically smallest
surface — the same rule the Spark-side election implements over the
actual extracted+linked mentions. The two agree iff extraction+linking
is exact on the seed-42 corpus (separately proven by the full-table
hash-green kg_webtext_edges golden).

Usage: python tools/regen_anchor_labels_golden.py
"""

from __future__ import annotations

import csv
import sys
from collections import Counter, defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PAGES = 1000
SEED = 42


def main() -> None:
    from csv_to_jsonld_processor_spark.sources.pages import page_facts, page_record

    counts: dict[str, Counter] = defaultdict(Counter)
    for idx in range(N_PAGES):
        rec = page_record(idx, SEED)
        if rec["lang"] != "en":
            continue
        for _sent, s, _p, o, s_alias, o_alias in page_facts(idx, SEED):
            if s is None:
                continue
            counts[s][s_alias] += 1
            counts[o][o_alias] += 1

    rows = []
    for entity in sorted(counts):
        c = counts[entity]
        # election rule: max count, then lexicographically smallest surface
        label = min(c, key=lambda s: (-c[s], s))
        rows.append(
            (entity, label, c[label], sum(c.values()), len(c))
        )

    out = REPO / "tests" / "golden" / "kg_anchor_labels.csv"
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["entity", "anchor_label", "n_label_mentions", "n_total_mentions", "n_surfaces"]
        )
        w.writerows(rows)
    print(f"{len(rows)} entities -> {out}")


if __name__ == "__main__":
    main()
