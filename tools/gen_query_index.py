"""Generate QUERIES.md — the navigable index of every registered
query: name, family, one-line summary (docstring first sentence), and
whether a DuckDB oracle covers it. Regenerate:
python tools/gen_query_index.py"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


FAMILIES = [
    ("q", "TPC-H relational archetypes"),
    ("sql_", "Shared-dialect SQL (verbatim text, both engines)"),
    ("cube_", "Relational (cube/rollup/window/setops)"),
    ("rollup_", "Relational (cube/rollup/window/setops)"),
    ("window_", "Relational (cube/rollup/window/setops)"),
    ("semi_", "Relational (cube/rollup/window/setops)"),
    ("customer_", "Customer analytics & privacy"),
    ("orders_", "Orders: baskets, data quality, bloom"),
    ("parts_", "Relational (cube/rollup/window/setops)"),
    ("events_", "Events: time series, streaming twins, statistics"),
    ("doc_", "Documents: text pipeline & corpus curation"),
    ("dedup_", "Deduplication"),
    ("ann_", "ANN / vector indexing"),
    ("embedding_", "Embedding analytics"),
    ("media_", "Multimodal codecs & pipelines"),
    ("warc_", "Web-archive formats"),
    ("fixture_", "Reference fixture parity (CSV -> JSON-LD)"),
    ("table_", "Snapshot table layer (lake features)"),
    ("kg_", "Knowledge graph: construction, SPARQL, graph algorithms"),
    ("corpus_", "Corpus curation composition"),
]


def family_of(name: str) -> str:
    if name[0] == "q" and name[1].isdigit():
        return FAMILIES[0][1]
    for pref, fam in FAMILIES[1:]:
        if name.startswith(pref):
            return fam
    return "Other"


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    line = doc.split("\n\n")[0].replace("\n", " ")
    line = " ".join(line.split())
    return (line[:157] + "...") if len(line) > 160 else line


def main() -> None:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    groups: "OrderedDict[str, list]" = OrderedDict()
    for name in sorted(qs):
        groups.setdefault(family_of(name), []).append(name)

    out = [
        "# QUERIES — registered query index",
        "",
        f"{len(qs)} queries registered in `__spark_entry__.queries()`; "
        f"{len(oracles)} carry a DuckDB oracle "
        "(`tools/gen_query_index.py` regenerates this file).",
        "",
    ]
    for fam in sorted(groups):
        out.append(f"## {fam} ({len(groups[fam])})")
        out.append("")
        out.append("| query | oracle | summary |")
        out.append("|---|---|---|")
        for name in groups[fam]:
            mark = "exact" if name in oracles else "rows-only"
            out.append(f"| `{name}` | {mark} | {first_line(qs[name])} |")
        out.append("")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(out))
    print(f"{len(qs)} queries -> QUERIES.md")


if __name__ == "__main__":
    main()
