"""Regenerate tests/golden/kg_recrawl_obs.csv — the RAW recrawl
observation stream for the temporal-KG query, derived purely from the
deterministic generator (sources/pages.py::recrawl_facts, no Spark, no
pipeline involvement). The DuckDB oracle recomputes the temporal
resolution (latest-crawl-wins snapshot diff) INDEPENDENTLY from these
raw rows, so the golden anchors the input, not the answer.

Usage: python tools/regen_recrawls_golden.py [n_urls]
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.sources.pages import recrawl_facts

N_URLS = int(sys.argv[1]) if len(sys.argv) > 1 else 400

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "kg_recrawl_obs.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["url", "crawl_id", "crawl_ts_epoch", "subj", "pred", "obj"])
    for i in range(N_URLS):
        for row in recrawl_facts(i):
            w.writerow(row)
print(f"wrote {out} ({N_URLS} urls)")
