"""Regenerate tests/golden/warc_host_stats.csv from the page generator
ground truth ONLY (no Spark, no WARC codec) — the truth anchor for
``warc_roundtrip_stats``: per-host record count, total html bytes, and
the order-free md5-prefix checksum the engine must reproduce after a
full encode→decode round trip."""

import csv
import hashlib
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.sources.pages import page_record
from csv_to_jsonld_processor_spark.sources.warc import (
    WARC_N_PAGES,
    WARC_SEED,
    _GOLDEN_WARC,
)


def main():
    stats = defaultdict(lambda: [0, 0, 0])
    for i in range(WARC_N_PAGES):
        rec = page_record(i, WARC_SEED)
        host = rec["url"].split("/")[2]
        html = rec["html"]
        s = stats[host]
        s[0] += 1
        s[1] += len(html)
        s[2] += int(hashlib.md5(html).hexdigest()[:8], 16)
    with open(_GOLDEN_WARC, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["host", "n_records", "total_html_bytes", "checksum"])
        for host in sorted(stats):
            n, b, c = stats[host]
            w.writerow([host, n, b, c])
    print(f"wrote {_GOLDEN_WARC}: {len(stats)} hosts")


if __name__ == "__main__":
    main()
