"""N-vs-4N scaling of the MinHash dedup chain (the second workload
family behind the KG pipeline in tools/scaling.py — evidence the
training-data operators scale, not just the extraction pipeline).

Protocol mirrors scaling.py: a deterministic web corpus (generate_pages
text) is materialized to parquet ONCE; each parallelism config runs the
full verified chain (signature agg → banded self-join → exact-Jaccard
verify) in its own JVM, best-of-2 in-JVM iterations after a warm-up.
The chain is shuffle-bound (signature aggregation) rather than
Python-bound like the KG extract, so it probes a different scaling
regime. xxhash64 backend (the scale path; md5 exists only for DuckDB
oracle parity).

Usage: python tools/dedup_scaling.py [--docs 1000000] [--skip-secondary]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cpus: int, docs_dir: str, max_bucket: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from csv_to_jsonld_processor_spark.operators.dedup import verified_pairs
    from csv_to_jsonld_processor_spark.session import get_spark

    spark = get_spark(
        "dedup-scaling",
        cpus=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.files.openCostInBytes": "1048576",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_dir)
    docs.write.format("noop").mode("overwrite").save()  # page-cache warm
    verified_pairs(docs.limit(20_000), hash_impl="xxhash64", max_bucket=max_bucket).write.format("noop").mode(
        "overwrite"
    ).save()  # JIT warm

    best = float("inf")
    n_pairs = 0
    for _ in range(2):
        t0 = time.perf_counter()
        out = verified_pairs(docs, hash_impl="xxhash64", max_bucket=max_bucket)
        n_pairs = out.count()
        best = min(best, time.perf_counter() - t0)
    n_docs = docs.count()
    return {
        "cpus": cpus,
        "seconds": round(best, 3),
        "docs": n_docs,
        "pairs": n_pairs,
        "docs_per_sec": round(n_docs / best, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--skip-secondary", action="store_true")
    ap.add_argument("--run-one", type=int, default=0, help="internal: one config")
    ap.add_argument("--docs-dir", default="")
    ap.add_argument("--max-bucket", type=int, default=0, help="0 = uncapped")
    args = ap.parse_args()

    if args.run_one:
        print(json.dumps(run_one(args.run_one, args.docs_dir, args.max_bucket or None)))
        return

    work = tempfile.mkdtemp(prefix="dedup_scaling_")
    docs_dir = os.path.join(work, "docs")
    from csv_to_jsonld_processor_spark.session import get_spark
    from csv_to_jsonld_processor_spark.sources.pages import generate_pages

    spark = get_spark("dedup-scaling-gen", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    # the KG generator's sentences are heavily templated — raw, they
    # collapse into mega band-buckets (~95M candidate pairs at 1M docs),
    # which measures a pair-explosion artifact instead of chain
    # throughput. Salting each text with its unique url tokens restores
    # realistic shingle diversity while keeping generation deterministic.
    generate_pages(spark, args.docs, seed=42).selectExpr(
        "monotonically_increasing_id() AS doc_id",
        "concat(text, ' ', translate(url, '/:.-', '    ')) AS text",
    ).write.mode("overwrite").parquet(docs_dir)
    spark.stop()

    def spawn(cpus: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "dedup_scaling.py"),
             "--run-one", str(cpus), "--docs-dir", docs_dir],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    results = {}
    for cpus in ([16, 4, 16, 4] if not args.skip_secondary else [16, 4]):
        r = spawn(cpus)
        print(f"  local[{cpus}]: {r['seconds']}s ({r['docs_per_sec']:,.0f} docs/s)", flush=True)
        k = f"local{cpus}"
        if k not in results or r["seconds"] < results[k]["seconds"]:
            results[k] = r

    eff = (results["local4"]["seconds"] / results["local16"]["seconds"]) / 4.0
    out = {
        "metric": "dedup_chain_scaling",
        "docs": results["local16"]["docs"],
        "pairs": results["local16"]["pairs"],
        "local4_seconds": results["local4"]["seconds"],
        "local16_seconds": results["local16"]["seconds"],
        "efficiency_4_to_16": round(eff, 3),
    }
    print(json.dumps(out))

    md = f"""

## MinHash dedup chain scaling, N=4 → 4N=16 ({time.strftime("%Y-%m-%d %H:%M:%S")})

Full verified chain (xxhash64 signatures → banded LSH self-join →
exact-Jaccard verify) over {out["docs"]:,} generated web pages
({out["pairs"]:,} candidate pairs), same parquet input, each config in
its own JVM, best of 2 runs × 2 alternating spawns:

| config | wall (s) | throughput (docs/s) |
|---|---|---|
| local[4]  (N)  | {results["local4"]["seconds"]} | {results["local4"]["docs_per_sec"]:,.0f} |
| local[16] (4N) | {results["local16"]["seconds"]} | {results["local16"]["docs_per_sec"]:,.0f} |

**Scaling efficiency {out["efficiency_4_to_16"]:.3f}** — the chain is
shuffle-bound (signature aggregation), a different regime from the
Python-bound KG extract measured above.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print("appended BENCH/BASELINE.md section")


if __name__ == "__main__":
    main()
