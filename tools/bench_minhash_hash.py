"""A/B bench: MinHash verified-dedup chain with md5 vs xxhash64 hashing.

The md5 backend exists for DuckDB oracle parity; xxhash64 is the
documented 100 TB path (8-byte long min-hashes and band keys instead of
16-char strings — half the shuffle width, no hex formatting). This
script measures both on the same corpus in one JVM, interleaved A/B,
best-of-N per backend, and prints a JSON line for BENCH/BASELINE.md.

Usage: python tools/bench_minhash_hash.py [--sf-dir /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from csv_to_jsonld_processor_spark.operators.dedup import dedup_minhash_verified
    from csv_to_jsonld_processor_spark.session import get_spark, load_tables

    spark = get_spark("bench-minhash-hash", cpus=args.cpus)
    # page-cache + worker-pool warmup
    load_tables(spark, args.sf_dir)["documents"].count()

    times: dict[str, list[float]] = {"md5": [], "xxhash64": []}
    counts: dict[str, int] = {}
    for rep in range(args.reps):
        for impl in ("md5", "xxhash64"):  # interleaved so drift hits both
            t0 = time.monotonic()
            n = dedup_minhash_verified(spark, args.sf_dir, hash_impl=impl).where(
                "is_dup"
            ).count()
            times[impl].append(time.monotonic() - t0)
            counts[impl] = n

    best = {k: min(v) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "minhash_verified_hash_ab",
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "verified_dups": counts,
                "best_md5_s": round(best["md5"], 3),
                "best_xxhash64_s": round(best["xxhash64"], 3),
                "speedup": round(best["md5"] / best["xxhash64"], 3),
                "all_times": {k: [round(x, 3) for x in v] for k, v in times.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
