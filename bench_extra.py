"""Subset benchmark for optimization work (bench.py is FROZEN for the
driver's measurement; this file exists so before/after numbers for
individual queries can be taken without a 15-minute full-suite run).

Same methodology as bench.py: one untimed warm-up execution per query,
then QUERY_REPS timed runs through the noop sink, median reported,
plus the single-thread noise probe so numbers from different windows
can be compared against the documented shared-VM noise envelope.

Usage:
    python bench_extra.py q1 q2 ...        # bench the named queries
    python bench_extra.py --reps 5 q1 ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from csv_to_jsonld_processor_spark.session import get_spark

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # identical extra_conf to bench.py so subset numbers are comparable
    # with the frozen driver bench
    spark = get_spark(
        "bench_extra",
        cpus=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.files.openCostInBytes": "1048576",
            "spark.sql.execution.arrow.pyspark.selfDestruct.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    p0 = probe()
    medians: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in args.names:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"warm:{name}")
        qs[name](spark, args.sf_dir).count()
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench:{name}:{i}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        medians[name] = round(statistics.median(reps), 3)
        spread[name] = [round(min(reps), 3), round(max(reps), 3)]
    p1 = probe()
    print(json.dumps({
        "queries": medians,
        "spread": spread,
        "total": round(sum(medians.values()), 3),
        "probe_before": p0,
        "probe_after": p1,
        "sf_dir": args.sf_dir,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
