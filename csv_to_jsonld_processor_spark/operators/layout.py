"""Table layout ops — the file-level hygiene a 100 TB lake lives or
dies by: hive-partitioned writes (so predicates prune whole directories
before any I/O), and small-file compaction (streaming/incremental
ingestion fragments partitions into thousands of KB-files; scans then
pay per-file open cost and the driver pays per-file listing cost).

Both are metadata-driven: compaction sizes its output from the actual
on-disk bytes per partition, so a hot partition compacts to many
target-sized files while a cold one collapses to one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, by: list[str]) -> None:
    """Hive-layout parquet write partitioned by ``by`` (directory per
    key value — the layout partition pruning needs)."""
    df.write.mode("overwrite").partitionBy(*by).parquet(path)


def partition_file_stats(spark: SparkSession, path: str) -> list[tuple[str, int, int]]:
    """[(partition_dir, n_files, total_bytes)] from the filesystem —
    JVM Hadoop FS, so it works on any scheme the cluster can read."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    out = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        ]
        out.append((name, len(files), sum(f.getLen() for f in files)))
    return sorted(out)


def compact_partitions(
    spark: SparkSession, path: str, by: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite each hive partition of ``path`` into
    ceil(partition_bytes / target_bytes) files.

    Plan shape: ONE job — the reader keeps the partition column, a
    repartition on (partition column, bucket) spreads rows into exactly
    the per-partition file budget, and dynamic partition overwrite
    swaps each directory atomically-per-partition (same crash contract
    as the resume ledger's data writes). The per-partition byte sizes
    come from file metadata, not a data scan.

    Returns {"before": n_files, "after": n_files, "partitions": n}.
    """
    stats = partition_file_stats(spark, path)
    before = sum(n for _p, n, _b in stats)
    # partition dir name "day=2024-01-01" → value string after '='
    n_files = {
        p.split("=", 1)[1]: max(1, math.ceil(b / target_bytes)) for p, _n, b in stats
    }
    df = spark.read.parquet(path)
    mapping = F.create_map(*[F.lit(x) for kv in n_files.items() for x in (kv[0], kv[1])])
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns if c != by]),
        mapping[F.col(by).cast("string")],
    )
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    total_buckets = sum(n_files.values())
    try:
        # explicit partition count: an unpinned repartition(cols) is fair
        # game for AQE partition coalescing, which would merge the
        # per-bucket splits back into one task (and one file)
        (
            df.repartition(total_buckets, F.col(by), bucket)
            .write.mode("overwrite")
            .partitionBy(by)
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    after_stats = partition_file_stats(spark, path)
    return {
        "before": before,
        "after": sum(n for _p, n, _b in after_stats),
        "partitions": len(after_stats),
    }
