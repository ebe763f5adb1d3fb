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
    the per-partition file budget. The per-partition byte sizes come
    from file metadata, not a data scan.

    Crash contract: the compacted table is STAGED to a sibling
    ``<path>.compacting`` directory first (the job never writes into
    the tree it is reading — Spark's self-overwrite guard can abort
    that, and a mid-commit failure would leave a mix of rewritten and
    stale partitions); only after the whole staged write succeeds are
    partition directories swapped in one-by-one via Hadoop FS rename.
    A crash mid-swap leaves every partition complete and valid — some
    compacted, some not — i.e. genuinely atomic per partition. A crash
    before the swap leaves the table untouched plus an orphan staging
    dir that the next run clears.

    Partition values are hive-unescaped (%XX) before the file-budget
    lookup, so a value needing escaping (spaces, '/', '=') still finds
    its bucket count; the directory swap itself is name-based and never
    decodes.

    Returns {"before": n_files, "after": n_files, "partitions": n}.
    """
    from urllib.parse import unquote

    stats = partition_file_stats(spark, path)
    before = sum(n for _p, n, _b in stats)
    # partition dir name "day=2024-01-01" → value string after '=',
    # hive-unescaped to match the column's actual value
    n_files = {
        unquote(p.split("=", 1)[1]): max(1, math.ceil(b / target_bytes))
        for p, _n, b in stats
    }
    df = spark.read.parquet(path)
    mapping = F.create_map(*[F.lit(x) for kv in n_files.items() for x in (kv[0], kv[1])])
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns if c != by]),
        mapping[F.col(by).cast("string")],
    )
    total_buckets = sum(n_files.values())

    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    staging = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".compacting")
    fs.delete(staging, True)  # clear any orphan from a previous crash

    # explicit partition count: an unpinned repartition(cols) is fair
    # game for AQE partition coalescing, which would merge the
    # per-bucket splits back into one task (and one file)
    (
        df.repartition(total_buckets, F.col(by), bucket)
        .write.mode("overwrite")
        .partitionBy(by)
        .parquet(str(staging))
    )
    # staged write fully committed — swap partition dirs name-by-name
    for st in fs.listStatus(staging):
        name = st.getPath().getName()
        if not st.isDirectory() or name.startswith(("_", ".")):
            continue
        dest = jvm.org.apache.hadoop.fs.Path(root, name)
        fs.delete(dest, True)
        fs.rename(st.getPath(), dest)
    fs.delete(staging, True)

    after_stats = partition_file_stats(spark, path)
    return {
        "before": before,
        "after": sum(n for _p, n, _b in after_stats),
        "partitions": len(after_stats),
    }
