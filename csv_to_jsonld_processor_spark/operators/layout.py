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


# --- Z-order (space-filling-curve) layout audit -----------------------------

ZORDER_FILES = 32
# query boxes: day bounds absolute (domain is fixed Jan 2024); user bounds
# as percent of the observed user range so the box stays non-degenerate at
# every SF (user cardinality scales 15 → 1500 with SF).
ZORDER_BOXES = [  # (query, ux1_pct, ux2_pct, y1, y2); None pct = full range
    ("day_range", None, None, 10, 19),
    ("user_range", 27, 33, 0, 29),
    ("both_range", 27, 33, 10, 19),
]


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multidimensional-clustering audit — the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` decision made measurable. The events table
    is laid out into {ZORDER_FILES} files under three sort orders —
    day-major ``(day, user)``, user-major ``(user, day)``, and the
    Morton Z-curve over both keys — and three canonical query boxes
    (a day range, a user range, and a 2-D box) are costed purely from
    per-file min/max footer stats, exactly how a parquet reader
    prunes. Each linear order wins its own aligned query and collapses
    on the orthogonal one (every file spans the full secondary-key
    range); the Z-curve bounds BOTH dimensions' spans per file, so it
    stays within a small factor of optimal for every box — the whole
    argument for Z-ordering a 100 TB fact table serving mixed filter
    shapes.

    The curve interleaves 8 bits of each key AFTER min/max range
    normalization — the step real Z-order writers do by range sampling.
    Skipping it is the classic Z-order trap (measured here before the
    fix): user_id carries 8 significant bits vs day's 5, so the raw
    interleave is user-dominated and a day-range query opened 31/32
    files; normalized, both dimensions prune.

    Output: (layout, query, n_files, files_opened, rows_scanned,
    rows_matched) — rows_matched is layout-invariant (pytest-pinned);
    rows_scanned is what the cluster actually reads.

    Scale shape: the audit rides one scan (bit-interleave is integer
    column algebra; the min/max bounds are one scalar aggregate
    broadcast back). File assignment here uses a single global
    row_number per layout (3 ordered partitions at gate scale) — the
    production writer is ``repartitionByRange(z).sortWithinPartitions``
    which computes the same assignment by range sampling without a
    global sort; min/max per (layout, file) is one partial-aggregated
    groupBy, and the box costing joins a 3-row literal against
    {ZORDER_FILES}×3 file-stat rows — driver-sized."""
    from pyspark.sql import Window

    from ..session import load_tables

    t = load_tables(spark, sf_dir)
    raw = t["events"].select(
        "event_id",
        F.col("user_id").cast("long").alias("x"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    bounds = raw.agg(
        F.min("x").alias("lo_x"),
        F.max("x").alias("hi_x"),
        F.min("y").alias("lo_y"),
        F.max("y").alias("hi_y"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    e = (
        raw.crossJoin(F.broadcast(bounds))
        .withColumn("xn", F.expr("((x - lo_x) * 255) div greatest(hi_x - lo_x, 1)"))
        .withColumn("yn", F.expr("((y - lo_y) * 255) div greatest(hi_y - lo_y, 1)"))
        .withColumn(
            "z",
            F.expr(
                "aggregate(sequence(0, 7), 0L, (acc, i) -> acc"
                " + shiftleft((xn >> i) & 1, 2 * i)"
                " + shiftleft((yn >> i) & 1, 2 * i + 1))"
            ),
        )
        .select(
            "event_id",
            "x",
            "y",
            "n_rows",
            F.explode(
                F.expr(
                    "array(struct('day_user' AS layout, y * 1048576 + x AS sk),"
                    " struct('user_day' AS layout, x * 1048576 + y AS sk),"
                    " struct('zorder' AS layout, z AS sk))"
                )
            ).alias("s"),
        )
        .select("event_id", "x", "y", "n_rows", "s.layout", "s.sk")
    )
    w = Window.partitionBy("layout").orderBy("sk", "event_id")
    files = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("f", F.expr(f"((rn - 1) * {ZORDER_FILES}) div n_rows"))
        .groupBy("layout", "f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    box_rows = " , ".join(
        "struct('{q}' AS query, {x1} AS x1, {x2} AS x2, {y1}L AS y1, {y2}L AS y2)".format(
            q=q,
            x1="lo_x" if px1 is None else f"lo_x + ((hi_x - lo_x) * {px1}) div 100",
            x2="hi_x" if px2 is None else f"lo_x + ((hi_x - lo_x) * {px2}) div 100",
            y1=y1,
            y2=y2,
        )
        for q, px1, px2, y1, y2 in ZORDER_BOXES
    )
    boxes = bounds.select(F.explode(F.expr(f"array({box_rows})")).alias("b")).select(
        "b.query", "b.x1", "b.x2", "b.y1", "b.y2"
    )
    hit = (
        (F.col("max_x") >= F.col("x1"))
        & (F.col("min_x") <= F.col("x2"))
        & (F.col("max_y") >= F.col("y1"))
        & (F.col("min_y") <= F.col("y2"))
    )
    opened = (
        files.crossJoin(F.broadcast(boxes))
        .groupBy("layout", "query")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_opened"),
            F.sum(F.when(hit, F.col("n")).otherwise(0)).cast("long").alias("rows_scanned"),
        )
    )
    matched = (
        raw.crossJoin(F.broadcast(boxes))
        .where(
            F.col("x").between(F.col("x1"), F.col("x2"))
            & F.col("y").between(F.col("y1"), F.col("y2"))
        )
        .groupBy("query")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    )
    return (
        opened.join(F.broadcast(matched), "query")
        .select("layout", "query", "n_files", "files_opened", "rows_scanned", "rows_matched")
        .orderBy("layout", "query")
    )


def _zorder_sql() -> str:
    box_rows = " UNION ALL ".join(
        "SELECT '{q}' AS query, {x1} AS x1, {x2} AS x2, {y1} AS y1, {y2} AS y2 FROM bounds".format(
            q=q,
            x1="lo_x" if px1 is None else f"lo_x + ((hi_x - lo_x) * {px1}) // 100",
            x2="hi_x" if px2 is None else f"lo_x + ((hi_x - lo_x) * {px2}) // 100",
            y1=y1,
            y2=y2,
        )
        for q, px1, px2, y1, y2 in ZORDER_BOXES
    )
    return f"""
WITH raw AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS x,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS y
  FROM events),
bounds AS (
  SELECT MIN(x) AS lo_x, MAX(x) AS hi_x, MIN(y) AS lo_y, MAX(y) AS hi_y,
         COUNT(*) AS n_rows
  FROM raw),
z AS (
  SELECT event_id, x, y, n_rows,
         list_sum(list_transform(range(0, 8), i ->
           ((((((x - lo_x) * 255) // greatest(hi_x - lo_x, 1)) >> i) & 1) << (2 * i))
         + ((((((y - lo_y) * 255) // greatest(hi_y - lo_y, 1)) >> i) & 1) << (2 * i + 1)))) AS z
  FROM raw CROSS JOIN bounds),
placed AS (
  SELECT event_id, x, y, n_rows, s.layout AS layout, s.sk AS sk
  FROM z, UNNEST([
    {{'layout': 'day_user', 'sk': y * 1048576 + x}},
    {{'layout': 'user_day', 'sk': x * 1048576 + y}},
    {{'layout': 'zorder', 'sk': z}}]) AS u(s)),
assigned AS (
  SELECT layout, x, y,
         ((ROW_NUMBER() OVER (PARTITION BY layout ORDER BY sk, event_id) - 1)
          * {ZORDER_FILES}) // n_rows AS f
  FROM placed),
files AS (
  SELECT layout, f, COUNT(*) AS n,
         MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
  FROM assigned GROUP BY 1, 2),
boxes AS ({box_rows}),
opened AS (
  SELECT layout, query, CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(CASE WHEN max_x >= x1 AND min_x <= x2
                        AND max_y >= y1 AND min_y <= y2 THEN 1 ELSE 0 END) AS BIGINT)
           AS files_opened,
         CAST(SUM(CASE WHEN max_x >= x1 AND min_x <= x2
                        AND max_y >= y1 AND min_y <= y2 THEN n ELSE 0 END) AS BIGINT)
           AS rows_scanned
  FROM files CROSS JOIN boxes GROUP BY 1, 2),
matched AS (
  SELECT query, CAST(COUNT(*) AS BIGINT) AS rows_matched
  FROM raw CROSS JOIN boxes
  WHERE x BETWEEN x1 AND x2 AND y BETWEEN y1 AND y2
  GROUP BY 1)
SELECT layout, query, n_files, files_opened, rows_scanned, rows_matched
FROM opened JOIN matched USING (query)
ORDER BY layout, query
"""


EVENTS_ZORDER_SQL = _zorder_sql()


LAYOUT_QUERIES: dict[str, tuple] = {
    "events_zorder_layout": (events_zorder_layout, EVENTS_ZORDER_SQL),
}
