"""SparkSession builders tuned for the target execution profile.

Design for a 1000-executor cluster, test on local[N]:

- AQE on (runtime coalesce + skew-join splitting) — hub entities and
  mega-domains in web corpora produce skewed shuffle keys.
- Arrow on — every Python-side transform in this engine is a pandas UDF
  over whole batches, never per-row Python.
- ``spark.sql.shuffle.partitions`` scales with core count locally; on a
  real cluster you'd set it to ~2-3x total cores and let AQE coalesce.
- UTC session timezone so timestamp semantics are stable across engines
  (the DuckDB correctness oracle runs in UTC too).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def env_cpus(default: int = 32) -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(default)))


def get_spark(
    app_name: str = "csv-to-jsonld-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-oriented defaults."""
    cpus = cpus or env_cpus()
    shuffle = shuffle_partitions or max(32, 2 * cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# Table-CATALOG memo: spark.read.parquet pays a driver-side file
# listing + footer schema read per table (~0.9s for the 10-table set,
# measured warm), and nearly every registered query calls load_tables —
# often through several helpers — inside its own span.  A real
# deployment resolves tables through a metastore ONCE; this memo is
# that catalog: it holds only the scan RELATION (schema + file index),
# never data — no persist/cache, every query still reads the parquet
# files themselves.  Keyed by (applicationId, sf_dir) so a fresh
# SparkContext or a different scale factor re-resolves.
_TABLES_MEMO: dict[tuple[str, str], dict] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver-provided parquet tables and register temp views.

    Parquet scans get column pruning + predicate pushdown from Catalyst
    for free; callers select/filter declaratively and the scan narrows.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    memo = _TABLES_MEMO.get(key)
    if memo is not None:
        # re-register the views (cheap, plan-only) so alternating
        # sf_dirs inside one session keep the view names consistent
        for name, df in memo.items():
            df.createOrReplaceTempView(name)
        return dict(memo)
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    _TABLES_MEMO[key] = out
    return dict(out)
