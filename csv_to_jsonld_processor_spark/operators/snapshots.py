"""Snapshot/time-travel table layer on plain parquet.

The lake-format feature the sandbox can't install (Iceberg/Delta),
re-expressed with the same commit discipline this repo already proved
for streaming ingest (streaming/ingest.py): every commit writes a FULL
new generation directory ``snap-<id>`` (ordered integer ids), then
atomically flips a tiny ``CURRENT`` pointer file (os.replace — POSIX
atomic rename). Invariants:

- A reader never sees a half-written table: it resolves CURRENT once,
  then reads only that immutable directory (snapshot isolation — a
  concurrent commit can't change the files under it).
- Time travel is just pinning an older id: committed snapshot dirs are
  immutable and retained until ``expire_snapshots``.
- A crash between the generation write and the pointer flip leaves
  CURRENT on the previous snapshot and an ORPHAN ``snap-<id>`` dir;
  the next commit reuses that id (mode=overwrite) and flips — the
  orphan is never observable through the read API
  (tests/test_snapshots.py pins exactly this window).

At 100 TB the full-rewrite-per-commit becomes append-only manifests
(what Iceberg does); the pointer-flip commit protocol and the reader
contract are identical — this module is the protocol at parquet-dir
granularity, upsert included (idempotent delta-wins merge, the MERGE
INTO analogue, same shape as operators/upsert.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

_SNAP_RE = re.compile(r"^snap-(\d{6})$")


def _snap_dir(table_dir: str, snap_id: int) -> str:
    return os.path.join(table_dir, f"snap-{snap_id:06d}")


def current_snapshot_id(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def snapshot_ids(table_dir: str) -> list[int]:
    """Committed snapshot ids, oldest first. On-disk dirs with id >
    CURRENT are uncommitted orphans and are NOT listed."""
    cur = current_snapshot_id(table_dir)
    if cur is None:
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _SNAP_RE.match(name)
        if m and int(m.group(1)) <= cur:
            out.append(int(m.group(1)))
    return sorted(out)


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame | None:
    """The table as of ``snapshot_id`` (default: CURRENT). Reading a
    pinned id is the time-travel contract: the directory is immutable
    once committed, so the same id always yields the same rows."""
    cur = current_snapshot_id(table_dir)
    if cur is None:
        return None
    if snapshot_id is None:
        snapshot_id = cur
    if snapshot_id > cur or snapshot_id < 0:
        raise ValueError(f"snapshot {snapshot_id} not committed (CURRENT={cur})")
    d = _snap_dir(table_dir, snapshot_id)
    if not os.path.isdir(d):
        raise ValueError(f"snapshot {snapshot_id} expired or missing")
    return spark.read.parquet(d)


def commit_snapshot(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Write-then-flip commit; returns the new snapshot id. Restartable:
    a crash before the flip leaves an orphan dir that the retry
    overwrites under the SAME id."""
    os.makedirs(table_dir, exist_ok=True)
    cur = current_snapshot_id(table_dir)
    new_id = 0 if cur is None else cur + 1
    df.write.mode("overwrite").parquet(_snap_dir(table_dir, new_id))
    # manifest belongs to the generation: written before the flip, so a
    # crash leaves it orphaned along with the data it describes
    _write_manifest(_snap_dir(table_dir, new_id))
    tmp = os.path.join(table_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(str(new_id))
    os.replace(tmp, os.path.join(table_dir, "CURRENT"))
    return new_id


def _write_manifest(snap_dir: str) -> dict:
    """Iceberg-style per-file column stats, harvested from the parquet
    FOOTERS (pyarrow metadata — no data scan): {file: {col: [min, max],
    ...}, "_rows": n}. Written next to the snapshot as
    ``_manifest.json`` so readers can skip whole files by predicate
    before Spark ever lists them — at 100 TB this manifest layer (not
    directory listing) is what makes a pinned-snapshot read O(matching
    files)."""
    import glob
    import json

    import pyarrow.parquet as pq

    entries: dict = {}
    for f in sorted(glob.glob(os.path.join(snap_dir, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols: dict = {"_rows": md.num_rows}
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                col = rg.column(c_i)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                name = col.path_in_schema
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    continue  # undecoded physical type — skip stats, never prune
                prev = cols.get(name)
                if prev is None:
                    cols[name] = [mn, mx]
                else:
                    cols[name] = [min(prev[0], mn), max(prev[1], mx)]
        entries[os.path.basename(f)] = cols
    manifest = {"files": entries}
    with open(os.path.join(snap_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, default=str, indent=1, sort_keys=True)
    return manifest


def read_snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo,
    hi,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Manifest-pruned snapshot read: keep only files whose [min, max]
    for ``col`` overlaps [lo, hi] (files without stats are always kept
    — pruning must never be lossy), then apply the residual filter.
    Returns (df, files_read, files_total). Semantically identical to
    ``read_snapshot(...).where(lo <= col <= hi)``; the difference is
    the skipped files never reach Spark's file index."""
    import json

    cur = current_snapshot_id(table_dir)
    if cur is None:
        raise ValueError("empty table")
    sid = cur if snapshot_id is None else snapshot_id
    if sid > cur or sid < 0:
        raise ValueError(f"snapshot {sid} not committed (CURRENT={cur})")
    d = _snap_dir(table_dir, sid)
    with open(os.path.join(d, "_manifest.json")) as f:
        manifest = json.load(f)
    keep = []
    total = 0
    for fname, cols in manifest["files"].items():
        total += 1
        rng = cols.get(col)
        if rng is None or not (rng[1] < lo or rng[0] > hi):
            keep.append(os.path.join(d, fname))
    df = (
        spark.read.parquet(*keep)
        if keep
        else read_snapshot(spark, table_dir, sid).limit(0)
    )
    return df.where(F.col(col).between(lo, hi)), len(keep), total


def upsert_snapshot(
    spark: SparkSession, table_dir: str, delta: DataFrame, key: str
) -> int:
    """MERGE INTO analogue: delta rows win on key collision, everything
    else carries forward; the merge commits as a new snapshot so the
    pre-upsert state stays time-travel-readable."""
    base = read_snapshot(spark, table_dir)
    if base is None:
        merged = delta
    else:
        merged = base.join(delta.select(key), key, "left_anti").unionByName(delta)
    return commit_snapshot(spark, merged, table_dir)


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots
    (never CURRENT). Returns the expired ids."""
    import shutil

    ids = snapshot_ids(table_dir)
    victims = ids[:-keep_last] if keep_last > 0 else ids[:-1]
    for sid in victims:
        shutil.rmtree(_snap_dir(table_dir, sid))
    return victims


# --- driver-visible query ---------------------------------------------------

_CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel across an upsert, end-to-end through the real commit
    protocol: snapshot 0 = customers with custkey % 3 != 0; one upsert
    batch (custkey % 5 == 0, acctbal + 1000 — part update, part insert)
    commits snapshot 1; the query then reads BOTH pinned snapshots and
    reports the per-segment row-count/balance delta. The DuckDB oracle
    recomputes both states relationally from the same base table — a
    commit that leaks the batch into snapshot 0, loses carried-forward
    rows, or double-applies the delta hash-mismatches."""
    import tempfile

    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(*_CUST_COLS)
    table_dir = tempfile.mkdtemp(prefix="snap_table_")

    base = cust.where(F.col("c_custkey") % 3 != 0)
    commit_snapshot(spark, base, table_dir)
    batch = cust.where(F.col("c_custkey") % 5 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
    )
    new_id = upsert_snapshot(spark, table_dir, batch, "c_custkey")

    def seg_stats(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{suffix}"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias(f"bal_{suffix}"),
        )

    before = seg_stats(read_snapshot(spark, table_dir, new_id - 1), "before")
    after = seg_stats(read_snapshot(spark, table_dir, new_id), "after")
    return (
        before.join(after, "c_mktsegment")
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n_before",
            "n_after",
            (F.col("n_after") - F.col("n_before")).cast("long").alias("rows_added"),
            "bal_before",
            "bal_after",
        )
        .orderBy("segment")
    )


TIME_TRAVEL_SQL = """
WITH base AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0
), batch AS (
  SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 5 = 0
), after AS (
  SELECT * FROM batch
  UNION ALL
  SELECT b.* FROM base b LEFT JOIN batch d USING (c_custkey) WHERE d.c_custkey IS NULL
), agg_before AS (
  SELECT c_mktsegment, COUNT(*) AS n_before,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal_before
  FROM base GROUP BY c_mktsegment
), agg_after AS (
  SELECT c_mktsegment, COUNT(*) AS n_after,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal_after
  FROM after GROUP BY c_mktsegment
)
SELECT c_mktsegment AS segment,
       CAST(n_before AS BIGINT) AS n_before,
       CAST(n_after AS BIGINT) AS n_after,
       CAST(n_after - n_before AS BIGINT) AS rows_added,
       bal_before, bal_after
FROM agg_before JOIN agg_after USING (c_mktsegment)
ORDER BY segment
"""


SNAPSHOT_QUERIES: dict[str, tuple] = {
    "table_time_travel": (table_time_travel, TIME_TRAVEL_SQL),
}
