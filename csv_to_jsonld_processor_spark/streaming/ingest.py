"""Streaming ingestion into a parquet table with exactly-once EFFECT —
the production "stream into the lake" topology on a plain-parquet lake
(no Delta/Iceberg in this container; their MERGE would replace the
foreachBatch body one-for-one).

Structured Streaming's contract for any custom sink is at-least-once
batch delivery with a durable (checkpoint) batch id: after a crash the
last unacknowledged micro-batch is REPLAYED into foreachBatch. Exactly-
once effect therefore requires the batch application to be IDEMPOTENT —
here, per-key last-write-wins:

    table'[k] = argmax_{(ts, event_id)} (table[k] ∪ batch[k])

Applying the same batch twice is a no-op (max is idempotent), so replay
is harmless; within a batch the same reduction picks one deterministic
winner per key. That is the whole trick — no distributed transactions,
just an idempotent merge plus Spark's checkpointed offsets.

The table swap is write-new-generation-then-flip-pointer: the merged
table lands in a fresh ``gen-<batch_id>`` directory and a tiny pointer
file is atomically renamed over the old one (Hadoop FS rename), so a
reader never sees a half-written table and a crash between write and
flip leaves the previous generation live (the replayed batch simply
rebuilds the orphan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _latest_per_key(df: DataFrame, key: str) -> DataFrame:
    """Deterministic last-write-wins reduction: max (ts, event_id)."""
    w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def read_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    ptr = os.path.join(table_dir, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, gen))


def apply_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                table_dir: str, key: str) -> None:
    """The foreachBatch body — idempotent per-key last-write-wins merge
    of one micro-batch into the pointered parquet table.

    Replay after a COMPLETED flip (crash window: pointer flipped but the
    checkpoint offset not yet committed → same batch_id redelivered) is
    a pointer-equality no-op: CURRENT already names gen-<batch_id>, so
    re-running would read gen-<batch_id> as base while overwriting that
    same directory — Spark's self-overwrite guard aborts, or worse the
    live generation is corrupted mid-read. The short-circuit IS the
    idempotency for that window; the merge's last-write-wins max covers
    the other window (crash before the flip)."""
    gen = f"gen-{batch_id}"
    ptr = os.path.join(table_dir, "CURRENT")
    if os.path.exists(ptr):
        with open(ptr) as f:
            if f.read().strip() == gen:
                return  # batch fully applied before the crash — no-op
    delta = _latest_per_key(batch_df, key)
    base = read_table(spark, table_dir)
    merged = delta if base is None else _latest_per_key(base.unionByName(delta), key)
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, gen))
    tmp = os.path.join(table_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(gen)
    os.replace(tmp, os.path.join(table_dir, "CURRENT"))  # atomic pointer flip


def read_file_sink(spark: SparkSession, path: str) -> DataFrame:
    """Committed-files-only read of a streaming file sink's output.

    The file sink's exactly-once guarantee lives in its
    ``_spark_metadata`` transaction log: a batch killed mid-write
    leaves orphan part files on disk that the replayed batch re-emits
    under new names, and only the replay's files are logged. Spark 4's
    BATCH reader ignores that log entirely (measured here: a plain
    ``spark.read.parquet(out)`` after a kill-and-restart returned
    committed+orphan rows — 1000 for a 600-row corpus), so any batch
    consumer of a streaming sink MUST resolve the committed file set
    through the log or silently double-count after every crash window.
    This reads the v1 log (numeric entries + ``.compact`` snapshots,
    later entries win) and opens exactly the ``add``-ed files."""
    import glob
    import json

    entries = sorted(
        glob.glob(os.path.join(path, "_spark_metadata", "*")),
        key=lambda p: (
            int(os.path.basename(p).split(".")[0])
            if os.path.basename(p).split(".")[0].isdigit()
            else -1
        ),
    )
    compacts = [e for e in entries if e.endswith(".compact")]
    if compacts:
        last_compact_id = int(os.path.basename(compacts[-1]).split(".")[0])
        entries = [compacts[-1]] + [
            e
            for e in entries
            if os.path.basename(e).split(".")[0].isdigit()
            and int(os.path.basename(e).split(".")[0]) > last_compact_id
        ]
    files: list[str] = []
    seen: set[str] = set()
    for ent in entries:
        if not os.path.basename(ent).split(".")[0].isdigit():
            continue
        with open(ent) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                rec = json.loads(line)
                if rec.get("action") == "add" and rec["path"] not in seen:
                    seen.add(rec["path"])
                    files.append(rec["path"])
    if not files:
        raise ValueError(f"no committed files in {path}/_spark_metadata")
    return spark.read.parquet(*files)


def stream_merge_into_table(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    table_dir: str,
    key: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``input_dir`` (file source, ``max_files_per_trigger`` per
    micro-batch so multi-batch behavior is real) through the idempotent
    merge into the pointered table. Restartable: the checkpoint carries
    the source offsets, and a replayed batch is a no-op by
    construction."""
    os.makedirs(table_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: apply_batch(spark, df, bid, table_dir, key)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
