"""Custom connector via Spark 4's Python DataSource API.

``spark.read.format("synthpages")`` — the deterministic page corpus
(sources/pages.py) exposed as a REAL pluggable source instead of a
helper function: schema declaration, driver-side partition PLANNING
(index ranges — the stand-in for a WARC reader's per-file byte ranges),
and executor-side Arrow-batched reads. This is the integration surface
a 100 TB deployment uses to mount an external corpus the built-in
readers can't parse: partition planning stays on the driver and is
metadata-only; all row materialization happens in the partition reader
on executors.

Registration is per-session: ``register(spark)`` then
``spark.read.format("synthpages").option("n", 100000).load()``.
Equality with the mapInPandas generator and partition-planning behavior
are pinned by tests/test_pydatasource.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .pages import PAGES_SCHEMA, page_record

ARROW_CHUNK = 2048  # rows per yielded RecordBatch


@dataclass
class IndexRange(InputPartition):
    start: int
    end: int
    seed: int


class SyntheticPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("partitions", 8))
        if self.n < 0 or self.num_partitions <= 0:
            raise ValueError("synthpages: n must be >= 0 and partitions > 0")

    def partitions(self) -> list[IndexRange]:
        """Driver-side planning: contiguous index ranges, one per task —
        metadata only, never rows."""
        per = -(-self.n // self.num_partitions) if self.n else 0
        out = []
        for p in range(self.num_partitions):
            lo, hi = p * per, min((p + 1) * per, self.n)
            if lo < hi:
                out.append(IndexRange(lo, hi, self.seed))
        return out or [IndexRange(0, 0, self.seed)]

    def read(self, partition: IndexRange):
        """Executor-side: yield Arrow RecordBatches (the fast path the
        DataSource API offers Python sources — same Arrow transfer as
        mapInPandas, no per-row pickling)."""
        import pyarrow as pa

        cols = ["url", "warc_ts", "html", "text", "lang"]
        for lo in range(partition.start, partition.end, ARROW_CHUNK):
            hi = min(lo + ARROW_CHUNK, partition.end)
            recs = [page_record(i, partition.seed) for i in range(lo, hi)]
            yield pa.RecordBatch.from_pydict(
                {c: [r[c] for r in recs] for c in cols},
                schema=pa.schema(
                    [
                        ("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()),
                        ("text", pa.string()),
                        ("lang", pa.string()),
                    ]
                ),
            )


class SyntheticPagesStreamReader(DataSourceStreamReader):
    """Streaming form of the connector: a crawl-feed that emits pages in
    index order, ``rows_per_batch`` per micro-batch up to ``n``. Offsets
    are plain dicts ({"index": k}) checkpointed by the engine — restart
    resumes from the committed offset, and replayed (start, end) ranges
    regenerate identical rows (deterministic page function), which is
    the exactly-once contract a custom streaming connector must hold.
    Partition planning splits each micro-batch's index range across
    ``partitions`` tasks, same as the batch reader."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.num_partitions = int(options.get("partitions", 4))
        self._cursor = 0  # rate-limit state, driver-side

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # rate limiting lives HERE (the engine plans (committed, latest)
        # as one batch, so clamping anywhere else would desync the
        # checkpoint): an internal cursor advances rows_per_batch per
        # call. After a restart the fresh cursor trails the checkpointed
        # offset and the first trigger(s) plan empty batches until it
        # catches up — self-healing, because offsets only ever move
        # forward and ranges regenerate identically.
        self._cursor = min(self._cursor + self.rows_per_batch, self.n)
        return {"index": self._cursor}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        per = -(-(hi - lo) // self.num_partitions) if hi > lo else 0
        out = []
        for p in range(self.num_partitions):
            a, b = lo + p * per, min(lo + (p + 1) * per, hi)
            if a < b:
                out.append(IndexRange(a, b, self.seed))
        return out or [IndexRange(lo, lo, self.seed)]

    def read(self, partition: IndexRange):
        for i in range(partition.start, partition.end):
            r = page_record(i, partition.seed)
            yield (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])

    def commit(self, end: dict) -> None:
        pass  # nothing upstream to ack; checkpoint holds the offset


class SyntheticPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthpages"

    def schema(self) -> str:
        return PAGES_SCHEMA

    def reader(self, schema) -> SyntheticPagesReader:
        return SyntheticPagesReader(self.options)

    def streamReader(self, schema) -> SyntheticPagesStreamReader:
        return SyntheticPagesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticPagesDataSource)
