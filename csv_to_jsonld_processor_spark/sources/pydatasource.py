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
    InputPartition,
    SimpleDataSourceStreamReader,
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


class SyntheticPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the connector: a crawl-feed that emits pages in
    index order, ``rows_per_batch`` per micro-batch up to ``n``, through
    Spark 4's SIMPLE stream-reader API — ``read(start)`` returns the
    batch's rows AND its end offset, so the reader is the offset
    authority and the engine can never plan a range the reader didn't
    declare. That property is load-bearing: this source first shipped on
    the partitioned ``DataSourceStreamReader`` API, whose engine-driven
    ``latestOffset`` contract broke exactly-once in two measured ways —
    (1) after a restart the engine records a fresh rate-limit cursor's
    stale ``latestOffset`` into the WAL even when it is BEHIND the
    committed offset, then re-emits the gap (800 rows from a 600-row
    corpus); (2) ``partitions()`` is invoked more than once per batch
    and with out-of-order probe ranges at restart, so any in-reader
    high-water-mark guard either double-plans or clamps a replayed
    batch to empty (400 rows from a 600-row corpus). With the simple
    API, replay is engine-managed through ``readBetweenOffsets`` over
    checkpointed (start, end) pairs, and the deterministic page
    function regenerates identical rows — exactly-once across restarts
    is pinned by tests/test_pydatasource.py. The trade: batches are
    single-partition prefetch (fine for a feed; the partitioned batch
    reader above carries the parallel-scan story)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator to allow re-consumption, and
        # generators aren't copyable (measured planPartitions failure)
        out = []
        for i in range(lo, hi):
            r = page_record(i, self.seed)
            out.append((r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]))
        return iter(out)

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.rows_per_batch, self.n)
        return self._rows(lo, hi), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic regeneration — the replay contract
        return self._rows(int(start["index"]), int(end["index"]))

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

    def simpleStreamReader(self, schema) -> SyntheticPagesStreamReader:
        return SyntheticPagesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticPagesDataSource)
