"""WARC (ISO 28500) record codec — the native Common-Crawl ingestion
format — implemented from scratch on the stdlib, with Arrow-batched
Spark plumbing.

Writer: each page becomes a WARC/1.0 ``response`` record carrying an
HTTP/1.1 response envelope (the layout crawlers actually emit), either
plain or as an independent gzip member (``zlib`` with the gzip
container, MTIME=0 so bytes are deterministic).  Real CC shards are
exactly this: concatenated per-record gzip members, which is what makes
record-level random access possible without a splittable codec.

Reader: ``read_warc`` parses shard bytes back to records inside
``mapInPandas`` — header block terminated by CRLFCRLF, payload sized by
``Content-Length`` (never by scanning for the next magic, which legally
appears inside payloads), two CRLFs of record separator.  Gzip shards
are walked member-by-member via ``zlib.decompressobj().unused_data``.

Scale shape: one shard = one task (the CC model — ~1 GB unsplittable
gzip shards, parallelism from shard count, not intra-file splits);
records stream through Arrow batches; nothing driver-side.  Parsing is
Python-per-shard by necessity (binary format), but the expensive work
(inflate) is zlib C code.

Reference parity: the reference ingests CSV/XLSX only
(csv-to-jsonld-lib/src/manifest/mod.rs); WARC is engine-brief surface
for the web-text tier, not a port.
"""

from __future__ import annotations

import hashlib
import zlib
from datetime import timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"


def _record_id(url: str) -> str:
    # deterministic urn:uuid from the target URI (RFC 4122 shape,
    # md5-derived — stable across runs and engines)
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def encode_warc_record(url: str, warc_ts, html: bytes, gzip_member: bool = False) -> bytes:
    """One page → one WARC/1.0 response record (optionally one
    independent gzip member, the CC shard layout)."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: text/html; charset=UTF-8" + CRLF
        + b"Content-Length: " + str(len(html)).encode() + CRLF
        + CRLF
        + html
    )
    ts = warc_ts
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    headers = (
        _WARC_VERSION + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Record-ID: " + _record_id(url).encode() + CRLF
        + b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode() + CRLF
        + CRLF
    )
    record = headers + http + CRLF + CRLF
    if not gzip_member:
        return record
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)  # gzip, MTIME=0
    return co.compress(record) + co.flush()


def decode_warc_shard(
    shard: bytes, permissive: bool = False
) -> list[dict] | tuple[list[dict], int]:
    """Parse one shard (plain concatenation OR concatenated gzip
    members) into record dicts.

    ``permissive=True`` is the production crawl posture: a corrupt
    record (bad magic, truncated payload, unparseable headers) is
    skipped by resyncing to the next ``WARC/1.0`` magic at a record
    boundary, and the function returns ``(records, n_skipped)`` so the
    loss is COUNTED, never silent.  Strict mode raises on the first
    corruption (the round-trip/integrity posture)."""
    if shard[:2] == b"\x1f\x8b":
        chunks = []
        buf = shard
        while buf:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                chunks.append(d.decompress(buf))
            except zlib.error:
                if not permissive:
                    raise ValueError("corrupt gzip member")
                break  # rest of the shard is unrecoverable
            buf = d.unused_data
        shard = b"".join(chunks)
    out: list[dict] = []
    skipped = 0
    pos = 0
    n = len(shard)
    while pos < n:
        try:
            if shard[pos:pos + len(_WARC_VERSION)] != _WARC_VERSION:
                raise ValueError(f"bad WARC magic at offset {pos}")
            head_end = shard.index(CRLF + CRLF, pos)
            header_block = shard[pos:head_end].decode("utf-8")
            headers: dict[str, str] = {}
            for line in header_block.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            clen = int(headers["content-length"])
            if head_end + 4 + clen + 4 > n:
                raise ValueError("truncated record payload")
            body = shard[head_end + 4:head_end + 4 + clen]
            # split the HTTP envelope from the entity body
            http_end = body.index(CRLF + CRLF)
            rec = {
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "rec_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "html": body[http_end + 4:],
            }
        except (ValueError, KeyError, UnicodeDecodeError):
            if not permissive:
                raise
            skipped += 1
            nxt = shard.find(CRLF + CRLF + _WARC_VERSION, pos + 1)
            if nxt == -1:
                break
            pos = nxt + 4
            continue
        out.append(rec)
        pos = head_end + 4 + clen + 4  # payload + record separator CRLFCRLF
    return (out, skipped) if permissive else out


PAGES_WARC_SCHEMA = "shard_id long, warc binary"
WARC_RECORDS_SCHEMA = (
    "url string, warc_date string, rec_type string, record_id string, html binary"
)


def pages_to_warc_shards(pages: DataFrame, gzip_member: bool = True) -> DataFrame:
    """Encode a pages DataFrame into one WARC shard per input partition
    (the CC shard model).  Shard id = Spark partition id."""
    import pandas as pd
    from pyspark.sql.functions import spark_partition_id

    def enc(batches):
        shard_id = None
        parts: list[bytes] = []
        for pdf in batches:
            for _i, row in pdf.iterrows():
                shard_id = int(row["pid"])
                parts.append(
                    encode_warc_record(
                        row["url"], row["warc_ts"], bytes(row["html"]), gzip_member
                    )
                )
        if shard_id is not None:
            yield pd.DataFrame({"shard_id": [shard_id], "warc": [b"".join(parts)]})

    return (
        pages.withColumn("pid", spark_partition_id())
        .select("pid", "url", "warc_ts", "html")
        .mapInPandas(enc, schema=PAGES_WARC_SCHEMA)
    )


def read_warc(shards: DataFrame) -> DataFrame:
    """Shard bytes → one row per WARC record (Arrow-batched)."""
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["warc"]:
                rows.extend(decode_warc_shard(bytes(blob)))
            if rows:
                yield pd.DataFrame.from_records(rows)

    return shards.select("warc").mapInPandas(dec, schema=WARC_RECORDS_SCHEMA)


# ---------------------------------------------------------------------------
# Registered query: round-trip integrity stats
# ---------------------------------------------------------------------------

import os as _os

_GOLDEN_WARC = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "tests", "golden", "warc_host_stats.csv",
)

WARC_N_PAGES = 1000
WARC_SEED = 42


def warc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the deterministic seed-42 corpus into gzip WARC shards,
    decode it back, and emit per-host (records, html bytes, order-free
    md5-prefix checksum).  The oracle is a golden CSV computed by
    tools/regen_warc_golden.py purely from the page generator — if the
    codec drops, duplicates, or corrupts ONE byte of ONE record, a
    checksum diverges and the row goes red."""
    from .pages import generate_pages

    pages = generate_pages(spark, WARC_N_PAGES, seed=WARC_SEED, partitions=8)
    records = read_warc(pages_to_warc_shards(pages, gzip_member=True))
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    csum = F.conv(F.substring(F.md5(F.col("html")), 1, 8), 16, 10).cast("long")
    return (
        records.select(host.alias("host"), F.length("html").alias("nbytes"), csum.alias("c"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("nbytes").alias("total_html_bytes"),
            F.sum("c").alias("checksum"),
        )
        .orderBy("host")
    )


WARC_STATS_SQL = f"""
SELECT host, CAST(n_records AS BIGINT) AS n_records,
       CAST(total_html_bytes AS BIGINT) AS total_html_bytes,
       CAST(checksum AS BIGINT) AS checksum
FROM read_csv('{_GOLDEN_WARC}', header=true)
ORDER BY host
"""


WARC_QUERIES: dict[str, tuple] = {
    "warc_roundtrip_stats": (warc_roundtrip_stats, WARC_STATS_SQL),
}
