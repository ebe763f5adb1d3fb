"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shape,
partition-parallel decode via ``mapInPandas``, metadata projection that
never touches the bytes (column pruning keeps the binary out of stages
that don't need it). Codecs: ``synthetic`` (deterministic fake
container, below), ``bmp`` (REAL uncompressed 24-bit BMP, pure-stdlib
encode+decode — proves the stage handles actual on-disk bytes), and
``real`` (the still-stubbed PIL/librosa/av integration point: those
libs are not in this container, so it raises ``NotImplementedError``).

Synthetic blob format (fake codec), deterministic per (media_id, seed):
  magic 4B "SYNM" | kind 1B (0=image 1=audio 2=video) |
  width u16 | height u16 | channels u8 | payload (w*h*c bytes, hash-derived)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, url string, blob binary, "
    "meta_width int, meta_height int, meta_channels int"
)

_KINDS = ["image", "audio", "video"]
_MAGIC = b"SYNM"


def synth_blob(media_id: int, seed: int = 42) -> tuple[bytes, str, int, int, int]:
    h = hashlib.sha256(f"media:{seed}:{media_id}".encode()).digest()
    kind_i = h[0] % 3
    w = 8 + h[1] % 24
    ht = 8 + h[2] % 24
    c = 1 + h[3] % 3
    n = w * ht * c
    payload = (hashlib.sha256(h).digest() * (n // 32 + 1))[:n]
    blob = _MAGIC + struct.pack("<BHHB", kind_i, w, ht, c) + payload
    return blob, _KINDS[kind_i], w, ht, c


def synth_bmp(media_id: int, seed: int = 42) -> tuple[bytes, int, int]:
    """Deterministic REAL-format blob: a valid uncompressed 24-bit BMP
    whose dims and RGB payload derive from sha256(media_id, seed)."""
    h = hashlib.sha256(f"bmp:{seed}:{media_id}".encode()).digest()
    w = 8 + h[1] % 16
    ht = 8 + h[2] % 16
    n = w * ht * 3
    rgb = (hashlib.sha256(h).digest() * (n // 32 + 1))[:n]
    return encode_bmp(w, ht, rgb), w, ht


def generate_bmp_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table whose blobs are real BMP bytes (same schema as
    generate_media; kind is always image, channels 3)."""
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, w, ht = synth_bmp(int(i), seed)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "image",
                        "url": f"https://media.example.org/bmp/{int(i)}.bmp",
                        "blob": blob,
                        "meta_width": w,
                        "meta_height": ht,
                        "meta_channels": 3,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, kind, w, ht, c = synth_blob(int(i), seed)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "url": f"https://media.example.org/{kind}/{int(i)}",
                        "blob": blob,
                        "meta_width": w,
                        "meta_height": ht,
                        "meta_channels": c,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Real-format encode: uncompressed 24-bit Windows BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to
    4 bytes) from top-down row-major RGB bytes. Pure stdlib — the
    format any image tool opens, used to prove the decode path handles
    actual on-disk bytes, not just the synthetic container."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb payload must be width*height*3 bytes")
    row_pad = (-(width * 3)) % 4
    stride = width * 3 + row_pad
    pixel_bytes = stride * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):  # RGB -> BGR
            px = row[x * 3 : x * 3 + 3]
            rows += bytes((px[2], px[1], px[0]))
        rows += b"\x00" * row_pad
    return header + info + bytes(rows)


def decode_bmp(blob: bytes) -> dict:
    """Real-format decode: uncompressed 24-bit BMP → top-down RGB
    payload + dims, same dict contract as the synthetic codec so every
    downstream stage (features, resize, frame-sample) is codec-blind."""
    if blob[:2] != b"BM":
        raise ValueError("bad BMP magic")
    (off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = blob[off + src_y * stride : off + src_y * stride + width * 3]
        for x in range(width):  # BGR -> RGB
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes(
                (row[x * 3 + 2], row[x * 3 + 1], row[x * 3])
            )
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "channels": 3,
        "payload": bytes(out),
    }


def encode_wav(sample_rate: int, n_channels: int, pcm16: bytes) -> bytes:
    """Real-format encode: RIFF/WAVE PCM16 via the stdlib ``wave``
    module — the audio twin of encode_bmp (any audio tool opens it)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16)
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """Real-format decode: WAV → the codec-blind dict contract
    (payload = raw PCM bytes; width = frames, height = 1)."""
    import io
    import wave

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("bad WAV magic")
    with wave.open(io.BytesIO(blob), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 supported")
        frames = w.getnframes()
        ch = w.getnchannels()
        payload = w.readframes(frames)
    return {"kind": "audio", "width": frames, "height": 1, "channels": ch, "payload": payload}


def synth_wav(media_id: int, seed: int = 42) -> tuple[bytes, int, int]:
    """Deterministic real WAV blob: (blob, n_frames, n_channels); PCM
    payload is a sha256 stretch keyed by (media_id, seed)."""
    h = hashlib.sha256(f"wav:{seed}:{media_id}".encode()).digest()
    ch = 1 + h[0] % 2
    frames = 200 + h[1] * 4
    n = frames * ch * 2
    pcm = (hashlib.sha256(h).digest() * (n // 32 + 1))[:n]
    return encode_wav(16000, ch, pcm), frames, ch


def generate_wav_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, frames, ch = synth_wav(int(i), seed)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "audio",
                        "url": f"https://media.example.org/wav/{int(i)}.wav",
                        "blob": blob,
                        "meta_width": frames,
                        "meta_height": 1,
                        "meta_channels": ch,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


# --- PNG: the first COMPRESSED real format (zlib deflate + scanline
# filters), pure stdlib ------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Real-format encode: 8-bit RGB (color type 2, no interlace) PNG —
    zlib-deflated filtered scanlines in one IDAT, CRC'd chunks. The
    filter type CYCLES y % 5, so every reconstruction branch
    (None/Sub/Up/Average/Paeth) is present in every image ≥5 rows and a
    decoder that fumbles any one of them fails the golden oracle."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb payload must be width*height*3 bytes")
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        row = rgb[y * width * bpp : (y + 1) * width * bpp]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF for i in range(len(row))
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> dict:
    """Real-format decode: 8-bit RGB PNG → top-down RGB payload + dims,
    same dict contract as the other codecs. Walks the chunk stream with
    CRC verification, inflates the concatenated IDATs, and reconstructs
    all five scanline filters per the PNG spec (RFC 2083 §6)."""
    import zlib

    if blob[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = len(PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG supported "
                    f"(depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("inflated size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "channels": 3,
        "payload": bytes(out),
    }


def synth_png(media_id: int, seed: int = 42) -> tuple[bytes, int, int]:
    """Deterministic REAL compressed blob: valid 8-bit RGB PNG whose
    dims and payload derive from sha256(media_id, seed) — same synth
    scheme as the BMP path, different format family (DEFLATE stream +
    per-row filters rather than raw pixels)."""
    h = hashlib.sha256(f"png:{seed}:{media_id}".encode()).digest()
    w = 8 + h[1] % 16
    ht = 8 + h[2] % 16
    n = w * ht * 3
    rgb = (hashlib.sha256(h).digest() * (n // 32 + 1))[:n]
    return encode_png(w, ht, rgb), w, ht


def generate_png_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, w, ht = synth_png(int(i), seed)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "image",
                        "url": f"https://media.example.org/png/{int(i)}.png",
                        "blob": blob,
                        "meta_width": w,
                        "meta_height": ht,
                        "meta_channels": 3,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_blob(blob: bytes, codec: str = "synthetic") -> dict:
    """Decode one blob. ``synthetic`` parses the fake container; ``bmp``
    parses real uncompressed 24-bit BMP bytes (stdlib decoder above);
    ``real`` is the integration point for the remaining codecs
    (PNG/JPEG/audio/video libs, absent in this container)."""
    if codec == "bmp":
        return decode_bmp(blob)
    if codec == "wav":
        return decode_wav(blob)
    if codec == "png":
        return decode_png(blob)
    if codec == "real":
        raise NotImplementedError(
            "JPEG/compressed-audio/video decode needs PIL/librosa/av — "
            "not in this container; wire them here, the Spark plumbing is "
            "codec-agnostic (the bmp and wav codecs prove it on real byte "
            "formats)"
        )
    if blob[:4] != _MAGIC:
        raise ValueError("bad magic")
    kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
    payload = blob[10:]
    return {"kind": _KINDS[kind_i], "width": w, "height": h, "channels": c, "payload": payload}


FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "mean_intensity double, n_frames int, feature_v array<double>"
)


def extract_features(media: DataFrame, codec: str = "synthetic", feature_dim: int = 8) -> DataFrame:
    """Partition-parallel decode + feature extraction (mapInPandas).

    Features (on the fake codec): per-channel-chunk mean intensity folded
    to ``feature_dim`` buckets — a stand-in with the same batch shape a
    real embedding/resize/frame-sample stage would have."""
    import numpy as np
    import pandas as pd

    src = media.select("media_id", "blob")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                d = decode_blob(bytes(blob), codec)
                arr = np.frombuffer(d["payload"], dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(arr, feature_dim)
                feat = [float(c.mean()) if len(c) else 0.0 for c in chunks]
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": d["kind"],
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "mean_intensity": float(arr.mean()) if len(arr) else 0.0,
                        "n_frames": 1 if d["kind"] == "image" else d["height"],
                        "feature_v": feat,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return src.mapInPandas(run, schema=FEATURES_SCHEMA)


def media_metadata_only(media: DataFrame) -> DataFrame:
    """Metadata projection — Catalyst prunes the binary column out of the
    scan entirely (assert via .explain: ReadSchema excludes ``blob``)."""
    return media.select("media_id", "kind", "meta_width", "meta_height", "meta_channels")


# --------------------------------------------------------------------------
# driver-visible query: multimodal decode plumbing, hash-checked
# --------------------------------------------------------------------------


def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate the deterministic 2,000-blob synthetic media table,
    decode + feature-extract via mapInPandas, aggregate per kind.
    Hash-checked against a golden VALUES oracle recomputed independently
    in plain Python/numpy (same seed, no Spark) — a regression in the
    Arrow batch plumbing, blob schema, or decode path shifts a stat."""
    from pyspark.sql import functions as F

    media = generate_media(spark, 2000, seed=42)
    feats = extract_features(media, codec="synthetic", feature_dim=8)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("channels"), 6).alias("avg_channels"),
            F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("kind")
    )


# golden values: plain-Python recomputation (sha256 synth + numpy means),
# N=2000 seed=42 — see module docstring for the blob format
MEDIA_STATS_SQL = """
SELECT kind, CAST(n AS BIGINT) AS n,
       CAST(avg_width AS DOUBLE) AS avg_width,
       CAST(avg_height AS DOUBLE) AS avg_height,
       CAST(avg_channels AS DOUBLE) AS avg_channels,
       CAST(avg_intensity AS DOUBLE) AS avg_intensity,
       CAST(total_frames AS BIGINT) AS total_frames
FROM (VALUES
  ('audio', 654, 19.634557, 18.912844, 2.030581, 126.863261, 12369),
  ('image', 682, 19.56305, 18.888563, 2.004399, 128.233968, 682),
  ('video', 664, 19.688253, 19.031627, 2.003012, 126.751694, 12637)
) AS golden(kind, n, avg_width, avg_height, avg_channels, avg_intensity, total_frames)
ORDER BY kind
"""

def media_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained multimodal pipeline as a driver query: generate →
    resize (factor 2, binary→binary re-encode) → frame-sample the
    resized VIDEOS (every 4th frame) → per-kind stats. Exercises two
    mapInPandas stages back-to-back on binary columns — the re-encoded
    blob from stage 1 must round-trip through stage 2's decoder.
    Golden VALUES oracle recomputed independently in plain Python/numpy
    (same sha256 synth, resize slice, frame stride — no Spark)."""
    from pyspark.sql import functions as F

    media = generate_media(spark, 2000, seed=42)
    resized = resize_media(media, factor=2)
    frames = sample_frames(resized, every_k=4)
    per_kind = resized.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.round(F.avg("height"), 6).alias("avg_height"),
    )
    frame_stats = (
        frames.join(resized.select("media_id", "kind"), "media_id")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
        )
    )
    return (
        per_kind.join(frame_stats, "kind", "left")
        .select(
            "kind",
            "n",
            "avg_width",
            "avg_height",
            F.coalesce("n_frames_sampled", F.lit(0)).cast("long").alias("n_frames_sampled"),
            F.coalesce("avg_frame_mean", F.lit(0.0)).alias("avg_frame_mean"),
        )
        .orderBy("kind")
    )


# golden: independent plain-Python recomputation (sha256 synth + numpy
# [::2,::2] resize + every-4th-frame means), N=2000 seed=42
MEDIA_PIPELINE_SQL = """
SELECT kind, CAST(n AS BIGINT) AS n,
       CAST(avg_width AS DOUBLE) AS avg_width,
       CAST(avg_height AS DOUBLE) AS avg_height,
       CAST(n_frames_sampled AS BIGINT) AS n_frames_sampled,
       CAST(avg_frame_mean AS DOUBLE) AS avg_frame_mean
FROM (VALUES
  ('audio', 654, 10.099388, 9.692661, 0, 0.0),
  ('image', 682, 10.026393, 9.684751, 0, 0.0),
  ('video', 664, 10.11747, 9.75753, 1859, 126.793282)
) AS golden(kind, n, avg_width, avg_height, n_frames_sampled, avg_frame_mean)
ORDER BY kind
"""


def media_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The de-stubbed codec path end-to-end on REAL on-disk bytes:
    1,000 deterministic 24-bit BMP blobs → stdlib BMP decode inside the
    mapInPandas feature stage → per-width-bucket stats. Hash-checked
    against a golden VALUES oracle recomputed independently from the
    BMP spec in plain Python/numpy — a byte off in header parse, BGR
    swap, row padding, or bottom-up flip shifts a mean."""
    from pyspark.sql import functions as F

    media = generate_bmp_media(spark, 1000, seed=42)
    feats = extract_features(media, codec="bmp", feature_dim=8)
    return (
        feats.groupBy((F.col("width") % 4).cast("int").alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        )
        .orderBy("width_bucket")
    )


# golden: independent plain-Python/numpy recomputation from the BMP
# spec (sha256 synth dims/payload, RGB means), N=1000 seed=42
MEDIA_BMP_SQL = """
SELECT CAST(width_bucket AS INT) AS width_bucket, CAST(n AS BIGINT) AS n,
       CAST(avg_width AS DOUBLE) AS avg_width,
       CAST(avg_height AS DOUBLE) AS avg_height,
       CAST(avg_intensity AS DOUBLE) AS avg_intensity
FROM (VALUES
  (0, 249, 14.200803, 15.192771, 128.725711),
  (1, 248, 15.532258, 15.645161, 127.500929),
  (2, 253, 16.450593, 15.905138, 127.981408),
  (3, 250, 17.224, 15.368, 128.02023)
) AS golden(width_bucket, n, avg_width, avg_height, avg_intensity)
ORDER BY width_bucket
"""


def media_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio codec path end-to-end on REAL on-disk bytes: 1,000
    deterministic PCM16 WAV blobs → stdlib wave decode inside the
    mapInPandas feature stage → per-channel-count stats. Golden VALUES
    oracle recomputed independently from the synth parameters in plain
    Python/numpy (never through encode/decode — equality proves the
    WAV round-trip is byte-exact)."""
    from pyspark.sql import functions as F

    media = generate_wav_media(spark, 1000, seed=42)
    feats = extract_features(media, codec="wav", feature_dim=8)
    return (
        feats.groupBy("channels")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 6).alias("avg_frames"),
            F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        )
        .orderBy("channels")
    )


# golden: plain-Python/numpy recomputation from the synth parameters,
# N=1000 seed=42
MEDIA_WAV_SQL = """
SELECT CAST(channels AS INT) AS channels, CAST(n AS BIGINT) AS n,
       CAST(avg_frames AS DOUBLE) AS avg_frames,
       CAST(avg_intensity AS DOUBLE) AS avg_intensity
FROM (VALUES
  (1, 501, 697.477046, 127.593685),
  (2, 499, 691.951904, 127.660567)
) AS golden(channels, n, avg_frames, avg_intensity)
ORDER BY channels
"""


def media_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED codec path end-to-end on real on-disk bytes:
    1,000 deterministic 8-bit RGB PNG blobs (filters cycling through
    all five types) → stdlib inflate + unfilter inside the mapInPandas
    feature stage → per-width-bucket stats. Golden VALUES oracle
    recomputed independently from the synth parameters in plain
    Python/numpy — never through encode/decode, so equality proves the
    DEFLATE round-trip and every filter reconstruction are byte-exact."""
    from pyspark.sql import functions as F

    media = generate_png_media(spark, 1000, seed=42)
    feats = extract_features(media, codec="png", feature_dim=8)
    return (
        feats.groupBy((F.col("width") % 4).cast("int").alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        )
        .orderBy("width_bucket")
    )


# golden: plain-Python/numpy recomputation from the synth parameters
# (sha256 dims + payload stretch), N=1000 seed=42
MEDIA_PNG_SQL = """
SELECT CAST(width_bucket AS INT) AS width_bucket, CAST(n AS BIGINT) AS n,
       CAST(avg_width AS DOUBLE) AS avg_width,
       CAST(avg_height AS DOUBLE) AS avg_height,
       CAST(avg_intensity AS DOUBLE) AS avg_intensity
FROM (VALUES
  (0, 238, 14.084034, 15.563025, 127.032019),
  (1, 242, 15.413223, 15.42562, 127.103187),
  (2, 279, 16.222222, 15.412186, 128.160897),
  (3, 241, 16.360996, 15.456432, 128.622362)
) AS golden(width_bucket, n, avg_width, avg_height, avg_intensity)
ORDER BY width_bucket
"""


MULTIMODAL_QUERIES: dict[str, tuple] = {
    "media_feature_stats": (media_feature_stats, MEDIA_STATS_SQL),
    "media_pipeline_stats": (media_pipeline_stats, MEDIA_PIPELINE_SQL),
    "media_bmp_stats": (media_bmp_stats, MEDIA_BMP_SQL),
    "media_wav_stats": (media_wav_stats, MEDIA_WAV_SQL),
    "media_png_stats": (media_png_stats, MEDIA_PNG_SQL),
}


# --------------------------------------------------------------------------
# resize + frame-sample (the remaining multimodal plumbing ops)
# --------------------------------------------------------------------------


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, blob binary"
)


def resize_media(media: DataFrame, factor: int = 2, codec: str = "synthetic") -> DataFrame:
    """Binary→binary resize: decode, drop every ``factor``-th sample in
    both spatial dims (nearest-neighbor downsample), re-encode in the
    same blob format. mapInPandas keeps it partition-parallel and the
    output is a valid media table (decode_blob round-trips it) — the
    shape a real thumbnail/downsample stage has."""
    import numpy as np
    import pandas as pd

    src = media.select("media_id", "blob")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                d = decode_blob(bytes(blob), codec)
                w, h, c = d["width"], d["height"], d["channels"]
                arr = np.frombuffer(d["payload"], dtype=np.uint8).reshape(h, w, c)
                small = arr[::factor, ::factor, :]
                nh, nw = small.shape[0], small.shape[1]
                kind_i = _KINDS.index(d["kind"])
                out_blob = _MAGIC + struct.pack("<BHHB", kind_i, nw, nh, c) + small.tobytes()
                rows.append(
                    {"media_id": int(mid), "kind": d["kind"], "width": nw,
                     "height": nh, "channels": c, "blob": out_blob}
                )
            yield pd.DataFrame.from_records(rows)

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_mean double"


def sample_frames(media: DataFrame, every_k: int = 4, codec: str = "synthetic") -> DataFrame:
    """Frame sampling for video rows (the fake codec models a video as
    height 'frames' of width×channels samples): emit every k-th frame's
    index and mean intensity. Non-video rows contribute nothing —
    the filter happens inside the batch, exactly how a real
    pyav-frame-iterator stage behaves."""
    import numpy as np
    import pandas as pd

    src = media.select("media_id", "blob")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if codec == "gif":
                    # REAL framed bytes: every k-th LZW-decoded raster
                    g = decode_gif(bytes(blob))
                    for fi in range(0, g["n_frames"], every_k):
                        px = np.frombuffer(g["frames"][fi], dtype=np.uint8)
                        rows.append(
                            {"media_id": int(mid), "frame_idx": fi,
                             "frame_mean": float(px.mean())}
                        )
                    continue
                d = decode_blob(bytes(blob), codec)
                if d["kind"] != "video":
                    continue
                w, h, c = d["width"], d["height"], d["channels"]
                arr = np.frombuffer(d["payload"], dtype=np.uint8).reshape(h, w * c)
                for fi in range(0, h, every_k):
                    rows.append(
                        {"media_id": int(mid), "frame_idx": fi,
                         "frame_mean": float(arr[fi].mean())}
                    )
            yield pd.DataFrame.from_records(rows) if rows else pd.DataFrame(
                {"media_id": pd.Series(dtype="int64"),
                 "frame_idx": pd.Series(dtype="int32"),
                 "frame_mean": pd.Series(dtype="float64")}
            )

    return src.mapInPandas(run, schema=FRAMES_SCHEMA)


# --------------------------------------------------------------------------
# GIF87a/89a codec (stdlib-only): LZW-compressed, multi-frame — the
# third REAL compressed format after PNG (DEFLATE) and WAV (PCM), and
# the first ANIMATED one, so the frame-sample stage runs on genuinely
# framed bytes. Grayscale 256-entry global palette: a pixel's palette
# index IS its intensity, which keeps the truth-anchored golden a pure
# arithmetic recomputation from the synth parameters.


def _lzw_encode(indices: bytes, min_code: int = 8) -> bytes:
    """GIF-variant LZW: clear/end codes, code width grows 9→12 bits,
    dictionary reset at 4096; LSB-first bit packing; 255-byte
    sub-blocks."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(1 << min_code)},
            end + 1,
            min_code + 1,
        )

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096 - 2:
            out_bits.append((clear, width))
            table, next_code, width = fresh()
        buf = bytes([b])
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))

    acc = n_acc = 0
    raw = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        raw.append(acc & 0xFF)

    blocks = bytearray([min_code])
    for i in range(0, len(raw), 255):
        chunk = raw[i:i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return bytes(blocks)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of _lzw_encode: consumes [min_code][sub-blocks...][0]."""
    min_code = data[0]
    clear, end = 1 << min_code, (1 << min_code) + 1
    raw = bytearray()
    pos = 1
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        raw.extend(data[pos:pos + n])
        pos += n

    out = bytearray()
    table: list[bytes] = []

    def reset() -> tuple[list[bytes], int]:
        t = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        return t, min_code + 1

    table, width = reset()
    acc = n_acc = 0
    prev: bytes | None = None
    for byte in raw:
        acc |= byte << n_acc
        n_acc += 8
        while n_acc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_acc -= width
            if code == clear:
                table, width = reset()
                prev = None
                continue
            if code == end:
                if len(out) != expected:
                    raise ValueError(
                        f"LZW stream ended at {len(out)} of {expected} pixels"
                    )
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    raise ValueError("missing LZW end code")


def encode_gif(width: int, height: int, frames: list[bytes]) -> bytes:
    """GIF89a, 256-entry grayscale global palette, one image block per
    frame (each a full wxh indexed raster), 4/100 s frame delay."""
    if any(len(f) != width * height for f in frames):
        raise ValueError("frame size mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # global palette, 256 entries, 8-bit
    for i in range(256):
        out += bytes([i, i, i])
    for f in frames:
        out += bytes([0x21, 0xF9, 4, 0, 4, 0, 0, 0])  # GCE: 4/100 s
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0])  # no local palette
        out += _lzw_encode(f)
    out += bytes([0x3B])
    return bytes(out)


def decode_gif(blob: bytes) -> dict:
    """Parse GIF87a/89a with a global palette and full-frame images;
    returns frames as indexed rasters plus the grayscale palette map."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", blob[6:10])
    flags = blob[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = blob[pos:pos + 3 * n]
        pos += 3 * n
    frames = []
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += blob[pos] + 1
            pos += 1
        elif b0 == 0x2C:
            left, top, w, h = struct.unpack("<HHHH", blob[pos + 1:pos + 9])
            iflags = blob[pos + 9]
            pos += 10
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pos += 3 * n
            start = pos
            pos += 1  # min code size
            while blob[pos] != 0:
                pos += blob[pos] + 1
            pos += 1
            frames.append(_lzw_decode(blob[start:pos], w * h))
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
        "palette": palette,
    }


def synth_gif(media_id: int, seed: int = 42) -> tuple[bytes, int, int, int]:
    """Deterministic REAL animated blob: dims, frame count, and every
    indexed raster derive from sha256(media_id, seed)."""
    h = hashlib.sha256(f"gif:{seed}:{media_id}".encode()).digest()
    w = 8 + h[1] % 16
    ht = 8 + h[2] % 16
    nf = 2 + h[3] % 3
    frames = []
    for fi in range(nf):
        n = w * ht
        fh = hashlib.sha256(h + bytes([fi])).digest()
        frames.append((fh * (n // 32 + 1))[:n])
    return encode_gif(w, ht, frames), w, ht, nf


def generate_gif_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, w, ht, nf = synth_gif(int(i), seed)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "video",
                        "url": f"https://media.example.org/gif/{int(i)}.gif",
                        "blob": blob,
                        "meta_width": w,
                        "meta_height": ht,
                        "meta_channels": nf,
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANIMATED compressed codec end-to-end on real bytes: 600
    deterministic multi-frame grayscale GIFs → stdlib LZW decode of
    every frame inside mapInPandas → per-frame-count stats (dims and
    mean intensity across ALL frames; intensity == palette index, so
    the golden recomputes from the synth parameters without touching
    encode/decode — equality proves the LZW round-trip is
    byte-exact)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    media = generate_gif_media(spark, 600, seed=42)
    src = media.select("media_id", "blob")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = decode_gif(bytes(r["blob"]))
                allpx = np.frombuffer(b"".join(g["frames"]), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(r["media_id"]),
                        "width": g["width"],
                        "height": g["height"],
                        "n_frames": g["n_frames"],
                        "mean_intensity": float(allpx.mean()),
                    }
                )
            yield pd.DataFrame.from_records(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames", "mean_intensity",
                ],
            )

    feats = src.mapInPandas(
        run,
        schema="media_id long, width int, height int, n_frames int, "
               "mean_intensity double",
    )
    return (
        feats.groupBy("n_frames")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        )
        .orderBy("n_frames")
    )


# golden: plain-Python recomputation from the synth parameters (sha256
# dims, frame count, payload stretch), N=600 seed=42 — never through
# encode/decode
MEDIA_GIF_SQL = """
SELECT CAST(n_frames AS INT) AS n_frames, CAST(n AS BIGINT) AS n,
       CAST(avg_width AS DOUBLE) AS avg_width,
       CAST(avg_height AS DOUBLE) AS avg_height,
       CAST(avg_intensity AS DOUBLE) AS avg_intensity
FROM (VALUES
  (2, 217, 14.741935, 15.456221, 126.150198),
  (3, 199, 16.291457, 15.502513, 126.851469),
  (4, 184, 15.391304, 15.646739, 127.627403)
) AS golden(n_frames, n, avg_width, avg_height, avg_intensity)
ORDER BY n_frames
"""


def media_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over REAL animated bytes: every 2nd LZW-decoded
    raster of the 600-GIF corpus through the sample_frames stage →
    per-frame-index stats. Golden recomputed from the synth
    parameters (frame 0 exists for all 600, frame 2 only for the
    3-or-4-frame blobs)."""
    from pyspark.sql import functions as F

    media = generate_gif_media(spark, 600, seed=42)
    frames = sample_frames(media, every_k=2, codec="gif")
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
        )
        .orderBy("frame_idx")
    )


MEDIA_GIF_FRAMES_SQL = """
SELECT CAST(frame_idx AS INT) AS frame_idx, CAST(n AS BIGINT) AS n,
       CAST(avg_frame_mean AS DOUBLE) AS avg_frame_mean
FROM (VALUES
  (0, 600, 126.908091),
  (2, 383, 127.837374)
) AS golden(frame_idx, n, avg_frame_mean)
ORDER BY frame_idx
"""


MULTIMODAL_QUERIES["media_gif_stats"] = (media_gif_stats, MEDIA_GIF_SQL)
MULTIMODAL_QUERIES["media_gif_frames"] = (media_gif_frames, MEDIA_GIF_FRAMES_SQL)
