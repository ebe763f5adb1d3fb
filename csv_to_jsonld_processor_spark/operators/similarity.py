"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

- ``ann_topk_bruteforce``: exact cosine top-k for a query set. The
  baseline: broadcast the (small) query side, score JVM-side with
  ``zip_with``/``aggregate`` folds (deterministic left-to-right order →
  bit-stable across partitionings), rank per query with a window.
  At 100 TB the corpus side stays partitioned; only queries broadcast.
- ``ann_lsh_bucketed``: random-hyperplane LSH — deterministic planes
  derived from xxhash64, sign-bit bucket keys, candidates restricted to
  same-bucket (multi-probe across H tables), then exact re-scoring.
  The scale path: candidate generation is an equi-join on bucket keys.
  Not ANSI-SQL-expressible → recall vs brute force is pytest-gated
  (tests/test_similarity.py); the driver gets a rows-only check.

Cosine formula matches DuckDB's ``list_cosine_similarity`` shape
(dot / sqrt(|a|²·|b|²) — single sqrt) so oracle scores are bit-equal;
ranking uses round(score, 6) with id tiebreaks for cross-engine
stability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_tables

N_QUERIES = 5
TOP_K = 10
LSH_PLANES = 3
LSH_TABLES = 8  # few planes, more tables: these 64-d vectors are near-random (max cos≈0.5), so collision prob per bit is only ~2/3


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a: str | Column) -> Column:
    return F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b))


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine("v", "qv"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


ANN_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4 — this synthetic table has no planted near-dups; 0.4 captures the top tail, max observed ≈0.51) — the
    embedding flavor of dedup. Brute-force at test SF; LSH path below is
    the scale plan."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine("va", "vb"), 6).alias("score"))
        .where(F.col("score") >= 0.4)
        .orderBy("id_a", "id_b")
    )


NEARDUP_COS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
ORDER BY id_a, id_b
"""


def _lsh_planes(dim: int = 64):
    """Deterministic pseudo-random hyperplanes: plane[t][p][i] derived
    from a hash counter — reproducible everywhere, no RNG state."""
    import hashlib

    planes = []
    for t in range(LSH_TABLES):
        table = []
        for p in range(LSH_PLANES):
            vec = []
            for i in range(dim):
                h = int.from_bytes(
                    hashlib.sha256(f"plane:{t}:{p}:{i}".encode()).digest()[:8], "big"
                )
                vec.append((h % 2_000_001 - 1_000_000) / 1_000_000.0)
            table.append(vec)
        planes.append(table)
    return planes


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucket assignment per vector per table. Candidate
    pairs come from an equi-join on (table, bucket) — the 100 TB path
    where brute force is impossible."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    planes = _lsh_planes()

    buckets = []
    for ti, table in enumerate(planes):
        bits = None
        for pi, plane in enumerate(table):
            arr = F.array(*[F.lit(x) for x in plane])
            bit = F.when(_dot("v", arr) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            term = F.shiftleft(bit, pi)
            bits = term if bits is None else bits + term
        buckets.append(F.struct(F.lit(ti).alias("table_id"), bits.alias("bucket")))
    return (
        emb.select("vec_id", F.explode(F.array(*buckets)).alias("b"))
        .select("vec_id", "b.table_id", "b.bucket")
        .orderBy("vec_id", "table_id")
    )


SIMILARITY_QUERIES: dict[str, tuple] = {
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_SQL),
    "embedding_neardup_cosine": (embedding_neardup_cosine, NEARDUP_COS_SQL),
    "ann_lsh_buckets": (ann_lsh_bucketed, None),  # rows-only: hyperplane folds aren't ANSI SQL
}
