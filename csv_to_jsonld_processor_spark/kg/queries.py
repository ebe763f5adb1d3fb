"""KG-construction operators expressed over the driver's ``documents``
table so the DuckDB gate can check them (the full web-text pipeline with
HTML + linking runs on the synthetic pages corpus in kg/pipeline.py and
is pytest-gated).

- ``kg_mention_counts``: gazetteer mention detection as triples
  (doc, "mentions", term, n) — the mention-detection stage with an
  exact SQL oracle.
- ``kg_cooccurrence_edges``: adjacent-token co-occurrence edges between
  lexicon terms — the degenerate-but-exact form of (subj, pred, obj)
  extraction: subject term, "next-to" predicate, object term.
- ``kg_entity_degree``: graph-side aggregation over the extracted edges
  (entity materialization A1 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

LEXICON = ["spark", "table", "join", "window", "query", "filter", "sort", "merge", "stream", "vector"]


def kg_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tokens = F.split(F.col("text"), " ")
    lex = F.array(*[F.lit(w) for w in LEXICON])
    d = t["documents"].select(
        "doc_id", F.explode(F.filter(tokens, lambda x: F.array_contains(lex, x))).alias("term")
    )
    return (
        d.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .orderBy("doc_id", "term")
    )


KG_MENTIONS_SQL = f"""
SELECT doc_id, term, COUNT(*) AS n_mentions FROM (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> list_contains({LEXICON!r}, x))) AS term
  FROM documents
) GROUP BY doc_id, term ORDER BY doc_id, term
"""


def kg_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-lexicon-term pairs → weighted edges. Plan: higher-order
    transform builds the bigram array per doc (no shuffle), explode, one
    partial-aggregated groupBy — |lexicon|² max groups regardless of
    corpus size."""
    t = load_tables(spark, sf_dir)
    lex = F.array(*[F.lit(w) for w in LEXICON])
    d = t["documents"].withColumn("_tokens", F.split(F.col("text"), " "))
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(_tokens) - 1, 0)),"
        " i -> struct(_tokens[i-1] as subj, _tokens[i] as obj))"
    )
    pairs = d.select(F.explode(bigrams).alias("bg")).select("bg.subj", "bg.obj")
    return (
        pairs.where(F.array_contains(lex, F.col("subj")) & F.array_contains(lex, F.col("obj")))
        .groupBy("subj", "obj")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy("subj", "obj")
    )


KG_COOC_SQL = f"""
WITH toks AS (SELECT string_split(text,' ') AS tokens FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(tokens)-1, 0)),
                i -> struct_pack(subj := tokens[i], obj := tokens[i+1]))) AS p
  FROM toks
)
SELECT p.subj AS subj, p.obj AS obj, COUNT(*) AS weight
FROM bg
WHERE list_contains({LEXICON!r}, p.subj) AND list_contains({LEXICON!r}, p.obj)
GROUP BY 1, 2 ORDER BY subj, obj
"""


def kg_entity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree (in+out, weighted) per lexicon term over the co-occurrence
    graph — entity-table aggregation on top of edge extraction."""
    edges = kg_cooccurrence_edges(spark, sf_dir)
    out_deg = edges.groupBy(F.col("subj").alias("term")).agg(F.sum("weight").alias("w"))
    in_deg = edges.groupBy(F.col("obj").alias("term")).agg(F.sum("weight").alias("w"))
    return (
        out_deg.unionByName(in_deg)
        .groupBy("term")
        .agg(F.sum("w").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("term"))
    )


KG_DEGREE_SQL = f"""
WITH toks AS (SELECT string_split(text,' ') AS tokens FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(tokens)-1, 0)),
                i -> struct_pack(subj := tokens[i], obj := tokens[i+1]))) AS p
  FROM toks
), edges AS (
  SELECT p.subj AS subj, p.obj AS obj, COUNT(*) AS weight
  FROM bg
  WHERE list_contains({LEXICON!r}, p.subj) AND list_contains({LEXICON!r}, p.obj)
  GROUP BY 1, 2
), deg AS (
  SELECT subj AS term, weight FROM edges
  UNION ALL
  SELECT obj AS term, weight FROM edges
)
SELECT term, CAST(SUM(weight) AS BIGINT) AS degree FROM deg GROUP BY term ORDER BY degree DESC, term ASC
"""


def kg_webtext_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship web-text pipeline end-to-end on a deterministic
    1,000-page synthetic corpus: HTML → extract → NER → link →
    canonicalize → edges. Not ANSI-SQL-expressible (gazetteer NER +
    linking) → rows-only driver check; P/R vs the generator's ground
    truth is pytest-gated (tests/test_kg_pipeline.py)."""
    from ..sources.pages import generate_pages
    from .pipeline import build_kg

    pages = generate_pages(spark, 1000, seed=42, partitions=8)
    edges = build_kg(spark, pages)["edges"]
    return edges.select("url", "sent_idx", "subj", "pred", "obj").orderBy(
        "url", "sent_idx", "subj", "pred", "obj"
    )


KG_QUERIES: dict[str, tuple] = {
    "kg_mention_counts": (kg_mention_counts, KG_MENTIONS_SQL),
    "kg_cooccurrence_edges": (kg_cooccurrence_edges, KG_COOC_SQL),
    "kg_entity_degree": (kg_entity_degree, KG_DEGREE_SQL),
    "kg_webtext_edges": (kg_webtext_edges, None),  # rows-only: NER+linking beyond ANSI SQL
}
