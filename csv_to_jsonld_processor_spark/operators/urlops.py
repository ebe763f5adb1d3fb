"""URL canonicalization + URL-level dedup — the first dedup stage of a
Common-Crawl-style corpus (collapse recrawl/tracking variants of the
same page BEFORE any content fingerprinting touches the bytes).

The canonicalizer normalizes the variation classes that dominate real
crawl frontiers: host/scheme case, fragments, default ports, tracking
(``utm_*``) query parameters, unsorted query-parameter order, and
trailing slashes. Genuinely different paths must NOT collapse.

Cross-engine design: the ENTIRE pipeline — messy-URL synthesis from
md5-of-doc_id buckets AND the canonicalization itself — is written once
as a dialect-neutral step template (`_STEPS`) and rendered twice: into
a chain of Spark `withColumn` expressions and into a DuckDB CTE chain.
One source of logic, two engines, so the oracle check exercises the
actual normalization rules rather than a pinned answer. Only function
NAMES differ per dialect (filter/list_filter, split/string_split,
array_join/array_to_string, array_sort/list_sort); md5, instr, substr,
CASE and LIKE behave identically.

Scale: every step is per-row column algebra riding the documents scan
(no UDF, no shuffle); the only exchanges are the (canonical_url) and
(domain) aggregations, both partial-aggregated. At 100 TB the canonical
key replaces raw-url as the partition key for all downstream
content-level dedup, cutting that stage's shuffle by the collapse rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

_SPARK_FNS = {
    "SPLIT": "split",
    "FILTER": "filter",
    "SORT": "array_sort",
    "JOIN": "array_join",
    "REVERSE": "reverse",
    "DOT": "'\\\\.'",  # Spark split() takes a regex
    "SLICE3_OPEN": "slice(",
    "SLICE3_CLOSE": ", 1, 3)",
}
_DUCK_FNS = {
    "SPLIT": "string_split",
    "FILTER": "list_filter",
    "SORT": "list_sort",
    "JOIN": "array_to_string",
    "REVERSE": "list_reverse",
    "DOT": "'.'",  # DuckDB string_split takes a literal
    "SLICE3_OPEN": "(",
    "SLICE3_CLOSE": ")[1:3]",  # 1-based inclusive slice
}

# messy-URL synthesis: two raw observations per document, variant B
# decorated by junk class k = first md5 hex digit. Classes 0-d are
# removable junk (must collapse with variant A); e-f are a genuinely
# different path (must NOT collapse).
_SYNTH = """
CASE WHEN v = 0 THEN
  'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id
ELSE
  CASE substr(md5(CAST(doc_id AS STRING)), 1, 1)
    WHEN '0' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '?utm_source=feed&utm_campaign=x'
    WHEN '1' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '?utm_medium=rss'
    WHEN '2' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '?utm_source=feed&utm_campaign=x'
    WHEN '3' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '#section-2'
    WHEN '4' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '#comments'
    WHEN '5' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '#'
    WHEN '6' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org:443/article/' || doc_id
    WHEN '7' THEN 'https://WWW.News-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.EXAMPLE.ORG:443/article/' || doc_id
    WHEN '8' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '/'
    WHEN '9' THEN 'https://WWW.NEWS-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id
    WHEN 'a' THEN 'https://WWW.News-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.Example.Org/article/' || doc_id || '#top'
    WHEN 'b' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '?utm_term=z&utm_content=y'
    WHEN 'c' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org:443/article/' || doc_id || '/'
    WHEN 'd' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '?utm_source=tw#frag'
    WHEN 'e' THEN 'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/article/' || doc_id || '-alt'
    ELSE          'https://www.news-' || substr(md5(CAST(doc_id AS STRING)), 2, 1) || '.example.org/amp/' || doc_id
  END
END
"""

# canonicalization steps: (output column, dialect-neutral expression).
# {FN} placeholders are the only per-engine substitutions.
_STEPS: list[tuple[str, str]] = [
    ("no_frag", "CASE WHEN instr(raw_url, '#') > 0 "
                "THEN substr(raw_url, 1, instr(raw_url, '#') - 1) ELSE raw_url END"),
    ("qpos", "instr(no_frag, '?')"),
    ("base", "CASE WHEN qpos > 0 THEN substr(no_frag, 1, qpos - 1) ELSE no_frag END"),
    ("qstr", "CASE WHEN qpos > 0 THEN substr(no_frag, qpos + 1) ELSE '' END"),
    ("kept_params",
     "{JOIN}({SORT}({FILTER}({SPLIT}(qstr, '&'), "
     "x -> NOT (x LIKE 'utm_%') AND x <> '')), '&')"),
    ("rest", "substr(base, 9)"),  # after the literal 'https://'
    ("spos", "instr(rest, '/')"),
    ("hostport", "lower(CASE WHEN spos > 0 THEN substr(rest, 1, spos - 1) ELSE rest END)"),
    ("host", "CASE WHEN hostport LIKE '%:443' "
             "THEN substr(hostport, 1, length(hostport) - 4) ELSE hostport END"),
    ("path0", "CASE WHEN spos > 0 THEN substr(rest, spos) ELSE '/' END"),
    ("path", "CASE WHEN length(path0) > 1 AND path0 LIKE '%/' "
             "THEN substr(path0, 1, length(path0) - 1) ELSE path0 END"),
    ("canonical_url",
     "'https://' || host || path || "
     "CASE WHEN kept_params <> '' THEN '?' || kept_params ELSE '' END"),
]


# SURT (Sort-friendly URI Reordering Transform) — the Common-Crawl CDX
# index key: host labels reversed comma-joined, then ')' + path + query,
# so a lexicographic sort clusters every URL under its domain subtree.
_SURT_STEPS: list[tuple[str, str]] = [
    ("surt_host", "{JOIN}({REVERSE}({SPLIT}(host, {DOT})), ',')"),
    ("surt", "surt_host || ')' || path || "
             "CASE WHEN kept_params <> '' THEN '?' || kept_params ELSE '' END"),
    # index shard key: the first three reversed labels (tld,domain,sub)
    ("surt_prefix",
     "{JOIN}({SLICE3_OPEN}{SPLIT}(surt_host, ','){SLICE3_CLOSE}, ',')"),
]


def canonicalize_url_cols(df: DataFrame) -> DataFrame:
    """Render the canonicalization template as Spark column algebra over
    a ``raw_url`` column (adds ``canonical_url``; intermediates kept for
    debuggability, prune with a select)."""
    for name, tmpl in _STEPS:
        df = df.withColumn(name, F.expr(tmpl.format(**_SPARK_FNS)))
    return df


def doc_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup over the synthesized two-observations-per-doc
    crawl frontier: canonicalize every raw URL, collapse by canonical
    form, and report per domain how much of the frontier was tracking/
    case/fragment noise: raw observations, distinct raw URLs, distinct
    canonical URLs, and URLs collapsed (distinct raw minus canonical).
    """
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    raw = (
        docs.select("doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("v"))
        .withColumn("raw_url", F.expr(_SYNTH))
    )
    canon = canonicalize_url_cols(raw).select("doc_id", "raw_url", "canonical_url", "host")
    per_canon = canon.groupBy("host", "canonical_url").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.countDistinct("raw_url").alias("n_raw"),
    )
    return (
        per_canon.groupBy(F.col("host").alias("domain"))
        .agg(
            F.sum("n_obs").cast("long").alias("n_observations"),
            F.sum("n_raw").cast("long").alias("n_raw_urls"),
            F.count(F.lit(1)).cast("long").alias("n_canonical_urls"),
            (F.sum("n_raw") - F.count(F.lit(1))).cast("long").alias("n_collapsed"),
        )
        .orderBy("domain")
    )


def doc_url_surt_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style capture index over the canonicalized crawl frontier:
    every canonical URL keyed by its SURT form, summarized per index
    shard (the 3-label surt_host prefix). Output per shard: capture and
    distinct-URL counts plus the shard's first/last SURT key — exactly
    the secondary-index row a CDX(J) reader binary-searches on.

    Scale: SURT keys are per-row column algebra on the scan; the shard
    rollup is one partial-aggregated groupBy. The production layout
    writes the captures repartitionByRange(surt) so each output file is
    a sorted CDX shard and this query is its footer metadata."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    raw = (
        docs.select("doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("v"))
        .withColumn("raw_url", F.expr(_SYNTH))
    )
    df = canonicalize_url_cols(raw)
    for name, tmpl in _SURT_STEPS:
        df = df.withColumn(name, F.expr(tmpl.format(**_SPARK_FNS)))
    return (
        df.groupBy("surt_prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_captures"),
            F.countDistinct("surt").cast("long").alias("n_urls"),
            F.min("surt").alias("first_key"),
            F.max("surt").alias("last_key"),
        )
        .orderBy("surt_prefix")
    )


def _render_duck_chain(steps: list[tuple[str, str]], prev: str) -> tuple[str, str]:
    rendered = []
    for name, tmpl in steps:
        rendered.append(
            f"s_{name} AS (SELECT *, {tmpl.format(**_DUCK_FNS)} AS {name} FROM {prev})"
        )
        prev = f"s_{name}"
    return ",\n".join(rendered), prev


def _url_surt_sql() -> str:
    chain1, prev = _render_duck_chain(_STEPS, "raw")
    chain2, prev = _render_duck_chain(_SURT_STEPS, prev)
    return f"""
WITH raw AS (
  SELECT doc_id, v, {_SYNTH} AS raw_url
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS v)
),
{chain1},
{chain2}
SELECT surt_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_captures,
       CAST(COUNT(DISTINCT surt) AS BIGINT) AS n_urls,
       MIN(surt) AS first_key,
       MAX(surt) AS last_key
FROM {prev} GROUP BY surt_prefix ORDER BY surt_prefix
"""


def _url_dedup_sql() -> str:
    steps = []
    prev = "raw"
    for name, tmpl in _STEPS:
        steps.append(
            f"s_{name} AS (SELECT *, {tmpl.format(**_DUCK_FNS)} AS {name} FROM {prev})"
        )
        prev = f"s_{name}"
    chain = ",\n".join(steps)
    return f"""
WITH raw AS (
  SELECT doc_id, v, {_SYNTH} AS raw_url
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS v)
),
{chain},
per_canon AS (
  SELECT host, canonical_url, COUNT(*) AS n_obs, COUNT(DISTINCT raw_url) AS n_raw
  FROM {prev} GROUP BY 1, 2
)
SELECT host AS domain,
       CAST(SUM(n_obs) AS BIGINT) AS n_observations,
       CAST(SUM(n_raw) AS BIGINT) AS n_raw_urls,
       CAST(COUNT(*) AS BIGINT) AS n_canonical_urls,
       CAST(SUM(n_raw) - COUNT(*) AS BIGINT) AS n_collapsed
FROM per_canon GROUP BY 1 ORDER BY domain
"""


DOC_URL_DEDUP_SQL = _url_dedup_sql()


DOC_URL_SURT_SQL = _url_surt_sql()


URL_QUERIES: dict[str, tuple] = {
    "doc_url_dedup": (doc_url_dedup, DOC_URL_DEDUP_SQL),
    "doc_url_surt_index": (doc_url_surt_index, DOC_URL_SURT_SQL),
}
