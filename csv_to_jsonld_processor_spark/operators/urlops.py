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


# --- crawl politeness: robots longest-prefix-match + per-host scheduling ----
#
# The admission-control stage of a crawl frontier: every candidate URL
# passes through its host's robots rules (REP longest-match semantics,
# allow wins ties — the Google/RFC 9309 rule), and surviving URLs are
# laid out on the host's politeness clock (one fetch per crawl_delay).
# Both the URL mix and the per-host rule sets are synthesized
# deterministically from md5 of doc_id / host, so BOTH engines derive
# rules + verdicts from the same column algebra — the oracle exercises
# the matcher itself, not a pinned answer.
#
# Rule classes planted: /private/ and /admin disallowed everywhere;
# "strict" hosts (md5 digit 0-7) additionally disallow /tmp/ BUT allow
# /tmp/ok/ — a longer allow overriding a shorter disallow, the case
# that distinguishes longest-match from first-match.
#
# Scale shape: the rules table is |hosts| × ≤4 rows — broadcast; the
# match join fans out ≤4× (rules per host), never |urls| × |rules|;
# the longest-match argmax is ONE map-side-combinable groupBy(url) of
# max(struct(prefix_len, is_allow)) — no window over the raw match
# rows; URLs matching NO rule keep their all-null join row (the match
# predicate lives in the ON clause, not a post-filter) and default to
# allowed. The politeness schedule is per-host SERIAL by definition
# (rank-by-path × crawl_delay), so its summary stats — makespan and
# first fetch — reduce to count/min aggregates with no window at all;
# emitting the full slot assignment at 10^12 URLs is a sort WITHIN the
# host partition (the crawl store's natural key), not a new exchange.

CRAWL_HOSTS = 12


def doc_crawl_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl admission + politeness schedule stats:
    (host, crawl_delay_s, n_urls, n_allowed, n_blocked, makespan_s)."""
    t = load_tables(spark, sf_dir)
    d = (
        t["documents"]
        .select("doc_id")
        .withColumn("pk", F.substring(F.md5(F.concat(F.lit("u:"), F.col("doc_id"))), 1, 1))
        .withColumn(
            "host",
            F.concat(
                F.lit("crawl"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit("h:"), F.col("doc_id"))), 1, 8), 16, 10
                    ).cast("long")
                    % CRAWL_HOSTS
                    + 1
                ).cast("string"),
                F.lit(".example.org"),
            ),
        )
        .withColumn(
            "path",
            F.concat(
                F.when(F.col("pk").isin("0", "1", "2", "3"), F.lit("/page/"))
                .when(F.col("pk").isin("4", "5"), F.lit("/private/"))
                .when(F.col("pk") == "6", F.lit("/admin/"))
                .when(F.col("pk").isin("7", "8", "9"), F.lit("/tmp/"))
                .when(F.col("pk").isin("a", "b"), F.lit("/tmp/ok/"))
                .otherwise(F.lit("/docs/")),
                F.col("doc_id"),
            ),
        )
        .select("doc_id", "host", "path")
    )
    hosts = d.select("host").distinct()
    strict = F.substring(F.md5(F.concat(F.lit("r:"), F.col("host"))), 1, 1) < "8"
    rules = (
        hosts.select("host", F.lit("/private/").alias("prefix"), F.lit(0).alias("is_allow"))
        .unionAll(hosts.select("host", F.lit("/admin"), F.lit(0)))
        .unionAll(hosts.where(strict).select("host", F.lit("/tmp/"), F.lit(0)))
        .unionAll(hosts.where(strict).select("host", F.lit("/tmp/ok/"), F.lit(1)))
    )
    delay = (
        F.conv(F.substring(F.md5(F.concat(F.lit("d:"), F.col("host"))), 1, 8), 16, 10).cast(
            "long"
        )
        % 5
        + 1
    ).alias("crawl_delay_s")
    r = rules.withColumnRenamed("host", "r_host")
    matched = (
        d.join(
            F.broadcast(r),
            (F.col("host") == F.col("r_host"))
            & (F.expr("left(path, length(prefix))") == F.col("prefix")),
            "left",
        )
        .groupBy("doc_id", "host", "path")
        .agg(
            F.max(
                F.when(
                    F.col("prefix").isNotNull(),
                    F.expr("struct(length(prefix) AS plen, is_allow)"),
                )
            ).alias("best")
        )
        .withColumn("allowed", F.col("best").isNull() | (F.col("best.is_allow") == 1))
    )
    per_host = (
        matched.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
            F.sum(F.when(F.col("allowed"), 0).otherwise(1)).cast("long").alias("n_blocked"),
            F.min(F.when(F.col("allowed"), F.col("path"))).alias("first_fetch"),
        )
        .withColumn("crawl_delay_s", delay)
    )
    return per_host.select(
        "host",
        F.col("crawl_delay_s").cast("long"),
        "n_urls",
        F.col("n_allowed").cast("long"),
        "n_blocked",
        (F.greatest(F.col("n_allowed") - 1, F.lit(0)) * F.col("crawl_delay_s"))
        .cast("long")
        .alias("makespan_s"),
        "first_fetch",
    ).orderBy("host")


DOC_CRAWL_POLITENESS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         substr(md5('u:' || doc_id), 1, 1) AS pk,
         'crawl' || CAST(CAST(('0x' || substr(md5('h:' || doc_id), 1, 8)) AS BIGINT)
                         % {CRAWL_HOSTS} + 1 AS VARCHAR) || '.example.org' AS host
  FROM documents),
urls AS (
  SELECT doc_id, host,
         (CASE WHEN pk IN ('0','1','2','3') THEN '/page/'
               WHEN pk IN ('4','5') THEN '/private/'
               WHEN pk = '6' THEN '/admin/'
               WHEN pk IN ('7','8','9') THEN '/tmp/'
               WHEN pk IN ('a','b') THEN '/tmp/ok/'
               ELSE '/docs/' END) || doc_id AS path
  FROM d),
hosts AS (SELECT DISTINCT host FROM urls),
rules AS (
  SELECT host, '/private/' AS prefix, 0 AS is_allow FROM hosts
  UNION ALL SELECT host, '/admin', 0 FROM hosts
  UNION ALL SELECT host, '/tmp/', 0 FROM hosts WHERE substr(md5('r:' || host), 1, 1) < '8'
  UNION ALL SELECT host, '/tmp/ok/', 1 FROM hosts WHERE substr(md5('r:' || host), 1, 1) < '8'),
matched AS (
  SELECT u.doc_id, u.host, u.path,
         MAX(CASE WHEN r.prefix IS NULL THEN NULL
                  ELSE {{'plen': length(r.prefix), 'is_allow': r.is_allow}} END) AS best
  FROM urls u LEFT JOIN rules r
    ON u.host = r.host AND left(u.path, length(r.prefix)) = r.prefix
  GROUP BY u.doc_id, u.host, u.path),
verdict AS (
  SELECT doc_id, host, path,
         (best IS NULL OR best.is_allow = 1) AS allowed
  FROM matched),
per_host AS (
  SELECT host, COUNT(*) AS n_urls,
         SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS n_allowed,
         SUM(CASE WHEN allowed THEN 0 ELSE 1 END) AS n_blocked,
         MIN(CASE WHEN allowed THEN path END) AS first_fetch
  FROM verdict GROUP BY host)
SELECT host,
       CAST(CAST(('0x' || substr(md5('d:' || host), 1, 8)) AS BIGINT) % 5 + 1 AS BIGINT)
         AS crawl_delay_s,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_allowed AS BIGINT) AS n_allowed,
       CAST(n_blocked AS BIGINT) AS n_blocked,
       CAST(GREATEST(n_allowed - 1, 0)
            * (CAST(('0x' || substr(md5('d:' || host), 1, 8)) AS BIGINT) % 5 + 1) AS BIGINT)
         AS makespan_s,
       first_fetch
FROM per_host
ORDER BY host
"""


URL_QUERIES: dict[str, tuple] = {
    "doc_url_dedup": (doc_url_dedup, DOC_URL_DEDUP_SQL),
    "doc_url_surt_index": (doc_url_surt_index, DOC_URL_SURT_SQL),
    "doc_crawl_politeness": (doc_crawl_politeness, DOC_CRAWL_POLITENESS_SQL),
}
