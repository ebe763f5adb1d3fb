"""End-to-end corpus curation funnel — the composition query that runs
the whole training-data pipeline in one plan:

    raw corpus
      → quality gate   (min length + Gopher repetition thresholds)
      → near-dup removal (MinHash LSH → exact-Jaccard verify → greedy
                          keep-smallest-id)
      → decontamination (13-gram overlap with the held-out benchmark)
      → per-language yield report

Every stage reuses the already-oracled building blocks (textops
repetition signals, the verified MinHash chain, the decontamination
semi-join), so this query proves the operators COMPOSE, not just that
they run alone. The greedy dedup rule is the standard production one:
a document is dropped iff some verified near-duplicate with a SMALLER
doc_id survived the quality gate (deterministic, one anti-join — no
iterative clustering in the keep path; dedup_clusters exists for the
cluster-report use case).

Scale shape: the verified-pair chain dominates (its cost analysis lives
in operators/dedup.py); the funnel adds only dimension-sized joins — the
dropped-doc set and the contaminated-doc set are both far smaller than
the corpus, and the final aggregation is per-language. Nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .dedup import dedup_minhash_verified
from .textops import (
    BENCH_DOCS,
    CONTAM_K,
    REP_DUP_BIGRAM_MAX,
    REP_TOP_WORD_MAX,
)
from .dedup import JACCARD_TAU, LSH_BANDS, LSH_ROWS, MINHASH_K, SHINGLE_K

QUALITY_MIN_TOKENS = 20  # same floor as doc_quality_scores


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation yield: docs in, survivors of each gate,
    tokens in/out, retention. Corpus = doc_id >= BENCH_DOCS (the first
    BENCH_DOCS docs play the held-out benchmark, as in
    doc_decontaminate)."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    # docs_tok: tokens only — the decontamination branch derives from
    # THIS so it never recomputes the heavy repetition metrics below
    docs_tok = (
        t["documents"]
        .where(F.col("doc_id") >= BENCH_DOCS)
        .withColumn("_tokens", toks)
        .withColumn("n_tokens", F.size("_tokens"))
    )
    top_count = F.expr(
        "array_max(transform(array_distinct(_tokens),"
        " t -> size(filter(_tokens, x -> x = t))))"
    )
    bigrams = F.expr(
        "CASE WHEN size(_tokens) >= 2 THEN transform(sequence(1, size(_tokens) - 1),"
        " i -> concat(_tokens[i-1], ' ', _tokens[i])) ELSE array() END"
    )
    base = (
        docs_tok.withColumn("_top", top_count)
        .withColumn("_bg", bigrams)
        .withColumn(
            "_top_frac", F.round(F.col("_top").cast("double") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "_dup_frac",
            F.round(
                F.when(
                    F.size("_bg") > 0,
                    (F.size("_bg") - F.size(F.array_distinct("_bg"))).cast("double")
                    / F.size("_bg"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "q_keep",
            (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
            & (F.col("_top_frac") <= REP_TOP_WORD_MAX)
            & (F.col("_dup_frac") <= REP_DUP_BIGRAM_MAX),
        )
        .select("doc_id", "lang", "n_tokens", "q_keep")
    )
    # narrow per-doc flags feed THREE downstream branches (qa, flags,
    # final agg): checkpoint the few-columns relation so the O(distinct ×
    # tokens) repetition metrics run over the corpus exactly once — at
    # 100 TB this is a tiny fraction of the input (4 scalar columns).
    # localCheckpoint, not persist: persist() entries live in the
    # session CacheManager until explicitly unpersisted (they leaked
    # across the multi-query driver run), while checkpoint blocks are
    # released when the DataFrame is garbage-collected.
    #
    # The quality-metric pass and the MinHash verified-pair chain share
    # no state, so their eager materializations run from two driver
    # threads (independent-job overlap): the pair chain's stragglers
    # back-fill with the repetition-metric tasks instead of serializing
    # the two heaviest stages of the funnel.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _base_ckpt():
        return base.localCheckpoint()

    def _pairs_ckpt():
        # greedy near-dup removal: drop b iff a verified dup (a, b), a < b,
        # has a q-surviving a inside the corpus. The verified chain's own
        # DAG references its candidate set twice — checkpointing the (tiny)
        # pair list materializes that whole chain once.
        return (
            dedup_minhash_verified(spark, sf_dir)
            .where("is_dup")
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        base_f = pool.submit(inheritable_thread_target(spark)(_base_ckpt))
        pairs_f = pool.submit(inheritable_thread_target(spark)(_pairs_ckpt))
        base = base_f.result()
        pairs = pairs_f.result()
    qa = base.select(F.col("doc_id").alias("doc_a"), F.col("q_keep").alias("_qa"))
    dropped = (
        pairs.join(qa, "doc_a")
        .where(F.col("_qa"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )

    # decontamination: any shared CONTAM_K-gram with the benchmark docs
    sh = F.array_distinct(
        F.expr(
            f"CASE WHEN size(_tokens) >= {CONTAM_K} THEN "
            f"transform(sequence(1, size(_tokens) - {CONTAM_K - 1}),"
            f" i -> array_join(slice(_tokens, i, {CONTAM_K}), ' ')) "
            "ELSE array() END"
        )
    )
    bench = (
        t["documents"]
        .where(F.col("doc_id") < BENCH_DOCS)
        .withColumn("_tokens", toks)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
    )
    contaminated = (
        docs_tok.select("doc_id", F.explode(sh).alias("shingle"))
        .join(F.broadcast(bench), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("_contam", F.lit(1))
    )

    flags = (
        base.join(dropped, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .withColumn("d_keep", F.col("q_keep") & F.col("_dropped").isNull())
        .withColumn("c_keep", F.col("d_keep") & F.col("_contam").isNull())
    )
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q_keep").cast("int")).cast("long").alias("n_quality"),
            F.sum(F.col("d_keep").cast("int")).cast("long").alias("n_dedup"),
            F.sum(F.col("c_keep").cast("int")).cast("long").alias("n_clean"),
            F.sum("n_tokens").cast("long").alias("tokens_in"),
            F.sum(F.when(F.col("c_keep"), F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tokens_out"),
            F.round(
                F.sum(F.col("c_keep").cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("retention"),
        )
        .orderBy("lang")
    )


CORPUS_CURATION_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))), ' ') AS tokens
  FROM documents
), base AS (
  SELECT doc_id, lang, tokens, len(tokens) AS n_tokens,
         ROUND(CAST(list_max(list_transform(list_distinct(tokens),
               t -> len(list_filter(tokens, x -> x = t)))) AS DOUBLE) / len(tokens), 6) AS top_frac,
         ROUND(CASE WHEN len(tokens) >= 2 THEN
           CAST(len(tokens) - 1 - len(list_distinct(list_transform(
                generate_series(1, len(tokens) - 1),
                i -> tokens[i] || ' ' || tokens[i+1]))) AS DOUBLE) / (len(tokens) - 1)
         ELSE 0.0 END, 6) AS dup_frac
  FROM toks WHERE doc_id >= {BENCH_DOCS}
), quality AS (
  SELECT doc_id, lang, tokens, n_tokens,
         (n_tokens >= {QUALITY_MIN_TOKENS}
          AND top_frac <= {REP_TOP_WORD_MAX}
          AND dup_frac <= {REP_DUP_BIGRAM_MAX}) AS q_keep
  FROM base
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS mh{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id
), banded AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || '|' || ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
      + ") AS band_key FROM sig"
      for b in range(LSH_BANDS)
  )}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a AS ca, c.doc_b AS cb, COUNT(*) AS n_common
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
), dup_pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  LEFT JOIN common cm ON cm.ca = c.doc_a AND cm.cb = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
         / (sa.n_shingles + sb.n_shingles - COALESCE(cm.n_common, 0)), 6) >= {JACCARD_TAU}
), dropped AS (
  SELECT DISTINCT p.doc_b AS doc_id
  FROM dup_pairs p JOIN quality qa ON qa.doc_id = p.doc_a
  WHERE qa.q_keep
), csh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {CONTAM_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{CONTAM_K - 1}], ' ')))) AS shingle
  FROM toks
), bench AS (
  SELECT DISTINCT shingle FROM csh WHERE doc_id < {BENCH_DOCS}
), contaminated AS (
  SELECT DISTINCT s.doc_id FROM csh s JOIN bench b ON s.shingle = b.shingle
  WHERE s.doc_id >= {BENCH_DOCS}
), flags AS (
  SELECT q.doc_id, q.lang, q.n_tokens, q.q_keep,
         (q.q_keep AND d.doc_id IS NULL) AS d_keep,
         (q.q_keep AND d.doc_id IS NULL AND c.doc_id IS NULL) AS c_keep
  FROM quality q
  LEFT JOIN dropped d ON d.doc_id = q.doc_id
  LEFT JOIN contaminated c ON c.doc_id = q.doc_id
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN d_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(SUM(CASE WHEN c_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_in,
       CAST(SUM(CASE WHEN c_keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_out,
       ROUND(CAST(SUM(CASE WHEN c_keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS retention
FROM flags GROUP BY lang ORDER BY lang
"""


CURATION_QUERIES: dict[str, tuple] = {
    "corpus_curation_funnel": (corpus_curation_funnel, CORPUS_CURATION_SQL),
}
