"""Batch model inference over documents — the quality-classifier stage
every production training-data pipeline runs (the fastText-style filter
in web-corpus curation), expressed the way it scales: model parameters
broadcast as plan constants, features and the dot product computed
entirely in JVM expressions riding the scan — zero Python in the hot
path, zero shuffles before the final dimension-sized aggregation.

The model here is a fixed linear scorer over six handcrafted text
features. Real pipelines load learned weights; the PLAN is identical —
swap the constants (or generate the expression from a weights file) and
nothing else changes. The score stays LINEAR (no sigmoid): monotone in
the logit, so the keep decision is identical, and it avoids the exp()
cross-engine ULP hazard the repo's FP discipline forbids. Feature
ratios are single integer/integer IEEE divisions and the dot product is
a fixed-order multiply-add chain, so Spark and DuckDB produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "for"]
PUNCT_CLASS = r"[.,!?;:]"

# (feature, weight) — fixed "trained" parameters; bias chosen so the
# corpus splits non-trivially
W_NTOK = 0.004
W_MEANLEN = 0.35
W_STOP = 2.0
W_PUNCT = -4.0
W_DIGIT = -3.0
W_SHORT = -1.5  # fraction of 1-2 char tokens
BIAS = -1.88  # ~median of the raw score distribution: splits the corpus non-trivially


def _features(doc: DataFrame) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    d = doc.withColumn("_toks", toks).withColumn("n_tokens", F.size("_toks"))
    total_chars = F.expr("aggregate(transform(_toks, t -> length(t)), 0, (a, x) -> a + x)")
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    n_stop = F.expr(f"size(filter(_toks, t -> array_contains({stop_arr}, t)))")
    n_short = F.expr("size(filter(_toks, t -> length(t) <= 2))")
    n_punct = F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    n_digit = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    return (
        d.withColumn("mean_len", total_chars.cast("double") / F.col("n_tokens"))
        .withColumn("stop_ratio", n_stop.cast("double") / F.col("n_tokens"))
        .withColumn("short_ratio", n_short.cast("double") / F.col("n_tokens"))
        .withColumn("punct_ratio", n_punct.cast("double") / F.length("text"))
        .withColumn("digit_ratio", n_digit.cast("double") / F.length("text"))
    )


def _score() -> F.Column:
    """Fixed-order multiply-add chain — textually identical to the SQL
    oracle's expression so both engines run the same IEEE ops."""
    return (
        F.col("n_tokens") * W_NTOK
        + F.col("mean_len") * W_MEANLEN
        + F.col("stop_ratio") * W_STOP
        + F.col("punct_ratio") * W_PUNCT
        + F.col("digit_ratio") * W_DIGIT
        + F.col("short_ratio") * W_SHORT
        + F.lit(BIAS)
    )


def doc_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, keep) inference report: document counts and the mean
    linear quality score (decimal-accumulated for cross-engine order
    independence). keep := score > 0."""
    t = load_tables(spark, sf_dir)
    scored = _features(t["documents"]).withColumn("score", _score())
    return (
        scored.groupBy("lang", (F.col("score") > 0).alias("keep"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_mean"),
        )
        .select(
            "lang",
            "keep",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("_mean", 6).alias("mean_score"),
        )
        .orderBy("lang", "keep")
    )


DOC_QUALITY_MODEL_SQL = rf"""
WITH feat AS (
  SELECT lang, text,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), f2 AS (
  SELECT lang,
         len(toks) AS n_tokens,
         CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks) AS mean_len,
         CAST(len(list_filter(toks, t -> list_contains({STOPWORDS!r}, t))) AS DOUBLE)
           / len(toks) AS stop_ratio,
         CAST(len(list_filter(toks, t -> len(t) <= 2)) AS DOUBLE) / len(toks) AS short_ratio,
         CAST(len(text) - len(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)
           / len(text) AS punct_ratio,
         CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / len(text) AS digit_ratio
  FROM feat
), scored AS (
  SELECT lang,
         n_tokens * {W_NTOK} + mean_len * {W_MEANLEN} + stop_ratio * {W_STOP}
           + punct_ratio * {W_PUNCT} + digit_ratio * {W_DIGIT}
           + short_ratio * {W_SHORT} + {BIAS} AS score
  FROM f2
)
SELECT lang, score > 0 AS keep, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_score
FROM scored GROUP BY 1, 2 ORDER BY lang, keep
"""


HEUR_MIN_TOKENS = 20
HEUR_STOP_TAU = 0.12
KAPPA_SCALE = 10_000  # kappa reported in exact basis points (integer)


def doc_classifier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement between the two quality gates the pipeline
    ships — the linear model (keep := score > 0) and the heuristic rule
    (n_tokens ≥ {HEUR_MIN_TOKENS} AND stop_ratio ≥ {HEUR_STOP_TAU}) —
    as an exact per-language confusion matrix plus Cohen's kappa in
    integer basis points.  This is the eval artifact a curation team
    reads before swapping filters: raw agreement over-credits the
    majority class; kappa corrects for chance agreement, and the
    integer form  κ_bp = {KAPPA_SCALE}·(n·(a+d) − E) // (n² − E)  with
    E = (a+b)(a+c) + (c+d)(b+d)  keeps the whole statistic in BIGINT —
    no float ever enters.

    Scale shape: the features ride the scan (same expressions as the
    model pass), ONE partial-aggregated groupBy(lang) produces the four
    confusion cells, and kappa is per-group scalar arithmetic."""
    t = load_tables(spark, sf_dir)
    f = _features(t["documents"]).withColumn("score", _score())
    mk = F.col("score") > 0
    hk = (F.col("n_tokens") >= HEUR_MIN_TOKENS) & (
        F.col("stop_ratio") >= HEUR_STOP_TAU
    )
    cells = f.groupBy("lang").agg(
        F.sum((mk & hk).cast("int")).cast("long").alias("a"),
        F.sum((mk & ~hk).cast("int")).cast("long").alias("b"),
        F.sum((~mk & hk).cast("int")).cast("long").alias("c"),
        F.sum((~mk & ~hk).cast("int")).cast("long").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    den_expr = ("(CAST((a+b+c+d) AS BIGINT) * (a+b+c+d)"
                " - ((a+b)*(a+c) + (c+d)*(b+d)))")
    # both engines truncate integer division toward zero (Spark DIV,
    # DuckDB //: -7/2 → -3 on each) so negative kappa is safe
    kappa = F.when(F.expr(den_expr) == 0, F.lit(KAPPA_SCALE).cast("long")) \
        .otherwise(
            F.expr(f"CAST({KAPPA_SCALE} AS BIGINT)"
                   f" * (CAST((a+b+c+d) AS BIGINT) * (a+d)"
                   f" - ((a+b)*(a+c) + (c+d)*(b+d))) DIV {den_expr}")
        )
    return (
        cells.select(
            "lang", "a", "b", "c", "d",
            n.cast("long").alias("n_docs"),
            kappa.cast("long").alias("kappa_bp"),
        )
        .orderBy("lang")
    )


DOC_AGREEMENT_SQL = rf"""
WITH feat AS (
  SELECT lang, text,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), f2 AS (
  SELECT lang,
         len(toks) AS n_tokens,
         CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks) AS mean_len,
         CAST(len(list_filter(toks, t -> list_contains({STOPWORDS!r}, t))) AS DOUBLE)
           / len(toks) AS stop_ratio,
         CAST(len(list_filter(toks, t -> len(t) <= 2)) AS DOUBLE) / len(toks) AS short_ratio,
         CAST(len(text) - len(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)
           / len(text) AS punct_ratio,
         CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / len(text) AS digit_ratio
  FROM feat
), flags AS (
  SELECT lang,
         (n_tokens * {W_NTOK} + mean_len * {W_MEANLEN} + stop_ratio * {W_STOP}
           + punct_ratio * {W_PUNCT} + digit_ratio * {W_DIGIT}
           + short_ratio * {W_SHORT} + {BIAS}) > 0 AS mk,
         (n_tokens >= {HEUR_MIN_TOKENS} AND stop_ratio >= {HEUR_STOP_TAU}) AS hk
  FROM f2
), cells AS (
  SELECT lang,
         CAST(SUM(CASE WHEN mk AND hk THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN mk AND NOT hk THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT mk AND hk THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT mk AND NOT hk THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM flags GROUP BY lang
)
SELECT lang, a, b, c, d,
       CAST(a + b + c + d AS BIGINT) AS n_docs,
       CAST(CASE WHEN (a+b+c+d)*(a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)) = 0
            THEN {KAPPA_SCALE}
            ELSE {KAPPA_SCALE} * ((a+b+c+d)*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d)))
                 // ((a+b+c+d)*(a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)))
            END AS BIGINT) AS kappa_bp
FROM cells ORDER BY lang
"""


INFERENCE_QUERIES: dict[str, tuple] = {
    "doc_quality_model": (doc_quality_model, DOC_QUALITY_MODEL_SQL),
    "doc_classifier_agreement": (doc_classifier_agreement, DOC_AGREEMENT_SQL),
}
