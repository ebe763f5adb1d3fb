"""Blank-node canonical labeling via distributed WL color refinement.

The reference emits UUIDv4 ids for pivot-child entities
(csv-to-jsonld-lib/src/instance/processor_impl.rs:233), this engine
content-hashes them — so the two graphs are only comparable *modulo
blank-node relabeling* (BASELINE.md pins all cross-engine triple
comparison to blank-node-isomorphic semantics). This module computes an
id-INDEPENDENT canonical signature of the graph: the 1-dimensional
Weisfeiler-Leman color-refinement fixpoint used by RDF dataset
canonicalization (URDNA2015 / Hogan's iso-canonicalisation) and graph-
isomorphism literature.

Algorithm (K fixed rounds, each a pure DataFrame plan):

- Ground terms (IRIs, literals) are their own color forever:
  ``md5('G' || term)``. Blank nodes (the 64-hex content-hash pivot ids)
  all start identical: ``md5('B')`` — the adversarial start that forces
  refinement to distinguish them by STRUCTURE alone.
- Each round hashes every node's (old color, multiset of incident edge
  signatures): outgoing ``md5('O' || pred || color(obj))``, incoming
  ``md5('I' || pred || color(subj))``, sorted and concatenated (every
  element md5-hashed first, so no separator injection from arbitrary
  literal text), then ``md5(old || sig)``.
- The canonical graph hash replaces blank ids by their final color and
  md5-folds the sorted triple multiset — equal for any two graphs that
  differ only by blank-node renaming, different when structure differs.

Scale shape: each round is two equi-joins of the triple table against a
node-sized color table plus one groupBy(node) — the canonical iterative
shape (PageRank's cousin); the color table co-partitions on node id so
AQE reuses the exchange, and no step collects the graph. K is fixed
(refinement converges in diameter-ish rounds; the registered query
reports the per-round color counts so convergence is VISIBLE in the
output row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLANK_RE = "^[0-9a-f]{64}$"
WL_ROUNDS = 3
_GOLDEN_FIXTURE = "/root/repo/tests/golden/fixture_triples.csv"


def wl_refine(trips: DataFrame, rounds: int = WL_ROUNDS) -> tuple[DataFrame, list]:
    """Run ``rounds`` of WL refinement over (subj, pred, obj) triples.

    Returns (colors DataFrame ``(n, col, isblank)`` after the last
    round, list of per-round blank-color-count DataFrames — single-row
    aggregates, cheap to collect or cross-join)."""
    nodes = (
        trips.select(F.col("subj").alias("n"))
        .unionByName(trips.select(F.col("obj").alias("n")))
        .dropDuplicates()
    )
    colors = nodes.select(
        "n",
        F.col("n").rlike(BLANK_RE).alias("isblank"),
        F.when(F.col("n").rlike(BLANK_RE), F.md5(F.lit("B")))
        .otherwise(F.md5(F.concat(F.lit("G"), F.col("n"))))
        .alias("col"),
    )
    counts = []
    for _ in range(rounds):
        counts.append(
            colors.where("isblank").agg(
                F.countDistinct("col").cast("long").alias("c")
            )
        )
        out_e = trips.join(
            colors.select(F.col("n").alias("obj"), F.col("col").alias("oc")), "obj"
        ).select(
            F.col("subj").alias("n"),
            F.md5(F.concat(F.lit("O"), F.col("pred"), F.col("oc"))).alias("e"),
        )
        in_e = trips.join(
            colors.select(F.col("n").alias("subj"), F.col("col").alias("sc")), "subj"
        ).select(
            F.col("obj").alias("n"),
            F.md5(F.concat(F.lit("I"), F.col("pred"), F.col("sc"))).alias("e"),
        )
        sigs = (
            out_e.unionByName(in_e)
            .groupBy("n")
            .agg(F.concat_ws("", F.sort_array(F.collect_list("e"))).alias("sig"))
        )
        colors = (
            colors.join(sigs, "n", "left")
            .select(
                "n",
                "isblank",
                F.when(
                    F.col("isblank"),
                    F.md5(F.concat(F.col("col"), F.coalesce(F.col("sig"), F.lit("")))),
                )
                .otherwise(F.col("col"))
                .alias("col"),
            )
            .localCheckpoint(eager=False)
        )
    counts.append(
        colors.where("isblank").agg(F.countDistinct("col").cast("long").alias("c"))
    )
    return colors, counts


def canonical_graph_hash(trips: DataFrame, colors: DataFrame) -> DataFrame:
    """md5-fold of the sorted triple multiset with blank ids replaced by
    their WL color — the blank-node-relabeling-invariant signature."""
    sc = colors.select(F.col("n").alias("subj"), F.col("col").alias("s_can"), F.col("isblank").alias("s_b"))
    oc = colors.select(F.col("n").alias("obj"), F.col("col").alias("o_can"), F.col("isblank").alias("o_b"))
    canon = (
        trips.join(sc, "subj")
        .join(oc, "obj")
        .select(
            F.md5(
                F.concat(
                    F.when(F.col("s_b"), F.col("s_can")).otherwise(F.col("subj")),
                    F.lit("|"),
                    F.col("pred"),
                    F.lit("|"),
                    F.when(F.col("o_b"), F.col("o_can")).otherwise(F.col("obj")),
                )
            ).alias("th")
        )
    )
    return canon.agg(
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("th")))).alias("graph_hash")
    )


def kg_wl_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WL canonicalization of the fixture graph's 118 pivot-child blank
    nodes (sha256 content-hash ids; the reference uses UUIDv4 — exactly
    the ids a canonical form must NOT depend on). Single audit row:
    blank count, per-round distinct blank colors (1 → converged), and
    the blank-invariant canonical graph hash. The engine runs the LIVE
    CSV→triple pipeline; the oracle replays the same rounds in SQL over
    the independently-generated golden triple CSV — so the hash match
    certifies both the pipeline output AND the refinement algebra."""
    from ..plans.fixture_queries import fixture_triples

    trips = (
        fixture_triples(spark, sf_dir)
        .select("subj", "pred", "obj")
        .localCheckpoint(eager=False)
    )
    colors, counts = wl_refine(trips, WL_ROUNDS)
    n_blank = colors.where("isblank").agg(F.count(F.lit(1)).cast("long").alias("n_blank"))
    out = n_blank
    for i, c in enumerate(counts):
        out = out.crossJoin(F.broadcast(c.withColumnRenamed("c", f"colors_r{i}")))
    return out.crossJoin(F.broadcast(canonical_graph_hash(trips, colors)))


def _wl_round_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT c.n, c.isblank,
         CASE WHEN c.isblank
              THEN md5(c.col || COALESCE(s.sig, ''))
              ELSE c.col END AS col
  FROM {prev} c LEFT JOIN (
    SELECT n, string_agg(e, '' ORDER BY e) AS sig FROM (
      SELECT t.subj AS n, md5('O' || t.pred || co.col) AS e
      FROM trips t JOIN {prev} co ON co.n = t.obj
      UNION ALL
      SELECT t.obj AS n, md5('I' || t.pred || cs.col) AS e
      FROM trips t JOIN {prev} cs ON cs.n = t.subj
    ) GROUP BY n
  ) s USING (n)
)"""


def _wl_sql() -> str:
    rounds = ",".join(_wl_round_sql(f"c{i}", f"c{i + 1}") for i in range(WL_ROUNDS))
    count_cols = ",\n       ".join(
        f"(SELECT CAST(COUNT(DISTINCT col) AS BIGINT) FROM c{i} WHERE isblank) AS colors_r{i}"
        for i in range(WL_ROUNDS + 1)
    )
    return f"""
WITH trips AS (
  SELECT subj, pred, obj
  FROM read_csv('{_GOLDEN_FIXTURE}', header=true, all_varchar=true)
),
nodes AS (SELECT DISTINCT n FROM (SELECT subj AS n FROM trips UNION SELECT obj FROM trips)),
c0 AS (
  SELECT n, regexp_matches(n, '{BLANK_RE}') AS isblank,
         CASE WHEN regexp_matches(n, '{BLANK_RE}')
              THEN md5('B') ELSE md5('G' || n) END AS col
  FROM nodes
),{rounds},
canon AS (
  SELECT md5(CASE WHEN sc.isblank THEN sc.col ELSE t.subj END
             || '|' || t.pred || '|' ||
             CASE WHEN oc.isblank THEN oc.col ELSE t.obj END) AS th
  FROM trips t
  JOIN c{WL_ROUNDS} sc ON sc.n = t.subj
  JOIN c{WL_ROUNDS} oc ON oc.n = t.obj
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c0 WHERE isblank) AS n_blank,
       {count_cols},
       (SELECT md5(string_agg(th, '' ORDER BY th)) FROM canon) AS graph_hash
"""


KG_CANONICAL_QUERIES: dict[str, tuple] = {
    "kg_wl_canonicalize": (kg_wl_canonicalize, _wl_sql()),
}
