"""Triple-STORE layer ops: the steps between "edges extracted" and "graph
queryable at 10^12-triple scale" that every production KG system runs
(reference analog: csv-to-jsonld's emitted @id-keyed instance documents
are its storage form; RDF-3X/HDT-style stores re-encode them).

Four operators, each oracled against the truth-anchored golden edge
table (tests/golden/kg_webtext_edges.csv — derived from the page
generator's own fact list, not from this engine):

- ``kg_characteristic_sets``: the Neumann & Moerkotte (ICDE'11)
  cardinality statistic — group subjects by their sorted distinct
  predicate signature. THE planning statistic for star-join SPARQL;
  also the schema-discovery artifact ("which entity shapes exist in
  this crawl"). Two partial-aggregated groupBys, signature width
  bounded by |predicates| (7 here, dozens in practice) — no shuffle
  carries more than (subject, signature) rows.
- ``kg_dictionary_encode``: HDT/RDF-3X-style term→int64 dictionary
  encoding, SHUFFLE-FREE: ids are the first 15 hex chars of md5(term)
  (60-bit), so no global sort, no dictionary join, and any executor
  can encode any partition independently — the property that makes
  encoding embarrassingly parallel at 100 TB. (Production keeps the
  full 128-bit digest — 60 bits collide around 2^30 distinct terms;
  here the id must fit a cross-engine BIGINT checksum.) Output is the
  per-predicate encoded-table audit: id, cardinalities, an order-free
  id checksum, and string-vs-encoded byte sizes (the compression
  argument for doing this at all).
- ``kg_nquads_export``: serialize every edge to an N-Quads line with
  its page URL as the provenance graph term — the interchange sink a
  KG pipeline ships downstream. Per-row string build rides the scan;
  the integrity artifact is an ORDER-FREE checksum (SUM of each
  line's md5-prefix u32) so the export is hash-verifiable without a
  global sort of 10^12 lines.
- ``kg_sameas_resolve``: owl:sameAs canonicalization — edges arrive
  with alias IRIs (synthesized deterministically per edge: one third
  use ``<iri>#aka1``, one third the 2-deep ``<iri>#aka1#v2``), a
  sameAs table maps alias→parent, and resolution follows the chain to
  the root before re-aggregating per canonical entity. Chains here
  are stars of depth ≤ 2, so exactly two alias-table hops resolve
  every term — expressed as two LEFT JOINs (broadcast: the alias
  table is |entities|-sized). At 10^12 scale with unbounded chains
  this becomes pointer-jumping (log-diameter rounds of the same
  child-key equi-join, edge table hash-partitioned on the alias key),
  the identical shape to dedup.py's connected-components contraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _GOLDEN_EDGES, kg_webtext_edges

# fixed per-triple footprint of the (s_id, p_id, o_id) int64 encoding
_ENC_BYTES_PER_EDGE = 24
_ID_MOD = 1_000_000  # checksum modulus: keeps SUM within BIGINT at any scale


def _term_id(col: F.Column) -> F.Column:
    """60-bit deterministic term id: first 15 md5 hex chars as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kg_characteristic_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic sets over the flagship pipeline's edges: for each
    subject its sorted distinct-predicate signature; one output row per
    signature with the subject count and total triple count."""
    edges = kg_webtext_edges(spark, sf_dir)
    per_subj = edges.groupBy("subj").agg(
        F.array_join(F.array_sort(F.collect_set("pred")), " ").alias("pred_set"),
        F.count(F.lit(1)).alias("n_triples"),
    )
    return (
        per_subj.groupBy("pred_set")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subjects"),
            F.sum("n_triples").cast("long").alias("n_triples"),
        )
        .orderBy(F.desc("n_subjects"), F.asc("pred_set"))
    )


KG_CHARSETS_SQL = f"""
WITH e AS (SELECT * FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
per_subj AS (
  SELECT subj,
         array_to_string(list_sort(list(DISTINCT pred)), ' ') AS pred_set,
         COUNT(*) AS n_triples
  FROM e GROUP BY subj
)
SELECT pred_set,
       CAST(COUNT(*) AS BIGINT) AS n_subjects,
       CAST(SUM(n_triples) AS BIGINT) AS n_triples
FROM per_subj GROUP BY pred_set
ORDER BY n_subjects DESC, pred_set ASC
"""


def kg_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encode the edge table to (s_id, p_id, o_id) int64
    triples and report the per-predicate audit of the encoded store."""
    edges = kg_webtext_edges(spark, sf_dir)
    enc = edges.select(
        "pred",
        _term_id(F.col("subj")).alias("s_id"),
        _term_id(F.col("pred")).alias("p_id"),
        _term_id(F.col("obj")).alias("o_id"),
        (
            F.octet_length("subj") + F.octet_length("pred") + F.octet_length("obj")
        ).alias("str_bytes"),
    )
    return (
        enc.groupBy("pred", "p_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.countDistinct("s_id").cast("long").alias("n_subj_ids"),
            F.countDistinct("o_id").cast("long").alias("n_obj_ids"),
            F.sum(F.col("s_id") % _ID_MOD + F.col("o_id") % _ID_MOD)
            .cast("long")
            .alias("id_checksum"),
            F.sum("str_bytes").cast("long").alias("str_bytes"),
            (F.count(F.lit(1)) * _ENC_BYTES_PER_EDGE).cast("long").alias("enc_bytes"),
        )
        .orderBy("pred")
    )


KG_DICT_SQL = f"""
WITH e AS (SELECT * FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
enc AS (
  SELECT pred,
         CAST(('0x' || substr(md5(subj), 1, 15)) AS BIGINT) AS s_id,
         CAST(('0x' || substr(md5(pred), 1, 15)) AS BIGINT) AS p_id,
         CAST(('0x' || substr(md5(obj), 1, 15)) AS BIGINT) AS o_id,
         strlen(subj) + strlen(pred) + strlen(obj) AS str_bytes
  FROM e
)
SELECT pred, p_id,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(DISTINCT s_id) AS BIGINT) AS n_subj_ids,
       CAST(COUNT(DISTINCT o_id) AS BIGINT) AS n_obj_ids,
       CAST(SUM(s_id % {_ID_MOD} + o_id % {_ID_MOD}) AS BIGINT) AS id_checksum,
       CAST(SUM(str_bytes) AS BIGINT) AS str_bytes,
       CAST(COUNT(*) * {_ENC_BYTES_PER_EDGE} AS BIGINT) AS enc_bytes
FROM enc GROUP BY pred, p_id ORDER BY pred
"""


def kg_nquads_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Quads export summary: every edge serialized as
    ``<s> <p> <o> <page-url> .`` with an order-free integrity checksum
    (sum of per-line md5-prefix u32) plus byte totals and the lexical
    first/last line (what a sorted shard writer would put in its
    footer)."""
    edges = kg_webtext_edges(spark, sf_dir)
    line = F.concat(
        F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"),
        F.lit("> <"), F.col("obj"), F.lit("> <"), F.col("url"), F.lit("> ."),
    )
    df = edges.select(
        line.alias("line"),
        F.conv(F.substring(F.md5(line), 1, 8), 16, 10).cast("long").alias("u32"),
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_quads"),
        F.sum(F.octet_length("line") + 1).cast("long").alias("total_bytes"),
        F.sum("u32").cast("long").alias("checksum"),
        F.min("line").alias("first_line"),
        F.max("line").alias("last_line"),
    )


KG_NQUADS_SQL = f"""
WITH e AS (SELECT * FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
lines AS (
  SELECT '<' || subj || '> <' || pred || '> <' || obj || '> <' || url || '> .' AS line
  FROM e
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_quads,
       CAST(SUM(strlen(line) + 1) AS BIGINT) AS total_bytes,
       CAST(SUM(CAST(('0x' || substr(md5(line), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
       MIN(line) AS first_line,
       MAX(line) AS last_line
FROM lines
"""


# alias-form selector: which surface form of a term an edge "arrived"
# with (deterministic per edge occurrence; thirds by an md5 gate)
def _alias_form(term: F.Column, salt: str) -> F.Column:
    gate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"aka:{salt}:"), F.col("url"), F.lit(":"),
                        F.col("sent_idx").cast("string"), F.lit(":"), term,
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 3
    )
    return (
        F.when(gate == 0, F.concat(term, F.lit("#aka1")))
        .when(gate == 1, F.concat(term, F.lit("#aka1#v2")))
        .otherwise(term)
    )


def kg_sameas_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:sameAs canonicalization: resolve alias-form subject/object
    IRIs to their canonical root through a 2-hop sameAs chain, then
    re-aggregate per canonical subject. Output per canonical subject:
    edge count, number of distinct raw subject surface forms observed,
    and distinct canonical objects."""
    edges = kg_webtext_edges(spark, sf_dir)
    messy = edges.select(
        _alias_form(F.col("subj"), "s").alias("used_subj"),
        _alias_form(F.col("obj"), "o").alias("used_obj"),
    )
    ents = (
        edges.select(F.col("subj").alias("e"))
        .union(edges.select(F.col("obj").alias("e")))
        .distinct()
    )
    pairs = ents.select(
        F.concat("e", F.lit("#aka1")).alias("child"), F.col("e").alias("parent")
    ).union(
        ents.select(
            F.concat("e", F.lit("#aka1#v2")).alias("child"),
            F.concat("e", F.lit("#aka1")).alias("parent"),
        )
    )

    def resolve(df: DataFrame, col: str) -> DataFrame:
        for _hop in range(2):
            df = (
                df.join(
                    F.broadcast(pairs.withColumnRenamed("child", col)),
                    on=col, how="left",
                )
                .withColumn(col + "_r", F.coalesce("parent", F.col(col)))
                .drop("parent", col)
                .withColumnRenamed(col + "_r", col)
            )
        return df

    resolved = resolve(resolve(messy.withColumn("raw_subj", F.col("used_subj")),
                               "used_subj"), "used_obj")
    return (
        resolved.groupBy(F.col("used_subj").alias("subj"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.countDistinct("raw_subj").cast("long").alias("n_subj_forms"),
            F.countDistinct("used_obj").cast("long").alias("n_objs"),
        )
        .orderBy("subj")
    )


_ALIAS_CASE = """CASE CAST(('0x' || substr(md5('aka:{salt}:' || url || ':' || sent_idx || ':' || {term}), 1, 8)) AS BIGINT) % 3
           WHEN 0 THEN {term} || '#aka1'
           WHEN 1 THEN {term} || '#aka1#v2'
           ELSE {term} END"""

KG_SAMEAS_SQL = f"""
WITH e AS (SELECT * FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
messy AS (
  SELECT {_ALIAS_CASE.format(salt='s', term='subj')} AS used_subj,
         {_ALIAS_CASE.format(salt='o', term='obj')} AS used_obj
  FROM e
),
ents AS (SELECT subj AS ent FROM e UNION SELECT obj FROM e),
pairs AS (
  SELECT ent || '#aka1' AS child, ent AS parent FROM ents
  UNION ALL
  SELECT ent || '#aka1#v2' AS child, ent || '#aka1' AS parent FROM ents
),
r1 AS (
  SELECT m.used_subj AS raw_subj,
         COALESCE(ps.parent, m.used_subj) AS s1,
         COALESCE(po.parent, m.used_obj) AS o1
  FROM messy m
  LEFT JOIN pairs ps ON ps.child = m.used_subj
  LEFT JOIN pairs po ON po.child = m.used_obj
),
r2 AS (
  SELECT raw_subj,
         COALESCE(ps.parent, r1.s1) AS subj,
         COALESCE(po.parent, r1.o1) AS obj
  FROM r1
  LEFT JOIN pairs ps ON ps.child = r1.s1
  LEFT JOIN pairs po ON po.child = r1.o1
)
SELECT subj,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(DISTINCT raw_subj) AS BIGINT) AS n_subj_forms,
       CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objs
FROM r2 GROUP BY subj ORDER BY subj
"""


# --- quotient (summary) graph + cardinality estimation --------------------

_GOLDEN_FIXTURE = "/root/repo/tests/golden/fixture_triples.csv"


def _fixture_cs(spark: SparkSession, sf_dir: str):
    """(triples, per-subject characteristic-set table) over the LIVE
    fixture pipeline. cs_id is an 8-hex digest of the sorted distinct-
    predicate signature — the quotient-class key."""
    from ..plans.fixture_queries import fixture_triples

    trips = (
        fixture_triples(spark, sf_dir)
        .select("subj", "pred", "obj", "obj_kind")
        .localCheckpoint(eager=False)
    )
    cs = trips.groupBy("subj").agg(
        F.substring(
            F.md5(F.array_join(F.array_sort(F.collect_set("pred")), " ")), 1, 8
        ).alias("cs_id")
    )
    return trips, cs


def kg_summary_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient (summary) graph over characteristic sets — the SumRDF /
    structural-index shape: collapse every subject to its CS class,
    every object to its CS class when the object is itself a subject
    and to ``lit:<obj_kind>`` otherwise, and count edges per
    (subj_class, pred, obj_class). The summary is schema-sized, not
    corpus-sized (here 10,105 triples / 1,040 subjects → 133 CS classes
    / 2,524 summary edges; the ratio widens with corpus growth because
    class count tracks the SCHEMA), fits in driver/broadcast memory at
    ANY corpus scale — production systems additionally merge rare
    signatures into an OTHER class to bound it (SumRDF's target-size
    merge), the documented upgrade path if the schema itself is
    unbounded. This is the index a query planner probes instead of the
    graph — see kg_cardinality_est for the measured payoff."""
    trips, cs = _fixture_cs(spark, sf_dir)
    ocs = cs.select(F.col("subj").alias("obj"), F.col("cs_id").alias("obj_cs"))
    return (
        trips.join(cs, "subj")
        .join(ocs, "obj", "left")
        .select(
            F.col("cs_id").alias("subj_class"),
            "pred",
            F.coalesce(F.col("obj_cs"), F.concat(F.lit("lit:"), F.col("obj_kind"))).alias(
                "obj_class"
            ),
        )
        .groupBy("subj_class", "pred", "obj_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy("subj_class", "pred", "obj_class")
    )


KG_SUMMARY_SQL = f"""
WITH t AS (
  SELECT subj, pred, obj, obj_kind
  FROM read_csv('{_GOLDEN_FIXTURE}', header=true, all_varchar=true)
),
cs AS (
  SELECT subj,
         substr(md5(array_to_string(list_sort(list(DISTINCT pred)), ' ')), 1, 8) AS cs_id
  FROM t GROUP BY subj
)
SELECT s.cs_id AS subj_class, t.pred,
       COALESCE(o.cs_id, 'lit:' || t.obj_kind) AS obj_class,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM t
JOIN cs s ON s.subj = t.subj
LEFT JOIN cs o ON o.subj = t.obj
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


CARD_P1 = "Material Name"
CARD_P2 = "has Manufacturer"


def kg_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured cardinality-estimation audit for the star query
    ``?m <{CARD_P1}> ?x . ?m <{CARD_P2}> ?y`` (subjects carrying both
    predicates), RDF-3X style: the characteristic-set estimator sums
    subject counts over signatures CONTAINING both predicates — exact
    for star shapes BY CONSTRUCTION (cs_est == actual is the invariant
    this row certifies) — against the textbook independence estimate
    ``N·sel(p1)·sel(p2)`` reported in exact integer ppm arithmetic so
    the cross-engine hash can check a float-free row. On the fixture
    graph independence undershoots ~4×: the predicates are correlated
    (both Material-class), exactly the error CS statistics exist to
    kill."""
    trips, _ = _fixture_cs(spark, sf_dir)
    per_subj = trips.groupBy("subj").agg(
        F.array_sort(F.collect_set("pred")).alias("sig"),
        F.max(F.when(F.col("pred") == CARD_P1, 1).otherwise(0)).alias("h1"),
        F.max(F.when(F.col("pred") == CARD_P2, 1).otherwise(0)).alias("h2"),
    )
    # the CS summary table (what a planner would keep): signature -> count
    cs_classes = per_subj.groupBy("sig").agg(F.count(F.lit(1)).alias("n_subjects"))
    cs_est = cs_classes.where(
        F.array_contains("sig", CARD_P1) & F.array_contains("sig", CARD_P2)
    ).agg(F.coalesce(F.sum("n_subjects"), F.lit(0)).cast("long").alias("cs_est"))
    base = per_subj.agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"),
        F.sum("h1").cast("long").alias("c_p1"),
        F.sum("h2").cast("long").alias("c_p2"),
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("actual_both"),
    )
    return base.crossJoin(F.broadcast(cs_est)).withColumn(
        "indep_est_ppm",
        F.expr("1000000 * c_p1 * c_p2 div n_subj").cast("long"),
    )


KG_CARD_SQL = f"""
WITH t AS (
  SELECT subj, pred FROM read_csv('{_GOLDEN_FIXTURE}', header=true, all_varchar=true)
),
per_subj AS (
  SELECT subj, list_sort(list(DISTINCT pred)) AS sig,
         MAX(CASE WHEN pred = '{CARD_P1}' THEN 1 ELSE 0 END) AS h1,
         MAX(CASE WHEN pred = '{CARD_P2}' THEN 1 ELSE 0 END) AS h2
  FROM t GROUP BY subj
),
cs_classes AS (
  SELECT sig, COUNT(*) AS n_subjects FROM per_subj GROUP BY sig
),
est AS (
  SELECT CAST(COALESCE(SUM(n_subjects), 0) AS BIGINT) AS cs_est
  FROM cs_classes
  WHERE list_contains(sig, '{CARD_P1}') AND list_contains(sig, '{CARD_P2}')
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_subj,
       CAST(SUM(h1) AS BIGINT) AS c_p1,
       CAST(SUM(h2) AS BIGINT) AS c_p2,
       CAST(SUM(h1 * h2) AS BIGINT) AS actual_both,
       (SELECT cs_est FROM est) AS cs_est,
       CAST(1000000 * SUM(h1) * SUM(h2) // COUNT(*) AS BIGINT) AS indep_est_ppm
FROM per_subj
"""


KG_TRIPLESTORE_QUERIES: dict[str, tuple] = {
    "kg_characteristic_sets": (kg_characteristic_sets, KG_CHARSETS_SQL),
    "kg_summary_graph": (kg_summary_graph, KG_SUMMARY_SQL),
    "kg_cardinality_est": (kg_cardinality_est, KG_CARD_SQL),
    "kg_dictionary_encode": (kg_dictionary_encode, KG_DICT_SQL),
    "kg_nquads_export": (kg_nquads_export, KG_NQUADS_SQL),
    "kg_sameas_resolve": (kg_sameas_resolve, KG_SAMEAS_SQL),
}
