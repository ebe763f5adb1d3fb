"""SHACL-style shape validation compiled to DataFrame constraint checks.

The reference validates instances against its vocabulary while emitting
JSON-LD (required-property / picklist / type checks inside
`csv-to-jsonld-lib/src/instance/processor.rs`); round 1..4 carried one
driver-visible SHACL gate (``kg_shacl_cardinality`` — sh:maxCount only,
kg/queries.py:630).  This module is the general form: a SHAPES table
(shapes-as-data, the way a real shapes graph arrives) compiled into
DataFrame constraint checks over the typed quad corpus — the
"SHACL-style instance validation re-expressed as DataFrame constraint
checks" leg of the engine brief.

Constraint vocabulary covered (one shape each over the rdfio gated quad
table, which has IRI / blank-node subjects and IRI / plain / lang /
typed literal objects):

- ``sh:nodeKind``       — object must be an IRI (sh1)
- ``sh:pattern``        — object value must match an anchored regex (sh2)
- ``sh:datatype``       — literal objects must carry xsd:integer (sh3)
- ``sh:in``             — language tags restricted to an allow-list (sh4)
- ``sh:maxCount``       — per-subject cardinality cap of 30 (sh5)
- ``sh:minCount`` via ``sh:targetSubjectsOf`` — every subject of
  worksFor must also have ≥1 residence (sh6)
- ``sh:class``-style link integrity — IRI objects of acquired must
  themselves appear as a subject in the graph (sh7)

Execution shape, and why it scales: the four ROW-LEVEL shapes (sh1-sh4)
compile to conditional aggregates over a SINGLE scan of the quad table
(one partial-aggregated reduce to one row; no shuffle of quad rows);
the three SUBJECT-LEVEL shapes are each one groupBy/anti-join keyed on
the subject — the natural hash-partitioned shape at 10^12 quads.  The
quad table is localCheckpoint-ed once so the seven consumers do not
re-run the upstream extraction pipeline (at production scale this input
is an already-materialized table; the checkpoint stands in for that).

Violation evidence is an ORDER-FREE checksum (sum of md5-prefix u32
over violating (subject, value) pairs), so the validator's full finding
set is hash-verifiable without collecting or sorting violations — the
same discipline as the N-Quads export integrity artifact.

Oracle: DuckDB rebuilds the identical quad corpus from the golden edge
CSV (shared CTE text, rdfio.GROUND_TRUTH_CTES) and evaluates each
constraint in plain SQL — engine and oracle share only the shapes
table and the corpus derivation, not the evaluation code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checksum import u32 as _u32
from .queries import kg_webtext_edges
from .rdfio import _US, _XSD_INT, GROUND_TRUTH_CTES, _ground_truth

_TERMS = "http://example.org/kg/terms/"
_ID_PAT = "^http://example\\.org/kg/ids/"
_LANGS = ("en", "de-DE")


def kg_shacl_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the seven-shape SHACL suite; one output row per shape:
    (shape_id, pred, check_kind, n_focus, n_violations, checksum)."""
    edges = kg_webtext_edges(spark, sf_dir)
    q = (
        _ground_truth(edges)
        .select("s", "p", "kind", "val", "lang", "dt")
        .localCheckpoint()
    )
    pair_sum = _u32(F.concat_ws(_US, "s", "val"))

    def flag(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def csum(cond):
        return F.coalesce(
            F.sum(F.when(cond, pair_sum).otherwise(0)), F.lit(0)
        ).cast("long")

    # --- row-level shapes: ONE conditional-aggregate scan -------------
    p = F.col("p")
    f1 = p == _TERMS + "worksFor"
    v1 = f1 & (F.col("kind") != "iri")
    f2 = p == _TERMS + "headquarters"
    v2 = f2 & ~F.col("val").rlike(_ID_PAT)
    f3 = p == _TERMS + "birthPlace"
    v3 = f3 & (F.col("kind") != "iri") & ~(
        (F.col("kind") == "typed") & (F.col("dt") == _XSD_INT)
    )
    f4 = F.col("kind") == "lang"
    v4 = f4 & ~F.col("lang").isin(*_LANGS)
    rowagg = q.agg(
        *[
            e
            for i, (fc, vc) in enumerate([(f1, v1), (f2, v2), (f3, v3), (f4, v4)], 1)
            for e in (
                flag(fc).alias(f"f{i}"),
                flag(vc).alias(f"v{i}"),
                csum(vc).alias(f"c{i}"),
            )
        ]
    )
    row_meta = [
        ("sh1", "worksFor", "nodeKind=IRI"),
        ("sh2", "headquarters", f"pattern={_ID_PAT}"),
        ("sh3", "birthPlace", "datatype=xsd:integer"),
        ("sh4", "*", "in=lang{en,de-DE}"),
    ]
    row_rows = None
    for i, (sid, pred, check) in enumerate(row_meta, 1):
        r = rowagg.select(
            F.lit(sid).alias("shape_id"),
            F.lit(pred).alias("pred"),
            F.lit(check).alias("check_kind"),
            F.col(f"f{i}").alias("n_focus"),
            F.col(f"v{i}").alias("n_violations"),
            F.col(f"c{i}").alias("checksum"),
        )
        row_rows = r if row_rows is None else row_rows.unionAll(r)

    # --- sh5: maxCount 30 on founderOf per subject ---------------------
    per_subj = (
        q.filter(p == _TERMS + "founderOf").groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    )
    sh5 = per_subj.agg(
        F.lit("sh5").alias("shape_id"),
        F.lit("founderOf").alias("pred"),
        F.lit("maxCount=30").alias("check_kind"),
        F.count(F.lit(1)).cast("long").alias("n_focus"),
        F.sum(F.when(F.col("c") > 30, 1).otherwise(0)).cast("long").alias("n_violations"),
        F.coalesce(F.sum(F.when(F.col("c") > 30, _u32(F.col("s"))).otherwise(0)), F.lit(0))
        .cast("long").alias("checksum"),
    )

    # --- sh6: targetSubjectsOf(worksFor) → minCount 1 residence --------
    a = q.filter(p == _TERMS + "worksFor").select("s").distinct()
    b = q.filter(p == _TERMS + "residence").select("s").distinct()
    missing = a.join(b, "s", "left_anti")
    sh6 = a.agg(F.count(F.lit(1)).cast("long").alias("n_focus")).crossJoin(
        missing.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.coalesce(F.sum(_u32(F.col("s"))), F.lit(0)).cast("long").alias("checksum"),
        )
    ).select(
        F.lit("sh6").alias("shape_id"),
        F.lit("worksFor").alias("pred"),
        F.lit("minCount=1:residence").alias("check_kind"),
        "n_focus", "n_violations", "checksum",
    )

    # --- sh7: link integrity — IRI objects of acquired are subjects ----
    objs = (
        q.filter((p == _TERMS + "acquired") & (F.col("kind") == "iri"))
        .select(F.col("val").alias("o")).distinct()
    )
    subs = q.select("s").distinct()
    dangling = objs.join(subs, objs.o == subs.s, "left_anti")
    sh7 = objs.agg(F.count(F.lit(1)).cast("long").alias("n_focus")).crossJoin(
        dangling.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.coalesce(F.sum(_u32(F.col("o"))), F.lit(0)).cast("long").alias("checksum"),
        )
    ).select(
        F.lit("sh7").alias("shape_id"),
        F.lit("acquired").alias("pred"),
        F.lit("class:subject-linked").alias("check_kind"),
        "n_focus", "n_violations", "checksum",
    )

    return (
        row_rows.unionAll(sh5).unionAll(sh6).unionAll(sh7).orderBy("shape_id")
    )


KG_SHACL_VALIDATE_SQL = f"""
WITH {GROUND_TRUTH_CTES},
rowagg AS (
  SELECT
    SUM(CASE WHEN p = '{_TERMS}worksFor' THEN 1 ELSE 0 END) AS f1,
    SUM(CASE WHEN p = '{_TERMS}worksFor' AND kind <> 'iri' THEN 1 ELSE 0 END) AS v1,
    SUM(CASE WHEN p = '{_TERMS}worksFor' AND kind <> 'iri'
             THEN CAST(('0x' || substr(md5(s || chr(31) || val), 1, 8)) AS BIGINT)
             ELSE 0 END) AS c1,
    SUM(CASE WHEN p = '{_TERMS}headquarters' THEN 1 ELSE 0 END) AS f2,
    SUM(CASE WHEN p = '{_TERMS}headquarters'
              AND NOT regexp_matches(val, '{_ID_PAT}') THEN 1 ELSE 0 END) AS v2,
    SUM(CASE WHEN p = '{_TERMS}headquarters'
              AND NOT regexp_matches(val, '{_ID_PAT}')
             THEN CAST(('0x' || substr(md5(s || chr(31) || val), 1, 8)) AS BIGINT)
             ELSE 0 END) AS c2,
    SUM(CASE WHEN p = '{_TERMS}birthPlace' THEN 1 ELSE 0 END) AS f3,
    SUM(CASE WHEN p = '{_TERMS}birthPlace' AND kind <> 'iri'
              AND NOT (kind = 'typed' AND dt = '{_XSD_INT}') THEN 1 ELSE 0 END) AS v3,
    SUM(CASE WHEN p = '{_TERMS}birthPlace' AND kind <> 'iri'
              AND NOT (kind = 'typed' AND dt = '{_XSD_INT}')
             THEN CAST(('0x' || substr(md5(s || chr(31) || val), 1, 8)) AS BIGINT)
             ELSE 0 END) AS c3,
    SUM(CASE WHEN kind = 'lang' THEN 1 ELSE 0 END) AS f4,
    SUM(CASE WHEN kind = 'lang' AND lang NOT IN ('en', 'de-DE') THEN 1 ELSE 0 END) AS v4,
    SUM(CASE WHEN kind = 'lang' AND lang NOT IN ('en', 'de-DE')
             THEN CAST(('0x' || substr(md5(s || chr(31) || val), 1, 8)) AS BIGINT)
             ELSE 0 END) AS c4
  FROM q
),
founder AS (
  SELECT s, COUNT(*) AS c FROM q WHERE p = '{_TERMS}founderOf' GROUP BY s
),
sh5 AS (
  SELECT 'sh5' AS shape_id, 'founderOf' AS pred, 'maxCount=30' AS check_kind,
         CAST(COUNT(*) AS BIGINT) AS n_focus,
         CAST(SUM(CASE WHEN c > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         CAST(COALESCE(SUM(CASE WHEN c > 30
              THEN CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) ELSE 0 END), 0)
              AS BIGINT) AS checksum
  FROM founder
),
wf AS (SELECT DISTINCT s FROM q WHERE p = '{_TERMS}worksFor'),
res AS (SELECT DISTINCT s FROM q WHERE p = '{_TERMS}residence'),
sh6 AS (
  SELECT 'sh6' AS shape_id, 'worksFor' AS pred,
         'minCount=1:residence' AS check_kind,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM wf) AS n_focus,
         CAST(COUNT(*) AS BIGINT) AS n_violations,
         CAST(COALESCE(SUM(CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)), 0)
              AS BIGINT) AS checksum
  FROM (SELECT s FROM wf WHERE s NOT IN (SELECT s FROM res))
),
acq AS (
  SELECT DISTINCT val AS o FROM q
  WHERE p = '{_TERMS}acquired' AND kind = 'iri'
),
subs AS (SELECT DISTINCT s FROM q),
sh7 AS (
  SELECT 'sh7' AS shape_id, 'acquired' AS pred,
         'class:subject-linked' AS check_kind,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM acq) AS n_focus,
         CAST(COUNT(*) AS BIGINT) AS n_violations,
         CAST(COALESCE(SUM(CAST(('0x' || substr(md5(o), 1, 8)) AS BIGINT)), 0)
              AS BIGINT) AS checksum
  FROM (SELECT o FROM acq WHERE o NOT IN (SELECT s FROM subs))
)
SELECT 'sh1' AS shape_id, 'worksFor' AS pred, 'nodeKind=IRI' AS check_kind,
       CAST(f1 AS BIGINT) AS n_focus, CAST(v1 AS BIGINT) AS n_violations,
       CAST(c1 AS BIGINT) AS checksum FROM rowagg
UNION ALL
SELECT 'sh2', 'headquarters', 'pattern={_ID_PAT}',
       CAST(f2 AS BIGINT), CAST(v2 AS BIGINT), CAST(c2 AS BIGINT) FROM rowagg
UNION ALL
SELECT 'sh3', 'birthPlace', 'datatype=xsd:integer',
       CAST(f3 AS BIGINT), CAST(v3 AS BIGINT), CAST(c3 AS BIGINT) FROM rowagg
UNION ALL
SELECT 'sh4', '*', 'in=lang{{en,de-DE}}',
       CAST(f4 AS BIGINT), CAST(v4 AS BIGINT), CAST(c4 AS BIGINT) FROM rowagg
UNION ALL SELECT * FROM sh5
UNION ALL SELECT * FROM sh6
UNION ALL SELECT * FROM sh7
ORDER BY 1
"""


KG_SHACL_QUERIES: dict[str, tuple] = {
    "kg_shacl_validate": (kg_shacl_validate, KG_SHACL_VALIDATE_SQL),
}
