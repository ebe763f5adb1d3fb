"""JSON-LD node-document reader: the reverse of the pipeline's R6
assembly (plans/pipeline.py:49 ``assemble_entities_json``), closing the
codec loop on the REFERENCE'S OWN output format (the reference writes
@id-keyed JSON-LD instance documents — `csv-to-jsonld-lib/src/instance/
processor.rs` sink; this engine both writes and now reads them).

Reader semantics: one JSON-LD node object per input string —
``{"@id": ..., "@type": [...], pred: scalar | [scalars]}`` — exploded
to (subj, pred, jtype, sval, nval) rows.  JSON is a TYPED format, so
the reload recovers typed values exactly, not source lexical forms
("300.00" was serialized as the JSON number 300.0): string-valued
triples (string/ref/type kinds) round-trip BYTE-EXACT and are gated by
an order-free checksum; numeric triples are gated by exact
DECIMAL(18,4) sums (fixture numbers carry ≤2 decimals — audited) plus
int/float shape counts that mirror the writer's typing rule.

Scale shape: parse is per-node independent Python inside an
Arrow-batched ``mapInPandas`` (the codec slow path, same as WARC and
N-Quads — per-node dynamic keys rule out spark.read.json schema
inference), so a 10^12-node reload is pure map work; the verification
aggregate is one partial-aggregated groupBy on (pred, jtype).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checksum import u32

_US = "\x1f"


def read_jsonld_nodes(nodes: DataFrame, col: str = "node") -> DataFrame:
    """DataFrame of JSON-LD node-document strings → triple rows
    (subj, pred, jtype, sval, nval): jtype ∈ {string,int,float,bool},
    sval carries string values byte-exact, nval the numeric lexical."""
    import pandas as pd

    schema = "subj string, pred string, jtype string, sval string, nval string"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["subj", "pred", "jtype", "sval", "nval"]
        for pdf in batches:
            rows = []
            for doc in pdf[col]:
                d = json.loads(doc)
                subj = d["@id"]
                types = d.get("@type", [])
                for t in types if isinstance(types, list) else [types]:
                    rows.append((subj, "@type", "string", t, None))
                for pred, v in d.items():
                    if pred in ("@id", "@type"):
                        continue
                    for x in v if isinstance(v, list) else [v]:
                        if isinstance(x, bool):
                            rows.append((subj, pred, "bool", str(x).lower(), None))
                        elif isinstance(x, int):
                            rows.append((subj, pred, "int", None, str(x)))
                        elif isinstance(x, float):
                            rows.append((subj, pred, "float", None, repr(x)))
                        else:
                            rows.append((subj, pred, "string", x, None))
            yield pd.DataFrame(rows, columns=cols)

    return nodes.mapInPandas(gen, schema)


def fixture_jsonld_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the full fixture corpus through the JSON-LD codec:
    CSV → triples → assembled node documents → PARSED BACK → per
    (pred, jtype) verification aggregate.  The oracle computes the same
    aggregate from the golden fixture triple table (written by the
    independent reference-semantics oracle) without ever touching
    JSON — a dropped array element, a mangled unicode escape, or a
    mistyped number turns a checksum or sum red."""
    from ..plans.fixture_queries import fixture_triples
    from ..plans.pipeline import assemble_entities_json

    triples = fixture_triples(spark, sf_dir)
    nodes = assemble_entities_json(triples).select("node")
    parsed = read_jsonld_nodes(nodes)

    str_sum = u32(F.concat_ws(_US, "subj", "pred", "sval"))
    return (
        parsed.groupBy("pred", "jtype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("subj").cast("long").alias("n_subjects"),
            F.coalesce(
                F.sum(F.when(F.col("jtype") == "string", str_sum).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("str_checksum"),
            F.coalesce(
                F.sum(F.col("nval").cast("decimal(18,4)")), F.lit(0).cast("decimal(18,4)")
            ).cast("double").alias("num_sum"),
        )
        .orderBy("pred", "jtype")
    )


def _reload_sql() -> str:
    from ..plans.fixture_queries import _GOLDEN_TRIPLES

    return f"""
WITH t AS (
  -- DISTINCT mirrors the writer: assemble_entities_json dedups values
  -- per (subj, pred, value, kind) before serializing, so the reload
  -- yields one row per distinct triple even if the golden grows dups
  SELECT DISTINCT subj, pred, obj,
         CASE WHEN obj_kind = 'number' AND obj NOT LIKE '%.%'
                   AND lower(obj) NOT LIKE '%e%' THEN 'int'
              WHEN obj_kind = 'number' THEN 'float'
              WHEN obj_kind = 'boolean' THEN 'bool'
              ELSE 'string' END AS jtype
  FROM read_csv('{_GOLDEN_TRIPLES}', header=true, all_varchar=true)
)
SELECT pred, jtype,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjects,
       CAST(COALESCE(SUM(CASE WHEN jtype = 'string'
            THEN CAST(('0x' || substr(md5(subj || chr(31) || pred || chr(31) || obj),
                 1, 8)) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS str_checksum,
       CAST(COALESCE(SUM(CASE WHEN jtype IN ('int', 'float')
            THEN CAST(obj AS DECIMAL(18,4)) END), 0) AS DOUBLE) AS num_sum
FROM t GROUP BY pred, jtype ORDER BY pred, jtype
"""


JSONLD_QUERIES: dict[str, tuple] = {
    "fixture_jsonld_reload": (fixture_jsonld_reload, _reload_sql()),
}
