"""End-to-end web-text KG construction pipeline (north_star flow):

pages (Iceberg/parquet) → extract text (mapInPandas, byte-pinned)
→ mention + triple extraction (mapInPandas)
→ entity linking (blocked join, broadcast or salted shuffle)
→ predicate canonicalization (broadcast @context)
→ SHACL-style validation → entities/predicates/edges (+violations)
with per-partition lineage when a ledger dir is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extract import extract_pages
from ..sources.pages import ENTITIES, PREDICATES
from .mentions import extract_link_from_html, extract_mentions, extract_mentions_from_html
from .graph import (
    canonicalize_edges,
    materialize_graph,
    predicate_context,
    validate_edges,
)
from .link import kb_alias_table, kb_index, link_mentions

DOMAIN_RANGE = {
    f"http://example.org/kg/terms/{canon}": (s_cls, o_cls)
    for _surface, canon, s_cls, o_cls in PREDICATES
}


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str | None = None,
    link_strategy: str = "fused_broadcast",
    entities: list[tuple] = ENTITIES,
    predicates: list[tuple] = PREDICATES,
) -> dict:
    """Returns dict with edges/violations DataFrames and (if out_dir)
    materialized table counts."""
    surfaces = [p[0] for p in predicates]
    gazetteer = [a for _c, aliases, _cls in entities for a in aliases]

    if link_strategy == "fused_broadcast" and "html" in pages.columns:
        # dimension-sized KB: extract+link in ONE shuffle-free scan with
        # the KB broadcast as a dict (the reference's hash-map lookups)
        linked = extract_link_from_html(pages, surfaces, gazetteer, kb_index(entities))
    else:
        if "html" in pages.columns:
            # fused single-stage path: no Arrow round-trip of the html bytes
            mentions = extract_mentions_from_html(pages, surfaces, gazetteer)
        else:
            mentions = extract_mentions(extract_pages(pages), surfaces, gazetteer)
        kb = kb_alias_table(spark, entities)
        linked = link_mentions(mentions, kb, "subj_mention", strategy=link_strategy)
        linked = link_mentions(linked, kb, "obj_mention", strategy=link_strategy)

    edges, viol = canonicalize_edges(linked, predicate_context(predicates))
    viol = viol.unionByName(validate_edges(edges, DOMAIN_RANGE))

    result = {"edges": edges, "violations": viol}
    if out_dir:
        result["counts"] = materialize_graph(edges, viol, out_dir)
    return result
