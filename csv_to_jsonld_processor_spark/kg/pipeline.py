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
    validate_cardinality,
    validate_edges,
    validate_node_iris,
)
from .link import kb_alias_table, kb_index, link_mentions

DOMAIN_RANGE = {
    f"http://example.org/kg/terms/{canon}": (s_cls, o_cls)
    for _surface, canon, s_cls, o_cls in PREDICATES
}

# sh:maxCount: functional predicates — a person has one birth place, an
# org one headquarters. The synthetic generator draws each fact's object
# independently, so conflicting birthPlaces/headquarters occur and these
# fire as genuine data-quality findings (pytest pins that they do)
MAX_COUNTS = {
    "http://example.org/kg/terms/birthPlace": 1,
    "http://example.org/kg/terms/headquarters": 1,
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
    viol = viol.unionByName(validate_cardinality(edges, MAX_COUNTS))
    viol = viol.unionByName(validate_node_iris(edges))

    result = {"edges": edges, "violations": viol}
    if out_dir:
        result["counts"] = materialize_graph(edges, viol, out_dir)
    return result


def build_kg_resumable(
    spark: SparkSession,
    pages: DataFrame,
    work_dir: str,
    n_parts: int = 16,
    entities: list[tuple] = ENTITIES,
    predicates: list[tuple] = PREDICATES,
    fail_at: tuple[str, int] | None = None,
) -> dict:
    """The full pipeline as CHAINED resumable stages (north_rule: "every
    stage checkpoints per-partition lineage and counters ... a killed
    run resumes at partition granularity").

    Each stage materializes under ``work_dir/<stage>/part_id=k/`` and
    commits per-partition ledger rows (kg/lineage.py run_stage); a
    killed run re-invoked with the same work_dir skips every
    (stage, partition) already ledgered — including fully-complete
    earlier stages — and reprocesses only what's pending. Stage
    boundaries are the three shuffle-free row-local transforms
    (mentions → linked → edges); the global steps (SHACL cardinality,
    node-kind checks) run post-hoc over the final materialized edges,
    where they are plain aggregations and need no per-partition resume.

    ``fail_at=(stage, k)`` injects a crash after k partitions of the
    named stage — the kill-and-resume test hook.

    Output contract: identical edge set to ``build_kg(...,
    link_strategy='broadcast')`` (pinned by
    tests/test_kg_pipeline.py::test_resumable_pipeline_equals_batch).
    """
    from .lineage import run_stage

    surfaces = [p[0] for p in predicates]
    gazetteer = [a for _c, aliases, _cls in entities for a in aliases]
    kb = kb_alias_table(spark, entities)
    ledger = f"{work_dir}/ledger"

    def _fail(stage: str) -> int | None:
        return fail_at[1] if fail_at and fail_at[0] == stage else None

    mentions = run_stage(
        spark, "mentions", pages,
        lambda df: extract_mentions_from_html(df, surfaces, gazetteer),
        f"{work_dir}/mentions", ledger, key="url", n_parts=n_parts,
        fail_after_parts=_fail("mentions"),
    )

    def _link(df: DataFrame) -> DataFrame:
        out = link_mentions(df, kb, "subj_mention")
        return link_mentions(out, kb, "obj_mention")

    linked = run_stage(
        spark, "linked", mentions.drop("part_id"), _link,
        f"{work_dir}/linked", ledger, key="url", n_parts=n_parts,
        fail_after_parts=_fail("linked"),
    )

    ctx = predicate_context(predicates)
    edges = run_stage(
        spark, "edges", linked.drop("part_id"),
        lambda df: canonicalize_edges(df, ctx)[0],
        f"{work_dir}/edges", ledger, key="url", n_parts=n_parts,
        fail_after_parts=_fail("edges"),
    ).drop("part_id")

    viol = canonicalize_edges(
        spark.read.parquet(f"{work_dir}/linked").drop("part_id"), ctx
    )[1]
    viol = viol.unionByName(validate_edges(edges, DOMAIN_RANGE))
    viol = viol.unionByName(validate_cardinality(edges, MAX_COUNTS))
    viol = viol.unionByName(validate_node_iris(edges))
    return {"edges": edges, "violations": viol, "ledger": ledger}
