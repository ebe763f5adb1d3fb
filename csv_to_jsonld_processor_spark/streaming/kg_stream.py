"""Incremental KG construction: the batch pipeline's stateless stages
(HTML extract → mention/triple extraction → broadcast linking →
canonicalization) run unchanged over a Structured Streaming source —
mapInPandas and broadcast joins are stateless, so micro-batch results
are exactly the batch results on the same rows (pytest-gated).

At production scale this is the continuous-ingest shape: a file/Kafka
source of crawled pages, append-mode sink into the same partitioned
edges table the batch job writes (kg/graph.py), lineage per micro-batch
instead of per partition. Aggregating stages (entity dedup, PageRank)
stay batch/periodic — they need the full graph, which is why the
pipeline splits exactly here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.pages import ENTITIES, PREDICATES
from .events import run_stream_over_dir

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def kg_edges_stream(spark: SparkSession, pages_dir: str, query_name: str = "kg_edges_stream") -> DataFrame:
    """readStream over a pages directory → fused extract+link+canonicalize
    → drained append-mode memory sink (availableNow). Returns the edge
    table; equals build_kg(...)["edges"] on the same input."""
    from ..kg.graph import canonicalize_edges, predicate_context
    from ..kg.link import kb_index
    from ..kg.mentions import extract_link_from_html

    surfaces = [p[0] for p in PREDICATES]
    gazetteer = [a for _c, aliases, _cls in ENTITIES for a in aliases]
    idx = kb_index(ENTITIES)

    def transform(stream: DataFrame) -> DataFrame:
        linked = extract_link_from_html(stream, surfaces, gazetteer, idx)
        edges, _viol = canonicalize_edges(linked, predicate_context(PREDICATES))
        return edges

    return run_stream_over_dir(
        spark, pages_dir, transform, PAGES_SCHEMA, query_name, output_mode="append"
    )
