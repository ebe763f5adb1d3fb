"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

The KG pipeline benchmark reads pre-materialized parquet pages (written
once outside the timed region) so the measured span is the engine, not
the synthetic generator. ``--kg-only`` runs just that span — used by
tools/scaling.py for the N-vs-4N-cores scaling measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "events_hourly_rollup",
    "doc_quality_scores",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "dedup_clusters",
    "embedding_neardup_cosine",
    "kg_cooccurrence_edges",
    "kg_pagerank",
    "fixture_triples",
    # round-3 session-2 additions (absent from earlier BENCH_r* runs —
    # cross-round totals compare via round1_subset_seconds, not value)
    "corpus_curation_funnel",
    "q21_waiting_suppliers",
    "kg_triangle_counts",
    "ann_kmeans_train",
    "ann_sq8_recall",
    "ann_ivf_sq8_recall",
    # round-4 additions (absent from earlier BENCH_r* runs — cross-round
    # totals compare via round1_subset_seconds)
    "dedup_minhash_incremental",
    "events_trending_topk",
    "doc_quality_model",
    "events_value_quantile_sketch",
    # round-5 additions (absent from earlier BENCH_r* runs — cross-round
    # totals compare via round1_subset_seconds)
    "doc_dsir_weights",
    "doc_chunk_windows",
    "doc_readability",
    "table_time_travel",
    "events_stream_join",
    "sql_shared_grouping_sets",
    "media_png_stats",
    "media_gif_stats",
    "media_gif_frames",
    # round-5 session-4 additions
    "doc_bm25_search",
    "doc_bpe_train",
    "kg_sparql_bgp",
    "warc_roundtrip_stats",
    # round-5 session-5 additions (edges memoized once per process —
    # the first kg_* query pays the construction, the rest scan it)
    "kg_nquads_roundtrip",
    "kg_shacl_validate",
    "kg_rule_closure",
    "fixture_jsonld_reload",
    "kg_stream_edges",
    # round-5 session-6 additions
    "kg_turtle_roundtrip",
    "kg_hyperball_nf",
    "kg_transe_epoch",
    "kg_mis",
    "events_sequence_motifs",
    "kg_sssp_weighted",
    "kg_sparql_path_nps",
    "kg_sparql_update",
    "kg_sparql_service",
    "kg_ktruss",
    "parts_skyline",
    "orders_association_rules",
    "orders_dq_report",
    "parts_abc_analysis",
    "parts_gini_concentration",
    "events_exact_median",
    "kg_temporal_reachability",
    "customer_kanonymity",
    "kg_bipartiteness",
    "kg_maximal_matching",
    "embedding_hard_negatives",
    "events_cusum_changepoint",
    "events_ewma_forecast",
    "events_bootstrap_ci",
    "events_ab_test",
    "events_cuped_adjustment",
    "events_kaplan_meier",
    "events_logrank_test",
    "events_ewma_backtest",
    "events_rfm_segments",
    "events_conversion_latency",
    "events_holt_forecast",
    "events_forecast_tournament",
    "events_seasonality_audit",
    "events_metric_correlation",
    "events_theilsen_trend",
    "doc_classifier_agreement",
    "table_mor_deletes",
    "table_mor_updates",
    "table_wap_publish",
    "table_changelog",
    "table_schema_evolution",
    "kg_incremental_recrawl",
    "table_incremental_agg",
    "table_mor_merge",
    "table_bloom_lookup",
    "table_partition_evolution",
    "kg_lake_incremental",
]


def _consume(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


QUERY_REPS = 3  # median-of-3 per query separates real regressions from VM noise


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Per-query (median, [min, max]) over QUERY_REPS timed runs after a
    warm-up execution. Medians are the headline numbers; the spread is
    recorded so a cross-round per-query delta can be read against the
    documented +-10-15% (occasionally 2.3x) shared-VM noise envelope
    without re-running anything."""
    import statistics

    import __spark_entry__ as entry

    qs = entry.queries()
    medians: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        qs[name](spark, sf_dir).count()  # warm: plan + scan caches + codegen
        reps = []
        for _ in range(QUERY_REPS):
            t0 = time.perf_counter()
            _consume(qs[name](spark, sf_dir))
            reps.append(time.perf_counter() - t0)
        medians[name] = round(statistics.median(reps), 3)
        spread[name] = [round(min(reps), 3), round(max(reps), 3)]
    return medians, spread


def bench_kg(spark, n_pages: int, work_dir: str) -> dict:
    from csv_to_jsonld_processor_spark.kg.pipeline import build_kg
    from csv_to_jsonld_processor_spark.sources.pages import generate_pages

    pages_path = os.path.join(work_dir, f"pages_{n_pages}")
    if not os.path.exists(pages_path):
        generate_pages(spark, n_pages, seed=42).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    # warm outside the timed span: full input scan (OS page cache — the
    # previous subprocess may have left it warm for one config and cold for
    # the other), Python worker pool, and JVM JIT. A real cluster's workers
    # are long-lived and its inputs are not one cold local disk.
    pages.write.format("noop").mode("overwrite").save()
    build_kg(spark, pages.limit(2000))["edges"].count()

    # steady-state: best of 2 in-JVM iterations (iteration 1 still pays
    # whole-stage-codegen JIT for the big-batch paths)
    dt = float("inf")
    n_edges = 0
    for it in range(2):
        t0 = time.perf_counter()
        res = build_kg(spark, pages)
        n_edges = res["edges"].count()
        cur = time.perf_counter() - t0
        if os.environ.get("SPARK_GRAFT_BENCH_DEBUG"):
            print(f"# kg iter {it}: {cur:.2f}s", file=sys.stderr)
        dt = min(dt, cur)
    return {
        "kg_pages": n_pages,
        "kg_edges": n_edges,
        "kg_seconds": round(dt, 3),
        "kg_triples_per_sec": round(n_edges / dt, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg-only", action="store_true")
    ap.add_argument("--pages", type=int, default=int(os.environ.get("SPARK_GRAFT_KG_PAGES", "20000")))
    ap.add_argument("--pages-dir", default=os.environ.get("SPARK_GRAFT_PAGES_DIR", ""))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # single-thread noise probe: this shared VM's CPU varies >2x with
    # ZERO of our processes running (probe observed 1.3-4.1s for this
    # fixed loop — BENCH/BASELINE.md noise section). Emitting it with
    # every run lets any cross-run comparison normalize for the window
    # it happened to land in.
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    probe_seconds = round(time.perf_counter() - t0, 3)

    from csv_to_jsonld_processor_spark.session import get_spark

    # scan granularity: this local corpus is a few hundred MB, so the default
    # 128 MB split serializes it into a couple of tasks; 4 MB splits give both
    # scaling configs the same ~dozens of input partitions with NO repartition
    # shuffle (a real 100 TB input has thousands of natural splits)
    spark = get_spark(
        "bench",
        cpus=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.files.openCostInBytes": "1048576",
            # frees Arrow buffers as pandas consumes them — cuts peak
            # memory traffic in the fused python stage, which is what
            # bounds multi-core scaling on a single box
            "spark.sql.execution.arrow.pyspark.selfDestruct.enabled": "true",
            # smaller Arrow batches keep the per-worker working set inside
            # cache at high core counts: measured local[16] 16.3s → 14.3s
            # per 4M pages (default 10000 → 2000) with local[4] unchanged —
            # the knob that lifts the bandwidth-bound wide config
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work_dir = args.pages_dir or tempfile.mkdtemp(prefix="kg_bench_")
    own_tmp = not args.pages_dir

    try:
        sf = sf_dir.rstrip("/").split("sf")[-1]
        kg = bench_kg(spark, args.pages, work_dir)
        if args.kg_only:
            out = {
                "metric": "kg_pipeline_seconds",
                "value": kg["kg_seconds"],
                "unit": "sec",
                "queries": {"kg_pipeline": kg["kg_seconds"]},
                "sf": sf,
                "cpus": cpus,
                **kg,
            }
        else:
            times, spread = bench_queries(spark, sf_dir)
            times["kg_pipeline"] = kg["kg_seconds"]
            # round-over-round comparability: the suite GREW from 11
            # queries (round 1) to 16, so the total is not apples-to-
            # apples; round1_subset_seconds sums exactly the round-1
            # query list for direct comparison with BENCH_r01.json
            r1_subset = [
                "q1_pricing_summary", "q3_shipping_priority",
                "q5_local_supplier_volume", "q10_returned_items",
                "events_hourly_rollup", "doc_quality_scores",
                "dedup_ngram_jaccard", "dedup_minhash_lsh",
                "ann_topk_bruteforce", "kg_cooccurrence_edges", "kg_pipeline",
            ]
            out = {
                "metric": "headline_suite_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "n_queries": len(times),
                "query_reps": QUERY_REPS,
                "query_spread": spread,
                "round1_subset_seconds": round(
                    sum(times[q] for q in r1_subset if q in times), 3
                ),
                "sf": sf,
                "cpus": cpus,
                **kg,
            }
        out["probe_seconds"] = probe_seconds
        print(json.dumps(out))
    finally:
        if own_tmp:
            shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
