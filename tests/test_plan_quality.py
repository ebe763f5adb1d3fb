"""Physical-plan quality gates: filters reach the parquet scan, small
dims broadcast, column pruning holds, the fused KG pipeline stays
shuffle-free. These are the 100 TB guarantees — a plan regression here
is a performance bug even when results stay correct."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from csv_to_jsonld_processor_spark.session import get_spark

    return get_spark("plan-quality", cpus=8)


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE materializes the final plan (with WholeStageCodegen spans)
        # only after the query runs
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    from csv_to_jsonld_processor_spark.plans.relational2 import q6_forecast_revenue

    plan = plan_of(q6_forecast_revenue(spark, SF))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_column_pruning(spark):
    from csv_to_jsonld_processor_spark.plans.relational2 import q6_forecast_revenue

    plan = plan_of(q6_forecast_revenue(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the four needed columns are read, not all 11
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q5_broadcasts_dimensions(spark):
    from csv_to_jsonld_processor_spark.plans.relational import q5_local_supplier_volume

    plan = plan_of(q5_local_supplier_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # nation/region/customer/supplier
    # only the orders⋈lineitem join may shuffle
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q1_whole_stage_codegen(spark):
    from csv_to_jsonld_processor_spark.plans.relational import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, SF), execute=True)
    # codegen spans render as "*(n)" in the final-plan string
    assert "WholeStageCodegen" in plan or "*(" in plan
    # map-side combine: partial aggregation before the exchange
    assert "partial_sum" in plan


def test_fused_kg_pipeline_is_shuffle_free(spark, tmp_path):
    from csv_to_jsonld_processor_spark.kg.pipeline import build_kg
    from csv_to_jsonld_processor_spark.sources.pages import generate_pages

    path = str(tmp_path / "pages")
    generate_pages(spark, 100, partitions=4).write.parquet(path)
    pages = spark.read.parquet(path)
    edges = build_kg(spark, pages)["edges"]
    plan = plan_of(edges)
    # the only exchange allowed is the broadcast of the predicate context
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert "SortMergeJoin" not in plan
    assert plan.count("MapInPandas") == 1  # fused: one python stage total


def test_anti_join_stays_broadcast_or_single_shuffle(spark):
    from csv_to_jsonld_processor_spark.plans.relational import semi_anti_join_parts

    plan = plan_of(semi_anti_join_parts(spark, SF))
    assert "LeftAnti" in plan


def test_ivf_assignment_shuffle_free_and_no_cartesian(spark):
    """IVF: centroid assignment must not shuffle the corpus (literal
    scores array + array_max, no exchange before the cell join), and no
    plan node may be a cartesian product."""
    from csv_to_jsonld_processor_spark.operators.similarity import ann_ivf_topk

    plan = plan_of(ann_ivf_topk(spark, SF))
    assert "CartesianProduct" not in plan
    # the only joins are the broadcast of probes + window ranking
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_per_doc_text_ops_ride_the_scan(spark):
    """doc_repetition_signals and doc_pii_scan are pure per-row column
    algebra: the ONLY exchange allowed is the presentation sort
    (rangepartitioning for orderBy doc_id) — no hash shuffle, no join.
    A regression here means someone rewrote them as explode+groupBy,
    which shuffles the token stream for the same answer."""
    from csv_to_jsonld_processor_spark.operators.textops import (
        doc_pii_scan,
        doc_repetition_signals,
    )

    for fn in (doc_repetition_signals, doc_pii_scan):
        plan = plan_of(fn(spark, SF))
        assert "hashpartitioning" not in plan, fn.__name__
        assert "Join" not in plan, fn.__name__
        assert plan.count("Exchange") <= 1  # rangepartitioning sort only


def test_dup_ngram_and_curation_no_cartesian(spark):
    """The duplicated-span and curation-funnel plans must stay equi-join
    blocked: no cartesian/broadcast-nested-loop anywhere, and the
    decontamination side of the funnel broadcasts (benchmark set is
    dimension-sized by nature)."""
    from csv_to_jsonld_processor_spark.operators.curation import corpus_curation_funnel
    from csv_to_jsonld_processor_spark.operators.textops import doc_dup_ngram_spans

    for fn in (doc_dup_ngram_spans, corpus_curation_funnel):
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
    assert "BroadcastHashJoin" in plan_of(corpus_curation_funnel(spark, SF))


def test_q19_disjunction_keeps_equi_join(spark):
    """The OR-of-conjunctions predicate must not swallow the
    `l_partkey = p_partkey` equi-condition: the plan stays a hash/merge
    equi-join (part side broadcast at this scale), never a nested-loop
    with the disjunction as its residual."""
    from csv_to_jsonld_processor_spark.plans.relational3 import q19_disjunctive_revenue

    plan = plan_of(q19_disjunctive_revenue(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q21_decorrelates_to_semi_anti_hash_joins(spark):
    """Q21's EXISTS/NOT EXISTS must decorrelate to hash-based left-semi
    and left-anti joins (equi on orderkey, supplier inequality as
    residual) — a nested-loop here is quadratic in order size."""
    from csv_to_jsonld_processor_spark.plans.relational3 import q21_waiting_suppliers

    plan = plan_of(q21_waiting_suppliers(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_limit_orderby_fuses_to_take_ordered(spark):
    """ORDER BY + LIMIT k must plan as TakeOrderedAndProject (per-
    partition top-k + driver merge of k·partitions rows) — a global
    sort for a top-10 is the classic way to shuffle 100 TB for 10
    rows."""
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .orderBy("o_totalprice", ascending=False)
        .limit(10)
    )
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE must shrink the static 32-partition shuffle down to the data
    at runtime (AQEShuffleRead coalesced in the FINAL plan) — the
    mechanism that makes one spark.sql.shuffle.partitions setting
    serve both the sf0.001 test and the 100 TB job."""
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
    )
    plan = plan_of(df, execute=True)  # final plan exists only post-run
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering (semi-join reduction): when a
    selective filter sits on the build side of a shuffle join, the
    optimizer must inject a bloom filter built from the dim keys and
    apply might_contain on the fact side BEFORE its shuffle — at 100 TB
    this is what keeps non-matching fact rows from ever crossing the
    network. Broadcast is disabled to force the shuffle-join scenario
    the technique exists for."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"
    )
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        plan = plan_of(li.join(orders, li.l_orderkey == orders.o_orderkey))
        assert "bloom_filter_agg" in plan, "no runtime bloom filter built"
        assert "might_contain" in plan, "bloom filter not applied to the probe side"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_thr,
        )


def test_neardup_lsh_no_cartesian(spark):
    """The near-dup scale path must be a bucket equi-join, never a
    cross join (the round-1 brute-force shape)."""
    from csv_to_jsonld_processor_spark.operators.similarity import (
        embedding_neardup_cosine,
    )

    plan = plan_of(embedding_neardup_cosine(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_media_metadata_projection_prunes_blob(spark, tmp_path):
    """Metadata-only projection over the media table: the parquet scan's
    ReadSchema must exclude the binary blob column entirely."""
    from csv_to_jsonld_processor_spark.sources.multimodal import (
        generate_media,
        media_metadata_only,
    )

    path = str(tmp_path / "media")
    generate_media(spark, 200).write.parquet(path)
    df = media_metadata_only(spark.read.parquet(path))
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "blob" not in read_schema
    assert "meta_width" in read_schema


def test_no_forced_broadcast_of_scaling_tables():
    """Broadcast hints are only legal on bounded relations: constant
    dims (region/nation) or filtered/projected slices. A forced
    broadcast of an UNFILTERED SF-scaling table (customer, supplier,
    part, orders, lineitem) is the inverse anti-pattern — at the 100 TB
    analog it replicates a multi-GB build side to every executor. This
    lints the plan sources for the direct pattern; filtered slices like
    ``F.broadcast(t["customer"].where(...))`` intentionally don't match."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "csv_to_jsonld_processor_spark"
    scaling = ("customer", "supplier", "part", "orders", "lineitem")
    pat = re.compile(
        r"F\.broadcast\(\s*t\[\s*['\"](%s)['\"]\s*\]\s*\)" % "|".join(scaling)
    )
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{py.relative_to(pkg.parent)}:{i}: {line.strip()}")
    assert not offenders, "forced broadcast of unfiltered scaling table:\n" + "\n".join(offenders)


def test_q5_no_broadcast_hint_on_scaling_tables(spark):
    """q5's analyzed plan must carry broadcast hints only on the
    region-filtered nation dim — customer/supplier join strategy is
    AQE's call, not a hint."""
    from csv_to_jsonld_processor_spark.plans.relational import q5_local_supplier_volume

    df = q5_local_supplier_volume(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly two hinted subtrees, both bounded dims: the ASIA-filtered
    # region inside the nation build, and the region-filtered nation
    assert analyzed.count("ResolvedHint") == 2


def test_doc_pack_window_parallelism_scales(spark):
    """Sequence packing must not funnel each language into one window
    partition (at web scale ~half the corpus is 'en'). The two-level
    (lang, block) key gives >1 block per language even at sf0.001."""
    from csv_to_jsonld_processor_spark.operators.textops import doc_pack_sequences

    out = doc_pack_sequences(spark, SF)
    groups = out.select("lang", "block").distinct().collect()
    langs = {r.lang for r in groups}
    assert len(groups) > len(langs)  # window keys outnumber languages
    per_lang = {}
    for r in groups:
        per_lang.setdefault(r.lang, set()).add(r.block)
    assert all(len(b) > 1 for b in per_lang.values())


def test_q2_dims_broadcast_and_topk_fused(spark):
    """q2: the region-supplier dimension chain broadcasts (lineitem — the
    SF-scaling side — is never a build side), and ORDER BY + LIMIT 100
    fuses to TakeOrderedAndProject instead of a global sort."""
    from csv_to_jsonld_processor_spark.plans.relational4 import q2_min_cost_supplier

    plan = plan_of(q2_min_cost_supplier(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Sort [s_acctbal" not in plan  # no global sort of the full result


def test_q11_scalar_subquery_single_row_build(spark):
    """q11: the national-total side is a single-row broadcast build
    (BroadcastNestedLoopJoin over one row), never a cartesian product of
    two SF-scaling relations."""
    from csv_to_jsonld_processor_spark.plans.relational4 import q11_important_stock

    plan = plan_of(q11_important_stock(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_triangle_banded_signature_computed_once(spark):
    """kg_triangle_counts: the undirected edge relation is checkpointed,
    so the four consumers (degree + three join legs) read ExistingRDD
    scans instead of re-deriving the co-occurrence aggregation."""
    from csv_to_jsonld_processor_spark.kg.queries import kg_triangle_counts

    plan = plan_of(kg_triangle_counts(spark, SF))
    assert plan.count("Scan ExistingRDD") >= 4


def test_minhash_lsh_signature_computed_once(spark):
    """Signature-REUSE path (verified pairs / clusters / funnel /
    incremental): both sides of the band self-join read the
    checkpointed banded-signature blocks — the 12-way min-hash
    SortAggregate appears ZERO times in the join plan (it ran once at
    checkpoint materialization; round-3 PLANS.md showed it twice).
    The one-shot dedup_minhash_lsh query deliberately SKIPS the
    checkpoint (round-4 BENCH: materialization was +24% pure tax
    there), so it is not the subject here."""
    from csv_to_jsonld_processor_spark.operators.dedup import (
        _lsh_candidate_pairs,
    )
    from csv_to_jsonld_processor_spark.session import load_tables

    docs = load_tables(spark, SF)["documents"]
    plan = plan_of(_lsh_candidate_pairs(docs, checkpoint_sig=True))
    assert plan.count("Scan ExistingRDD") >= 2
    assert "SortAggregate" not in plan and "partial_min" not in plan


def test_quality_model_rides_the_scan(spark):
    """doc_quality_model: feature extraction + dot product are JVM
    expressions over the scan — no Python stage, no shuffle before the
    final (lang, keep) aggregation (exactly one exchange pair)."""
    from csv_to_jsonld_processor_spark.operators.inference import doc_quality_model

    plan = plan_of(doc_quality_model(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
    # hashpartitioning for the group-by and rangepartitioning for the
    # orderBy; nothing else
    assert plan.count("Exchange") <= 2


def test_aqe_skew_join_splits_planted_hub(spark):
    """AQE skew-join: a planted hub key (90% of the probe side) must be
    SPLIT at runtime — the final adaptive plan marks the sort-merge join
    skew=true — once the skew thresholds are within reach of the toy
    data. This is the runtime half of the salting story: the salt
    bounds fan-out structurally, AQE splits residual stragglers."""
    from pyspark.sql import functions as F

    big = spark.range(0, 400_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 97).select(F.col("id").cast("long").alias("k"), F.lit("x").alias("v"))
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        # must be an action on THIS DataFrame: write()/count() build
        # their own QueryExecution, leaving df's plan isFinalPlan=false
        df = big.join(dim, "k")
        plan = plan_of(df, execute=True)
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead marks the split partitions
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dsir_two_scans_broadcast_scores(spark):
    """doc_dsir_weights: the corpus token stream is scanned exactly
    twice (one fused stats pass, one scoring join), the K-row score
    table broadcasts back (never a sort-merge join against the token
    stream), and everything stays JVM-side."""
    from csv_to_jsonld_processor_spark.operators.textops import doc_dsir_weights

    plan = plan_of(doc_dsir_weights(spark, SF))
    assert plan.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fuzzy_blocking_is_equi_join_no_cartesian(spark):
    """Fuzzy linking must pair candidates through the q-gram equi-join;
    an all-pairs levenshtein (cartesian) plan is the 100 TB failure."""
    from csv_to_jsonld_processor_spark.kg.queries import kg_fuzzy_token_link

    plan = plan_of(kg_fuzzy_token_link(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kcore_pushes_quantity_filter_and_prunes(spark):
    """The peel's edge build must push l_quantity to the lineitem scan
    and read only the two lineitem columns it needs."""
    from csv_to_jsonld_processor_spark.kg.queries import _purchase_edges

    plan = plan_of(_purchase_edges(spark, SF))
    assert "PushedFilters:" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]
    read_schema = [s for s in plan.split("ReadSchema:")[1:] if "l_" in s][0].splitlines()[0]
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_transitions_single_window_then_bounded_agg(spark):
    """The Markov matrix plan: exactly one window exchange (the per-user
    lag) feeding partial-aggregated groupBys — no cartesian, no extra
    scan of events."""
    from csv_to_jsonld_processor_spark.operators.eventops import events_type_transitions

    plan = plan_of(events_type_transitions(spark, SF))
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan
    # one events scan only: lag + agg reuse it, totals joins the agg output
    assert plan.count("events.parquet") <= 1 or plan.count("Scan parquet") <= 2


def test_type_inference_tbox_broadcast(spark):
    """RDFS typing joins the closed T-Box against the instance table as
    a BROADCAST — the instance side must not shuffle for the typing
    join (a SortMergeJoin on the entity table would be the 100 TB
    regression; only aggregation exchanges are expected downstream)."""
    from csv_to_jsonld_processor_spark.kg.reasoning import kg_type_inference

    plan = plan_of(kg_type_inference(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_functional_conflicts_election_plan(spark):
    """Conflict resolution adds exactly two hash exchanges past the
    edges stage: the partial-aggregated (subj, pred, obj) support
    groupBy, then the (subj, pred) election window whose exchange moves
    only aggregated rows. The top-1 row_number must be pruned by
    WindowGroupLimit (no full per-group sort materialization)."""
    from csv_to_jsonld_processor_spark.kg.reasoning import kg_functional_conflicts
    from csv_to_jsonld_processor_spark.kg.queries import kg_webtext_edges

    full = plan_of(kg_functional_conflicts(spark, SF))
    base = plan_of(
        kg_webtext_edges(spark, SF).where("pred like '%birthPlace'")
    )
    added_hash = full.count("hashpartitioning") - base.count("hashpartitioning")
    assert added_hash <= 2, f"election added {added_hash} hash exchanges"
    assert "WindowGroupLimit" in full
    assert "CartesianProduct" not in full


def test_fact_versioning_no_nested_loop(spark):
    """The temporal snapshot diff is equi-join-only: latest-crawl
    election joins back on url and the full-outer diff joins on the
    complete fact key — never a nested-loop/cartesian fallback."""
    from csv_to_jsonld_processor_spark.kg.reasoning import kg_fact_versioning

    plan = plan_of(kg_fact_versioning(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_bm25_rides_the_scan_no_explode(spark):
    """BM25 term frequencies are per-doc column expressions: no
    Generate (explode) of the token stream, no hash shuffle of the
    corpus — the only exchanges are the single-row stats broadcast, and
    the top-k is a fused TakeOrdered, never a global sort."""
    from csv_to_jsonld_processor_spark.operators.search import doc_bm25_search

    plan = plan_of(doc_bm25_search(spark, SF))
    assert "Generate" not in plan
    assert "hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_bpe_train_corpus_scanned_once(spark):
    """BPE training touches the corpus exactly once (the word census);
    every merge round must plan against the vocab-sized checkpointed
    census, not re-read documents.parquet."""
    from csv_to_jsonld_processor_spark.operators.search import doc_bpe_train

    df = doc_bpe_train(spark, SF)
    # the returned merge table is driver-built from bounded state; the
    # census scan count is observable via the query it came from: rerun
    # the census builder and assert its plan reads parquet once
    from csv_to_jsonld_processor_spark.operators.search import _word_census

    census_plan = plan_of(_word_census(spark, SF))
    assert census_plan.count("FileScan parquet") == 1
    assert df.count() > 0


def test_dynamic_partition_pruning_on_hive_layout(spark, tmp_path):
    """A hive-partitioned fact joined on its partition column against a
    selective dim must get a DynamicPruning subquery on the scan — the
    Spark-native runtime partition-skip that makes partitioned layouts
    pay off on star joins (at 100 TB this is the difference between
    scanning 3 day-partitions and 700)."""
    from pyspark.sql import functions as F

    from csv_to_jsonld_processor_spark.session import load_tables

    fact_dir = str(tmp_path / "events_by_day")
    load_tables(spark, SF)["events"].withColumn(
        "day", F.to_date("ts")
    ).write.partitionBy("day").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    # DPP's planner requires a SELECTIVE PREDICATE on the build side —
    # a bare 3-row relation does not qualify (verified: no DPP without
    # the filter), which is itself worth pinning: the pruning subquery
    # is driven by the dim's filter, not the dim's size
    days = fact.select("day").distinct().localCheckpoint()
    dim = days.where(
        F.col("day") <= F.lit("2024-01-03").cast("date")
    ).withColumn("weight", F.lit(1))
    q = (
        fact.join(dim, "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(q)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the join stays broadcast (DPP's cheap reuse case)
    assert "BroadcastHashJoin" in plan

    no_filter = fact.join(days.limit(3), "day").groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "dynamicpruning" not in plan_of(no_filter).lower()


def test_session6_operators_are_deterministic_across_runs(spark):
    """Two in-session executions must hash identically — catches
    collect_list/array-order nondeterminism the single-run oracle
    compare can miss (all grouped folds must sort before emitting)."""
    import hashlib

    from csv_to_jsonld_processor_spark.kg.graphalgs import (
        kg_hyperball_nf, kg_mis)
    from csv_to_jsonld_processor_spark.kg.turtle import kg_turtle_roundtrip
    from csv_to_jsonld_processor_spark.operators.eventops import (
        events_sequence_motifs)

    def h(df):
        rows = sorted(map(str, df.collect()))
        return hashlib.sha256("\n".join(rows).encode()).hexdigest()

    for fn in (kg_turtle_roundtrip, kg_hyperball_nf, kg_mis,
               events_sequence_motifs):
        assert h(fn(spark, SF)) == h(fn(spark, SF)), fn.__name__


def test_transe_epoch_model_joins_broadcast(spark):
    """The after-loss pass joins the O(model) update table back in —
    those four joins must be broadcast (no data-sized shuffle for
    model state), and the only nested-loop is the single-row pool
    count."""
    from csv_to_jsonld_processor_spark.kg.mlprep import kg_transe_epoch

    plan = plan_of(kg_transe_epoch(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_skyline_window_runs_on_domain_not_data(spark):
    """The global-order window must consume the aggregated price domain
    (a HashAggregate feeds the Window), never the raw scan."""
    from csv_to_jsonld_processor_spark.plans.relational4 import parts_skyline

    plan = plan_of(parts_skyline(spark, SF))
    w = plan.find("Window")
    assert w != -1
    # an aggregate appears below the window in the tree dump
    assert "HashAggregate" in plan[w:], plan[:1500]


def test_incremental_recrawl_antijoin_broadcasts_changed_urls(spark):
    """Incremental maintenance must not shuffle the edge table: the
    changed-url retirement is a broadcast LEFT ANTI join, and the plan
    has no cartesian product anywhere."""
    from csv_to_jsonld_processor_spark.kg.incremental import (
        kg_incremental_recrawl,
    )

    plan = plan_of(kg_incremental_recrawl(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin LeftAnti" not in plan


def test_association_rules_broadcast_supports_no_cartesian(spark):
    """Item supports must join back broadcast (dimension-sized), the
    pair generation is the only self-join, and nothing is cartesian."""
    from csv_to_jsonld_processor_spark.plans.relational4 import (
        orders_association_rules,
    )

    plan = plan_of(orders_association_rules(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
