"""Skew evidence for the ``salted_shuffle`` entity-linking strategy
(north_rule: "skew from hub entities ... handled with salted
repartitioning and AQE skew-join splitting").

Protocol: materialize the REAL mention table once (fused HTML extract +
NER over the synthetic corpus — the head alias takes ~35% of mentions
per class, the planted hub skew), then time ONLY the subj-mention
linking join under each strategy in one JVM, best-of-2 per config:

- broadcast            — the dimension-KB default (reference point)
- shuffle / AQE skew   — plain shuffle join (salt=1), auto-broadcast
                         disabled to simulate a KB too big to broadcast,
                         AQE skewedJoin ON
- shuffle / no AQE     — same, skewedJoin OFF (the naive worst case)
- salted(8) / no AQE   — the salt alone (what the machinery buys on
                         engines/configs without runtime skew handling)
- salted(8) / AQE      — production config for oversized KBs

Appends a markdown section to BENCH/BASELINE.md and prints one JSON
line. Usage:
    python tools/link_skew_bench.py [--pages 2000000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_link(
    spark, mentions, kb, strategy: str, salt: int, skew_join: bool, natural: bool = False
) -> tuple[float, str]:
    """(best-of-2 seconds, physical join strategy Catalyst picked).

    ``natural=True`` leaves the broadcast threshold at its default —
    used with a genuinely oversized KB (parquet stats > threshold) so
    the shuffle path is the PLANNER'S choice, not a config override."""
    from csv_to_jsonld_processor_spark.kg.link import link_mentions

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
    if natural or strategy == "broadcast":
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    else:
        # simulate a KB past the broadcast threshold: force the shuffle path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    best = float("inf")
    df = None
    for _ in range(2):
        t0 = time.perf_counter()
        df = link_mentions(mentions, kb, "subj_mention", strategy=strategy, salt=salt)
        _consume(df)
        best = min(best, time.perf_counter() - t0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_kind = next(
        (k for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin") if k in plan),
        "?",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return best, join_kind


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--no-md", action="store_true", help="skip BENCH/BASELINE.md append")
    ap.add_argument(
        "--kb-inflate",
        type=int,
        default=0,
        help="add N synthetic never-matching alias rows so the KB parquet "
        "is GENUINELY past the broadcast threshold (shuffle becomes the "
        "planner's own choice; the forced-broadcast reference config is "
        "skipped since force-broadcasting an oversized build side is the "
        "anti-pattern under test)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from csv_to_jsonld_processor_spark.kg.link import kb_alias_table
    from csv_to_jsonld_processor_spark.kg.mentions import extract_mentions_from_html
    from csv_to_jsonld_processor_spark.session import get_spark
    from csv_to_jsonld_processor_spark.sources.pages import ENTITIES, PREDICATES, generate_pages

    spark = get_spark("link-skew-bench", cpus=args.cpus)
    work = tempfile.mkdtemp(prefix="link_skew_")

    surfaces = [p[0] for p in PREDICATES]
    gazetteer = [a for _c, aliases, _cls in ENTITIES for a in aliases]

    mentions_path = os.path.join(work, "mentions")
    pages = generate_pages(spark, args.pages, seed=42)
    extract_mentions_from_html(pages, surfaces, gazetteer).write.mode("overwrite").parquet(
        mentions_path
    )
    mentions = spark.read.parquet(mentions_path)
    n_mentions = mentions.count()
    _consume(mentions)  # page-cache warm

    # measure the planted hub skew on the join key
    top = (
        mentions.select(F.element_at(F.split(F.lower("subj_mention"), " "), 1).alias("bk"))
        .groupBy("bk")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    hub_share = top["count"] / n_mentions

    natural = args.kb_inflate > 0
    if natural:
        # pad the KB with deterministic never-matching aliases (unique
        # block keys, so no mention probes them and no KB-side hot key is
        # introduced), write to parquet and read back: file-size stats are
        # what the planner consults, so exceeding the 10 MB threshold here
        # makes the shuffle join Catalyst's own decision
        # md5-hex payloads: incompressible, so parquet file size (what the
        # planner's stats see) tracks the logical KB size instead of
        # collapsing under RLE/dictionary encoding
        filler = spark.range(args.kb_inflate).selectExpr(
            "concat('zz', md5(cast(id AS string)), ' ', md5(cast(id + 1 AS string))) AS alias",
            "concat('http://example.org/kg/entity/zz', md5(cast(id + 2 AS string))) AS canonical",
            "'Org' AS entity_class",
            "concat('zz', md5(cast(id AS string))) AS block_key",
        )
        kb_path = os.path.join(work, "kb")
        kb_alias_table(spark, ENTITIES).unionByName(filler).write.mode(
            "overwrite"
        ).parquet(kb_path)
        kb = spark.read.parquet(kb_path)
        kb_mb = sum(
            os.path.getsize(os.path.join(kb_path, f))
            for f in os.listdir(kb_path)
            if f.endswith(".parquet")
        ) / 1e6
        print(f"  inflated KB: {kb.count():,} aliases, {kb_mb:.1f} MB parquet", flush=True)
    else:
        kb = kb_alias_table(spark, ENTITIES).localCheckpoint()
        kb_mb = 0.0

    configs = [
        ("broadcast", "broadcast", 1, True),
        ("shuffle_aqe", "salted_shuffle", 1, True),
        ("shuffle_noaqe", "salted_shuffle", 1, False),
        ("salted8_noaqe", "salted_shuffle", 8, False),
        ("salted8_aqe", "salted_shuffle", 8, True),
    ]
    if natural:
        configs = [c for c in configs if c[0] != "broadcast"]
    results: dict[str, float] = {}
    join_kinds: dict[str, str] = {}
    for name, strategy, salt, skew_join in configs:
        sec, jk = time_link(spark, mentions, kb, strategy, salt, skew_join, natural=natural)
        results[name] = round(sec, 3)
        join_kinds[name] = jk
        print(f"  {name}: {results[name]}s [{jk}]", flush=True)

    out = {
        "metric": "link_skew_seconds",
        "pages": args.pages,
        "mentions": n_mentions,
        "hub_block_key": top["bk"],
        "hub_share": round(hub_share, 4),
        "cpus": args.cpus,
        "kb_inflate": args.kb_inflate,
        "kb_parquet_mb": round(kb_mb, 1),
        "join_kinds": join_kinds,
        **results,
    }
    print(json.dumps(out))

    if not args.no_md:
        salt_delta = results["shuffle_noaqe"] / results["salted8_noaqe"]
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        if natural:
            md = f"""
## Salted-shuffle linking, KB genuinely past the broadcast threshold ({ts})

Same protocol as the skew section below, but the KB is padded with
{args.kb_inflate:,} deterministic never-matching aliases to
{kb_mb:.0f} MB of parquet — past the 10 MB auto-broadcast threshold on
FILE-SIZE stats, so the shuffle join is Catalyst's own pick (physical
join per config: {join_kinds}), not a config override; the
forced-broadcast reference config is omitted because force-broadcasting
an oversized build side is the anti-pattern under test.
{args.pages:,} pages -> {n_mentions:,} mentions; hottest blocking key
`{top["bk"]}` holds {hub_share:.1%} of mentions; local[{args.cpus}],
best of 2 in-JVM runs.

| config | wall (s) |
|---|---|
| plain shuffle, AQE skew-join | {results["shuffle_aqe"]} |
| plain shuffle, no AQE | {results["shuffle_noaqe"]} |
| salted (S=8), no AQE | {results["salted8_noaqe"]} |
| salted (S=8), AQE | {results["salted8_aqe"]} |

Salting alone is **{salt_delta:.2f}x** vs the naive shuffle join with
the build side genuinely un-broadcastable; AQE and the salt still
compose.
"""
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.write(md)
            print("appended BENCH/BASELINE.md section")
            return
        md = f"""
## Salted-shuffle linking under hub-entity skew ({ts})

Linking join only (subj mentions x KB aliases), {args.pages:,} pages ->
{n_mentions:,} mentions; hottest blocking key `{top['bk']}` holds
{hub_share:.1%} of all mentions (the planted hub). Auto-broadcast
disabled for the shuffle configs to simulate a KB past the broadcast
threshold; local[{args.cpus}], best of 2 in-JVM runs.

| config | wall (s) |
|---|---|
| broadcast KB (default) | {results['broadcast']} |
| plain shuffle, AQE skew-join | {results['shuffle_aqe']} |
| plain shuffle, no AQE | {results['shuffle_noaqe']} |
| salted (S=8), no AQE | {results['salted8_noaqe']} |
| salted (S=8), AQE | {results['salted8_aqe']} |

Salting alone is **{salt_delta:.2f}x** vs the naive shuffle join
(no-AQE pair — what the salt buys where runtime skew handling is
unavailable); AQE skew-join and the salt compose. Broadcast stays the
default whenever the KB fits (kg/link.py module docstring).
"""
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(md)
        print("appended to BENCH/BASELINE.md", flush=True)


if __name__ == "__main__":
    main()
