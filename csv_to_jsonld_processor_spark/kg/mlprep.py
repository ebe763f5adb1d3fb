"""ML-training preparation over the constructed KG: edge splitting with
inverse-leakage audit, and deterministic filtered negative sampling —
the two data-hygiene steps every KG-completion (TransE-family) training
pipeline runs between graph materialization and model training.

Both are exact integer/hash algebra (the house md5-prefix idiom shared
with ``kg/triplestore.py``), so the DuckDB oracle checks them
bit-for-bit, and both are truth-anchored to the generator-derived
golden edge table rather than this engine's own output.

Scale shape: the split is a stateless per-row hash bucket riding the
scan; the leakage audit and accidental-positive filter are equi-joins
on the full triple key (the natural clustering of a triple store); the
negative-sample candidate pool is per-predicate ranked objects — a
window over the (pred, obj) distinct set, tiny relative to the edge
count, then a broadcast-sized per-pred count table drives index
arithmetic.  No sampling loop, no rejection resampling: one pass,
deterministic, with removed accidental positives REPORTED instead of
silently resampled (the auditable variant of filtered negative
sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _u32(col) -> F.Column:
    """First 8 md5 hex chars as BIGINT — same idiom both engines."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


SPLIT_BUCKETS = 10  # 8 train / 1 valid / 1 test
NEG_K = 2


def _distinct_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import kg_webtext_edges

    return kg_webtext_edges(spark, sf_dir).select("subj", "pred", "obj").dropDuplicates()


def kg_edge_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split the distinct triple set 8/1/1 and audit INVERSE
    leakage: a valid/test triple (s,p,o) whose mirror (o,p,s) sits in
    train lets a model score the held-out edge from memorization, the
    classic KG-completion eval flaw (FB15k's pitfall).  Per predicate:
    split sizes and inverse-leak counts for both held-out splits."""
    trip = _distinct_triples(spark, sf_dir)
    t = trip.withColumn(
        "bucket",
        F.pmod(_u32(F.concat_ws("|", "subj", "pred", "obj")), F.lit(SPLIT_BUCKETS)),
    )
    train = t.where(F.col("bucket") < SPLIT_BUCKETS - 2)
    mirror = train.select(
        F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
    )
    key = ["subj", "pred", "obj"]
    leak_v = (
        t.where(F.col("bucket") == SPLIT_BUCKETS - 2)
        .join(mirror, key, "left_semi")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_valid_inv_leak"))
    )
    leak_t = (
        t.where(F.col("bucket") == SPLIT_BUCKETS - 1)
        .join(mirror, key, "left_semi")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_test_inv_leak"))
    )
    sizes = t.groupBy("pred").agg(
        F.sum((F.col("bucket") < SPLIT_BUCKETS - 2).cast("long")).alias("n_train"),
        F.sum((F.col("bucket") == SPLIT_BUCKETS - 2).cast("long")).alias("n_valid"),
        F.sum((F.col("bucket") == SPLIT_BUCKETS - 1).cast("long")).alias("n_test"),
    )
    return (
        sizes.join(leak_v, "pred", "left")
        .join(leak_t, "pred", "left")
        .select(
            "pred",
            "n_train",
            "n_valid",
            "n_test",
            F.coalesce("n_valid_inv_leak", F.lit(0)).alias("n_valid_inv_leak"),
            F.coalesce("n_test_inv_leak", F.lit(0)).alias("n_test_inv_leak"),
        )
        .orderBy("pred")
    )


def kg_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic filtered negative sampling (the original TransE
    uniform-corruption protocol): for every distinct triple, NEG_K
    object corruptions drawn from the GLOBAL entity pool
    (subjects ∪ objects, rank-indexed), index = md5(s|p|o|k) mod pool
    size; candidates that collide with a true triple are removed by
    anti-join and COUNTED, not resampled.  Per predicate:
    candidate/accidental/kept counts plus an order-free checksum of
    the kept negatives (sum of per-negative md5-prefix u32), so the
    full sample set is hash-verified without emitting it.

    Corrupt-within-range (per-predicate object pools) is the usual
    refinement, but this KB's ranges are SATURATED — e.g. every
    (person, birthPlace, place) pair is a true triple — so range
    corruption filters to almost nothing; the uniform pool keeps the
    type-violating negatives a real trainer would learn from."""
    trip = _distinct_triples(spark, sf_dir)
    ents = (
        trip.select(F.col("subj").alias("ent"))
        .unionByName(trip.select(F.col("obj").alias("ent")))
        .dropDuplicates()
    )
    # entity-dictionary-scale global rank (bounded: the KB's canonical
    # entity set, not the corpus) — at 10^9 entities this is the same
    # range-partitioned sort dictionary encoding already pays once
    pool = ents.withColumn(
        "idx", F.row_number().over(Window.orderBy("ent")) - 1
    )
    pool_n = pool.agg(F.count(F.lit(1)).cast("long").alias("pool_n"))
    cand = (
        trip.crossJoin(F.broadcast(pool_n))
        .select(
            "subj",
            "pred",
            "obj",
            "pool_n",
            F.explode(F.array(*[F.lit(k) for k in range(NEG_K)])).alias("k"),
        )
        .withColumn(
            "idx",
            F.pmod(
                _u32(F.concat_ws("|", "subj", "pred", "obj", "k")), F.col("pool_n")
            ),
        )
        .join(
            F.broadcast(pool.select("idx", F.col("ent").alias("neg_obj"))), "idx"
        )
        .select("subj", "pred", "neg_obj")
    )
    kept = cand.join(
        trip.select("subj", "pred", F.col("obj").alias("neg_obj")),
        ["subj", "pred", "neg_obj"],
        "left_anti",
    )
    n_cand = cand.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    stats = kept.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(_u32(F.concat_ws("|", "subj", "pred", "neg_obj")))
        .cast("long")
        .alias("neg_checksum"),
    )
    return (
        n_cand.join(stats, "pred")
        .select(
            "pred",
            "n_candidates",
            (F.col("n_candidates") - F.col("n_kept")).alias("n_accidental_removed"),
            "n_kept",
            "neg_checksum",
        )
        .orderBy("pred")
    )


def _edge_split_sql() -> str:
    from .queries import _GOLDEN_EDGES

    lo, v, t = SPLIT_BUCKETS - 2, SPLIT_BUCKETS - 2, SPLIT_BUCKETS - 1
    return f"""
WITH trip AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)
), b AS (
  SELECT subj, pred, obj,
         CAST(('0x' || substr(md5(subj || '|' || pred || '|' || obj), 1, 8)) AS BIGINT)
           % {SPLIT_BUCKETS} AS bucket
  FROM trip
), train AS (SELECT subj, pred, obj FROM b WHERE bucket < {lo}),
leak_v AS (
  SELECT h.pred, CAST(COUNT(*) AS BIGINT) AS n_valid_inv_leak
  FROM b h JOIN train tr
    ON h.subj = tr.obj AND h.pred = tr.pred AND h.obj = tr.subj
  WHERE h.bucket = {v} GROUP BY h.pred
), leak_t AS (
  SELECT h.pred, CAST(COUNT(*) AS BIGINT) AS n_test_inv_leak
  FROM b h JOIN train tr
    ON h.subj = tr.obj AND h.pred = tr.pred AND h.obj = tr.subj
  WHERE h.bucket = {t} GROUP BY h.pred
), sizes AS (
  SELECT pred,
         CAST(SUM(CASE WHEN bucket < {lo} THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN bucket = {v} THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         CAST(SUM(CASE WHEN bucket = {t} THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM b GROUP BY pred
)
SELECT s.pred, s.n_train, s.n_valid, s.n_test,
       COALESCE(lv.n_valid_inv_leak, 0) AS n_valid_inv_leak,
       COALESCE(lt.n_test_inv_leak, 0) AS n_test_inv_leak
FROM sizes s
LEFT JOIN leak_v lv ON s.pred = lv.pred
LEFT JOIN leak_t lt ON s.pred = lt.pred
ORDER BY s.pred
"""


def _neg_samples_sql() -> str:
    from .queries import _GOLDEN_EDGES

    ks = ", ".join(str(k) for k in range(NEG_K))
    return f"""
WITH trip AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)
), pool AS (
  SELECT ent, ROW_NUMBER() OVER (ORDER BY ent) - 1 AS idx
  FROM (SELECT DISTINCT subj AS ent FROM trip
        UNION SELECT DISTINCT obj FROM trip)
), pool_n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS pool_n FROM pool
), cand AS (
  SELECT t.subj, t.pred, p.ent AS neg_obj
  FROM (
    SELECT tr.subj, tr.pred, tr.obj, u.k,
           CAST(('0x' || substr(md5(tr.subj || '|' || tr.pred || '|' || tr.obj
                                || '|' || CAST(u.k AS VARCHAR)), 1, 8)) AS BIGINT)
             % (SELECT pool_n FROM pool_n) AS idx
    FROM trip tr
    CROSS JOIN (SELECT unnest([{ks}]) AS k) u
  ) t
  JOIN pool p ON t.idx = p.idx
), kept AS (
  SELECT c.subj, c.pred, c.neg_obj FROM cand c
  ANTI JOIN trip tr
    ON c.subj = tr.subj AND c.pred = tr.pred AND c.neg_obj = tr.obj
), n_cand AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand GROUP BY pred
), stats AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(CAST(('0x' || substr(md5(subj || '|' || pred || '|' || neg_obj), 1, 8))
                       AS BIGINT)) AS BIGINT) AS neg_checksum
  FROM kept GROUP BY pred
)
SELECT n.pred, n.n_candidates,
       n.n_candidates - s.n_kept AS n_accidental_removed,
       s.n_kept, s.neg_checksum
FROM n_cand n JOIN stats s ON n.pred = s.pred
ORDER BY n.pred
"""


# --- sampled filtered-ranking evaluation (MRR / Hits@1) -------------------
#
# The third leg of the KG-completion prep stack: after the split
# (kg_edge_split) and the corruption sampler (kg_negative_samples), a
# trainer needs the EVALUATION harness — rank each held-out triple's
# true object against sampled corruptions, filtered protocol (Bordes et
# al. 2013).  Full-ranking against the whole entity set is O(|test|·|E|)
# and is exactly what nobody runs at 10^9 entities; the standard
# large-scale protocol is sampled ranking against K corruptions, which
# is what this implements — stateless per-row score algebra riding the
# candidate join, no O(|E|) stage anywhere.
#
# Embeddings are DETERMINISTIC hash projections (md5 per dimension,
# values in [-1000, 1000]) rather than trained weights: the point is the
# exact mechanics of the eval pipeline — candidate generation, filtered
# anti-join, pessimistic tie-broken ranks, reciprocal-rank aggregation —
# all integer algebra both engines compute bit-for-bit.  A trained model
# would only swap the score expression for a table lookup.

EVAL_DIMS = 4
EVAL_MOD = 2001  # embedding values: u32 % 2001 - 1000 ∈ [-1000, 1000]
EVAL_K = 8  # corruptions per held-out triple; max rank = 9
MRR_SCALE = 2520  # lcm(1..9): 2520/rank is EXACT for every possible rank


def _dim_val(col: F.Column, dim: int) -> F.Column:
    """Deterministic per-dimension embedding value, integer-exact."""
    return F.pmod(_u32(F.concat(col, F.lit(f"#{dim}"))), F.lit(EVAL_MOD)) - F.lit(
        EVAL_MOD // 2
    )


def _l1_distance(s, p, o) -> F.Column:
    """TransE L1 distance ||e_s + r_p - e_o||_1 over hash embeddings.
    The predicate embedding is salted ('P|') so a predicate string that
    collides with an entity name still gets its own vector."""
    terms = [
        F.abs(
            _dim_val(F.col(s), i)
            + _dim_val(F.concat(F.lit("P|"), F.col(p)), i)
            - _dim_val(F.col(o), i)
        )
        for i in range(EVAL_DIMS)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.cast("long")


def kg_transe_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled filtered-ranking eval over the test split: per predicate,
    n_test, kept-corruption count, Hits@1, and the EXACT reciprocal-rank
    sum scaled by lcm(1..9) so MRR is a BIGINT, not a float.

    Rank is pessimistic (ties with the true triple count against it),
    so no float tiebreak is needed.  Corruptions reuse the uniform-pool
    index arithmetic of kg_negative_samples under a distinct salt 'E',
    and true triples are filtered by anti-join (the 'filtered' setting —
    a corruption that happens to be a true edge must not penalize the
    model).  Triples whose corruptions ALL collide with true edges rank
    1 by definition and stay in the denominator.

    Scale shape: the test split is a hash-bucket filter riding the
    scan; candidate gen is the same broadcast-dictionary index join the
    sampler uses (range-partitioned equi-join once the entity dictionary
    outgrows a broadcast); scores are stateless per-row expressions —
    the only shuffles are the per-triple and per-pred aggregations."""
    trip = _distinct_triples(spark, sf_dir)
    t = trip.withColumn(
        "bucket",
        F.pmod(_u32(F.concat_ws("|", "subj", "pred", "obj")), F.lit(SPLIT_BUCKETS)),
    )
    test = t.where(F.col("bucket") == SPLIT_BUCKETS - 1).drop("bucket")
    ents = (
        trip.select(F.col("subj").alias("ent"))
        .unionByName(trip.select(F.col("obj").alias("ent")))
        .dropDuplicates()
    )
    pool = ents.withColumn("idx", F.row_number().over(Window.orderBy("ent")) - 1)
    pool_n = pool.agg(F.count(F.lit(1)).cast("long").alias("pool_n"))
    cand = (
        test.crossJoin(F.broadcast(pool_n))
        .select(
            "subj",
            "pred",
            "obj",
            "pool_n",
            F.explode(F.array(*[F.lit(k) for k in range(EVAL_K)])).alias("k"),
        )
        .withColumn(
            "idx",
            F.pmod(
                _u32(F.concat_ws("|", "subj", "pred", "obj", F.lit("E"), "k")),
                F.col("pool_n"),
            ),
        )
        .join(F.broadcast(pool.select("idx", F.col("ent").alias("neg_obj"))), "idx")
        .select("subj", "pred", "obj", "neg_obj")
    )
    kept = cand.join(
        trip.select("subj", "pred", F.col("obj").alias("neg_obj")),
        ["subj", "pred", "neg_obj"],
        "left_anti",
    )
    scored = kept.select(
        "subj",
        "pred",
        "obj",
        _l1_distance("subj", "pred", "neg_obj").alias("d_neg"),
        _l1_distance("subj", "pred", "obj").alias("d_true"),
    )
    per_neg = scored.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_neg"),
        F.sum((F.col("d_neg") <= F.col("d_true")).cast("long")).alias("n_not_worse"),
    )
    ranked = (
        test.join(per_neg, ["subj", "pred", "obj"], "left")
        .select(
            "pred",
            F.coalesce("n_neg", F.lit(0).cast("long")).alias("n_neg"),
            (F.lit(1) + F.coalesce("n_not_worse", F.lit(0))).cast("long").alias("rank"),
        )
    )
    return (
        ranked.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("n_neg").cast("long").alias("n_neg_eval"),
            F.sum((F.col("rank") == 1).cast("long")).alias("n_hits1"),
            F.sum(F.expr(f"{MRR_SCALE} div rank")).cast("long").alias("mrr_x2520"),
        )
        .orderBy("pred")
    )


def _transe_mrr_sql() -> str:
    from .queries import _GOLDEN_EDGES

    def dv(expr: str, dim: int) -> str:
        return (
            f"(CAST(('0x' || substr(md5({expr} || '#{dim}'), 1, 8)) AS BIGINT)"
            f" % {EVAL_MOD} - {EVAL_MOD // 2})"
        )

    def l1(o_expr: str) -> str:
        return " + ".join(
            f"ABS({dv('subj', i)} + {dv(chr(39) + 'P|' + chr(39) + ' || pred', i)}"
            f" - {dv(o_expr, i)})"
            for i in range(EVAL_DIMS)
        )

    ks = ", ".join(str(k) for k in range(EVAL_K))
    hi = SPLIT_BUCKETS - 1
    return f"""
WITH trip AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)
), test AS (
  SELECT subj, pred, obj FROM trip
  WHERE CAST(('0x' || substr(md5(subj || '|' || pred || '|' || obj), 1, 8)) AS BIGINT)
        % {SPLIT_BUCKETS} = {hi}
), pool AS (
  SELECT ent, ROW_NUMBER() OVER (ORDER BY ent) - 1 AS idx
  FROM (SELECT DISTINCT subj AS ent FROM trip
        UNION SELECT DISTINCT obj FROM trip)
), cand AS (
  SELECT t.subj, t.pred, t.obj, p.ent AS neg_obj
  FROM (
    SELECT te.subj, te.pred, te.obj,
           CAST(('0x' || substr(md5(te.subj || '|' || te.pred || '|' || te.obj
                                || '|E|' || CAST(u.k AS VARCHAR)), 1, 8)) AS BIGINT)
             % (SELECT COUNT(*) FROM pool) AS idx
    FROM test te CROSS JOIN (SELECT unnest([{ks}]) AS k) u
  ) t
  JOIN pool p ON t.idx = p.idx
), kept AS (
  SELECT c.subj, c.pred, c.obj, c.neg_obj FROM cand c
  ANTI JOIN trip tr
    ON c.subj = tr.subj AND c.pred = tr.pred AND c.neg_obj = tr.obj
), scored AS (
  SELECT subj, pred, obj,
         {l1('neg_obj')} AS d_neg,
         {l1('obj')} AS d_true
  FROM kept
), per_neg AS (
  SELECT subj, pred, obj, CAST(COUNT(*) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN d_neg <= d_true THEN 1 ELSE 0 END) AS BIGINT) AS n_not_worse
  FROM scored GROUP BY subj, pred, obj
), ranked AS (
  SELECT te.pred,
         COALESCE(pn.n_neg, 0) AS n_neg,
         1 + COALESCE(pn.n_not_worse, 0) AS rank
  FROM test te
  LEFT JOIN per_neg pn
    ON te.subj = pn.subj AND te.pred = pn.pred AND te.obj = pn.obj
)
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg_eval,
       CAST(SUM(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits1,
       CAST(SUM({MRR_SCALE} // rank) AS BIGINT) AS mrr_x2520
FROM ranked GROUP BY pred ORDER BY pred
"""


EPOCH_GAMMA = 2000  # hinge margin; distances live in ~[0, 4*2000]
EPOCH_LR = 5        # integer learning rate — updates stay in BIGINT


def _dim_val_col(col: F.Column, dim: F.Column) -> F.Column:
    """_dim_val with a COLUMN dimension index (same hash text as the
    literal form: f'#{{dim}}' == '#' || dim)."""
    return F.pmod(
        _u32(F.concat(col, F.lit("#"), dim.cast("string"))), F.lit(EVAL_MOD)
    ) - F.lit(EVAL_MOD // 2)


def _isign(c: F.Column) -> F.Column:
    """Integer sign (Spark's signum returns DOUBLE — a float in the
    gradient path is exactly the cross-engine hazard this op avoids)."""
    return (
        F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1)).otherwise(F.lit(0))
        .cast("long")
    )


def kg_transe_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL-BATCH TransE training epoch (Bordes et al. 2013), bit-
    exact across engines: margin hinge L = max(0, γ + d(s,p,o) −
    d(s,p,o′)) over L1 distances, deterministic hash-initialized integer
    embeddings (the same ``_dim_val`` vectors ``kg_transe_mrr`` scores
    with), one uniformly-corrupted tail per triple (salt 'T', same
    index arithmetic as kg_negative_samples), subgradient signs in
    {{-1,0,1}}, and an integer SGD step e ← e − LR·∂L/∂e with no
    normalization.  Everything — distances, hinges, gradients, updated
    losses — is BIGINT, so the DuckDB oracle replays the entire epoch
    and must agree to the last unit.

    Output per predicate: triple count, margin-violating count and total
    hinge loss BEFORE the step, the same AFTER the step, and a checksum
    over the applied update magnitudes.  (A training step that silently
    stopped updating, mis-signed a gradient, or double-applied a delta
    flips at least one column.)

    Scale shape — the canonical data-parallel SGD epoch: the forward
    pass is stateless per-row expressions riding the triple scan; the
    gradient all-reduce is ONE partial-aggregated groupBy on (parameter,
    dim) — the shuffle carries O(model) not O(data); the updated model
    is broadcast back for the after-loss pass (model tables outgrow a
    broadcast only past ~10^8 entities, where the same plan becomes a
    range-partitioned equi-join).  No Python in the loop."""
    trip = _distinct_triples(spark, sf_dir)
    ents = (
        trip.select(F.col("subj").alias("ent"))
        .unionByName(trip.select(F.col("obj").alias("ent")))
        .dropDuplicates()
    )
    pool = ents.withColumn("idx", F.row_number().over(Window.orderBy("ent")) - 1)
    pool_n = pool.agg(F.count(F.lit(1)).cast("long").alias("pool_n"))
    tn = (
        trip.crossJoin(F.broadcast(pool_n))
        .withColumn(
            "idx",
            F.pmod(
                _u32(F.concat_ws("|", "subj", "pred", "obj", F.lit("T"))),
                F.col("pool_n"),
            ),
        )
        .join(F.broadcast(pool.select("idx", F.col("ent").alias("neg_obj"))), "idx")
        .select("subj", "pred", "obj", "neg_obj")
    )
    pcol = F.concat(F.lit("P|"), F.col("pred"))
    d_pos = _l1_distance("subj", "pred", "obj")
    terms_neg = [
        F.abs(
            _dim_val(F.col("subj"), i)
            + _dim_val(F.concat(F.lit("P|"), F.col("pred")), i)
            - _dim_val(F.col("neg_obj"), i)
        )
        for i in range(EVAL_DIMS)
    ]
    d_neg = terms_neg[0]
    for t in terms_neg[1:]:
        d_neg = d_neg + t
    scored = tn.select(
        "subj", "pred", "obj", "neg_obj",
        d_pos.alias("d_pos"), d_neg.cast("long").alias("d_neg"),
    ).withColumn(
        "active",
        (F.lit(EPOCH_GAMMA) + F.col("d_pos") - F.col("d_neg") > 0),
    ).localCheckpoint()

    # per-dim subgradient signs on the ACTIVE triples, fanned out to the
    # four parameter roles, then the (parameter, dim) all-reduce
    gp = [
        _isign(
            _dim_val(F.col("subj"), i) + _dim_val(pcol, i)
            - _dim_val(F.col("obj"), i)
        )
        for i in range(EVAL_DIMS)
    ]
    gn = [
        _isign(
            _dim_val(F.col("subj"), i) + _dim_val(pcol, i)
            - _dim_val(F.col("neg_obj"), i)
        )
        for i in range(EVAL_DIMS)
    ]
    lr = F.lit(EPOCH_LR)
    act = scored.where("active")
    role_frames = [
        act.select(F.col("subj").alias("key"),
                   F.array(*[(-lr * (gp[i] - gn[i])) for i in range(EVAL_DIMS)])
                   .alias("delta")),
        act.select(pcol.alias("key"),
                   F.array(*[(-lr * (gp[i] - gn[i])) for i in range(EVAL_DIMS)])
                   .alias("delta")),
        act.select(F.col("obj").alias("key"),
                   F.array(*[(lr * gp[i]) for i in range(EVAL_DIMS)])
                   .alias("delta")),
        act.select(F.col("neg_obj").alias("key"),
                   F.array(*[(-lr * gn[i]) for i in range(EVAL_DIMS)])
                   .alias("delta")),
    ]
    roles = role_frames[0]
    for rf in role_frames[1:]:
        roles = roles.unionByName(rf)
    upd = (
        roles.select("key", F.posexplode("delta").alias("dim", "dv"))
        .groupBy("key", "dim")
        .agg(F.sum("dv").cast("long").alias("ddelta"))
        # referenced FIVE times below (four per-role broadcast builds +
        # the update-magnitude checksum); without the checkpoint each
        # broadcast build re-ran the whole gradient all-reduce. Lazy —
        # the first broadcast build materializes+persists it.
        .localCheckpoint(eager=False)
    )

    # after-loss pass: (triple, dim) grid, model deltas broadcast back in
    dims = F.array(*[F.lit(i) for i in range(EVAL_DIMS)])
    grid = scored.select(
        "subj", "pred", "obj", "neg_obj", "d_pos", "d_neg", "active",
        F.explode(dims).alias("dim"),
    )
    g = grid
    for role, key_expr in [
        ("s", F.col("subj")), ("p", pcol), ("o", F.col("obj")),
        ("n", F.col("neg_obj")),
    ]:
        u = F.broadcast(
            upd.select(F.col("key").alias(f"{role}_key"),
                       F.col("dim").alias(f"{role}_dim"),
                       F.col("ddelta").alias(f"{role}_d"))
        )
        g = g.join(
            u,
            (key_expr == F.col(f"{role}_key")) & (F.col("dim") == F.col(f"{role}_dim")),
            "left",
        ).drop(f"{role}_key", f"{role}_dim")
    zero = F.lit(0).cast("long")
    h2 = _dim_val_col(F.col("subj"), F.col("dim")) + F.coalesce("s_d", zero)
    r2 = _dim_val_col(pcol, F.col("dim")) + F.coalesce("p_d", zero)
    t2 = _dim_val_col(F.col("obj"), F.col("dim")) + F.coalesce("o_d", zero)
    n2 = _dim_val_col(F.col("neg_obj"), F.col("dim")) + F.coalesce("n_d", zero)
    per2 = (
        g.select(
            "subj", "pred", "obj", "d_pos", "d_neg", "active",
            F.abs(h2 + r2 - t2).alias("c_pos"),
            F.abs(h2 + r2 - n2).alias("c_neg"),
        )
        .groupBy("subj", "pred", "obj", "d_pos", "d_neg", "active")
        .agg(F.sum("c_pos").cast("long").alias("d_pos2"),
             F.sum("c_neg").cast("long").alias("d_neg2"))
    )
    hinge_b = F.greatest(zero, F.lit(EPOCH_GAMMA) + F.col("d_pos") - F.col("d_neg"))
    hinge_a = F.greatest(zero, F.lit(EPOCH_GAMMA) + F.col("d_pos2") - F.col("d_neg2"))
    upd_cks = upd.agg(
        F.coalesce(F.sum(F.abs("ddelta")), zero).cast("long").alias("upd_l1")
    )
    return (
        per2.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.sum(F.col("active").cast("int")).cast("long").alias("n_active"),
            F.sum(hinge_b).cast("long").alias("loss_before"),
            F.sum((hinge_a > 0).cast("int")).cast("long").alias("n_active_after"),
            F.sum(hinge_a).cast("long").alias("loss_after"),
        )
        .crossJoin(F.broadcast(upd_cks))
        .orderBy("pred")
    )


def _transe_epoch_sql() -> str:
    from .queries import _GOLDEN_EDGES

    def dv(expr: str) -> str:
        # per-dim value with the CTE's dim column in scope
        return (
            f"(CAST(('0x' || substr(md5({expr} || '#' || CAST(dim AS VARCHAR)),"
            f" 1, 8)) AS BIGINT) % {EVAL_MOD} - {EVAL_MOD // 2})"
        )

    def isign(x: str) -> str:
        return f"(CASE WHEN {x} > 0 THEN 1 WHEN {x} < 0 THEN -1 ELSE 0 END)"

    p_expr = "'P|' || pred"
    return f"""
WITH trip AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)
), pool AS (
  SELECT ent, ROW_NUMBER() OVER (ORDER BY ent) - 1 AS idx
  FROM (SELECT DISTINCT subj AS ent FROM trip
        UNION SELECT DISTINCT obj FROM trip)
), tn AS (
  SELECT t.subj, t.pred, t.obj, p.ent AS neg_obj
  FROM (
    SELECT subj, pred, obj,
           CAST(('0x' || substr(md5(subj || '|' || pred || '|' || obj || '|T'),
                 1, 8)) AS BIGINT) % (SELECT COUNT(*) FROM pool) AS idx
    FROM trip
  ) t JOIN pool p ON t.idx = p.idx
), dims AS (SELECT unnest(generate_series(0, {EVAL_DIMS - 1})) AS dim),
pd AS (
  SELECT tn.*, d.dim,
         {dv('subj')} AS h, {dv(p_expr)} AS r,
         {dv('obj')} AS t, {dv('neg_obj')} AS n
  FROM tn CROSS JOIN dims d
), per_trip AS (
  SELECT subj, pred, obj, neg_obj,
         CAST(SUM(ABS(h + r - t)) AS BIGINT) AS d_pos,
         CAST(SUM(ABS(h + r - n)) AS BIGINT) AS d_neg
  FROM pd GROUP BY 1, 2, 3, 4
), flag AS (
  SELECT *, ({EPOCH_GAMMA} + d_pos - d_neg > 0) AS active FROM per_trip
), gr AS (
  SELECT pd.*, {isign('h + r - t')} AS gpos, {isign('h + r - n')} AS gneg
  FROM pd JOIN flag USING (subj, pred, obj, neg_obj)
  WHERE flag.active
), upd AS (
  SELECT key, dim, CAST(SUM(delta) AS BIGINT) AS ddelta FROM (
    SELECT subj AS key, dim, -{EPOCH_LR} * (gpos - gneg) AS delta FROM gr
    UNION ALL SELECT {p_expr}, dim, -{EPOCH_LR} * (gpos - gneg) FROM gr
    UNION ALL SELECT obj, dim, {EPOCH_LR} * gpos FROM gr
    UNION ALL SELECT neg_obj, dim, -{EPOCH_LR} * gneg FROM gr
  ) GROUP BY key, dim
), pd2 AS (
  SELECT pd.subj, pd.pred, pd.obj, pd.neg_obj, pd.dim,
         pd.h + COALESCE(us.ddelta, 0) AS h2,
         pd.r + COALESCE(up.ddelta, 0) AS r2,
         pd.t + COALESCE(uo.ddelta, 0) AS t2,
         pd.n + COALESCE(un.ddelta, 0) AS n2
  FROM pd
  LEFT JOIN upd us ON us.key = pd.subj AND us.dim = pd.dim
  LEFT JOIN upd up ON up.key = 'P|' || pd.pred AND up.dim = pd.dim
  LEFT JOIN upd uo ON uo.key = pd.obj AND uo.dim = pd.dim
  LEFT JOIN upd un ON un.key = pd.neg_obj AND un.dim = pd.dim
), per2 AS (
  SELECT subj, pred, obj, neg_obj,
         CAST(SUM(ABS(h2 + r2 - t2)) AS BIGINT) AS d_pos2,
         CAST(SUM(ABS(h2 + r2 - n2)) AS BIGINT) AS d_neg2
  FROM pd2 GROUP BY 1, 2, 3, 4
), cks AS (
  SELECT CAST(COALESCE(SUM(ABS(ddelta)), 0) AS BIGINT) AS upd_l1 FROM upd
)
SELECT f.pred,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM(CASE WHEN f.active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(SUM(GREATEST(0, {EPOCH_GAMMA} + f.d_pos - f.d_neg)) AS BIGINT)
         AS loss_before,
       CAST(SUM(CASE WHEN {EPOCH_GAMMA} + p2.d_pos2 - p2.d_neg2 > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_active_after,
       CAST(SUM(GREATEST(0, {EPOCH_GAMMA} + p2.d_pos2 - p2.d_neg2)) AS BIGINT)
         AS loss_after,
       (SELECT upd_l1 FROM cks) AS upd_l1
FROM flag f
JOIN per2 p2 USING (subj, pred, obj, neg_obj)
GROUP BY f.pred ORDER BY f.pred
"""


KG_MLPREP_QUERIES: dict[str, tuple] = {
    "kg_edge_split": (kg_edge_split, _edge_split_sql()),
    "kg_negative_samples": (kg_negative_samples, _neg_samples_sql()),
    "kg_transe_mrr": (kg_transe_mrr, _transe_mrr_sql()),
    "kg_transe_epoch": (kg_transe_epoch, _transe_epoch_sql()),
}
