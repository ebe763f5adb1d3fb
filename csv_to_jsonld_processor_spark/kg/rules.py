"""Forward-chaining rule materialization (datalog-lite): a general
semi-naive engine over the triple table, generalizing the repo's
single-purpose closures (kg_type_inference's subclass loop,
kg_sparql_path_closure's single-predicate transitive closure,
kg_sameas_resolve's bounded chains) to an arbitrary RULE SET — the
OWL-RL/RDFS materialization shape every production KG store runs at
load time.

A rule is (body patterns → head templates) over (subj, pred, obj).
Evaluation is SEMI-NAIVE: each round, every body position is joined
once against the PREVIOUS ROUND'S DELTA and the rest against the full
graph (the Datalog delta decomposition), derived heads are
deduplicated and anti-joined against the known set, and the loop stops
at the empty-delta fixpoint.  Per-round localCheckpoint truncates the
growing lineage exactly as the repo's other iterative operators do
(operators/dedup.py connected components).  At 10^12 triples every
join in a round is an equi-join on a bound variable of a pred-pruned
scan — the same shuffle shape as the BGP compiler, repeated a
bounded-by-graph-diameter number of rounds.

Registered query ``kg_rule_closure`` materializes four interacting
rules — partner symmetry, worksFor→employs inverse, acquired
transitivity, and employs propagation through the acquisition
hierarchy ("the acquirer employs the subsidiary's staff") — and emits
per-predicate distinct-triple counts with an order-free checksum.  The
DuckDB oracle computes the same fixpoint CLOSED-FORM (WITH RECURSIVE
for the transitive part, joins for the rest) — two independent
evaluation strategies must land on the identical triple set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checksum import u32
from .bgp import TERMS, Pattern, Var, _pattern_df, _pattern_vars

EMPLOYS = TERMS + "employs"

# (name, body, head) — body patterns share variables; heads are
# templates over the body's variables (constants allowed)
Rule = tuple[str, list[Pattern], list[Pattern]]

RULES: list[Rule] = [
    ("partner_symmetric",
     [(Var("x"), TERMS + "partner", Var("y"))],
     [(Var("y"), TERMS + "partner", Var("x"))]),
    ("works_for_inverse",
     [(Var("p"), TERMS + "worksFor", Var("o"))],
     [(Var("o"), EMPLOYS, Var("p"))]),
    ("acquired_transitive",
     [(Var("x"), TERMS + "acquired", Var("y")),
      (Var("y"), TERMS + "acquired", Var("z"))],
     [(Var("x"), TERMS + "acquired", Var("z"))]),
    ("employs_through_acquisition",
     [(Var("q"), TERMS + "acquired", Var("o")),
      (Var("o"), EMPLOYS, Var("p"))],
     [(Var("q"), EMPLOYS, Var("p"))]),
]


def _join_body(sources: list[DataFrame], body: list[Pattern]) -> DataFrame:
    """Join body patterns left-to-right, pattern i scanning sources[i]
    (the semi-naive delta substitution point)."""
    acc = _pattern_df(sources[0], body[0])
    bound = set(_pattern_vars(body[0]))
    for src, pat in zip(sources[1:], body[1:]):
        shared = sorted(bound & set(_pattern_vars(pat)))
        if not shared:
            raise ValueError("disconnected rule body")
        acc = acc.join(_pattern_df(src, pat), on=shared, how="inner")
        bound |= set(_pattern_vars(pat))
    return acc


def _instantiate(sols: DataFrame, head: list[Pattern]) -> DataFrame:
    parts = []
    for s, p, o in head:
        parts.append(
            sols.select(
                (F.col(s.name) if isinstance(s, Var) else F.lit(s)).alias("subj"),
                (F.col(p.name) if isinstance(p, Var) else F.lit(p)).alias("pred"),
                (F.col(o.name) if isinstance(o, Var) else F.lit(o)).alias("obj"),
            )
        )
    acc = parts[0]
    for df in parts[1:]:
        acc = acc.unionByName(df)
    return acc


def _seminaive_loop(
    full: DataFrame,
    delta: DataFrame,
    rules: list[Rule],
    max_rounds: int,
    delta_is_full: bool,
) -> tuple[DataFrame, int]:
    """Run semi-naive rounds from a (full, delta) start state until the
    empty-delta fixpoint.  ``delta_is_full`` marks the cold start where
    delta == full, letting round 1 evaluate each rule once (every
    position substitution would be the identical full-graph join)."""
    for rounds in range(1, max_rounds + 1):
        parts = []
        for _name, body, head in rules:
            positions = [0] if (delta_is_full and rounds == 1) else range(len(body))
            for i in positions:
                srcs = [delta if j == i else full for j in range(len(body))]
                parts.append(_instantiate(_join_body(srcs, body), head))
        derived = parts[0]
        for df in parts[1:]:
            derived = derived.unionByName(df)
        delta = (
            derived.dropDuplicates()
            .join(full, on=["subj", "pred", "obj"], how="left_anti")
            .localCheckpoint()
        )
        if delta.isEmpty():
            return full, rounds
        full = full.unionByName(delta).localCheckpoint()
    raise RuntimeError(f"no fixpoint after {max_rounds} rounds")


def materialize_rules(
    graph: DataFrame, rules: list[Rule], max_rounds: int = 25
) -> tuple[DataFrame, int]:
    """Semi-naive fixpoint: returns (materialized distinct graph,
    rounds executed).  Raises if max_rounds is hit before the fixpoint
    (a diverging rule set is a modeling bug, not a bigger-budget ask)."""
    full = graph.select("subj", "pred", "obj").dropDuplicates().localCheckpoint()
    return _seminaive_loop(full, full, rules, max_rounds, delta_is_full=True)


def extend_rules(
    materialized: DataFrame,
    new_edges: DataFrame,
    rules: list[Rule],
    max_rounds: int = 25,
) -> tuple[DataFrame, int]:
    """INCREMENTAL insertion maintenance of a materialized closure: add
    a batch of new base edges and derive only what they imply.  The
    first delta is the genuinely-new edge set; every subsequent round
    is ordinary semi-naive — the already-materialized closure is never
    recomputed (the classic Datalog view-maintenance shortcut for
    insertions; DELETIONS are :func:`retract_rules`, the DRed
    over-delete/re-derive twin).  At 10^12 triples this is the
    difference between touching the whole store per crawl batch and
    touching O(|batch| × closure-fanout)."""
    base = materialized.select("subj", "pred", "obj")
    delta = (
        new_edges.select("subj", "pred", "obj")
        .dropDuplicates()
        .join(base, on=["subj", "pred", "obj"], how="left_anti")
        .localCheckpoint()
    )
    if delta.isEmpty():
        return materialized, 0
    full = base.unionByName(delta).localCheckpoint()
    return _seminaive_loop(full, delta, rules, max_rounds, delta_is_full=False)


_SPO = ["subj", "pred", "obj"]


def retract_rules(
    materialized: DataFrame,
    base: DataFrame,
    removed: DataFrame,
    rules: list[Rule],
    max_rounds: int = 25,
) -> DataFrame:
    """DELETION maintenance of a materialized closure — DRed
    (delete-and-re-derive, Gupta/Mumick/Subrahmanian):

    1. OVER-DELETE: starting from the retracted base facts, iteratively
       mark every triple with a derivation that uses a marked triple
       (delta-restricted semi-naive over the OLD store — each round
       joins one body position against the deletion delta).
    2. RE-DERIVE: rescue marked triples that still hold.  Surviving
       BASE facts are axioms — any of them caught in the over-delete
       sweep is rescued unconditionally first (the materialized store
       carries no provenance, so the base table must ride along as the
       axiom set).  Then marked triples with an alternative derivation
       from the surviving store are rescued: the first round is one
       full rule evaluation filtered to the marked set, later rounds
       delta-restricted to freshly rescued triples.

    A retracted base fact itself is rescuable only via a rule
    (retracting partner(a,b) while partner(b,a) survives re-derives
    it — Datalog view semantics).  Work is O(|affected| × fanout),
    never a full recompute; the registered query pins equality with the
    oracle's independent from-scratch closure of the surviving base."""
    full = materialized.select(*_SPO).dropDuplicates().localCheckpoint()
    removed = removed.select(*_SPO).dropDuplicates()
    d0 = removed.join(full, on=_SPO, how="left_semi").localCheckpoint()
    if d0.isEmpty():
        return full

    # --- phase 1: over-delete ------------------------------------------
    overdel, delta = d0, d0
    for _ in range(max_rounds):
        parts = []
        for _name, body, head in rules:
            for i in range(len(body)):
                srcs = [delta if j == i else full for j in range(len(body))]
                parts.append(_instantiate(_join_body(srcs, body), head))
        derived = parts[0]
        for df in parts[1:]:
            derived = derived.unionByName(df)
        delta = (
            derived.dropDuplicates()
            .join(full, on=_SPO, how="left_semi")  # only triples we hold
            .join(overdel, on=_SPO, how="left_anti")
            .localCheckpoint()
        )
        if delta.isEmpty():
            break
        overdel = overdel.unionByName(delta).localCheckpoint()
    else:
        raise RuntimeError(f"over-delete did not converge in {max_rounds} rounds")

    # --- phase 2: re-derive --------------------------------------------
    # axiom rescue: over-deleted but still-asserted base facts come back
    axioms = (
        base.select(*_SPO).dropDuplicates()
        .join(removed, on=_SPO, how="left_anti")
        .join(overdel, on=_SPO, how="left_semi")
        .localCheckpoint()
    )
    remaining = (
        full.join(overdel, on=_SPO, how="left_anti")
        .unionByName(axioms)
        .localCheckpoint()
    )
    cand = overdel.join(axioms, on=_SPO, how="left_anti").localCheckpoint()
    for round_i in range(max_rounds):
        parts = []
        for _name, body, head in rules:
            if round_i == 0:
                parts.append(
                    _instantiate(_join_body([remaining] * len(body), body), head)
                )
            else:
                for i in range(len(body)):
                    srcs = [delta if j == i else remaining for j in range(len(body))]
                    parts.append(_instantiate(_join_body(srcs, body), head))
        derived = parts[0]
        for df in parts[1:]:
            derived = derived.unionByName(df)
        delta = (
            derived.dropDuplicates()
            .join(cand, on=_SPO, how="left_semi")  # only rescuing marked ones
            .localCheckpoint()
        )
        if delta.isEmpty():
            return remaining
        remaining = remaining.unionByName(delta).localCheckpoint()
        cand = cand.join(delta, on=_SPO, how="left_anti").localCheckpoint()
    raise RuntimeError(f"re-derive did not converge in {max_rounds} rounds")


def kg_rule_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize RULES over the webtext KG's distinct triple set;
    per-predicate distinct-triple count + order-free checksum."""
    from .queries import kg_webtext_edges

    base = kg_webtext_edges(spark, sf_dir).select("subj", "pred", "obj")
    full, _rounds = materialize_rules(base, RULES)
    csum = u32(F.concat_ws("\x1f", "subj", "pred", "obj"))
    return (
        full.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.sum(csum).cast("long").alias("checksum"),
        )
        .orderBy("pred")
    )


def _closure_ctes(base: str, sfx: str) -> str:
    """The closed-form fixpoint of RULES over base table ``base`` as a
    CTE chain; every CTE name carries ``sfx`` so two closures can live
    in one statement (the incremental query needs base-only and full)."""
    return f"""acq{sfx} AS (SELECT subj, obj FROM {base} WHERE pred = '{TERMS}acquired'),
tc{sfx} AS (
  WITH RECURSIVE r(subj, obj) AS (
    SELECT subj, obj FROM acq{sfx}
    UNION
    SELECT r.subj, a.obj FROM r JOIN acq{sfx} a ON r.obj = a.subj
  ) SELECT * FROM r
),
partner_all{sfx} AS (
  SELECT subj, obj FROM {base} WHERE pred = '{TERMS}partner'
  UNION
  SELECT obj, subj FROM {base} WHERE pred = '{TERMS}partner'
),
employs_base{sfx} AS (
  SELECT obj AS subj, subj AS obj FROM {base} WHERE pred = '{TERMS}worksFor'
),
employs_all{sfx} AS (
  SELECT subj, obj FROM employs_base{sfx}
  UNION
  SELECT t.subj, eb.obj FROM tc{sfx} t JOIN employs_base{sfx} eb ON t.obj = eb.subj
),
closed{sfx} AS (
  SELECT subj, pred, obj FROM {base}
  WHERE pred NOT IN ('{TERMS}partner', '{TERMS}acquired')
  UNION SELECT subj, '{TERMS}partner', obj FROM partner_all{sfx}
  UNION SELECT subj, '{TERMS}acquired', obj FROM tc{sfx}
  UNION SELECT subj, '{EMPLOYS}', obj FROM employs_all{sfx}
)"""


def _rule_closure_sql() -> str:
    from .queries import _GOLDEN_EDGES

    return f"""
WITH e AS (SELECT DISTINCT subj, pred, obj
           FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
{_closure_ctes("e", "")}
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM(CAST(('0x' || substr(md5(subj || chr(31) || pred || chr(31) || obj),
            1, 8)) AS BIGINT)) AS BIGINT) AS checksum
FROM closed GROUP BY pred ORDER BY pred
"""


def _delta_gate_spark() -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", "subj", "pred", "obj")), 1, 4),
            16, 10,
        ).cast("long") % 10
    ) == 0


def kg_rule_closure_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental insertion maintenance, audited against full
    recompute: ~10% of the distinct base edges (md5 gate) arrive as a
    late batch.  The closure of the 90% is materialized, then
    :func:`extend_rules` folds the batch in — deriving only from the
    delta — and the per-predicate (n_total, checksum, n_new) of the
    final store must equal the ORACLE'S independent full-recompute
    closure (monotone Datalog: n_new = full − base-closure counts).
    A wrong incremental shortcut (missing a delta⋈old derivation)
    leaves n_total short and flips the hash."""
    from .queries import kg_webtext_edges

    distinct = (
        kg_webtext_edges(spark, sf_dir).select("subj", "pred", "obj").dropDuplicates()
    )
    gate = _delta_gate_spark()
    base = distinct.where(~gate)
    late = distinct.where(gate)
    m_base, _ = materialize_rules(base, RULES)
    final, _ = extend_rules(m_base, late, RULES)
    new = final.join(m_base, on=["subj", "pred", "obj"], how="left_anti")
    totals = final.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(u32(F.concat_ws("\x1f", "subj", "pred", "obj")))
        .cast("long").alias("checksum"),
    )
    news = new.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    return (
        totals.join(news, "pred", "left")
        .na.fill({"n_new": 0})
        .select("pred", "n_total", "checksum", "n_new")
        .orderBy("pred")
    )


def _rule_closure_incremental_sql() -> str:
    from .queries import _GOLDEN_EDGES

    return f"""
WITH e AS (SELECT DISTINCT subj, pred, obj
           FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
eb AS (
  SELECT * FROM e
  WHERE (CAST(('0x' || substr(md5(subj || chr(31) || pred || chr(31) || obj),
         1, 4)) AS BIGINT) % 10) <> 0
),
{_closure_ctes("e", "")},
{_closure_ctes("eb", "_b")}
SELECT f.pred,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CAST(('0x' || substr(md5(f.subj || chr(31) || f.pred || chr(31)
            || f.obj), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
       CAST(COUNT(*) - COALESCE(MAX(b.n), 0) AS BIGINT) AS n_new
FROM closed f
LEFT JOIN (SELECT pred, COUNT(*) AS n FROM closed_b GROUP BY pred) b
       ON f.pred = b.pred
GROUP BY f.pred ORDER BY f.pred
"""


def kg_rule_closure_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRed deletion maintenance, audited against full recompute: the
    SAME ~10% md5-gated edge batch the incremental query inserts is
    here RETRACTED from the full materialized closure.  Over-delete
    marks everything those edges supported; re-derive rescues triples
    with surviving alternative derivations (e.g. a symmetric partner
    edge whose mirror is still asserted).  Output per predicate:
    surviving count + checksum + net-removed count — all of which must
    equal the oracle's independent from-scratch closure of the 90%
    base.  A missing rescue leaves n_total short; a missed over-delete
    leaves it long; either flips the hash."""
    from .queries import kg_webtext_edges

    distinct = (
        kg_webtext_edges(spark, sf_dir).select("subj", "pred", "obj").dropDuplicates()
    )
    gate = _delta_gate_spark()
    full_closure, _ = materialize_rules(distinct, RULES)
    final = retract_rules(full_closure, distinct, distinct.where(gate), RULES)
    gone = full_closure.join(final, on=_SPO, how="left_anti")
    totals = final.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(u32(F.concat_ws("\x1f", "subj", "pred", "obj")))
        .cast("long").alias("checksum"),
    )
    removed = gone.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed")
    )
    return (
        totals.join(removed, "pred", "left")
        .na.fill({"n_removed": 0})
        .select("pred", "n_total", "checksum", "n_removed")
        .orderBy("pred")
    )


def _rule_closure_retract_sql() -> str:
    from .queries import _GOLDEN_EDGES

    return f"""
WITH e AS (SELECT DISTINCT subj, pred, obj
           FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
eb AS (
  SELECT * FROM e
  WHERE (CAST(('0x' || substr(md5(subj || chr(31) || pred || chr(31) || obj),
         1, 4)) AS BIGINT) % 10) <> 0
),
{_closure_ctes("e", "")},
{_closure_ctes("eb", "_b")}
SELECT b.pred,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CAST(('0x' || substr(md5(b.subj || chr(31) || b.pred || chr(31)
            || b.obj), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
       CAST(COALESCE(MAX(f.n), 0) - COUNT(*) AS BIGINT) AS n_removed
FROM closed_b b
LEFT JOIN (SELECT pred, COUNT(*) AS n FROM closed GROUP BY pred) f
       ON b.pred = f.pred
GROUP BY b.pred ORDER BY b.pred
"""


KG_RULE_QUERIES: dict[str, tuple] = {
    "kg_rule_closure": (kg_rule_closure, _rule_closure_sql()),
    "kg_rule_closure_incremental": (
        kg_rule_closure_incremental,
        _rule_closure_incremental_sql(),
    ),
    "kg_rule_closure_retract": (
        kg_rule_closure_retract,
        _rule_closure_retract_sql(),
    ),
}
