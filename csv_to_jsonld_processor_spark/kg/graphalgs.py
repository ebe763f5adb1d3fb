"""Distributed graph algorithms over the KG's materialized edge tables
— the analytics layer a KG-construction pipeline feeds (reference
analog: the emitted triple graph of csv-to-jsonld's instance output;
here the graphs are the purchase bipartite graph and the nation-level
trade rollup so the DuckDB gate can check every value exactly).

Three classic algorithms, each expressed so the fixed-iteration loop is
EXACT cross-engine (integer/set arithmetic only — no float accumulation
order to diverge):

- ``kg_bfs_distance``: multi-source BFS shortest hop counts. Each round
  is one equi-join of the current distance table against the adjacency
  list plus a min-groupBy — the canonical Pregel superstep as DataFrame
  algebra. Distances are INTs, so min-merge is order-free.
- ``kg_hits``: HITS hubs/authorities on the directed customer→part
  graph in UNNORMALIZED integer form: with hub₀ ≡ 1, every subsequent
  auth/hub score is a pure BIGINT sum — bit-exact on every engine — and
  per-iteration normalization (a float hazard) is deferred to the final
  ranking, which only needs relative order. Rounds are kept small
  because unnormalized scores grow like deg^(2k).
- ``kg_scc``: strongly connected components of the nation trade graph
  via transitive-closure squaring (R ∪ R∘R, {SCC_SQUARINGS} doublings
  covers any path up to 2^{SCC_SQUARINGS} hops > |nations|); SCC id of
  v is min{{w : v→*w and w→*v}}. Sets under DISTINCT are exact.

Scale notes (the 100 TB story): BFS and HITS supersteps keep both join
sides hash-partitioned on the vertex key, so after the first exchange
each round shuffles only the frontier/score table, never the adjacency;
``localCheckpoint`` truncates the per-round lineage exactly like the
PageRank loop (kg/queries.py:199). Closure-squaring is reserved for
label-level graphs whose closure is bounded by |labels|² (here 25
nations — the nation rollup of the entity graph); a 10^12-vertex entity
graph would use FW-BW pivot decomposition with these same BFS
supersteps as its inner primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .queries import KCORE_QTY, _purchase_edges

BFS_ROUNDS = 6
BFS_SEED_MOD = 97
HITS_ITERS = 2  # unnormalized scores grow ~deg^(2k); 2 keeps BIGINT headroom
HITS_TOPN = 10
SCC_QTY = 46
SCC_SQUARINGS = 5

# The purchase-graph edge set as SQL, identical to _purchase_edges
# (kg/queries.py:914) — shared by the BFS and HITS oracles.
_EDGE_SQL = f"""
  SELECT DISTINCT 'c' || o.o_custkey AS a, 'p' || l.l_partkey AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= {KCORE_QTY}"""

_SEED_PRED = f"substring(v, 1, 1) = 'c' AND CAST(substring(v, 2) AS BIGINT) % {BFS_SEED_MOD} = 0"


def kg_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: hop distance from the seed set (customers with
    custkey ≡ 0 mod {BFS_SEED_MOD}) to every vertex of the purchase
    graph, {BFS_ROUNDS} supersteps, unreached vertices reported at
    distance -1. Output: (side, dist, n_vertices) histogram.

    Per round: ONE equi-join (distance table probing adjacency on the
    src key) + ONE min-groupBy on the destination — both partial-
    aggregated; the distance table is the only thing that moves. The
    round count bounds the result independent of cluster size, and INT
    min is order-free, so the histogram is exact on any partitioning.
    """
    # checkpoint the edge list, not the symmetrized adjacency: the union
    # references e on BOTH branches and Spark does not share identical
    # subtrees, so without this the scan+join+distinct ran twice inside
    # the adjacency job; adj is a narrow union over the persisted blocks
    e = _purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    )
    verts = adj.select(F.col("src").alias("v")).distinct().localCheckpoint()
    dist = verts.where(F.expr(_SEED_PRED)).withColumn("d", F.lit(0))
    for _ in range(BFS_ROUNDS):
        hop = (
            adj.join(dist, adj.src == dist.v)
            .select(F.col("dst").alias("v"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(hop).groupBy("v").agg(F.min("d").alias("d")).localCheckpoint()
        )
    full = verts.join(dist, "v", "left").select(
        "v", F.coalesce(F.col("d"), F.lit(-1)).alias("d")
    )
    return (
        full.groupBy(
            F.substring("v", 1, 1).alias("side"), F.col("d").cast("int").alias("dist")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        .orderBy("side", "dist")
    )


def _bfs_sql() -> str:
    parts = [f"""
WITH e0 AS MATERIALIZED ({_EDGE_SQL}),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj),
d0 AS MATERIALIZED (SELECT v, 0 AS d FROM verts WHERE {_SEED_PRED})"""]
    for r in range(1, BFS_ROUNDS + 1):
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT v, MIN(d) AS d FROM (
    SELECT v, d FROM d{r-1}
    UNION ALL
    SELECT adj.dst AS v, p.d + 1 AS d FROM d{r-1} p JOIN adj ON adj.src = p.v
  ) GROUP BY v)""")
    parts.append(f"""
SELECT substring(v, 1, 1) AS side, CAST(d AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM (
  SELECT verts.v, COALESCE(d{BFS_ROUNDS}.d, -1) AS d
  FROM verts LEFT JOIN d{BFS_ROUNDS} ON verts.v = d{BFS_ROUNDS}.v
) GROUP BY 1, 2 ORDER BY side, dist""")
    return "".join(parts)


KG_BFS_SQL = _bfs_sql()


def kg_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the directed customer→part purchase graph, {HITS_ITERS}
    full iterations in unnormalized BIGINT arithmetic (hub₀ ≡ 1;
    auth_k(p) = Σ_in hub_{{k-1}}, hub_k(c) = Σ_out auth_k): customers
    are hubs, parts authorities. The top-{HITS_TOPN} of each role by
    final score (ties broken by vertex id) — relative order is all the
    ranking needs, so the float normalization step of textbook HITS is
    dropped and every engine computes identical integers.

    Per half-iteration: ONE equi-join + ONE partial-aggregated sum-
    groupBy, score table moving, adjacency static — identical shuffle
    shape to the BFS superstep."""
    e = _purchase_edges(spark, sf_dir).localCheckpoint()
    hub = e.select(F.col("a").alias("v")).distinct().withColumn("s", F.lit(1).cast("long"))
    for _ in range(HITS_ITERS):
        auth = (
            e.join(hub, e.a == hub.v)
            .groupBy(F.col("b").alias("v"))
            .agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint()
        )
        hub = (
            e.join(auth, e.b == auth.v)
            .groupBy(F.col("a").alias("v"))
            .agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint()
        )
    from pyspark.sql import Window

    ranked = (
        hub.withColumn("role", F.lit("hub"))
        .unionByName(auth.withColumn("role", F.lit("authority")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("role").orderBy(F.desc("s"), F.asc("v"))
            ),
        )
        .where(F.col("rank") <= HITS_TOPN)
    )
    return ranked.select(
        "role", F.col("rank").cast("int").alias("rank"), F.col("v").alias("vertex"),
        F.col("s").alias("score"),
    ).orderBy("role", "rank")


def _hits_sql() -> str:
    parts = [f"""
WITH e0 AS MATERIALIZED ({_EDGE_SQL}),
hub0 AS MATERIALIZED (SELECT DISTINCT a AS v, CAST(1 AS BIGINT) AS s FROM e0)"""]
    for k in range(1, HITS_ITERS + 1):
        parts.append(f""",
auth{k} AS MATERIALIZED (
  SELECT e0.b AS v, CAST(SUM(h.s) AS BIGINT) AS s
  FROM e0 JOIN hub{k-1} h ON e0.a = h.v GROUP BY e0.b),
hub{k} AS MATERIALIZED (
  SELECT e0.a AS v, CAST(SUM(a2.s) AS BIGINT) AS s
  FROM e0 JOIN auth{k} a2 ON e0.b = a2.v GROUP BY e0.a)""")
    parts.append(f"""
SELECT role, CAST(rank AS INT) AS rank, vertex, score FROM (
  SELECT role, v AS vertex, s AS score,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY s DESC, v ASC) AS rank
  FROM (
    SELECT 'hub' AS role, v, s FROM hub{HITS_ITERS}
    UNION ALL
    SELECT 'authority' AS role, v, s FROM auth{HITS_ITERS}
  )
) WHERE rank <= {HITS_TOPN} ORDER BY role, rank""")
    return "".join(parts)


KG_HITS_SQL = _hits_sql()


def kg_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the nation-level trade graph
    (edge: supplier's nation → customer's nation for any lineitem with
    l_quantity >= {SCC_QTY}). Transitive closure by {SCC_SQUARINGS}
    squarings R ← R ∪ R∘R (path length 2^{SCC_SQUARINGS} = 32 > 25
    nations, so the closure is complete, not approximately converged);
    SCC id of v = min{{w : v→*w ∧ w→*v}} with v counted as reaching
    itself. Output: one row per component with its size and the sorted
    member list.

    The edge rollup itself is the KG shape: a four-way join
    (lineitem→orders→customer, lineitem→supplier, each →nation) where
    the three dimension sides broadcast, then DISTINCT onto ≤ 25² label
    pairs — the closure never touches more than |labels|² rows no
    matter the corpus size. Entity-level SCC at 10^12 vertices would
    use FW-BW pivot decomposition built on the kg_bfs_distance
    superstep instead."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(F.col("l_quantity") >= SCC_QTY).select(
        "l_orderkey", "l_suppkey"
    )
    cust_nation = (
        t["orders"].select("o_orderkey", "o_custkey")
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", F.col("n_name").alias("dst"))
    )
    supp_nation = (
        F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("src"))
    )
    edges = (
        li.join(cust_nation, li.l_orderkey == cust_nation.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select("src", "dst")
        .distinct()
        # deterministic 1/16 edge thinning: the raw trade rollup is near-
        # complete (one giant SCC — degenerate), and md5 is engine-shared
        .where(F.expr("substring(md5(concat(src, '>', dst)), 1, 1) = '0'"))
        # referenced three times below (node union branches + closure
        # seed); lazy checkpoint so the 4-way rollup join runs once
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("u")).unionAll(edges.select("dst")).distinct()
    )
    reach = edges.select(F.col("src").alias("u"), F.col("dst").alias("w")).unionAll(
        nodes.select("u", F.col("u").alias("w"))
    ).distinct().localCheckpoint()
    for _ in range(SCC_SQUARINGS):
        sq = (
            reach.alias("l")
            .join(reach.alias("r"), F.col("l.w") == F.col("r.u"))
            .select(F.col("l.u").alias("u"), F.col("r.w").alias("w"))
        )
        reach = reach.unionAll(sq).distinct().localCheckpoint()
    mutual = (
        reach.alias("f")
        .join(
            reach.alias("b"),
            (F.col("f.u") == F.col("b.w")) & (F.col("f.w") == F.col("b.u")),
        )
        .select(F.col("f.u").alias("u"), F.col("f.w").alias("w"))
    )
    comp = mutual.groupBy("u").agg(F.min("w").alias("scc_id"))
    return (
        comp.groupBy("scc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("u")), ",").alias("members"),
        )
        .orderBy("scc_id")
    )


def _scc_sql() -> str:
    parts = [f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT ns.n_name AS src, nc.n_name AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE l.l_quantity >= {SCC_QTY}
),
thinned AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE substring(md5(src || '>' || dst), 1, 1) = '0'
),
nodes AS MATERIALIZED (SELECT DISTINCT u FROM (SELECT src AS u FROM thinned UNION ALL SELECT dst FROM thinned)),
r0 AS MATERIALIZED (
  SELECT DISTINCT u, w FROM (
    SELECT src AS u, dst AS w FROM thinned UNION ALL SELECT u, u FROM nodes
  ))"""]
    for k in range(1, SCC_SQUARINGS + 1):
        parts.append(f""",
r{k} AS MATERIALIZED (
  SELECT DISTINCT u, w FROM (
    SELECT u, w FROM r{k-1}
    UNION ALL
    SELECT l.u, r.w FROM r{k-1} l JOIN r{k-1} r ON l.w = r.u
  ))""")
    parts.append(f""",
mutual AS (
  SELECT f.u, f.w FROM r{SCC_SQUARINGS} f JOIN r{SCC_SQUARINGS} b ON f.u = b.w AND f.w = b.u
),
comp AS (SELECT u, MIN(w) AS scc_id FROM mutual GROUP BY u)
SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(u, ',' ORDER BY u) AS members
FROM comp GROUP BY scc_id ORDER BY scc_id""")
    return "".join(parts)


KG_SCC_SQL = _scc_sql()


HB_K = 64        # bottom-k sketch size; rsd ~ 1/sqrt(k-2) ≈ 13%
HB_ROUNDS = 4    # ball radius — covers the purchase graph's short diameters
HB_SRC_MOD = 64  # md5 source sample the gate aggregates over (~V/64 sources)
HB_HSCALE = 1 << 52  # 52-bit vertex hashes; (k-1)*HSCALE stays in BIGINT


def _h52(c: F.Column) -> F.Column:
    """52-bit integer hash of a vertex id (md5 prefix)."""
    return F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("long")


def kg_hyperball_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function (Boldi & Vigna 2013) over the
    purchase graph, with BOTTOM-K (KMV) counters instead of HLL
    registers: per vertex, the k smallest 52-bit hashes of the vertices
    in its radius-r ball.  Each superstep merges every vertex's counter
    with its neighbors' — ``bottomk(∪ bottomk(..))`` — and because the
    bottom-k merge is LOSSLESS (the k smallest of a union are computable
    from the k smallest of each part), the distributed iteration yields
    EXACTLY the bottom-k of the true ball.  That choice upgrades the
    sketch gate from the ``within_tol`` pattern (operators/sketches.py:
    register-HLL estimates can never hash-match across engines) to a
    hash-EXACT one: the DuckDB oracle recomputes every sampled ball by
    recursive-CTE BFS, takes the same k-th smallest hash, applies the
    same integer estimator, and must agree to the last bit.

    Output per radius r = 0..{HB_ROUNDS}, aggregated over a
    deterministic md5-sampled source set (the full sketch state is
    maintained for ALL vertices — the sample only bounds the oracle's
    exact BFS): source count, estimated neighborhood function
    ``nf_est`` = Σ est|ball(v,r)| (exact size when the ball holds < k
    hashes, else the KMV estimator floor((k-1)·2^52 / h_k) in pure
    BIGINT arithmetic), how many balls were still exact, and a checksum
    over the h_k frontier hashes.

    Scale shape: per superstep ONE equi-join (adjacency probing the
    state table on the vertex key) + ONE partial-aggregated groupBy
    folding arrays — O((V+E)·k) state movement per round regardless of
    ball sizes, which is the entire reason HyperBall exists: exact ball
    materialization is O(Σ|ball|) ≈ O(V²) on a 10^12-edge graph, the
    sketch pass is linear.  ``localCheckpoint`` truncates per-round
    lineage exactly like BFS/PageRank above."""
    e = _purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    # narrow union over the lazily-persisted edge list (see
    # kg_bfs_distance on why e is checkpointed instead of adj)
    adj = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    state = (
        adj.select(F.col("src").alias("v")).distinct()
        .select("v", F.array(_h52(F.col("v"))).alias("sk"))
        .localCheckpoint()
    )
    is_src = (
        F.conv(F.substring(F.md5("v"), 1, 4), 16, 10).cast("long")
        % HB_SRC_MOD == 0
    )
    sz = F.size("sk")
    est = F.when(sz < HB_K, sz.cast("long")).otherwise(
        F.expr(f"CAST({(HB_K - 1) * HB_HSCALE} AS BIGINT)"
               f" DIV element_at(sk, {HB_K})")
    )
    hk = F.element_at("sk", HB_K)
    rounds = []
    for r in range(HB_ROUNDS + 1):
        if r > 0:
            msgs = adj.join(state, adj.dst == state.v).select(
                F.col("src").alias("v"), "sk"
            )
            state = (
                state.unionByName(msgs)
                .groupBy("v")
                .agg(
                    F.slice(
                        F.array_sort(
                            F.array_distinct(F.flatten(F.collect_list("sk")))
                        ),
                        1, HB_K,
                    ).alias("sk")
                )
                .localCheckpoint()
            )
        rounds.append(
            state.where(is_src)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_sources"),
                F.sum(est).cast("long").alias("nf_est"),
                F.sum((sz < HB_K).cast("int")).cast("long").alias("n_exact_balls"),
                F.sum(F.when(sz >= HB_K, hk).otherwise(F.lit(0)))
                .cast("long").alias("hk_checksum"),
            )
            .select(F.lit(r).cast("int").alias("r"), "*")
        )
    out = rounds[0]
    for df in rounds[1:]:
        out = out.unionByName(df)
    return out.orderBy("r")


KG_HYPERBALL_SQL = f"""
WITH RECURSIVE e0 AS MATERIALIZED ({_EDGE_SQL}),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj),
srcs AS MATERIALIZED (
  SELECT v FROM verts
  WHERE CAST(('0x' || substr(md5(v), 1, 4)) AS BIGINT) % {HB_SRC_MOD} = 0
),
reach(src, dst, d) AS (
  SELECT v, v, 0 FROM srcs
  UNION
  SELECT r.src, a.dst, r.d + 1
  FROM reach r JOIN adj a ON a.src = r.dst
  WHERE r.d < {HB_ROUNDS}
),
rad AS (SELECT unnest(generate_series(0, {HB_ROUNDS})) AS r),
hh AS (
  SELECT DISTINCT re.src, rad.r,
         CAST(('0x' || substr(md5(re.dst), 1, 13)) AS BIGINT) AS h
  FROM reach re JOIN rad ON re.d <= rad.r
),
ranked AS (
  SELECT src, r, h,
         ROW_NUMBER() OVER (PARTITION BY src, r ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY src, r) AS sz
  FROM hh
),
per_src AS (
  SELECT src, r, MAX(sz) AS sz,
         MAX(CASE WHEN rn = {HB_K} THEN h END) AS hk
  FROM ranked GROUP BY src, r
)
SELECT CAST(r AS INT) AS r,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(CASE WHEN sz < {HB_K} THEN sz
                ELSE {(HB_K - 1) * HB_HSCALE} // hk END) AS BIGINT) AS nf_est,
       CAST(SUM(CASE WHEN sz < {HB_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_balls,
       CAST(SUM(CASE WHEN sz >= {HB_K} THEN hk ELSE 0 END) AS BIGINT)
         AS hk_checksum
FROM per_src GROUP BY r ORDER BY r
"""


MIS_ROUNDS = 6  # Luby decides all but O(V/2^R) whp; leftovers REPORTED


def kg_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set by the deterministic-priority variant of
    Luby's algorithm (Luby 1986) on the purchase graph: each vertex
    draws a fixed md5 priority; per round, an undecided vertex joins
    the MIS iff its priority beats every undecided neighbor's, and MIS
    neighbors become excluded.  Fixed {MIS_ROUNDS} rounds — the expected
    undecided residue halves (better) per round; stragglers are
    REPORTED as undecided rather than resolved by a driver loop, so the
    operator is deterministic and both engines unroll identically.

    Output per vertex side: MIS size, excluded count, undecided count,
    and an order-free checksum over the MIS members.

    Scale shape (per round): ONE equi-join of the undecided-neighbor
    table against the undecided set + ONE min-groupBy (the priority
    floor per vertex), then two hash semi/anti-joins to retire decided
    vertices — the same superstep cost model as BFS above; priorities
    are recomputed expressions, never shuffled state.  MIS is the
    building block for distributed graph coloring and maximal matching;
    at 10^12 edges every step is still plain partial-aggregated joins
    on the vertex key."""
    e = _purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    # narrow union over the lazily-persisted edge list (see
    # kg_bfs_distance on why e is checkpointed instead of adj)
    adj = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    prio_src = F.md5(F.concat(F.lit("MIS|"), F.col("src")))
    und = adj.select(F.col("src").alias("v")).distinct().localCheckpoint()
    verts0 = und  # full vertex set, already checkpointed — reused for the
    # final state join instead of re-running the distinct over adj
    mis = und.limit(0)
    for _ in range(MIS_ROUNDS):
        nb_min = (
            adj.join(und.select(F.col("v").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.min(F.md5(F.concat(F.lit("MIS|"), F.col("dst")))).alias("nb_prio"))
        )
        # ONE left join decides the round: winners (beat every undecided
        # neighbor's priority) and non-winners split by flag from the
        # same checkpointed relation — the former und×new_mis anti-join
        # re-derived the split with an extra join per round
        decided = (
            und.join(nb_min, und.v == nb_min.src, "left")
            .select(
                "v",
                (
                    F.col("nb_prio").isNull()
                    | (F.md5(F.concat(F.lit("MIS|"), F.col("v"))) < F.col("nb_prio"))
                ).alias("win"),
            )
            .localCheckpoint()
        )
        new_mis = decided.where("win").select("v")
        # the accumulator is a union of narrow filters over checkpointed
        # round relations — no checkpoint needed (lineage stays shallow,
        # and the eager materialization job per round was pure overhead)
        mis = mis.unionByName(new_mis)
        # excl feeds only an anti-join, which ignores duplicates — no
        # distinct (one needless exchange per round)
        excl = (
            adj.join(new_mis.select(F.col("v").alias("src")), "src")
            .select(F.col("dst").alias("v"))
        )
        und = (
            decided.where(~F.col("win")).select("v")
            .join(excl, "v", "left_anti")
            # lazy: next round's decided-checkpoint (or the final state
            # join) materializes+persists it in the same job
            .localCheckpoint(eager=False)
        )
    state = (
        verts0.join(mis.withColumn("in_mis", F.lit(1)), "v", "left")
        .join(und.withColumn("undec", F.lit(1)), "v", "left")
    )
    u32 = F.conv(F.substring(F.md5("v"), 1, 8), 16, 10).cast("long")
    return (
        state.groupBy(F.substring("v", 1, 1).alias("side"))
        .agg(
            F.sum(F.coalesce("in_mis", F.lit(0))).cast("long").alias("n_mis"),
            F.sum(
                F.when(F.col("in_mis").isNull() & F.col("undec").isNull(), 1)
                .otherwise(0)
            ).cast("long").alias("n_excluded"),
            F.sum(F.coalesce("undec", F.lit(0))).cast("long").alias("n_undecided"),
            F.sum(F.when(F.col("in_mis") == 1, u32).otherwise(F.lit(0)))
            .cast("long").alias("mis_checksum"),
        )
        .orderBy("side")
    )


def _mis_sql() -> str:
    parts = [f"""
WITH e0 AS MATERIALIZED ({_EDGE_SQL}),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj),
und0 AS MATERIALIZED (SELECT v FROM verts),
mis0 AS MATERIALIZED (SELECT v FROM verts WHERE FALSE)"""]
    for r in range(1, MIS_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
nbmin{r} AS MATERIALIZED (
  SELECT a.src, MIN(md5('MIS|' || a.dst)) AS nb_prio
  FROM adj a JOIN und{p} u ON a.dst = u.v
  GROUP BY a.src
),
new{r} AS MATERIALIZED (
  SELECT u.v FROM und{p} u LEFT JOIN nbmin{r} n ON u.v = n.src
  WHERE n.nb_prio IS NULL OR md5('MIS|' || u.v) < n.nb_prio
),
mis{r} AS MATERIALIZED (SELECT v FROM mis{p} UNION ALL SELECT v FROM new{r}),
und{r} AS MATERIALIZED (
  SELECT u.v FROM und{p} u
  WHERE u.v NOT IN (SELECT v FROM new{r})
    AND u.v NOT IN (SELECT DISTINCT a.dst FROM adj a
                    JOIN new{r} nw ON a.src = nw.v)
)""")
    R = MIS_ROUNDS
    parts.append(f"""
SELECT substr(v.v, 1, 1) AS side,
       CAST(SUM(CASE WHEN m.v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
       CAST(SUM(CASE WHEN m.v IS NULL AND u.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_excluded,
       CAST(SUM(CASE WHEN u.v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_undecided,
       CAST(SUM(CASE WHEN m.v IS NOT NULL
                THEN CAST(('0x' || substr(md5(v.v), 1, 8)) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS mis_checksum
FROM verts v
LEFT JOIN mis{R} m ON v.v = m.v
LEFT JOIN und{R} u ON v.v = u.v
GROUP BY 1 ORDER BY side""")
    return "".join(parts)


KG_MIS_SQL = _mis_sql()


SSSP_ROUNDS = 6   # Bellman-Ford supersteps: exact ≤R-hop shortest distance
SSSP_WMOD = 9     # edge weights 1..9, md5-derived (deterministic attribute)


def kg_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source-set shortest paths by {SSSP_ROUNDS}
    Bellman-Ford supersteps over the purchase graph (integer edge
    weights 1..{SSSP_WMOD}, md5-derived per undirected edge — the
    deterministic stand-in for a cost attribute).  Distances after R
    rounds are the EXACT ≤R-hop shortest distances — a well-defined
    deterministic object both engines unroll identically, exactly like
    the BFS hop histogram above; unreached vertices report -1.

    Output: (side, dist, n_vertices) histogram — weighted distances
    spread into ~{SSSP_ROUNDS}×{SSSP_WMOD} buckets, so the histogram is
    a far sharper fingerprint of the relaxation than reach counts.

    Scale shape: identical to BFS — per round ONE equi-join (distance
    table probing adjacency) + ONE min-groupBy, INT min is order-free,
    only the frontier table moves; weights are recomputed expressions
    riding the join, never stored state."""
    e = _purchase_edges(spark, sf_dir)
    w = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 8), 16, 10
        ).cast("long") % SSSP_WMOD + 1
    )
    # lazy checkpoint of the weighted edge list: the union references
    # it on both branches (no shared-subtree reuse in Spark), so the
    # scan+join+distinct otherwise ran twice inside the adjacency job
    ew = e.select("a", "b", w.alias("w")).localCheckpoint(eager=False)
    adj = (
        ew.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionAll(ew.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
        .localCheckpoint()
    )
    verts = adj.select(F.col("src").alias("v")).distinct().localCheckpoint()
    dist = verts.where(F.expr(_SEED_PRED)).withColumn("d", F.lit(0).cast("long"))
    for _ in range(SSSP_ROUNDS):
        hop = (
            adj.join(dist, adj.src == dist.v)
            .select(F.col("dst").alias("v"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionByName(hop).groupBy("v").agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    full = verts.join(dist, "v", "left").select(
        "v", F.coalesce(F.col("d"), F.lit(-1)).alias("d")
    )
    return (
        full.groupBy(
            F.substring("v", 1, 1).alias("side"), F.col("d").cast("int").alias("dist")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        .orderBy("side", "dist")
    )


def _sssp_sql() -> str:
    w_sql = ("(CAST(('0x' || substr(md5(a || '|' || b), 1, 8)) AS BIGINT)"
             f" % {SSSP_WMOD} + 1)")
    parts = [f"""
WITH e0 AS MATERIALIZED ({_EDGE_SQL}),
ew AS MATERIALIZED (SELECT a, b, {w_sql} AS w FROM e0),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM ew UNION ALL SELECT b, a, w FROM ew
),
verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj),
d0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS d FROM verts WHERE {_SEED_PRED})"""]
    for r in range(1, SSSP_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT v, MIN(d) AS d FROM (
    SELECT v, d FROM d{p}
    UNION ALL
    SELECT a.dst AS v, dd.d + a.w AS d FROM adj a JOIN d{p} dd ON a.src = dd.v
  ) GROUP BY v
)""")
    parts.append(f"""
SELECT substr(vv.v, 1, 1) AS side,
       CAST(COALESCE(dd.d, -1) AS INT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM verts vv LEFT JOIN d{SSSP_ROUNDS} dd ON vv.v = dd.v
GROUP BY 1, 2 ORDER BY side, dist""")
    return "".join(parts)


KG_SSSP_SQL = _sssp_sql()


KTRUSS_K = 5       # keep edges in >= K-2 = 3 triangles
KTRUSS_ROUNDS = 4  # fixed peels; residue REPORTED per round, not looped
KTRUSS_DEG_CAP = 20  # contributor-degree cap on the projection (see doc)


def _copurchase_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part–part co-purchase graph: two parts adjacent iff some
    customer bought both (one-mode projection of the bipartite purchase
    graph).  Projections are the known quadratic hazard — a hub
    customer of degree d contributes d² pairs — so contributors above
    {KTRUSS_DEG_CAP} parts are dropped first (the standard basket-
    projection cap: a customer who buys everything carries no
    co-purchase signal).  Cost is then Σ min(deg, cap)², linear in
    customers at any scale."""
    # e feeds both the contributor-degree census and the capped join —
    # lazy checkpoint so the underlying scan+join+distinct runs once
    e = _purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    keep = (
        e.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= KTRUSS_DEG_CAP)
        .select("a")
    )
    capped = e.join(keep, "a")
    l = capped.select(F.col("a").alias("c"), F.col("b").alias("p1"))
    r = capped.select(F.col("a").alias("c"), F.col("b").alias("p2"))
    return (
        l.join(r, "c")
        .where(F.col("p1") < F.col("p2"))
        .select(F.col("p1").alias("a"), F.col("p2").alias("b"))
        .distinct()
    )


def _edge_support(und: DataFrame) -> DataFrame:
    """Triangles of the (a<b)-ordered edge set, projected back to
    per-edge support counts.  Edges in no triangle are absent."""
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])
    sides = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("sup"))


def kg_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KTRUSS_K}-truss decomposition (Cohen 2008; the GraphChallenge
    kernel) of the part–part co-purchase projection: iteratively delete
    every edge supported by fewer than {KTRUSS_K}-2 triangles.  Fixed
    {KTRUSS_ROUNDS} peels — the trajectory (edges, vertices, triangles
    per round) IS the output, so an unconverged residue is visible, not
    hidden behind a driver loop.

    Scale shape (per round): the triangle enumeration is the same
    ordered wedge join as kg_triangle_counts (degree orientation is the
    drop-in hub mitigation there; the capped projection already bounds
    degrees here), support is ONE partial-aggregated groupBy on the
    edge key, and the peel is an equi-join filter.  localCheckpoint
    truncates per-round lineage.  The projection input documents its
    own quadratic-hazard cap (see _copurchase_projection).

    Fixed-point short-circuit: the peel is a pure function of the edge
    set, so once a peel removes nothing (checked with the one-job
    count + double-xxhash64-fold set sketch from dedup's _cc_star) every
    later round's edge set, support table, and stats row are provably
    identical — the trajectory rows for the converged tail reuse the
    already-computed aggregates instead of re-enumerating triangles
    over an unchanged graph."""

    def _sketch(df: DataFrame) -> tuple:
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(0Y, a, b))").alias("h0"),
            F.expr("bit_xor(xxhash64(1Y, a, b))").alias("h1"),
        ).first()
        return (row["n"], row["h0"], row["h1"])

    # lazy checkpoints: the per-round sketch (und) and the next peel's
    # materialization (sup) compute+persist them without the extra
    # standalone job an eager checkpoint pays
    und = _copurchase_projection(spark, sf_dir).localCheckpoint(eager=False)
    sk_und = _sketch(und)
    rounds = []
    row_core = None
    converged = False
    for r in range(KTRUSS_ROUNDS + 1):
        if not converged:
            sup = _edge_support(und).localCheckpoint(eager=False)
            n_tri = sup.agg(
                (F.coalesce(F.sum("sup"), F.lit(0)) / 3).cast("long").alias("n_triangles")
            )
            verts = (
                und.select(F.col("a").alias("v"))
                .unionByName(und.select(F.col("b").alias("v")))
                .agg(F.countDistinct("v").cast("long").alias("n_vertices"))
            )
            row_core = (
                und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
                .crossJoin(F.broadcast(verts))
                .crossJoin(F.broadcast(n_tri))
            )
        rounds.append(row_core.select(F.lit(r).cast("int").alias("round"), "*"))
        if r < KTRUSS_ROUNDS and not converged:
            und = (
                und.join(sup, ["a", "b"])
                .where(F.col("sup") >= KTRUSS_K - 2)
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
            sk_new = _sketch(und)
            converged = sk_new == sk_und
            sk_und = sk_new
    out = rounds[0]
    for df in rounds[1:]:
        out = out.unionByName(df)
    return out.orderBy("round")


def _ktruss_sql() -> str:
    parts = [f"""
WITH pe AS MATERIALIZED ({_EDGE_SQL}),
keep AS (SELECT a FROM (SELECT a, COUNT(*) AS d FROM pe GROUP BY a)
         WHERE d <= {KTRUSS_DEG_CAP}),
cap AS MATERIALIZED (SELECT pe.a AS c, pe.b AS p FROM pe JOIN keep USING (a)),
e0 AS MATERIALIZED (
  SELECT DISTINCT l.p AS a, r.p AS b
  FROM cap l JOIN cap r ON l.c = r.c WHERE l.p < r.p
)"""]
    for r in range(KTRUSS_ROUNDS + 1):
        parts.append(f""",
tri{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e{r} e1 JOIN e{r} e2 ON e1.b = e2.a
  JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup{r} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS sup FROM (
    SELECT x AS a, y AS b FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r}
  ) GROUP BY a, b
),
stat{r} AS (
  SELECT {r} AS round,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
         (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) FROM
            (SELECT a AS v FROM e{r} UNION ALL SELECT b FROM e{r})) AS n_vertices,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM tri{r}) AS n_triangles
)""")
        if r < KTRUSS_ROUNDS:
            parts.append(f""",
e{r + 1} AS MATERIALIZED (
  SELECT s.a, s.b FROM sup{r} s WHERE s.sup >= {KTRUSS_K - 2}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST(round AS INT) AS round, n_edges, n_vertices, n_triangles"
        f" FROM stat{r}" for r in range(KTRUSS_ROUNDS + 1)
    )
    parts.append("\n" + sel + "\nORDER BY round")
    return "".join(parts)


KG_KTRUSS_SQL = _ktruss_sql()


BIPARTITE_ROUNDS = 6


def kg_bipartiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartiteness audit by BFS 2-coloring over BOTH standing graphs:
    the customer–part purchase graph (bipartite by construction — the
    audit must find ZERO conflicts) and its part–part co-purchase
    projection (odd triangles everywhere — conflicts must be plenty).
    Color = BFS parity from the md5-min root of each component region
    reached within {BIPARTITE_ROUNDS} supersteps; a conflict is an edge
    whose endpoints took equal parity.  Running the same operator over
    a known-bipartite and a known-odd-cycle graph makes the audit
    self-validating: a parity bug flips one of two opposite expected
    outcomes.

    Output per graph: reached vertex count, edges with both endpoints
    reached, conflict count, and a conflict checksum.

    Scale shape: the BFS superstep cost model (ONE equi-join + ONE
    min-groupBy per round); the conflict check is a single equi-join of
    the edge list against the final parity table.  The two graphs'
    audits share no state, so their superstep chains run from two
    driver threads (guide-style independent-job overlap): each graph's
    per-round jobs back-fill executors left idle by the other's
    stragglers instead of running strictly one after the other."""

    def _audit(gname: str, und: DataFrame) -> DataFrame:
        # checkpoint the EDGE LIST, not the symmetrized adjacency: und is
        # referenced again by the final conflict join, which otherwise
        # re-ran the whole projection build; adj is a narrow union over
        # the checkpointed blocks (no shuffle to recompute per use)
        und = und.localCheckpoint()
        adj = (
            und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        )
        # vertex set feeds both the min-md5 seed broadcast and the seed
        # join — checkpoint so the distinct runs once
        verts = adj.select(F.col("src").alias("v")).distinct().localCheckpoint()
        # SINGLE seed (global md5-min vertex): two seeds at odd distance
        # inside one component would 2-color a bipartite graph with
        # false conflicts — the audit colors one component from one root
        seeds = verts.join(
            F.broadcast(verts.agg(F.min(F.md5("v")).alias("mh"))),
            F.md5("v") == F.col("mh"),
        ).select("v")
        dist = seeds.withColumn("d", F.lit(0).cast("long"))
        for _ in range(BIPARTITE_ROUNDS):
            hop = (
                adj.join(dist, adj.src == dist.v)
                .select(F.col("dst").alias("v"), (F.col("d") + 1).alias("d"))
            )
            dist = (
                dist.unionByName(hop).groupBy("v").agg(F.min("d").alias("d"))
                .localCheckpoint()
            )
        pa = dist.select(F.col("v").alias("a"), (F.col("d") % 2).alias("pa"))
        pb = dist.select(F.col("v").alias("b"), (F.col("d") % 2).alias("pb"))
        checked = und.join(pa, "a").join(pb, "b")
        return (
            checked.agg(
                F.count(F.lit(1)).cast("long").alias("n_edges_checked"),
                F.sum((F.col("pa") == F.col("pb")).cast("int"))
                .cast("long").alias("n_conflicts"),
                F.sum(
                    F.when(
                        F.col("pa") == F.col("pb"),
                        F.conv(F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 8),
                               16, 10).cast("long"),
                    ).otherwise(F.lit(0))
                ).cast("long").alias("conflict_checksum"),
            )
            .crossJoin(
                F.broadcast(
                    dist.agg(F.count(F.lit(1)).cast("long").alias("n_reached"))
                )
            )
            .select(F.lit(gname).alias("graph"), "n_reached",
                    "n_edges_checked", "n_conflicts", "conflict_checksum")
        )

    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    graphs = (
        ("purchase_bipartite", _purchase_edges(spark, sf_dir)),
        ("copurchase_projection", _copurchase_projection(spark, sf_dir)),
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(inheritable_thread_target(spark)(_audit), g, u)
            for g, u in graphs
        ]
        results = [f.result() for f in futs]
    return results[0].unionByName(results[1]).orderBy("graph")


def _bipartite_sql() -> str:
    def rounds_sql(edges_cte: str, tag: str) -> str:
        parts = [f"""
adj_{tag} AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM {edges_cte}
  UNION ALL SELECT b, a FROM {edges_cte}
),
v_{tag} AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj_{tag}),
d0_{tag} AS MATERIALIZED (
  SELECT v, CAST(0 AS BIGINT) AS d FROM v_{tag}
  WHERE md5(v) = (SELECT MIN(md5(v)) FROM v_{tag})
)"""]
        for r in range(1, BIPARTITE_ROUNDS + 1):
            p = r - 1
            parts.append(f""",
d{r}_{tag} AS MATERIALIZED (
  SELECT v, MIN(d) AS d FROM (
    SELECT v, d FROM d{p}_{tag}
    UNION ALL
    SELECT a.dst, dd.d + 1 FROM adj_{tag} a JOIN d{p}_{tag} dd ON a.src = dd.v
  ) GROUP BY v
)""")
        return "".join(parts)

    R = BIPARTITE_ROUNDS

    def stat_sql(edges_cte: str, tag: str, gname: str) -> str:
        return f"""
SELECT '{gname}' AS graph,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d{R}_{tag}) AS n_reached,
       CAST(COUNT(*) AS BIGINT) AS n_edges_checked,
       CAST(SUM(CASE WHEN pa.d % 2 = pb.d % 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conflicts,
       CAST(SUM(CASE WHEN pa.d % 2 = pb.d % 2
                THEN CAST(('0x' || substr(md5(e.a || '|' || e.b), 1, 8)) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS conflict_checksum
FROM {edges_cte} e
JOIN d{R}_{tag} pa ON e.a = pa.v
JOIN d{R}_{tag} pb ON e.b = pb.v"""

    return f"""
WITH e_bi AS MATERIALIZED ({_EDGE_SQL}),
keep2 AS (SELECT a FROM (SELECT a, COUNT(*) AS d FROM e_bi GROUP BY a)
          WHERE d <= {KTRUSS_DEG_CAP}),
cap2 AS MATERIALIZED (SELECT e_bi.a AS c, e_bi.b AS p
                      FROM e_bi JOIN keep2 USING (a)),
e_pr AS MATERIALIZED (
  SELECT DISTINCT l.p AS a, r.p AS b
  FROM cap2 l JOIN cap2 r ON l.c = r.c WHERE l.p < r.p
),{rounds_sql('e_bi', 'bi')},{rounds_sql('e_pr', 'pr')}
{stat_sql('e_bi', 'bi', 'purchase_bipartite')}
UNION ALL
{stat_sql('e_pr', 'pr', 'copurchase_projection')}
ORDER BY graph
"""


KG_BIPARTITE_SQL = _bipartite_sql()


MATCH_ROUNDS = 6


def kg_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal matching by deterministic handshaking (the Israeli–Itai
    pattern with md5 edge priorities): each round, every unmatched
    vertex points at its MINIMUM-priority incident edge among surviving
    edges; an edge whose BOTH endpoints point at it joins the matching,
    its endpoints retire, and incident edges drop.  Fixed {MATCH_ROUNDS}
    rounds, residue reported.  With MIS and 2-coloring this completes
    the classic local symmetry-breaking trio — matching is the
    primitive behind distributed coarsening/clustering (e.g. METIS-style
    multilevel partitioning).

    Scale shape (per round): TWO min-groupBys (each endpoint's favorite
    edge), ONE self-join of the favorites on the edge key (the
    handshake), and anti-joins to retire matched vertices — all
    partial-aggregated on vertex/edge keys, state one row per live
    vertex/edge.

    Output: matched-pair count, per-side matched vertices, surviving
    (unmatched-but-live) edge count, and an order-free matching
    checksum."""
    e = _purchase_edges(spark, sf_dir)
    prio = F.md5(F.concat_ws("|", "a", "b"))
    live = e.select("a", "b", prio.alias("pr")).localCheckpoint()
    matched = live.limit(0).select("a", "b")
    for _ in range(MATCH_ROUNDS):
        fav_a = live.groupBy("a").agg(F.min("pr").alias("pa"))
        fav_b = live.groupBy("b").agg(F.min("pr").alias("pb"))
        hand = (
            live.join(fav_a, "a").join(fav_b, "b")
            .where((F.col("pr") == F.col("pa")) & (F.col("pr") == F.col("pb")))
            .select("a", "b")
            # lazy: the live-set eager checkpoint below materializes it
            .localCheckpoint(eager=False)
        )
        # accumulator = union of checkpointed round outputs; no checkpoint
        matched = matched.unionByName(hand)
        gone = (
            hand.select(F.col("a").alias("v"))
            .unionByName(hand.select(F.col("b").alias("v")))
        )
        live = (
            live.join(gone.select(F.col("v").alias("a")), "a", "left_anti")
            .join(gone.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b", "pr")
            .localCheckpoint()
        )
    u32a = F.conv(F.substring(F.md5(F.concat_ws("|", "a", "b")), 1, 8), 16, 10)
    return (
        matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_pairs"),
            F.coalesce(F.sum(u32a.cast("long")), F.lit(0)).cast("long")
            .alias("matching_checksum"),
        )
        .crossJoin(
            F.broadcast(
                live.agg(F.count(F.lit(1)).cast("long").alias("n_live_edges"))
            )
        )
    )


def _matching_sql() -> str:
    parts = [f"""
WITH e0m AS MATERIALIZED (
  SELECT a, b, md5(a || '|' || b) AS pr FROM ({_EDGE_SQL})
)"""]
    prev = "e0m"
    match_ctes = []
    for r in range(1, MATCH_ROUNDS + 1):
        parts.append(f""",
fa{r} AS (SELECT a, MIN(pr) AS pa FROM {prev} GROUP BY a),
fb{r} AS (SELECT b, MIN(pr) AS pb FROM {prev} GROUP BY b),
h{r} AS MATERIALIZED (
  SELECT l.a, l.b FROM {prev} l
  JOIN fa{r} USING (a) JOIN fb{r} USING (b)
  WHERE l.pr = fa{r}.pa AND l.pr = fb{r}.pb
),
g{r} AS (SELECT a AS v FROM h{r} UNION ALL SELECT b FROM h{r}),
e{r}m AS MATERIALIZED (
  SELECT l.a, l.b, l.pr FROM {prev} l
  WHERE l.a NOT IN (SELECT v FROM g{r}) AND l.b NOT IN (SELECT v FROM g{r})
)""")
        match_ctes.append(f"SELECT a, b FROM h{r}")
        prev = f"e{r}m"
    union = " UNION ALL ".join(match_ctes)
    parts.append(f""",
m AS ({union})
SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_matched_pairs,
       CAST(COALESCE((SELECT SUM(CAST(('0x' || substr(md5(a || '|' || b), 1, 8))
                                 AS BIGINT)) FROM m), 0) AS BIGINT)
         AS matching_checksum,
       CAST((SELECT COUNT(*) FROM {prev}) AS BIGINT) AS n_live_edges""")
    return "".join(parts)


KG_MATCHING_SQL = _matching_sql()


KG_GRAPHALG_QUERIES: dict[str, tuple] = {
    "kg_maximal_matching": (kg_maximal_matching, KG_MATCHING_SQL),
    "kg_bipartiteness": (kg_bipartiteness, KG_BIPARTITE_SQL),
    "kg_bfs_distance": (kg_bfs_distance, KG_BFS_SQL),
    "kg_hits": (kg_hits, KG_HITS_SQL),
    "kg_scc": (kg_scc, KG_SCC_SQL),
    "kg_hyperball_nf": (kg_hyperball_nf, KG_HYPERBALL_SQL),
    "kg_mis": (kg_mis, KG_MIS_SQL),
    "kg_sssp_weighted": (kg_sssp_weighted, KG_SSSP_SQL),
    "kg_ktruss": (kg_ktruss, KG_KTRUSS_SQL),
}
