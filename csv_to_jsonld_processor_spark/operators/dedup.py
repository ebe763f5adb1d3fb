"""Deduplication operators over ``documents`` — the core of any
large-scale training-data pipeline.

Four families, all shuffle-architected for 100 TB:

- exact: hash-groupBy on a normalized fingerprint. One shuffle carrying
  16-byte keys; map-side combine collapses per-partition duplicates.
- n-gram Jaccard: word-shingle explode → equi-join on shingle → pair
  aggregation. The shingle join IS the blocking step — no O(n²) cross
  product ever materializes; hot shingles are the skew risk (AQE skew
  join + the shingle-frequency cap below).
- MinHash + LSH: k md5-derived min-hashes per doc → band keys →
  bucket-join on band → Jaccard verify on candidates only. md5 (not
  xxhash64) so the DuckDB oracle computes the identical signature.
- SimHash: 60-bit signature from per-token md5-derived hashes;
  hamming<=3 pairs via 15-bit band pigeonholing + popcount verify —
  exact by construction, oracle-checked in DuckDB bit-for-bit, and
  additionally set-equality pytest-gated vs an all-pairs recompute.
- clusters: connected components over the MinHash pair graph
  (min-label propagation; recursive-CTE oracle).

Embedding near-dup (cosine) lives in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

SHINGLE_K = 5
MINHASH_K = 12
LSH_BANDS = 4  # 4 bands x 3 rows
LSH_ROWS = 3
JACCARD_TAU = 0.8
MAX_SHINGLE_FREQ = 1000  # drop super-hot shingles from candidate gen (stopword shields)
CLUSTER_MAX_BUCKET = 200  # star-cap mega band-buckets in the clustering path (CC-exact)


def _norm_text() -> F.Column:
    return F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))


def _shingles(tokens: F.Column, k: int = SHINGLE_K) -> F.Column:
    """Distinct word k-shingles via a higher-order transform (JVM-side).
    Docs shorter than k tokens yield an empty array — guarded explicitly
    because Spark's sequence(1, 0) steps BACKWARDS ([1, 0]) and would
    feed slice() an invalid 0 start."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size(_tokens) >= {k} THEN "
            f"transform(sequence(1, size(_tokens) - {k - 1}),"
            f" i -> array_join(slice(_tokens, i, {k}), ' ')) "
            "ELSE array() END"
        )
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups, two keys: full normalized text, and the
    first-20-token prefix (the URL/prefix-normalized exact-dedup variant
    common in web-corpus pipelines — catches boilerplate-prefix dupes
    that byte-exact hashing misses)."""
    t = load_tables(spark, sf_dir)
    norm = _norm_text()
    prefix = F.array_join(F.slice(F.split(norm, " "), 1, 20), " ")
    keyed = t["documents"].select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("full").alias("key_kind"), F.md5(norm).alias("fingerprint")),
                F.struct(F.lit("prefix20").alias("key_kind"), F.md5(prefix).alias("fingerprint")),
            )
        ).alias("k"),
    ).select("doc_id", "k.key_kind", "k.fingerprint")
    return (
        keyed.groupBy("key_kind", "fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_docs") > 1)
        .orderBy("key_kind", "fingerprint")
    )


DEDUP_EXACT_SQL = """
WITH norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text,'\\s+',' ','g'))) AS n FROM documents
), keyed AS (
  SELECT doc_id, 'full' AS key_kind, md5(n) AS fingerprint FROM norm
  UNION ALL
  SELECT doc_id, 'prefix20' AS key_kind,
         md5(array_to_string((string_split(n,' '))[1:20], ' ')) AS fingerprint
  FROM norm
)
SELECT key_kind, fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM keyed GROUP BY 1, 2 HAVING COUNT(*) > 1 ORDER BY key_kind, fingerprint
"""


def _doc_shingles(docs: DataFrame) -> DataFrame:
    return (
        docs.withColumn("_tokens", F.split(_norm_text(), " "))
        .select("doc_id", F.explode(_shingles(F.col("_tokens"))).alias("shingle"))
    )


def _ngram_candidate_pairs(
    docs: DataFrame, max_shingle_freq: int | None = MAX_SHINGLE_FREQ
) -> tuple[DataFrame, DataFrame]:
    """Shingle-blocked candidate generation: explode → (optional)
    hot-shingle cap → self-equi-join on shingle → per-pair intersection
    counts. The cap is THE fan-out bound: a boilerplate shingle shared
    by f docs alone contributes C(f,2) join rows, so one stopword shield
    in a web corpus makes the join quadratic without it
    (tests/test_dedup_stress.py proves the bound on a planted corpus).
    Returns (pairs(doc_a, doc_b, n_common), sizes(doc_id, n_shingles));
    sizes are computed BEFORE the cap so Jaccard stays exact for every
    surviving pair."""
    # the raw shingle relation feeds FOUR consumers (sizes, the hot-
    # shingle census, and both self-join sides) — without a checkpoint
    # the corpus-wide tokenize+explode ran once per consumer. Lazy: the
    # first materialization persists it (the inverted-index shape).
    sh = _doc_shingles(docs).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
        sh = sh.join(
            F.broadcast(hot.where(F.col("freq") > max_shingle_freq).select("shingle")),
            "shingle",
            "left_anti",
        )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return pairs, sizes


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-5-gram Jaccard >= 0.8.

    Plan: shingle explode → self-equi-join on shingle (the blocking key)
    → per-pair intersection counts → Jaccard from |A|+|B|-∩. Hot-shingle
    cap bounds the join fan-out at scale."""
    t = load_tables(spark, sf_dir)
    pairs, sizes = _ngram_candidate_pairs(t["documents"])
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    jac = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return jac


DEDUP_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ') AS tokens
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common), 6) >= {JACCARD_TAU}
ORDER BY doc_a, doc_b
"""


def _minhash_signature(docs: DataFrame, hash_impl: str = "md5") -> DataFrame:
    """k min-hashes per doc. Two hash backends, same plan shape:

    - ``md5`` (default): 16-hex-char string min-hashes — available and
      identical in both engines, so the signature is oracle-checkable.
    - ``xxhash64``: the JVM-native seeded 64-bit hash — 8-byte long
      min-hashes instead of 16-char strings, no hex formatting, ~half
      the shuffle width. The 100 TB path; oracle-incompatible (DuckDB
      has no xxhash64), so it's pytest-gated instead: the VERIFIED
      pair set (post exact-Jaccard) must match the md5 path
      (tests/test_dedup.py), and the speedup is recorded in
      BENCH/BASELINE.md.
    """
    sh = _doc_shingles(docs)
    if hash_impl == "xxhash64":
        minhashes = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(MINHASH_K)
        ]
    else:
        minhashes = [
            F.min(F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 16)).alias(
                f"mh{i}"
            )
        for i in range(MINHASH_K)
        ]
    # n_shingles rides the SAME aggregation: the verified chain needs
    # per-doc shingle counts for exact Jaccard, and computing them here
    # saves that chain a second full shingle explode + (doc_id) shuffle
    return sh.groupBy("doc_id").agg(*minhashes, F.count(F.lit(1)).alias("n_shingles"))


def _lsh_candidate_pairs(
    docs: DataFrame, hash_impl: str = "md5", checkpoint_sig: bool = True
) -> DataFrame:
    """Unordered distinct LSH candidate pairs for ``docs``.

    ``checkpoint_sig`` materializes the signature before the self-join.
    It is the right call for every chain that READS THE SIGNATURE AGAIN
    (verified pairs, clusters, the curation funnel, the incremental
    index — those callers build their own checkpointed sig and go
    through _lsh_candidates_from_sig): one 12-way min-hash aggregation
    pass, then equi-joins over stored blocks, exactly the
    signature-store shape of the 100 TB path. A ONE-SHOT caller should
    pass False: the materialization write is pure tax there (r3→r4
    BENCH showed +24% on the standalone query), and Catalyst still
    computes the aggregation once on the probe side + once on the build
    side only if the build broadcasts — at real scale one-shot callers
    don't exist (the signature IS the stored index)."""
    sig = _minhash_signature(docs, hash_impl)
    if checkpoint_sig:
        sig = sig.localCheckpoint()
    return _lsh_candidates_from_sig(sig, hash_impl)


def _lsh_candidates_from_sig(
    sig: DataFrame, hash_impl: str = "md5", max_bucket: int | None = None
) -> DataFrame:
    """Band self-join over an already-materialized signature relation.

    ``max_bucket`` is the mega-bucket fan-out cap — the quadratic
    hazard of LSH on templated web text: a band bucket holding f docs
    (f docs sharing THREE identical min-hashes, i.e. near-identical
    boilerplate) contributes C(f, 2) pairs, and a measured 2M-page
    corpus produced 139M candidates that way. Buckets larger than the
    cap switch to STAR pairing — every member pairs with the bucket
    minimum only — which is O(f) and EXACT for the clustering/drop
    path: all members stay connected through the minimum, so the
    connected components of the pair graph are unchanged
    (tests/test_dedup_stress.py pins CC-label equality on a planted
    mega-bucket). Pairwise-verification recall on intra-mega-bucket
    non-adjacent pairs is the documented trade; the oracled driver
    queries keep the exact default (None)."""
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        band_key = (
            F.xxhash64(*cols) if hash_impl == "xxhash64" else F.md5(F.concat_ws("|", *cols))
        )
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), band_key.alias("band_key"))
        )
    banded = sig.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_key"
    )
    if max_bucket is None:
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    stats = banded.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("_f"), F.min("doc_id").alias("_mn")
    )
    tagged = banded.join(stats, ["band_idx", "band_key"])
    small = tagged.where(F.col("_f") <= max_bucket).select(
        "doc_id", "band_idx", "band_key"
    )
    a = small.alias("a")
    b = small.alias("b")
    all_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    star_pairs = (
        tagged.where((F.col("_f") > max_bucket) & (F.col("doc_id") != F.col("_mn")))
        .select(F.col("_mn").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return all_pairs.unionByName(star_pairs).distinct()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str, hash_impl: str = "md5") -> DataFrame:
    """MinHash/LSH candidate pairs: docs sharing any LSH band.

    Bands of {LSH_ROWS} min-hashes hash to a band key; an equi-join on
    (band_idx, band_key) yields candidates — the 100 TB-safe plan since
    only same-bucket docs ever meet. ``hash_impl="xxhash64"`` switches
    the signature AND band keys to 64-bit longs (see
    _minhash_signature). One-shot query → no signature checkpoint
    (see _lsh_candidate_pairs on the trade)."""
    t = load_tables(spark, sf_dir)
    return _lsh_candidate_pairs(t["documents"], hash_impl, checkpoint_sig=False).orderBy(
        "doc_a", "doc_b"
    )


DEDUP_MINHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ') AS tokens
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS mh{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id
), banded AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || '|' || ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
      + ") AS band_key FROM sig"
      for b in range(LSH_BANDS)
  )}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit in BOTH engines
SIMHASH_BANDS = 4  # 4 x 15-bit bands: hamming <= 3 pigeonholes into >=1 equal band
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_TAU = 3


def _simhash_df(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, band0..band3): 60-bit SimHash per doc + 15-bit
    band keys. The per-token hash is md5-derived (first 15 hex chars as
    int) so the DuckDB oracle computes the identical signature — same
    deliberate md5-for-parity tax as the MinHash path; at pure-Spark
    scale swap xxhash64 (identical plan shape)."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(_norm_text(), " "))).alias("token")
    )
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    bit_votes = [
        F.sum(
            F.when(((F.shiftright(h, i)).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    out = votes.select("doc_id", sim.alias("simhash"))
    for band in range(SIMHASH_BANDS):
        out = out.withColumn(
            f"band{band}",
            F.shiftright(F.col("simhash"), band * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .cast("int"),
        )
    return out


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + band keys per doc, hash-checked against a
    DuckDB oracle that folds the identical bit votes."""
    t = load_tables(spark, sf_dir)
    return _simhash_df(t["documents"]).orderBy("doc_id")


def _simhash_sql_core() -> str:
    """Shared oracle CTEs computing (doc_id, simhash, band0..3)."""
    votes = ", ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    bands = ", ".join(
        f"CAST((simhash >> {b * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1} AS INT) AS band{b}"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' '))) AS token
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM toks
), votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sim} AS simhash FROM votes
), sigb AS (
  SELECT doc_id, simhash, {bands} FROM sig
)"""


DEDUP_SIMHASH_SQL = _simhash_sql_core() + """
SELECT doc_id, simhash, band0, band1, band2, band3 FROM sigb ORDER BY doc_id
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-neighbor pairs (distance <= 3): band equi-join for
    candidates, popcount(xor) verify.

    EXACT by construction, not approximate: 4 disjoint 15-bit bands and
    <= 3 differing bits pigeonhole at least one band into equality, so
    the band join has zero false negatives and the popcount filter
    removes all false positives (pytest asserts set-equality vs an
    all-pairs recomputation; the DuckDB oracle recomputes the identical
    join). Shuffle is on (band_idx, band_val) — at 100 TB only same-band
    docs meet; degenerate signatures (empty docs all hash to band 0)
    are the skew risk, which AQE skew-split and the distinct() before
    the signature join bound."""
    t = load_tables(spark, sf_dir)
    sig = _simhash_df(t["documents"])
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band_idx"), F.col(f"band{i}").alias("band_val"))
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_val")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
        )
        .where(F.col("hamming") <= HAMMING_TAU)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _cc_min_label(edges: DataFrame) -> tuple[DataFrame, int]:
    """Connected components by min-label propagation: per round every
    node takes min(own label, neighbors' labels); converges in diameter
    rounds. ``edges`` must be the SYMMETRIC pair list (src, dst).
    Returns (labels(node, label), rounds). Kept as the simple baseline —
    ``_cc_star`` below is the production algorithm (O(log n) rounds)."""
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    rounds = 0
    while True:
        rounds += 1
        msgs = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        # lazy checkpoint: the convergence count below materializes (and
        # persists) the round in the SAME job — eager checkpointing paid
        # an extra full job per round for the same truncated lineage
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels, rounds


def _cc_star(edges: DataFrame) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): per round every node hooks its larger neighbors (then its
    smaller neighbors) directly onto its neighborhood minimum, so chains
    collapse doubly-exponentially — O(log n) rounds vs diameter for
    min-label propagation, and per-round output stays bounded by the
    edge count (no frontier blow-up on skewed/hub components — the
    100 TB property; tests/test_dedup_stress.py measures the round
    reduction on a planted deep chain).

    ``edges`` is any (src, dst) pair list, src != dst. Returns
    (labels(node, label=component min), rounds)."""
    # canonical (hi, lo) orientation; the loop preserves it
    def _sketch(df: DataFrame) -> tuple:
        """One-job set sketch of an edge relation: (count, two
        independent 64-bit hash XOR-folds). Equal sketches across
        rounds ⇒ equal edge sets up to a simultaneous collision of two
        independent xxhash64 folds (~2⁻¹²⁸ per round) — replacing the
        round-3 count()+left-anti-count() pair (two jobs, one a join)
        with a single shuffle-light aggregation over the checkpointed
        blocks. XOR-fold is order-insensitive and overflow-free; the
        relation is distinct so self-cancellation can't hide edges.
        Exactness of the labels is separately pytest-pinned against
        min-label propagation (tests/test_dedup_stress.py)."""
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(0Y, src, dst))").alias("h0"),
            F.expr("bit_xor(xxhash64(1Y, src, dst))").alias("h1"),
        ).first()
        return (row["n"], row["h0"], row["h1"])

    canon = (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        # lazy: the sketch right below materializes + persists it in ONE
        # job; eager checkpointing ran the plan in its own job first
        .localCheckpoint(eager=False)
    )
    sk_canon = _sketch(canon)
    rounds = 0
    while True:
        rounds += 1
        sym = canon.unionByName(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # large-star: u's strictly-larger neighbors → min(Γ(u) ∪ {u})
        mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
        mins = mins.withColumn("m", F.least("mn", "src"))
        large = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star on the (hi, lo) output: hi's ≤-neighbors and hi
        # itself → min neighbor
        smins = large.groupBy("src").agg(F.min("dst").alias("m"))
        new_canon = (
            large.join(smins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(smins.select("src", F.col("m").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sk_new = _sketch(new_canon)
        stable = sk_new == sk_canon
        canon, sk_canon = new_canon, sk_new
        if stable:
            break
    # at fixpoint the graph is a forest of stars: every non-root points
    # at its component min; roots label themselves
    labels = canon.select(F.col("src").alias("node"), F.col("dst").alias("label"))
    roots = (
        canon.select(F.col("dst").alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        .withColumn("label", F.col("node"))
    )
    return labels.unionByName(roots), rounds


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash/LSH
    pair graph, each doc labeled with its component's minimum doc_id
    (the canonical keeper — the standard "pick one per dup cluster"
    step after pair generation). Exact dups are a subgraph by
    construction (identical text → identical signature → same bands).

    Algorithm: alternating large-star/small-star (``_cc_star``) —
    O(log n) rounds with per-round work bounded by the edge count, the
    scale-safe choice for skewed dup clusters (boilerplate mega-
    clusters). Output identical to min-label propagation (component min
    labels), so the recursive-CTE DuckDB oracle is unchanged;
    tests/test_dedup_stress.py pins label equality of the two
    algorithms and the round reduction on a planted deep chain.

    Docs in no pair are singleton clusters (cluster = own id), so the
    output covers the whole corpus: (doc_id, cluster, cluster_size).
    """
    t = load_tables(spark, sf_dir)
    # capped candidates: the star cap changes the PAIR LIST but provably
    # not its connected components (see _lsh_candidates_from_sig), so
    # the cluster labels — and the recursive-CTE oracle — are identical
    # while the mega-bucket quadratic hazard is bounded at scale
    # lazy: the star-contraction's first sketch job materializes the
    # signature (and persists it for the band self-join's second side)
    sig = _minhash_signature(t["documents"]).localCheckpoint(eager=False)
    pairs = _lsh_candidates_from_sig(sig, max_bucket=CLUSTER_MAX_BUCKET)
    labels, _rounds = _cc_star(pairs.selectExpr("doc_a AS src", "doc_b AS dst"))

    full = (
        t["documents"]
        .select(F.col("doc_id").alias("node"))
        .join(labels, "node", "left")
        .select("node", F.coalesce(F.col("label"), F.col("node")).alias("label"))
    )
    sizes = full.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        full.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


# oracle: same pair graph, components via recursive transitive closure
# (UNION dedup terminates it), cluster = min reachable node
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ') AS tokens
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS mh{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id
), banded AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || '|' || ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
      + ") AS band_key FROM sig"
      for b in range(LSH_BANDS)
  )}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.dst AS node, reach.r
  FROM reach JOIN edges e ON e.src = reach.node
), comp AS (
  SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
)
SELECT node AS doc_id, cluster,
       CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
FROM comp ORDER BY doc_id
"""


DEDUP_SIMHASH_PAIRS_SQL = _simhash_sql_core() + f"""
, banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, band{b} AS band_val FROM sigb" for b in range(SIMHASH_BANDS))}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band_val = r.band_val AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cand
JOIN sigb sa ON sa.doc_id = doc_a
JOIN sigb sb ON sb.doc_id = doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {HAMMING_TAU}
ORDER BY doc_a, doc_b
"""




def dedup_minhash_verified(
    spark: SparkSession, sf_dir: str, hash_impl: str = "md5"
) -> DataFrame:
    """The COMPLETE MinHash dedup chain: LSH candidates → exact Jaccard
    verification on candidates only → confirmed near-dups at tau.

    Verification work is proportional to |candidates| × shingles-per-doc
    (the candidate set joins back to the shingle table on doc id, then
    equi-joins the other side on (doc, shingle)) — never the all-pairs
    shingle self-join. This is the production shape: LSH prunes, exact
    Jaccard decides. ``hash_impl`` selects the candidate-gen hash
    backend; the verified output is hash-independent up to LSH recall
    (pytest pins md5/xxhash64 set equality on the test corpora).

    The candidate set is checkpointed: it feeds both the intersection
    count and the final left-join, and it is tiny (LSH-pruned pairs),
    so materializing it avoids running the band self-join twice."""
    t = load_tables(spark, sf_dir)
    return verified_pairs(t["documents"], hash_impl)


def verified_pairs(
    docs: DataFrame, hash_impl: str = "md5", max_bucket: int | None = None
) -> DataFrame:
    """The verified chain over any (doc_id, text) relation — the
    sf_dir-free core (tools/dedup_scaling.py runs it on a generated
    web corpus for the N-vs-4N scaling measurement).
    ``max_bucket``: see _lsh_candidates_from_sig."""
    sig = _minhash_signature(docs, hash_impl).localCheckpoint()
    cand = _lsh_candidates_from_sig(sig, hash_impl, max_bucket).localCheckpoint()
    # verification only ever reads shingles of docs that appear in a
    # candidate pair — semi-join the corpus against the (tiny,
    # checkpointed) candidate set BEFORE the shingle explode, so the
    # verify pass re-tokenizes |candidate docs|, not |corpus| (the
    # proportionality the chain promises; previously both the a and b
    # sides re-exploded every document)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = _doc_shingles(docs.join(F.broadcast(cand_docs), "doc_id", "semi"))
    sizes = sig.select("doc_id", "n_shingles")  # rides the signature agg — no re-scan

    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        cand.join(common, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
                / (F.col("size_a") + F.col("size_b") - F.coalesce(F.col("n_common"), F.lit(0))).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .withColumn("is_dup", (F.col("jaccard") >= JACCARD_TAU).cast("boolean"))
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_VERIFIED_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))), ' ') AS tokens
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS mh{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id
), banded AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || '|' || ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
      + ") AS band_key FROM sig"
      for b in range(LSH_BANDS)
  )}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a AS ca, c.doc_b AS cb, COUNT(*) AS n_common
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       CAST(COALESCE(cm.n_common, 0) AS BIGINT) AS n_common,
       ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - COALESCE(cm.n_common, 0)), 6) AS jaccard,
       ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - COALESCE(cm.n_common, 0)), 6) >= {JACCARD_TAU} AS is_dup
FROM cand c
LEFT JOIN common cm ON cm.ca = c.doc_a AND cm.cb = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
ORDER BY doc_a, doc_b
"""


INCR_FRACTION = 0.8  # docs with doc_id >= 80% of max play the "new batch"


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash dedup — the production ingestion shape: a new
    batch is deduped against the existing corpus (and earlier docs of
    its own batch) WITHOUT re-pairing the whole corpus against itself.

    The probe side is only the new batch's band rows; the index side is
    the full banded-signature relation (in production this is the
    stored signature table maintained across ingests — here it is
    recomputed from the corpus because the sandbox has no persistent
    index, which changes nothing about the join shape). Every emitted
    pair has doc_b in the new batch and doc_a < doc_b, so each
    new-vs-old and new-vs-earlier-new pair appears exactly once and old
    ⋈ old pairs are never generated — candidate work scales with
    |batch| × bucket hit rate, not |corpus|². Candidates are verified
    with exact Jaccard (same chain as dedup_minhash_verified).

    Batch boundary: doc_id >= {INCR_FRACTION} × MAX(doc_id), computed
    in-plan (single-row broadcast, no driver collect) so it holds at
    any SF."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    thresh = docs.agg(
        F.ceil(F.max("doc_id") * F.lit(INCR_FRACTION)).cast("long").alias("_thresh")
    )
    # checkpoint the SIGNATURE (one heavy shingle+min-hash pass) and
    # derive the band rows narrowly from it: the stored-index relation
    # keeps n_shingles, so the verify stage below reuses it instead of
    # re-exploding the corpus for sizes
    sig = _minhash_signature(docs).localCheckpoint()
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_key"))
        )
    banded = (
        sig.select("doc_id", F.explode(F.array(*bands)).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_key")
    )
    new_bands = (
        banded.crossJoin(F.broadcast(thresh))
        .where(F.col("doc_id") >= F.col("_thresh"))
        .select("doc_id", "band_idx", "band_key")
    )
    idx = banded.alias("i")
    nb = new_bands.alias("n")
    cand = (
        idx.join(
            nb,
            (F.col("i.band_idx") == F.col("n.band_idx"))
            & (F.col("i.band_key") == F.col("n.band_key"))
            & (F.col("i.doc_id") < F.col("n.doc_id")),
        )
        .select(F.col("i.doc_id").alias("doc_a"), F.col("n.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint()
    )
    # verify-side pruning, same as verified_pairs: only candidate docs'
    # shingles are consulted, and sizes ride the signature relation
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = _doc_shingles(docs.join(F.broadcast(cand_docs), "doc_id", "semi"))
    sizes = sig.select("doc_id", "n_shingles")
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        cand.join(common, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
                / (F.col("size_a") + F.col("size_b") - F.coalesce(F.col("n_common"), F.lit(0))).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .withColumn("is_dup", (F.col("jaccard") >= JACCARD_TAU).cast("boolean"))
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_INCREMENTAL_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))), ' ') AS tokens
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks
), sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS mh{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id
), banded AS (
  {" UNION ALL ".join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || '|' || ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
      + ") AS band_key FROM sig"
      for b in range(LSH_BANDS)
  )}
), thresh AS (
  SELECT CAST(ceil(MAX(doc_id) * {INCR_FRACTION}) AS BIGINT) AS t FROM documents
), cand AS (
  SELECT DISTINCT i.doc_id AS doc_a, n.doc_id AS doc_b
  FROM banded i JOIN banded n
    ON i.band_idx = n.band_idx AND i.band_key = n.band_key AND i.doc_id < n.doc_id
  WHERE n.doc_id >= (SELECT t FROM thresh)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), common AS (
  SELECT c.doc_a AS ca, c.doc_b AS cb, COUNT(*) AS n_common
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - COALESCE(cm.n_common, 0)), 6) AS jaccard,
       ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - COALESCE(cm.n_common, 0)), 6) >= {JACCARD_TAU} AS is_dup
FROM cand c
LEFT JOIN common cm ON cm.ca = c.doc_a AND cm.cb = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
ORDER BY doc_a, doc_b
"""


# --- chunk-level exact dedup (sub-document granularity) ---------------------

CHUNK_K = 4  # tokens per chunk; trailing partial chunks are dropped


def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup at fixed {CHUNK_K}-token chunk
    granularity — the scalable approximation of Lee et al. 2021's
    suffix-array substring dedup (a chunk duplicated verbatim across
    documents is boilerplate/template text that whole-doc hashing
    misses). Each document is cut into consecutive non-overlapping
    {CHUNK_K}-token chunks (trailing partial dropped); a chunk instance
    is *duplicated* when its text occurs in ≥2 distinct documents.
    Output: documents histogrammed by dup-chunk-ratio decile, with
    chunk totals per bucket.

    Scale shape: chunking is pure expression work riding the scan
    (slice over the token array — no shuffle, no Python); the global
    chunk census is ONE groupBy on the chunk key with map-side combine
    (at 100 TB you'd group on xxhash64(chunk) to shrink the shuffle key
    to 8 bytes — identical counts, the string key here keeps the oracle
    byte-comparable); the per-doc roll-up joins census back on the same
    key then ONE groupBy doc_id. Hot chunks (boilerplate that appears
    everywhere) are bounded: the join fan-out is |instances|, never
    |instances|² — there is no pair generation at this granularity."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    chunks = F.when(
        F.size(toks) >= CHUNK_K,
        F.transform(
            F.sequence(F.lit(0), (F.size(toks) / CHUNK_K).cast("int") - 1),
            lambda i: F.array_join(F.slice(toks, i * CHUNK_K + 1, CHUNK_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    inst = t["documents"].select("doc_id", F.explode(chunks).alias("chunk"))
    census = inst.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        inst.join(census, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy(
            F.least(F.lit(9), (F.col("n_dup") * 10 / F.col("n_chunks")).cast("int")).alias(
                "dup_decile"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n_dup").cast("long").alias("n_dup_chunks"),
        )
        .orderBy("dup_decile")
    )


DEDUP_CHUNKS_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
inst AS (
  SELECT doc_id, array_to_string(t[i*{CHUNK_K}+1 : i*{CHUNK_K}+{CHUNK_K}], ' ') AS chunk
  FROM toks, UNNEST(range(0, len(t)//{CHUNK_K})) AS u(i)),
census AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM inst GROUP BY chunk),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_chunks,
         SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM inst JOIN census USING (chunk) GROUP BY doc_id)
SELECT CAST(LEAST(9, n_dup * 10 // n_chunks) AS INT) AS dup_decile,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(n_dup) AS BIGINT) AS n_dup_chunks
FROM per_doc GROUP BY 1 ORDER BY dup_decile
"""


# --- content-defined chunking (CDC) dedup -----------------------------------

CDC_BOUNDARY_DIGITS = ("0", "4", "8", "c")  # P(boundary)=4/16 → mean chunk ≈ 4 tokens


def cdc_chunk_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, n, chunks): cut each document at
    content-defined boundaries — after token i iff the first md5 hex
    digit of (token i, \\x01, token i+1) lands in CDC_BOUNDARY_DIGITS.
    Pure column algebra; the n >= 2 guard keeps sequence() ascending."""
    digits = ", ".join(f"'{d}'" for d in CDC_BOUNDARY_DIGITS)
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "bpos",
            F.when(
                F.col("n") >= 2,
                F.expr(
                    "filter(sequence(1, n - 1), i -> substring(md5(concat("
                    f"element_at(toks, i), chr(1), element_at(toks, i + 1))), 1, 1) IN ({digits}))"
                ),
            ).otherwise(F.array().cast("array<int>")),
        )
        .withColumn("edges", F.expr("concat(array(0), bpos, array(n))"))
        .withColumn(
            "chunks",
            F.expr(
                "transform(sequence(1, size(edges) - 1), j -> array_join("
                "slice(toks, element_at(edges, j) + 1,"
                " element_at(edges, j + 1) - element_at(edges, j)), ' '))"
            ),
        )
        .select("doc_id", "n", "chunks")
    )


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at CONTENT-DEFINED chunk granularity — the
    LBFS/rsync/storage-dedup boundary rule applied at token level. A
    chunk boundary falls after token i iff a hash of the local window
    (token i, token i+1) lands in a fixed 1/4 slice of hash space, so
    boundaries are a function of local content only. That makes the
    chunking SHIFT-RESISTANT: inserting or deleting one token near a
    document's head re-cuts at most the chunks overlapping the edit,
    while the fixed-K chunker (``dedup_chunks``) shifts every
    downstream chunk by one token and loses all of them. Chunk sizes
    are geometric(1/4) (mean 4 tokens, matching CHUNK_K=4 so the two
    censuses are comparable); production CDC adds min/max clamps, which
    need a sequential scan — documented out, the unclamped rule is the
    one that stays per-position-independent and hence expressible as
    pure column algebra. Window hash is md5 of the two tokens joined by
    an \\x01 sentinel (so ("ab","c") cannot collide with ("a","bc"));
    at 100 TB you'd swap md5 for a rolling buzhash inside one
    mapInPandas pass — identical boundaries, O(1) per position.

    Same census/roll-up shape as ``dedup_chunks``: chunking rides the
    scan (no shuffle, no Python), ONE map-side-combined groupBy on the
    chunk key, census joined back, ONE groupBy doc_id, decile roll-up.
    Output adds n_tokens so mean chunk length per bucket is auditable.
    """
    t = load_tables(spark, sf_dir)
    d = cdc_chunk_docs(t["documents"])
    inst = d.select("doc_id", "n", F.explode("chunks").alias("chunk"))
    census = inst.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        inst.join(census, "chunk")
        .groupBy("doc_id")
        .agg(
            F.first("n").alias("n_toks"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy(
            F.least(F.lit(9), (F.col("n_dup") * 10 / F.col("n_chunks")).cast("int")).alias(
                "dup_decile"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n_dup").cast("long").alias("n_dup_chunks"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("dup_decile")
    )


DEDUP_CDC_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents),
cut AS (
  SELECT doc_id, t, n,
    [0] || CASE WHEN n >= 2 THEN list_filter(range(1, n), i ->
        substr(md5(t[i] || chr(1) || t[i+1]), 1, 1)
        IN ({", ".join(f"'{d}'" for d in CDC_BOUNDARY_DIGITS)}))
      ELSE [] END || [CAST(n AS BIGINT)] AS edges
  FROM toks),
inst AS (
  SELECT doc_id, n,
         array_to_string(t[edges[j] + 1 : edges[j + 1]], ' ') AS chunk
  FROM cut, UNNEST(range(1, len(edges))) AS u(j)),
census AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM inst GROUP BY chunk),
per_doc AS (
  SELECT doc_id, ANY_VALUE(n) AS n_toks, COUNT(*) AS n_chunks,
         SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM inst JOIN census USING (chunk) GROUP BY doc_id)
SELECT CAST(LEAST(9, n_dup * 10 // n_chunks) AS INT) AS dup_decile,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(n_dup) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM per_doc GROUP BY 1 ORDER BY dup_decile
"""


# --- prefix-filtered set-similarity join (PPJoin-lite) --------------------

PREFIX_TAU_NUM = 8  # Jaccard threshold 8/10 on word-5-shingle SETS —
PREFIX_TAU_DEN = 10  # integer-exact: 10·|∩| >= 8·|∪|, no float compare


def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filtering for the shingle-set similarity self-join (the
    PPJoin family, Xiao et al. 2011): order every doc's 5-shingles by a
    GLOBAL rarity rank (document frequency asc, shingle asc) and block
    only on each doc's first ``n - ceil(τ·n) + 1`` rarest shingles — any
    pair with Jaccard >= τ provably shares a shingle inside both
    prefixes, so the filter is LOSSLESS while candidate generation
    touches only rare shingles.

    This query is the measured audit of that theorem on real data: it
    runs BOTH blocking schemes — full inverted index (every shared
    shingle, the gate-scale truth; same shape dedup_ngram_jaccard
    blocks on) and prefix-only — verifies matches with exact integer
    arithmetic, and reports that the prefix scheme found every match
    (n_matches_in_prefix == n_matches) at a candidate-pair cost of
    prefix_ppm/1e6 of the full join.

    Scale shape: the theorem needs only a CONSISTENT TOTAL ORDER on
    shingles, not a materialized integer rank — so each doc orders its
    own shingles by ``(df, shingle)`` directly: df comes from one
    vocabulary-sized groupBy (broadcast at gate scale; sort-merge past
    it) and the positional window is PARTITIONED BY doc_id, never a
    single-partition global sort.  Prefix shingles are by construction
    each doc's RAREST, so the blocking key's fan-out is naturally
    capped — the hot-shingle skew that forces MAX_SHINGLE_FREQ on the
    plain shingle join cannot occur on the prefix path.  Only the
    audit runs the full inverted-index join; a production run keeps
    the prefix join + per-candidate verify."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    toks = _doc_shingles(t["documents"]).withColumnRenamed("shingle", "token")
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    pos = (
        toks.join(F.broadcast(dfreq), "token")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "token")),
        )
        .join(sizes, "doc_id")
    )
    pref = pos.where(
        F.col("pos")
        <= F.col("n_tok")
        - F.expr(f"({PREFIX_TAU_NUM} * n_tok + {PREFIX_TAU_DEN - 1}) div {PREFIX_TAU_DEN}")
        + F.lit(1)
    ).select("doc_id", "token")
    pa = pref.select(F.col("doc_id").alias("doc_a"), "token")
    pb = pref.select(F.col("doc_id").alias("doc_b"), "token")
    cand = (
        pa.join(pb, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "token")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "token")
    full_pairs = (
        ta.join(tb, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("nb"))
    matches = (
        full_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.lit(PREFIX_TAU_DEN) * F.col("n_common")
            >= F.lit(PREFIX_TAU_NUM) * (F.col("na") + F.col("nb") - F.col("n_common"))
        )
        .select("doc_a", "doc_b")
    )
    n_docs = t["documents"].agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_full = full_pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs_full"))
    n_pref = cand.agg(F.count(F.lit(1)).cast("long").alias("n_pairs_prefix"))
    n_match = matches.agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
    n_in_pref = matches.join(cand, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches_in_prefix")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_full))
        .crossJoin(F.broadcast(n_pref))
        .crossJoin(F.broadcast(n_match))
        .crossJoin(F.broadcast(n_in_pref))
        .withColumn(
            "prefix_ppm",
            F.expr("1000000 * n_pairs_prefix div greatest(n_pairs_full, 1)").cast("long"),
        )
    )


DEDUP_PREFIX_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ') AS tokens
  FROM documents
), toks AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(tokens) - {SHINGLE_K - 1}, 0)),
           i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' ')))) AS token
  FROM words
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY token
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id
), pos AS (
  SELECT t.doc_id, t.token,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY r.df, r.token) AS pos
  FROM toks t JOIN dfreq r USING (token)
), pref AS (
  SELECT p.doc_id, p.token
  FROM pos p JOIN sizes s USING (doc_id)
  WHERE p.pos <= s.n_tok
               - ({PREFIX_TAU_NUM} * s.n_tok + {PREFIX_TAU_DEN - 1}) // {PREFIX_TAU_DEN}
               + 1
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b ON a.token = b.token AND a.doc_id < b.doc_id
), full_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), matches AS (
  SELECT f.doc_a, f.doc_b
  FROM full_pairs f
  JOIN sizes sa ON sa.doc_id = f.doc_a
  JOIN sizes sb ON sb.doc_id = f.doc_b
  WHERE {PREFIX_TAU_DEN} * f.n_common
        >= {PREFIX_TAU_NUM} * (sa.n_tok + sb.n_tok - f.n_common)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM full_pairs) AS n_pairs_full,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_pairs_prefix,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM matches) AS n_matches,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM matches m
        SEMI JOIN cand c ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b)
         AS n_matches_in_prefix,
       CAST(1000000 * (SELECT COUNT(*) FROM cand)
            // GREATEST((SELECT COUNT(*) FROM full_pairs), 1) AS BIGINT) AS prefix_ppm
"""


DEDUP_QUERIES: dict[str, tuple] = {
    "dedup_chunks": (dedup_chunks, DEDUP_CHUNKS_SQL),
    "dedup_prefix_filter": (dedup_prefix_filter, DEDUP_PREFIX_SQL),
    "dedup_cdc_chunks": (dedup_cdc_chunks, DEDUP_CDC_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_minhash_verified": (dedup_minhash_verified, DEDUP_MINHASH_VERIFIED_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_minhash_incremental": (dedup_minhash_incremental, DEDUP_MINHASH_INCREMENTAL_SQL),
}
