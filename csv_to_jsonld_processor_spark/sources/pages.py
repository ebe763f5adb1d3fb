"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the engine's primary input table (BASELINE.json input_hint):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Every page is a pure function of its index and the seed — no RNG state,
so generation is reproducible across partitions, cluster sizes, and
runs (the property the resume ledger and the golden-hash suite rely on).
Hosts follow a Zipf-ish distribution so mega-domains exist (skew-handling
exercise per north_rule); a small set of hub entities appears in a large
fraction of sentences so entity-linking blocking keys skew too.

Generation happens ON EXECUTORS via ``spark.range(n)`` + column
expressions / mapInPandas — the driver never materializes the corpus.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- tiny deterministic knowledge base -------------------------------------

# entity classes with aliases; ENTITIES[k] = (canonical, [aliases...], class)
_PEOPLE = [
    ("Ada Lovelace", ["Ada Lovelace", "A. Lovelace", "Lovelace"], "Person"),
    ("Alan Turing", ["Alan Turing", "A. Turing", "Turing"], "Person"),
    ("Grace Hopper", ["Grace Hopper", "G. Hopper", "Hopper"], "Person"),
    ("Edsger Dijkstra", ["Edsger Dijkstra", "E. Dijkstra", "Dijkstra"], "Person"),
    ("Barbara Liskov", ["Barbara Liskov", "B. Liskov", "Liskov"], "Person"),
    ("John Backus", ["John Backus", "J. Backus", "Backus"], "Person"),
    ("Frances Allen", ["Frances Allen", "F. Allen"], "Person"),
    ("Donald Knuth", ["Donald Knuth", "D. Knuth", "Knuth"], "Person"),
]
_ORGS = [
    ("Acme Analytics", ["Acme Analytics", "Acme"], "Organization"),
    ("Globex Data", ["Globex Data", "Globex"], "Organization"),
    ("Initech Systems", ["Initech Systems", "Initech"], "Organization"),
    ("Umbrella Compute", ["Umbrella Compute", "Umbrella"], "Organization"),
    ("Stark Industries", ["Stark Industries", "Stark"], "Organization"),
    ("Wayne Engineering", ["Wayne Engineering", "Wayne"], "Organization"),
]
_PLACES = [
    ("London", ["London"], "Place"),
    ("New York", ["New York", "NYC"], "Place"),
    ("Berlin", ["Berlin"], "Place"),
    ("Tokyo", ["Tokyo"], "Place"),
    ("Paris", ["Paris"], "Place"),
]

ENTITIES = _PEOPLE + _ORGS + _PLACES

# surface predicate phrase → (canonical predicate local name, subj class, obj class)
PREDICATES = [
    ("works for", "worksFor", "Person", "Organization"),
    ("is employed by", "worksFor", "Person", "Organization"),
    ("joined", "worksFor", "Person", "Organization"),
    ("founded", "founderOf", "Person", "Organization"),
    ("is the founder of", "founderOf", "Person", "Organization"),
    ("was born in", "birthPlace", "Person", "Place"),
    ("lives in", "residence", "Person", "Place"),
    ("is headquartered in", "headquarters", "Organization", "Place"),
    ("operates in", "headquarters", "Organization", "Place"),
    ("acquired", "acquired", "Organization", "Organization"),
    ("partnered with", "partner", "Organization", "Organization"),
]

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

_FILLER = (
    "the quarterly report was published online",
    "readers responded with detailed commentary",
    "the archive keeps a full history of revisions",
    "analysts expect further announcements soon",
    "the committee reviewed the proposal at length",
)


def _h(seed: int, *parts) -> int:
    b = hashlib.sha256(("|".join(str(p) for p in parts) + f"|{seed}").encode()).digest()
    return int.from_bytes(b[:8], "big")


def _zipf_host(seed: int, i: int, n_hosts: int = 1000) -> str:
    """Inverse-CDF Zipf(s≈1) pick: host 0 gets ~1/H(n) of all pages."""
    u = (_h(seed, "host", i) % 10**9) / 10**9
    # harmonic partial sums approximated analytically: rank ≈ exp(u * ln(n))
    import math

    rank = int(math.exp(u * math.log(n_hosts)))
    rank = min(max(rank, 1), n_hosts)
    return f"site{rank}.example.org"


def _entity_pool(idx: int, seed: int):
    """Hub skew: entity 0 of each class appears ~35% of the time."""
    def pick(pool, tag, j):
        r = _h(seed, tag, idx, j)
        if r % 100 < 35:
            return pool[0]
        return pool[1 + (r % (len(pool) - 1))]

    return pick


def page_facts(idx: int, seed: int) -> list[tuple]:
    """Ground-truth facts for page idx INCLUDING the surface-form
    choices → list of (sentence, subj_canonical, pred_canonical,
    obj_canonical, s_alias, o_alias) — filler sentences carry Nones
    in every slot but the sentence. The alias slots let truth-anchored
    goldens (e.g. anchor-label election) be derived without re-parsing
    the generated text."""
    n_facts = 2 + _h(seed, "nf", idx) % 4
    pick = _entity_pool(idx, seed)
    out = []
    for j in range(n_facts):
        pred_i = _h(seed, "pred", idx, j) % len(PREDICATES)
        surface, canon, s_cls, o_cls = PREDICATES[pred_i]
        pool_s = {"Person": _PEOPLE, "Organization": _ORGS, "Place": _PLACES}[s_cls]
        pool_o = {"Person": _PEOPLE, "Organization": _ORGS, "Place": _PLACES}[o_cls]
        subj = pick(pool_s, "s", j)
        obj = pick(pool_o, "o", j * 7 + 3)
        if subj[0] == obj[0]:
            obj = pool_o[(pool_o.index(obj) + 1) % len(pool_o)]
        s_alias = subj[1][_h(seed, "sa", idx, j) % len(subj[1])]
        o_alias = obj[1][_h(seed, "oa", idx, j) % len(obj[1])]
        sentence = f"{s_alias} {surface} {o_alias}."
        out.append((sentence, subj[0], canon, obj[0], s_alias, o_alias))
        if _h(seed, "fill", idx, j) % 3 == 0:
            out.append(
                (_FILLER[_h(seed, "fi", idx, j) % len(_FILLER)] + ".", None, None, None, None, None)
            )
    return out


def page_sentences(idx: int, seed: int) -> list[tuple]:
    """Ground-truth facts for page idx → list of
    (sentence, subj_canonical, pred_canonical, obj_canonical) — filler
    sentences carry Nones."""
    return [(s, su, p, o) for s, su, p, o, _sa, _oa in page_facts(idx, seed)]


def page_record(idx: int, seed: int = 42) -> dict:
    sents = page_sentences(idx, seed)
    text = " ".join(s for s, *_ in sents)
    title = f"Notes {idx}"
    body = "".join(f"<p>{s}</p>" for s, *_ in sents)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>p{{margin:0}}</style></head>"
        f"<body><h1>{title}</h1>{body}"
        f"<script>var x={idx};</script>"
        f"<!-- crawl {idx} --></body></html>"
    )
    host = _zipf_host(seed, idx)
    lang = _LANGS[_h(seed, "lang", idx) % len(_LANGS)]
    ts = datetime.fromtimestamp(1700000000 + (_h(seed, "ts", idx) % 10_000_000), tz=timezone.utc)
    return {
        "url": f"https://{host}/page/{idx}",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas (Arrow-batched);
    each executor generates its own index range — no driver materialize,
    no shuffle."""
    import pandas as pd

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            recs = [page_record(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame.from_records(recs)

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def ground_truth_triples(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """The generator's fact list (subj/pred/obj canonical) — the oracle
    for extraction+linking P/R."""
    import pandas as pd

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                idx = int(i)
                rec = page_record(idx, seed)
                if rec["lang"] != "en":
                    continue
                for sent, s, p, o in page_sentences(idx, seed):
                    if s is not None:
                        rows.append({"url": rec["url"], "subj": s, "pred": p, "obj": o})
            yield pd.DataFrame.from_records(rows, columns=["url", "subj", "pred", "obj"])

    return rng.mapInPandas(gen, schema="url string, subj string, pred string, obj string")


# --- recrawl stream (temporal KG input) -------------------------------------

RECRAWL_TS0 = 1700000000
RECRAWL_STEP_S = 2_592_000  # 30 days between recrawls of the same url


def recrawl_facts(idx: int, seed: int = 42) -> list[tuple]:
    """Deterministic recrawl history for url idx: the same page observed
    at 1-3 crawl times, with facts mutating between crawls the way web
    pages actually drift (object updated, fact deleted, fact added).

    Pure function of (idx, seed) → list of
    ``(url, crawl_id, crawl_ts_epoch, subj, pred, obj)`` with canonical
    names (IRI-ification is the shared F10 rule, applied downstream).
    Per crawl k>0, each fact of crawl k-1 independently: r%5==0 →
    dropped, r%5==1 → object replaced by the next same-class pool
    entity (an UPDATE), else carried; one brand-new fact is appended
    when a separate draw hits. Within-crawl duplicates are collapsed
    and facts emitted in sorted order so the history is a set sequence.
    """
    url = f"https://{_zipf_host(seed, idx)}/page/{idx}"
    base = [
        (s, p, o)
        for _sent, s, p, o, _sa, _oa in page_facts(idx, seed)
        if s is not None
    ]
    pools = {
        "Person": [e[0] for e in _PEOPLE],
        "Organization": [e[0] for e in _ORGS],
        "Place": [e[0] for e in _PLACES],
    }
    obj_class = {canon: o_cls for _s, canon, _sc, o_cls in PREDICATES}
    n_crawls = 1 + _h(seed, "nc", idx) % 3
    ts0 = RECRAWL_TS0 + _h(seed, "rts", idx) % 1_000_000
    cur = sorted(set(base))
    out = []
    for k in range(n_crawls):
        if k > 0:
            nxt = []
            for j, (s, p, o) in enumerate(cur):
                r = _h(seed, "mut", idx, k, j)
                if r % 5 == 0:
                    continue  # fact removed in this recrawl
                if r % 5 == 1:
                    pool = pools[obj_class[p]]
                    o = pool[(pool.index(o) + 1) % len(pool)]
                    if o == s:
                        o = pool[(pool.index(o) + 1) % len(pool)]
                nxt.append((s, p, o))
            if _h(seed, "add", idx, k) % 2 == 0:
                pred_i = _h(seed, "addp", idx, k) % len(PREDICATES)
                _surface, canon, s_cls, o_cls = PREDICATES[pred_i]
                s = pools[s_cls][_h(seed, "adds", idx, k) % len(pools[s_cls])]
                o = pools[o_cls][_h(seed, "addo", idx, k) % len(pools[o_cls])]
                if s != o:
                    nxt.append((s, canon, o))
            cur = sorted(set(nxt))
        ts = ts0 + k * RECRAWL_STEP_S
        out.extend((url, k, ts, s, p, o) for s, p, o in cur)
    return out


RECRAWL_SCHEMA = (
    "url string, crawl_id int, crawl_ts_epoch bigint, "
    "subj string, pred string, obj string"
)


def generate_recrawls(spark: SparkSession, n_urls: int, seed: int = 42,
                      partitions: int | None = None) -> DataFrame:
    """Distributed recrawl-observation stream: spark.range → mapInPandas,
    each executor expands its own url range. Same no-driver-materialize
    contract as generate_pages."""
    import pandas as pd

    rng = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)
    cols = ["url", "crawl_id", "crawl_ts_epoch", "subj", "pred", "obj"]

    def gen(batches):
        for pdf in batches:
            rows = [t for i in pdf["id"] for t in recrawl_facts(int(i), seed)]
            yield pd.DataFrame.from_records(rows, columns=cols)

    return rng.mapInPandas(gen, schema=RECRAWL_SCHEMA)


# --- recrawled page batches (incremental KG maintenance input) ---------------

def recrawled_page_record(idx: int, base_seed: int = 42,
                          content_seed: int = 43) -> dict:
    """A re-crawl of page ``idx``: IDENTITY fields (url, lang) keep the
    base-seed values — the same page, revisited — while html/text are
    regenerated under ``content_seed`` (the page changed between
    crawls) and warc_ts advances one day. Deterministic on both seeds,
    so truth-anchored goldens can derive the post-recrawl corpus
    without running the pipeline."""
    ident = page_record(idx, base_seed)
    content = page_record(idx, content_seed)
    ident["html"] = content["html"]
    ident["text"] = content["text"]
    ident["warc_ts"] = ident["warc_ts"] + timedelta(days=1)
    return ident


def generate_recrawled_pages(
    spark: SparkSession, n: int, mod: int = 10, residue: int = 3,
    base_seed: int = 42, content_seed: int = 43,
    partitions: int | None = None,
) -> DataFrame:
    """The changed-page batch of a recrawl: pages with idx % mod ==
    residue out of the n-page corpus, with regenerated content. Same
    distributed mapInPandas contract as generate_pages."""
    import pandas as pd

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    rng = rng.where((F.col("id") % mod) == residue)

    def gen(batches):
        for pdf in batches:
            recs = [
                recrawled_page_record(int(i), base_seed, content_seed)
                for i in pdf["id"]
            ]
            yield pd.DataFrame.from_records(
                recs, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)
