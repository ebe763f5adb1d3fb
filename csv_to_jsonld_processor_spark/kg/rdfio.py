"""RDF N-Quads codec: a full serializer/parser pair for the interchange
format a KG construction pipeline ships and ingests (reference analog:
csv-to-jsonld emits JSON-LD documents, `csv-to-jsonld-lib/src/manifest/
mod.rs` write path; N-Quads is the line-oriented sibling every triple
store bulk-loads).

The round-1..4 ``kg_nquads_export`` (triplestore.py:148) serializes only
IRI-object quads.  This module closes the codec: the WRITE side covers
the whole term grammar — blank-node subjects, plain / language-tagged /
datatyped literals with canonical string escapes (``\\\\ \\" \\n \\r
\\t``), named vs default graphs — as pure JVM expressions riding the
scan (zero Python in the export path); the READ side is a cursor
tokenizer (no backtracking regex) handling ECHAR + ``\\uXXXX`` /
``\\UXXXXXXXX`` UCHAR escapes in both literals and IRIs, comments,
blank lines, arbitrary horizontal whitespace, and malformed-line
classification, run distributed as an Arrow-batched ``mapInPandas``
(the same codec shape as sources/warc.py — per-line Python is the
honest path for a text wire format; each line parses independently so
the op is embarrassingly parallel and shuffle-free at 10^12 lines).

Correctness gate (``kg_nquads_roundtrip``): a deterministic quad corpus
is derived from the truth-anchored golden edge table by md5 gates —
1/4 of subjects become blank nodes, objects split into IRI / nasty
plain literal (quotes, backslashes, newlines, tabs, CR, multibyte
suffixes) / lang-tagged / xsd:integer-typed quarters, half the quads
get a named graph — then serialized, polluted with deterministic
comment / blank / malformed lines, PARSED BACK, and aggregated.  The
DuckDB oracle constructs the same ground truth directly from the golden
CSV and never serializes or parses: if escaping or tokenizing mangles
one byte of one term, a group checksum diverges and the row goes red.

Scale notes: serialize and parse are both per-row narrow ops (no
shuffle until the final bounded aggregation, ≤ 9 groups); a 100 TB
export/ingest is pure map work plus one tiny partial-aggregated
groupBy.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _GOLDEN_EDGES, kg_webtext_edges

_US = "\x1f"  # field separator inside checksum tuples (never in term text)
_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

# nasty literal suffixes the round-trip must survive byte-exactly
_SPECIALS = [
    'q"q',
    "b\\b",
    "n\nn",
    "t\tt r\rr",
    "ué∆",
    '"\\\n\t mixü',
]


# ---------------------------------------------------------------------------
# Python codec (unit-testable; the parser is what mapInPandas runs)
# ---------------------------------------------------------------------------

_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}
_ESC_OUT = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def escape_literal(value: str) -> str:
    """Canonical N-Quads string escaping (backslash first)."""
    out = []
    for ch in value:
        out.append(_ESC_OUT.get(ch, ch))
    return "".join(out)


_IRI_ILLEGAL = set(' <>"{}|^`\\') | {chr(c) for c in range(0x21)}


def _check_iri(iri: str) -> str:
    """Reject IRIs the N-Quads grammar cannot carry unescaped — the
    serializer refuses rather than silently emitting a line its own
    parser would classify '#malformed' (quad loss).  The KG pipeline
    guarantees this upstream (kg/graph.py ``validate_node_iris`` routes
    bad IRIs to the violations table); this guard covers direct
    callers."""
    bad = _IRI_ILLEGAL.intersection(iri)
    if bad:
        raise ValueError(f"IRI contains characters illegal in N-Quads: {sorted(bad)!r}")
    return iri


def quad_to_line(subj: str, pred: str, kind: str, value: str,
                 lang: Optional[str] = None, dt: Optional[str] = None,
                 graph: Optional[str] = None) -> str:
    """Serialize one quad. ``subj`` starting with ``_:`` is a blank
    node; ``kind`` in {iri, plain, lang, typed} picks the object form.
    IRI positions are validated — see :func:`_check_iri`."""
    for term in (subj if not subj.startswith("_:") else None, pred,
                 value if kind == "iri" else None, dt, graph):
        if term is not None:
            _check_iri(term)
    s = subj if subj.startswith("_:") else f"<{subj}>"
    if kind == "iri":
        o = f"<{value}>"
    else:
        o = f'"{escape_literal(value)}"'
        if kind == "lang":
            o += f"@{lang}"
        elif kind == "typed":
            o += f"^^<{dt}>"
    g = f" <{graph}>" if graph else ""
    return f"{s} <{pred}> {o}{g} ."


def _uchar(s: str, i: int) -> Tuple[str, int]:
    """Decode \\uXXXX / \\UXXXXXXXX at s[i] == '\\\\'."""
    width = 4 if s[i + 1] == "u" else 8
    cp = int(s[i + 2: i + 2 + width], 16)
    return chr(cp), i + 2 + width


def _parse_iriref(s: str, i: int) -> Tuple[str, int]:
    # s[i] == '<'
    i += 1
    out = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == ">":
            return "".join(out), i + 1
        if c == "\\":
            if i + 1 < n and s[i + 1] in ("u", "U"):
                ch, i = _uchar(s, i)
                out.append(ch)
                continue
            raise ValueError("bad IRI escape")
        if c in ' "{}|^`' or ord(c) <= 0x20:
            raise ValueError("illegal IRI char")
        out.append(c)
        i += 1
    raise ValueError("unterminated IRI")


def _parse_string(s: str, i: int) -> Tuple[str, int]:
    # s[i] == '"'
    i += 1
    out = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            if i + 1 >= n:
                raise ValueError("dangling escape")
            nxt = s[i + 1]
            if nxt in ("u", "U"):
                ch, i = _uchar(s, i)
                out.append(ch)
                continue
            if nxt not in _ECHAR:
                raise ValueError("bad string escape")
            out.append(_ECHAR[nxt])
            i += 2
            continue
        if c in ("\n", "\r"):
            raise ValueError("raw newline in literal")
        out.append(c)
        i += 1
    raise ValueError("unterminated literal")


def _parse_bnode(s: str, i: int) -> Tuple[str, int]:
    # s[i:i+2] == '_:'
    j = i + 2
    n = len(s)
    while j < n and (s[j].isalnum() or s[j] in "_.-"):
        j += 1
    label = s[i:j]
    # PN_CHARS: a label cannot END with '.' — give trailing dots back
    # to the stream (they are statement terminators)
    while label.endswith("."):
        label = label[:-1]
        j -= 1
    if len(label) <= 2:
        raise ValueError("empty blank-node label")
    return label, j


def parse_nquads_line(line: str):
    """Parse one N-Quads line.  Returns
    ``('#blank',)`` / ``('#comment',)`` / ``('#malformed',)`` for
    non-statement lines, else
    ``('quad', subj, pred, obj_kind, obj_value, lang, dt, graph)``
    where subj/graph keep their ``_:`` prefix for blank nodes and
    obj_kind ∈ {iri, plain, lang, typed}."""
    stripped = line.strip()
    if not stripped:
        return ("#blank",)
    if stripped.startswith("#"):
        return ("#comment",)
    try:
        terms = []  # (tkind, value, lang, dt)
        i, n = 0, len(line)
        ended = False
        while True:
            while i < n and line[i] in " \t":
                i += 1
            if i >= n:
                raise ValueError("missing terminator")
            c = line[i]
            if c == ".":
                # W3C grammar allows an end-of-line comment after '.'
                tail = line[i + 1:].strip()
                if tail and not tail.startswith("#"):
                    raise ValueError("content after terminator")
                ended = True
                break
            if c == "<":
                v, i = _parse_iriref(line, i)
                terms.append(("iri", v, None, None))
            elif c == "_":
                if i + 1 >= n or line[i + 1] != ":":
                    raise ValueError("bad blank node")
                v, i = _parse_bnode(line, i)
                terms.append(("bnode", v, None, None))
            elif c == '"':
                v, i = _parse_string(line, i)
                if i < n and line[i] == "@":
                    j = i + 1
                    while j < n and (line[j].isalnum() or line[j] == "-"):
                        j += 1
                    if j == i + 1:
                        raise ValueError("empty langtag")
                    terms.append(("lang", v, line[i + 1: j], None))
                    i = j
                elif line[i: i + 2] == "^^":
                    dt, i = _parse_iriref(line, i + 2)
                    terms.append(("typed", v, None, dt))
                else:
                    terms.append(("plain", v, None, None))
            else:
                raise ValueError(f"unexpected char {c!r}")
        if not ended or len(terms) not in (3, 4):
            raise ValueError("wrong term count")
        sk, sv = terms[0][0], terms[0][1]
        if sk not in ("iri", "bnode"):
            raise ValueError("bad subject kind")
        if terms[1][0] != "iri":
            raise ValueError("predicate must be IRI")
        ok, ov, olang, odt = terms[2]
        graph = None
        if len(terms) == 4:
            gk, gv = terms[3][0], terms[3][1]
            if gk not in ("iri", "bnode"):
                raise ValueError("bad graph term")
            graph = gv
        return ("quad", sv, terms[1][1], ok, ov, olang, odt, graph)
    except (ValueError, IndexError):
        return ("#malformed",)


def read_nquads(lines: DataFrame, col: str = "line") -> DataFrame:
    """Distributed N-Quads reader: DataFrame of text lines → DataFrame
    of (subj, pred, obj_kind, obj_value, lang, dt, graph); comment /
    blank / malformed lines come back with obj_kind = '#comment' /
    '#blank' / '#malformed' and null terms so callers can audit them.
    Arrow-batched per partition; no shuffle."""
    import pandas as pd

    schema = ("subj string, pred string, obj_kind string, obj_value string, "
              "lang string, dt string, graph string")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["subj", "pred", "obj_kind", "obj_value", "lang", "dt", "graph"]
        for pdf in batches:
            rows = []
            for line in pdf[col].astype(str):
                r = parse_nquads_line(line)
                if r[0] == "quad":
                    _, s, p, ok, ov, olang, odt, g = r
                    rows.append((s, p, ok, ov, olang, odt, g))
                else:
                    rows.append((None, None, r[0], None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return lines.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Spark-expression serializer (the export hot path: zero Python)
# ---------------------------------------------------------------------------

def _esc_expr(c: F.Column) -> F.Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _gate(key: F.Column, off: int, mod: int) -> F.Column:
    return F.conv(F.substring(F.md5(key), off, 4), 16, 10).cast("long") % mod


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression (chr() for anything
    that would need SQL escaping, plain quoted runs otherwise)."""
    parts, run = [], ""
    for ch in s:
        o = ord(ch)
        if 32 <= o < 127 and ch not in ("'", "\\"):
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({o})")
    if run:
        parts.append(f"'{run}'")
    return "(" + " || ".join(parts) + ")" if parts else "''"


def _ground_truth(edges: DataFrame) -> DataFrame:
    """Deterministic quad corpus from the edge table (same md5 gates as
    the oracle SQL): columns s, p, kind, val, lang, dt, graph(+null)."""
    rk = F.concat_ws(
        _US, "url", F.col("sent_idx").cast("string"), "subj", "pred", "obj"
    )
    g_subj = _gate(rk, 1, 4)
    g_obj = _gate(rk, 5, 4)
    g_sfx = _gate(rk, 9, 6)
    g_graph = _gate(rk, 13, 2)
    sfx = F.element_at(
        F.array(*[F.lit(s) for s in _SPECIALS]), (g_sfx + 1).cast("int")
    )
    return edges.select(
        F.when(
            g_subj == 0, F.concat(F.lit("_:b"), F.substring(F.md5("subj"), 1, 12))
        ).otherwise(F.col("subj")).alias("s"),
        F.col("pred").alias("p"),
        F.when(g_obj == 0, F.lit("iri"))
        .when(g_obj == 1, F.lit("plain"))
        .when(g_obj == 2, F.lit("lang"))
        .otherwise(F.lit("typed")).alias("kind"),
        F.when(g_obj == 0, F.col("obj"))
        .when(g_obj == 1, F.concat(F.lit("v:"), F.col("obj"), sfx))
        .when(g_obj == 2, F.concat(F.lit("L:"), F.col("obj")))
        .otherwise(F.col("sent_idx").cast("string")).alias("val"),
        F.when(g_obj == 2,
               F.when(g_sfx % 2 == 0, F.lit("en")).otherwise(F.lit("de-DE")))
        .otherwise(F.lit("")).alias("lang"),
        F.when(g_obj == 3, F.lit(_XSD_INT)).otherwise(F.lit("")).alias("dt"),
        F.when(g_graph == 0, F.col("url")).alias("graph"),
        _gate(rk, 17, 8).alias("g_comment"),
        _gate(rk, 21, 8).alias("g_blankln"),
        _gate(rk, 25, 16).alias("g_malformed"),
        _gate(rk, 29, 3).alias("g_ws"),
        F.md5(rk).alias("rk_md5"),
    )


def write_nquads_lines(truth: DataFrame) -> DataFrame:
    """Expression-side serializer over the ground-truth quads, plus the
    deterministic pollution lines (comments / blanks / malformed) that
    the parser must classify and skip.  Returns one column ``line``.

    Precondition: IRI-position values contain no characters illegal in
    an unescaped IRIREF (space, angle brackets, quote, control chars) —
    guaranteed for pipeline edges by kg/graph.py ``validate_node_iris``;
    the Python twin :func:`quad_to_line` enforces it for direct use."""
    sep = F.when(F.col("g_ws") == 0, F.lit("\t")).otherwise(F.lit(" "))
    s_term = F.when(F.col("s").startswith("_:"), F.col("s")).otherwise(
        F.concat(F.lit("<"), F.col("s"), F.lit(">"))
    )
    o_term = F.when(
        F.col("kind") == "iri", F.concat(F.lit("<"), F.col("val"), F.lit(">"))
    ).otherwise(
        F.concat(
            F.lit('"'), _esc_expr(F.col("val")), F.lit('"'),
            F.when(F.col("kind") == "lang", F.concat(F.lit("@"), F.col("lang")))
            .when(F.col("kind") == "typed",
                  F.concat(F.lit("^^<"), F.col("dt"), F.lit(">")))
            .otherwise(F.lit("")),
        )
    )
    g_term = F.when(
        F.col("graph").isNotNull(),
        F.concat(sep, F.lit("<"), F.col("graph"), F.lit(">")),
    ).otherwise(F.lit(""))
    quad_lines = truth.select(
        F.concat(
            s_term, sep, F.lit("<"), F.col("p"), F.lit(">"), sep, o_term,
            g_term, sep, F.lit("."),
        ).alias("line")
    )
    comments = truth.filter(F.col("g_comment") == 0).select(
        F.concat(F.lit("# src="), F.col("rk_md5")).alias("line")
    )
    blanks = truth.filter(F.col("g_blankln") == 0).select(
        F.lit("   \t ").alias("line")
    )
    malformed = truth.filter(F.col("g_malformed") == 0).select(
        F.concat(F.lit("<"), F.col("s"), F.lit('> <'), F.col("p"),
                 F.lit('> "broken')).alias("line")
    )
    return quad_lines.unionAll(comments).unionAll(blanks).unionAll(malformed)


def kg_nquads_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize the gated quad corpus to N-Quads text (JVM exprs),
    parse it back (distributed tokenizer), and aggregate per
    (object kind, default-graph flag): quad count, blank-node-subject
    count, an order-free checksum over the md5 of each parsed term
    tuple, and the lexical min/max tuple md5.  Meta rows ('#comment',
    '#blank', '#malformed', in_default = -1) audit the skipped lines.
    The oracle builds the identical tuples straight from the golden
    edge CSV — it never serializes or parses."""
    edges = kg_webtext_edges(spark, sf_dir)
    truth = _ground_truth(edges)
    parsed = read_nquads(write_nquads_lines(truth))

    is_meta = F.col("obj_kind").startswith("#")
    tup = F.concat_ws(
        _US,
        F.coalesce("subj", F.lit("")), F.coalesce("pred", F.lit("")),
        F.coalesce("obj_kind", F.lit("")), F.coalesce("obj_value", F.lit("")),
        F.coalesce("lang", F.lit("")), F.coalesce("dt", F.lit("")),
        F.coalesce("graph", F.lit("")),
    )
    tm = F.when(~is_meta, F.md5(tup))
    return (
        parsed.select(
            "obj_kind",
            F.when(is_meta, F.lit(-1))
            .when(F.col("graph").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("in_default"),
            F.when(F.col("subj").startswith("_:"), F.lit(1))
            .otherwise(F.lit(0)).alias("bn"),
            tm.alias("tm"),
        )
        .groupBy("obj_kind", "in_default")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_quads"),
            F.sum("bn").cast("long").alias("n_bnode_subj"),
            F.coalesce(
                F.sum(F.conv(F.substring("tm", 1, 8), 16, 10).cast("long")),
                F.lit(0),
            ).cast("long").alias("checksum"),
            F.coalesce(F.min("tm"), F.lit("")).alias("min_md5"),
            F.coalesce(F.max("tm"), F.lit("")).alias("max_md5"),
        )
        .orderBy("obj_kind", "in_default")
    )


_SFX_SQL = ("CASE g_sfx " + " ".join(
    f"WHEN {i} THEN {_sql_str(s)}" for i, s in enumerate(_SPECIALS)
) + " END")

# Shared ground-truth CTE chain (e → k → g → q): the gated quad corpus
# reconstructed straight from the golden edge CSV.  Reused by the SHACL
# validator oracle (kg/shacl.py) — any consumer gets the exact table
# that _ground_truth() computes on the Spark side.
GROUND_TRUTH_CTES = f"""e AS (SELECT * FROM read_csv('{_GOLDEN_EDGES}', header=true, all_varchar=true)),
k AS (
  SELECT *, url || chr(31) || sent_idx || chr(31) || subj || chr(31)
            || pred || chr(31) || obj AS rk
  FROM e
),
g AS (
  SELECT *,
    (CAST(('0x' || substr(md5(rk), 1, 4)) AS BIGINT) % 4)  AS g_subj,
    (CAST(('0x' || substr(md5(rk), 5, 4)) AS BIGINT) % 4)  AS g_obj,
    (CAST(('0x' || substr(md5(rk), 9, 4)) AS BIGINT) % 6)  AS g_sfx,
    (CAST(('0x' || substr(md5(rk),13, 4)) AS BIGINT) % 2)  AS g_graph,
    (CAST(('0x' || substr(md5(rk),17, 4)) AS BIGINT) % 8)  AS g_comment,
    (CAST(('0x' || substr(md5(rk),21, 4)) AS BIGINT) % 8)  AS g_blankln,
    (CAST(('0x' || substr(md5(rk),25, 4)) AS BIGINT) % 16) AS g_malformed
  FROM k
),
q AS (
  SELECT
    CASE WHEN g_subj = 0 THEN '_:b' || substr(md5(subj), 1, 12) ELSE subj END AS s,
    pred AS p,
    CASE g_obj WHEN 0 THEN 'iri' WHEN 1 THEN 'plain'
               WHEN 2 THEN 'lang' ELSE 'typed' END AS kind,
    CASE g_obj WHEN 0 THEN obj
               WHEN 1 THEN 'v:' || obj || {_SFX_SQL}
               WHEN 2 THEN 'L:' || obj
               ELSE sent_idx END AS val,
    CASE WHEN g_obj = 2 THEN (CASE WHEN g_sfx % 2 = 0 THEN 'en' ELSE 'de-DE' END)
         ELSE '' END AS lang,
    CASE WHEN g_obj = 3 THEN '{_XSD_INT}' ELSE '' END AS dt,
    CASE WHEN g_graph = 0 THEN url ELSE '' END AS graph
  FROM g
)"""

KG_NQUADS_ROUNDTRIP_SQL = f"""
WITH {GROUND_TRUTH_CTES},
t AS (
  SELECT kind, CASE WHEN graph = '' THEN 1 ELSE 0 END AS in_default,
         CASE WHEN substr(s, 1, 2) = '_:' THEN 1 ELSE 0 END AS is_bnode,
         md5(s || chr(31) || p || chr(31) || kind || chr(31) || val
             || chr(31) || lang || chr(31) || dt || chr(31) || graph) AS tm
  FROM q
),
quads AS (
  SELECT kind AS obj_kind, in_default,
         CAST(COUNT(*) AS BIGINT) AS n_quads,
         CAST(SUM(is_bnode) AS BIGINT) AS n_bnode_subj,
         CAST(SUM(CAST(('0x' || substr(tm, 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
         MIN(tm) AS min_md5, MAX(tm) AS max_md5
  FROM t GROUP BY kind, in_default
),
meta AS (
  SELECT '#comment' AS obj_kind, -1 AS in_default,
         CAST(SUM(CASE WHEN g_comment = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quads,
         CAST(0 AS BIGINT) AS n_bnode_subj, CAST(0 AS BIGINT) AS checksum,
         '' AS min_md5, '' AS max_md5
  FROM g
  UNION ALL
  SELECT '#blank', -1,
         CAST(SUM(CASE WHEN g_blankln = 0 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), '', ''
  FROM g
  UNION ALL
  SELECT '#malformed', -1,
         CAST(SUM(CASE WHEN g_malformed = 0 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), '', ''
  FROM g
)
SELECT * FROM quads
UNION ALL
SELECT * FROM meta
ORDER BY obj_kind, in_default
"""


KG_RDFIO_QUERIES: dict[str, tuple] = {
    "kg_nquads_roundtrip": (kg_nquads_roundtrip, KG_NQUADS_ROUNDTRIP_SQL),
}
