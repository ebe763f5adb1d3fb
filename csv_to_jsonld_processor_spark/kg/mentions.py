"""Batched mention detection + (subj, pred, obj) triple extraction.

The web-text analog of the reference's cell→typed-value step (SURVEY
§7.0): a page's sentences are "rows", predicate surface phrases are the
"headers", and mentions are the "cell values". Runs as ``mapInPandas``
over whole partitions (Arrow batches; no per-row Python calls back to
the JVM) per BASELINE.json input_hint.

Extraction is pattern-based and deterministic: for each sentence,
the first predicate surface phrase found splits it into a subject
mention (left) and object mention (right). Surface phrases come from
the broadcast predicate context (kg/canonicalize.py) — the analog of
the reference mapping CSV headers through the vocabulary (P1/P5).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTIONS_SCHEMA = (
    "url string, sent_idx int, subj_mention string, pred_surface string, obj_mention string"
)

# sentence split on ". " except after an initial ("A. Lovelace")
_SENT_SPLIT = re.compile(r"(?<!\s[A-Z])(?<!^[A-Z])\. ")


def _compile_gazetteer(gazetteer: list[str]) -> "re.Pattern":
    """Alternation over known surface forms, longest-first so
    'Stark Industries' beats 'Stark'; word-bounded."""
    parts = sorted({re.escape(g) for g in gazetteer}, key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(parts) + r")\b")


def _padded(surfaces: list[str]) -> list[tuple[str, str]]:
    """[(surface, ' surface ')]: the search patterns are loop constants —
    precompute once per partition, not per sentence × surface."""
    return [(s, f" {s} ") for s in surfaces]


def _extract_from_text(
    url: str, text: str, surfaces: list[tuple[str, str]], gaz: "re.Pattern"
) -> list[tuple]:
    """``surfaces`` is the _padded() pair list (ordered longest-first)."""
    rows = []
    find = str.find
    for si, sent in enumerate(_SENT_SPLIT.split(text)):
        sent = sent.rstrip(".").strip()
        if not sent:
            continue
        for surface, pat in surfaces:
            pos = find(sent, pat)
            if pos <= 0:
                continue
            # subject: gazetteer match ending nearest before the predicate;
            # object: match starting nearest after it
            subj = obj = None
            for m in gaz.finditer(sent):
                if m.end() <= pos:
                    subj = m.group(0)
                elif m.start() >= pos + len(pat) and obj is None:
                    obj = m.group(0)
            if subj and obj:
                rows.append((url, si, subj, surface, obj))
            break
    return rows


def extract_mentions(
    pages: DataFrame,
    surfaces: list[str],
    gazetteer: list[str],
    text_col: str = "extracted_text",
    lang_filter: str | None = "en",
) -> DataFrame:
    """pages(url, ..., text) → mention triples. Filter first (predicate
    pushdown to the scan), then Arrow-batched extraction; longest
    surfaces are tried first so 'is the founder of' wins over 'founded'.

    Mention detection is gazetteer-NER (alias surface forms); the
    *linking* stage still owns disambiguation — the same surface can map
    to several canonical entities."""
    import pandas as pd

    ordered = _padded(sorted(surfaces, key=len, reverse=True))
    gaz = _compile_gazetteer(gazetteer)
    src = pages
    if lang_filter is not None and "lang" in pages.columns:
        src = src.where(F.col("lang") == lang_filter)
    src = src.select("url", text_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[tuple] = []
            for url, text in zip(pdf["url"], pdf[text_col]):
                if text:
                    rows.extend(_extract_from_text(url, text, ordered, gaz))
            yield pd.DataFrame(
                rows, columns=["url", "sent_idx", "subj_mention", "pred_surface", "obj_mention"]
            )

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)


LINKED_SCHEMA = MENTIONS_SCHEMA + (
    ", subj_mention_entity string, subj_mention_class string, subj_mention_score double"
    ", obj_mention_entity string, obj_mention_class string, obj_mention_score double"
)


def extract_link_from_html(
    pages: DataFrame,
    surfaces: list[str],
    gazetteer: list[str],
    idx: dict,
    lang_filter: str | None = "en",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Fully fused HTML→text→mentions→LINK in one mapInPandas stage.

    When the KB is dimension-sized it rides into the UDF as a broadcast
    dict and linking needs no join at all — the whole pipeline becomes a
    single shuffle-free scan (the 100 TB fast path; hub-entity skew is
    moot because every partition resolves its own mentions locally).
    The output matches link_mentions(broadcast|salted_shuffle) exactly.

    ``passthrough`` names page columns to replicate onto each emitted
    row (e.g. ``("warc_ts",)`` so streaming aggregations can watermark
    on crawl time). Empty by default — the hot path is byte-identical
    to the benchmarked round-2 stage when unused.
    """
    import pandas as pd

    from ..extract import extract_text
    from .link import resolve_mention

    ordered = _padded(sorted(surfaces, key=len, reverse=True))
    gaz = _compile_gazetteer(gazetteer)
    src = pages
    if lang_filter is not None and "lang" in pages.columns:
        src = src.where(F.col("lang") == lang_filter)
    src = src.select("url", "html", *passthrough)
    bidx = src.sparkSession.sparkContext.broadcast(idx)

    cols = [
        "url", "sent_idx", "subj_mention", "pred_surface", "obj_mention",
        "subj_mention_entity", "subj_mention_class", "subj_mention_score",
        "obj_mention_entity", "obj_mention_class", "obj_mention_score",
    ] + list(passthrough)
    schema = LINKED_SCHEMA
    if passthrough:
        extra = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
        schema += ", " + ", ".join(f"{c} {extra[c]}" for c in passthrough)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        local_idx = bidx.value
        cache: dict[str, tuple] = {}

        def link(m: str):
            r = cache.get(m)
            if r is None:
                r = resolve_mention(m, local_idx) or (None, None, None)
                cache[m] = r
            return r

        for pdf in batches:
            rows: list[tuple] = []
            extras_cols = [pdf[c] for c in passthrough]
            for url, html, *extras in zip(pdf["url"], pdf["html"], *extras_cols):
                if html is None:
                    continue
                text = extract_text(bytes(html))
                for u, si, subj, surf, obj in _extract_from_text(url, text, ordered, gaz):
                    se, sc, ss = link(subj)
                    oe, oc, os_ = link(obj)
                    rows.append((u, si, subj, surf, obj, se, sc, ss, oe, oc, os_, *extras))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, schema=schema)


def extract_mentions_from_html(
    pages: DataFrame,
    surfaces: list[str],
    gazetteer: list[str],
    lang_filter: str | None = "en",
) -> DataFrame:
    """Fused HTML→text→mentions in ONE mapInPandas stage.

    Two separate pandas stages would round-trip the binary ``html``
    column (the widest column in the table) through Arrow twice —
    Catalyst cannot column-prune through a mapInPandas barrier. Fusing
    halves Arrow traffic and drops a full Python-worker stage; this is
    the production path, while extract_pages stays the golden-hash
    surface (both call the same pinned ``extract_text``).
    """
    import pandas as pd

    from ..extract import extract_text

    ordered = _padded(sorted(surfaces, key=len, reverse=True))
    gaz = _compile_gazetteer(gazetteer)
    src = pages
    if lang_filter is not None and "lang" in pages.columns:
        src = src.where(F.col("lang") == lang_filter)
    src = src.select("url", "html")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[tuple] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                if html is not None:
                    text = extract_text(bytes(html))
                    rows.extend(_extract_from_text(url, text, ordered, gaz))
            yield pd.DataFrame(
                rows, columns=["url", "sent_idx", "subj_mention", "pred_surface", "obj_mention"]
            )

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)
