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


def _extract_from_text(
    url: str, text: str, surfaces: list[str], gaz: "re.Pattern"
) -> list[tuple]:
    rows = []
    for si, sent in enumerate(_SENT_SPLIT.split(text)):
        sent = sent.rstrip(".").strip()
        if not sent:
            continue
        for surface in surfaces:
            pat = f" {surface} "
            pos = sent.find(pat)
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

    ordered = sorted(surfaces, key=len, reverse=True)
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
