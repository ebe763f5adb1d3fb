"""The checked-in golden CSVs must stay byte-identical to what their
regeneration tools produce — a drift guard between the independent
oracles (reference-semantics oracle, synthetic generator) and the files
the driver's hash gate actually reads. No Spark needed."""

import csv
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _csv_bytes(header, rows) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(header)
    w.writerows(rows)
    return buf.getvalue()


def test_fixture_triples_golden_is_fresh():
    from csv_to_jsonld_processor_spark.plans.fixture_queries import (
        FIXTURES,
        _load_fixture_manifest,
    )
    from csv_to_jsonld_processor_spark.vocabulary import compile_vocabulary
    from oracle_reference import oracle_triples

    manifest = _load_fixture_manifest()
    vocab = compile_vocabulary(manifest, FIXTURES)
    rows = sorted(oracle_triples(manifest, vocab, FIXTURES))
    want = _csv_bytes(["subj", "pred", "obj", "obj_kind"], rows)
    with open(f"{REPO}/tests/golden/fixture_triples.csv", newline="") as f:
        assert f.read() == want


def test_kg_edges_golden_is_fresh():
    from csv_to_jsonld_processor_spark.iri import to_kebab_case
    from csv_to_jsonld_processor_spark.sources.pages import (
        ENTITIES,
        page_record,
        page_sentences,
    )
    from tools.regen_kg_edges_golden import KG_IDS, N_PAGES, SEED, TERMS

    cls_of = {canonical: cls for canonical, _aliases, cls in ENTITIES}

    def eiri(name: str) -> str:
        return f"{KG_IDS}{to_kebab_case(cls_of[name])}/{to_kebab_case(name)}"

    rows = []
    for idx in range(N_PAGES):
        rec = page_record(idx, SEED)
        if rec["lang"] != "en":
            continue
        for si, (_s, s, p, o) in enumerate(page_sentences(idx, SEED)):
            if s is not None:
                rows.append((rec["url"], si, eiri(s), TERMS + p, eiri(o)))
    rows.sort()
    want = _csv_bytes(["url", "sent_idx", "subj", "pred", "obj"], rows)
    with open(f"{REPO}/tests/golden/kg_webtext_edges.csv", newline="") as f:
        assert f.read() == want
