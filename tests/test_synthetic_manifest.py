"""Exercises the reference paths the BOM fixture corpus never touches:
PicklistStep two-phase ordering, delimitValuesOn, mapToLabel,
namespaceIris, rdfs:label injection (R7), picklist one_of accumulation
(A4) — on a small synthetic corpus with a hand-computed expected triple
set."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.manifest import Manifest
from csv_to_jsonld_processor_spark.vocabulary import compile_vocabulary

MODEL_CSV = """Class Name,Class Description,Property Name,Property Description,Type,Class Range,
Color,Palette color,Color ID,id,@id,,
Color,Palette color,Color Name,name,string,,
Gadget,A gadget,Gadget ID,id,@id,,
Gadget,A gadget,Gadget Name,name,string,,
Gadget,A gadget,has Color,color ref,Picklist,Color,
Gadget,A gadget,Tags,multi,URI,Gadget,
Gadget,A gadget,Weight,weight,Float,,
Gadget,A gadget,Counts,counts,Integer,,
"""

COLORS_CSV = """Color ID,Color Name
red,Red
blue,Blue
"""

GADGETS_CSV = """Gadget ID,Gadget Name,has Color,Tags,Weight,Counts,Mystery
G1,Widget,red,G2;G3,1.5,1;x,m1
G2,Sprocket,blue,,2, 42,m2
G3,Doodad,green,G1,bad,,m3
"""

MANIFEST = {
    "@type": "CSVImportManifest",
    "@id": "model/synth",
    "name": "synthetic",
    "model": {
        "baseIRI": "http://ex.com/terms/",
        "path": "model/",
        "sequence": [
            {
                "path": "Model.csv",
                "@type": ["CSVImportStep", "BasicVocabularyStep"],
                "overrides": [
                    {"column": "Class Name", "mapTo": "$Class.ID"},
                    {"column": "Property Name", "mapTo": "$Property.ID"},
                ],
            }
        ],
    },
    "instances": {
        "baseIRI": "http://ex.com/ids/",
        "namespaceIris": True,
        "path": "instances/",
        "sequence": [
            {
                "path": "Gadgets.csv",
                "@type": ["CSVImportStep", "BasicInstanceStep"],
                "instanceType": "Gadget",
                "mapToLabel": "Gadget Name",
            },
            {
                "path": "Colors.csv",
                "@type": ["CSVImportStep", "PicklistStep"],
                "instanceType": "Color",
                "mapToLabel": "Color Name",
            },
        ],
    },
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    (d / "model").mkdir()
    (d / "instances").mkdir()
    (d / "model" / "Model.csv").write_text(MODEL_CSV)
    (d / "instances" / "Colors.csv").write_text(COLORS_CSV)
    (d / "instances" / "Gadgets.csv").write_text(GADGETS_CSV)
    return str(d)


@pytest.fixture(scope="module")
def spark():
    from csv_to_jsonld_processor_spark.session import get_spark

    return get_spark("synth-manifest", cpus=8)


def test_picklist_first_ordering():
    m = Manifest.from_dict(MANIFEST)
    seq = m.instance_sequence()
    assert seq[0].has_type("PicklistStep")  # reordered ahead of Gadgets


def test_vocab_picklist_label_injection(corpus):
    m = Manifest.from_dict(MANIFEST)
    vocab = compile_vocabulary(m, corpus)
    # R7: Color is a Picklist target → rdfs:label property injected
    assert "rdfs:label" in vocab.properties
    color = vocab.classes["Color"]
    label_targets = [r.target for r in color.range or []]
    assert any(t and t.endswith("rdfs:label") or t == "rdfs:label" for t in label_targets) or any(
        "rdfs:label" in (t or "") for t in label_targets
    )
    # has Color range is Picklist(ColorIRI)
    hc = vocab.properties["hasColor"]
    assert hc.range[0].kind == "Picklist"
    assert hc.range[0].target == "http://ex.com/terms/Color"


def test_synthetic_triples(spark, corpus):
    from csv_to_jsonld_processor_spark.operators.instance_steps import build_instance_triples

    m = Manifest.from_dict(MANIFEST)
    vocab = compile_vocabulary(m, corpus)
    triples = {tuple(r) for r in build_instance_triples(spark, m, vocab, corpus).collect()}

    # namespaceIris: subjects are kebab(class)/id
    assert ("gadget/G1", "@type", "Gadget", "type") in triples
    assert ("color/red", "@type", "Color", "type") in triples
    # mapToLabel duplicates into "label"
    assert ("gadget/G1", "label", "Widget", "string") in triples
    assert ("gadget/G1", "Gadget Name", "Widget", "string") in triples
    assert ("color/red", "label", "Red", "string") in triples
    # delimit split on default ';' for non-String URI column + J5 namespacing
    assert ("gadget/G1", "Tags", "gadget/G2", "ref") in triples
    assert ("gadget/G1", "Tags", "gadget/G3", "ref") in triples
    # picklist value namespaced by target class kebab
    assert ("gadget/G1", "has Color", "color/red", "ref") in triples
    # decimal coercion + fallback
    assert ("gadget/G1", "Weight", "1.5", "number") in triples
    assert ("gadget/G3", "Weight", "bad", "string") in triples
    # per-element typing of multi-value cells (value_processor.rs types
    # each split value independently, not the whole cell)
    assert ("gadget/G1", "Counts", "1", "number") in triples
    assert ("gadget/G1", "Counts", "x", "string") in triples
    # padded single value: kind computed on the trimmed element
    assert ("gadget/G2", "Counts", "42", "number") in triples


def test_oracle_agrees_on_synthetic(spark, corpus):
    from csv_to_jsonld_processor_spark.operators.instance_steps import build_instance_triples
    from oracle_reference import oracle_triples

    m = Manifest.from_dict(MANIFEST)
    vocab = compile_vocabulary(m, corpus)
    engine = {tuple(r) for r in build_instance_triples(spark, m, vocab, corpus).collect()}
    oracle = oracle_triples(m, vocab, corpus)
    assert engine == oracle, (
        f"engine-only={sorted(engine - oracle)[:6]} oracle-only={sorted(oracle - engine)[:6]}"
    )


def test_violations_lenient(spark, corpus):
    """A7 + J4: unknown header, failed Integer coercion, and picklist
    membership failures route to the violations DataFrame; Decimal
    fallback stays silent (reference value_processor.rs:106-114)."""
    from csv_to_jsonld_processor_spark.operators.violations import build_instance_outputs

    m = Manifest.from_dict(MANIFEST)
    vocab = compile_vocabulary(m, corpus)
    triples_df, violations_df = build_instance_outputs(spark, m, vocab, corpus, strict=False)

    # A4: one_of accumulated from the PicklistStep rows, base-expanded
    assert vocab.classes["Color"].one_of == [
        "http://ex.com/ids/color/red",
        "http://ex.com/ids/color/blue",
    ]

    v = [(r.rule, r.subj, r.pred, r.value, r.severity) for r in violations_df.collect()]
    assert ("header_validation", None, "Mystery",
            "Unknown column found in CSV for class 'Gadget'", "warning") in [
        (r[0], r[1], r[2], r[3], r[4]) for r in v
    ]
    assert ("value_validation", "gadget/G1", "Counts", "x", "warning") in v
    # G3's picklist value 'green' is not in {red, blue}
    assert ("picklist_validation", "gadget/G3", "has Color", "color/green", "warning") in v
    # valid picklist values pass the broadcast anti-join
    assert not any(r[0] == "picklist_validation" and r[3] in ("color/red", "color/blue") for r in v)
    # Decimal fallback ('bad') must NOT warn — the reference is silent there
    assert not any(r[3] == "bad" for r in v)
    # triples identical to the plain builder
    from csv_to_jsonld_processor_spark.operators.instance_steps import build_instance_triples

    vocab2 = compile_vocabulary(m, corpus)
    plain = {tuple(r) for r in build_instance_triples(spark, m, vocab2, corpus).collect()}
    assert {tuple(r) for r in triples_df.collect()} == plain


def test_strict_mode_fails_run(spark, corpus, tmp_path):
    """Strict escalates violations to errors and the pipeline run fails
    (reference is_strict Err path); lenient run succeeds with warnings."""
    from csv_to_jsonld_processor_spark.plans.pipeline import Pipeline

    m = Manifest.from_dict(MANIFEST)
    strict_out = Pipeline(m, corpus, strict=True).run(spark, tmp_path / "strict")
    assert not strict_out.ok
    assert any("picklist_validation" in e or "value_validation" in e for e in strict_out.errors)

    m2 = Manifest.from_dict(MANIFEST)
    lenient_out = Pipeline(m2, corpus, strict=False).run(spark, tmp_path / "lenient")
    assert lenient_out.ok
    assert lenient_out.warnings  # same issues, downgraded
    # violations parquet is always written
    viol = spark.read.parquet(str(tmp_path / "lenient" / "violations.parquet"))
    assert viol.count() >= 3
    # vocabulary export carries the accumulated f:oneOf
    import json as _json

    vocab_doc = _json.loads((tmp_path / "lenient" / "vocabulary.jsonld").read_text())
    color = next(c for c in vocab_doc["insert"]["f:classes"] if c["@id"].endswith("Color"))
    assert set(color["f:oneOf"]) == {
        "http://ex.com/ids/color/red",
        "http://ex.com/ids/color/blue",
    }


def test_vocab_meta_reload_identical(spark, corpus, tmp_path):
    """S5: a run driven by the exported vocab_meta.json (model phase
    skipped) must produce byte-identical outputs to the compiled run
    (vocabulary/processor.rs:64-133 round-trip)."""
    from csv_to_jsonld_processor_spark.plans.pipeline import Pipeline

    out1, out2 = tmp_path / "o1", tmp_path / "o2"
    r1 = Pipeline(Manifest.from_dict(MANIFEST), corpus).run(spark, out1)
    assert r1.ok
    r2 = Pipeline(
        Manifest.from_dict(MANIFEST), corpus, vocab_meta=out1 / "vocab_meta.json"
    ).run(spark, out2)
    assert r2.ok
    for name in ("instances.jsonld", "vocabulary.jsonld", "vocab_meta.json"):
        assert (out1 / name).read_text() == (out2 / name).read_text(), name
