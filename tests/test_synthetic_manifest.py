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

GADGETS_CSV = """Gadget ID,Gadget Name,has Color,Tags,Weight,Counts
G1,Widget,red,G2;G3,1.5,1;x
G2,Sprocket,blue,,2, 42
G3,Doodad,green,G1,bad,
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
