"""Triple P/R gate: the Spark engine vs the reference-semantics oracle on
the reference's own fixture corpus (BASELINE.json: P/R >= 0.95).

Floats are canonicalized before comparison (Java's Double.toString and
Python's repr disagree in exponent formatting); everything else must
match byte-for-byte.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.manifest import Manifest
from csv_to_jsonld_processor_spark.vocabulary import compile_vocabulary

FIXTURES = "/root/reference/test-data"


def canon(t):
    subj, pred, obj, kind = t
    if kind == "number":
        try:
            obj = repr(round(float(obj), 9))
        except ValueError:
            pass
    return (subj, pred, obj, kind)


@pytest.fixture(scope="module")
def spark():
    from csv_to_jsonld_processor_spark.session import get_spark

    return get_spark("fixture-parity", cpus=8)


@pytest.fixture(scope="module")
def manifest():
    m = Manifest.from_file(f"{FIXTURES}/manifest-total.jsonc")
    assert m.validate() == []
    # the manifest names "Products.csv" but the file on disk is lowercase
    for step in m.instances.sequence:
        if step.path == "Products.csv":
            step.path = "products.csv"
    return m


@pytest.fixture(scope="module")
def vocab(manifest):
    return compile_vocabulary(manifest, FIXTURES)


def test_fixture_triple_parity(spark, manifest, vocab):
    from csv_to_jsonld_processor_spark.operators.instance_steps import build_instance_triples
    from oracle_reference import oracle_triples

    engine = {
        canon(tuple(r))
        for r in build_instance_triples(spark, manifest, vocab, FIXTURES).collect()
    }
    oracle = {canon(t) for t in oracle_triples(manifest, vocab, FIXTURES)}

    inter = engine & oracle
    precision = len(inter) / len(engine) if engine else 0.0
    recall = len(inter) / len(oracle) if oracle else 0.0
    only_engine = sorted(engine - oracle)[:10]
    only_oracle = sorted(oracle - engine)[:10]
    msg = (
        f"P={precision:.4f} R={recall:.4f} engine={len(engine)} oracle={len(oracle)}\n"
        f"engine-only: {only_engine}\noracle-only: {only_oracle}"
    )
    print(msg)
    assert precision >= 0.95 and recall >= 0.95, msg


def test_vocabulary_shape(vocab):
    assert set(vocab.identifiers) == {
        "BillOfMaterials",
        "Manufacturer",
        "Material",
        "Product",
        "WarehouseInventory",
    }
    assert vocab.get_identifier_label("Product") == "Product Identifier"
    # replaced class ids resolve to replaced IRIs
    c = vocab.classes["C858545219"]
    assert c.id.final() == "http://example.com/dell-bom/terms/AccessManagementSystem"
    # replaced property ids emit camelCase finals
    p = vocab.properties["MF1"]
    assert p.id.final() == "http://example.com/dell-bom/terms/type"


def test_fixture_corpus_has_no_violations(spark, manifest, vocab):
    """The reference's own CLI processes this corpus under --strict
    successfully (cli_tests.rs), so the violations path must emit ZERO
    rows here — any row would be a false positive in header validation,
    coercion checking, or picklist enforcement."""
    from csv_to_jsonld_processor_spark.operators.violations import build_instance_outputs

    _, violations = build_instance_outputs(spark, manifest, vocab, FIXTURES, strict=True)
    rows = violations.collect()
    assert rows == [], f"false-positive violations: {rows[:5]}"
