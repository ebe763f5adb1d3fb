"""Unit tests for F1–F5/F10–F11 mirroring the reference's own test cases
(csv-to-jsonld-lib/src/utils/mod.rs:218-278) plus coercion vectors from
FIXTURES.md §D."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.iri import (
    are_conflicting,
    expand_iri_with_base,
    namespace_iri,
    normalize_label_for_iri,
    to_camel_case,
    to_kebab_case,
    to_pascal_case,
)


def test_expand_iri_with_base_and_spaces():
    assert (
        expand_iri_with_base("http://example.com/base/", "resource with spaces")
        == "http://example.com/base/resource with spaces"
    )


def test_expand_iri_with_base():
    base = "http://example.com/base/"
    assert expand_iri_with_base(base, "path/to/resource") == "http://example.com/base/path/to/resource"
    assert (
        expand_iri_with_base(base, "http://example.com/absolute/resource")
        == "http://example.com/absolute/resource"
    )
    assert (
        expand_iri_with_base("s3://example.com/base/", "path/to/resource")
        == "s3://example.com/base/path/to/resource"
    )
    base_frag = "http://example.com/base#"
    assert expand_iri_with_base(base_frag, "path/to/resource") == "http://example.com/base#path/to/resource"
    assert expand_iri_with_base(base_frag, "prefix:value") == "prefix:value"
    assert (
        expand_iri_with_base(base_frag, "path-to/name with spaces")
        == "http://example.com/base#path-to/name with spaces"
    )


def test_expand_invalid_base_passthrough():
    assert expand_iri_with_base("not a url", "x") == "x"


def test_pascal_camel_kebab():
    assert to_pascal_case("Bill of Materials") == "BillOfMaterials"
    assert to_pascal_case("has Material Class") == "HasMaterialClass"
    assert to_pascal_case("CPU (Dual-core)") == "CPUDualCore"
    assert to_camel_case("has Material") == "hasMaterial"
    assert to_camel_case("rdfs:label") == "rdfs:label"  # URL/prefixed passthrough
    assert to_camel_case("http://x.com/y") == "http://x.com/y"
    assert to_kebab_case("BillOfMaterials") == "bill-of-materials"
    assert to_kebab_case("Warehouse Inventory") == "warehouse-inventory"


def test_normalize_label_for_iri():
    assert normalize_label_for_iri(" Hard Disk Drive (HDD 2TB) ") == "Hard-Disk-Drive-HDD-2TB"
    assert normalize_label_for_iri("a//b") == "a-b"
    assert normalize_label_for_iri("--x--") == "x"


def test_namespace_and_conflicts():
    assert namespace_iri("WarehouseInventory", "42") == "warehouse-inventory/42"
    assert are_conflicting("a", "b")
    assert not are_conflicting("a", "a")
    assert not are_conflicting("", "b")
    assert not are_conflicting(None, "b")
