"""Instance import steps as Spark DataFrame plans → long triple table.

Re-expresses the reference's row-at-a-time instance processing
(``csv-to-jsonld-lib/src/instance/processor_impl.rs``) as declarative
column expressions over a CSV/parquet scan:

- P1/P2 column mapping → positional ``select``
- P4/P5 ignore + header-vs-vocabulary validation → driver-side plan
  compilation against the broadcast vocabulary (J1)
- P6 empty-id/empty-value filters → ``filter`` + per-header ``when``
- R4 multi-value split → ``transform(split(...), trim)``
- F6–F9 coercions → JVM column expressions (coercion.py)
- J5 class-restricted values → plan-time class resolution (the target
  class is a column-level constant)
- R1 pivot columns → deterministic content-hash child ids (``sha2``)
  instead of the reference's UUIDv4 (processor_impl.rs:233) — see
  SURVEY §2.8: UUIDs make runs unreproducible; content hashes keep
  blank-node identity stable across runs and cluster sizes
- R2 EAV → per-row triple emission + broadcast property resolve (J2)
- R3 subclass typing → broadcast class resolve (J3)
- A1 merge-by-@id → the triple table IS the merged form: set-union
  semantics fall out of ``dropDuplicates`` on (subj, pred, obj)

The output is the long/normalized triple table (FIXTURES.md §C):
``(subj, pred, obj, obj_kind)`` where obj_kind ∈
{string, number, boolean, ref, type}.

Scale notes: each step is one scan → narrow transforms → explode; no
shuffle until the final ``dropDuplicates`` (one exchange on the triple
key). Vocabulary lookups are plan-time constants or broadcast joins —
never a shuffled join. At 100 TB the explode fan-out is bounded by
(#columns × values-per-cell), and AQE handles post-explode skew.

Known reference bugs NOT reproduced (documented deviations):
- unknown headers silently desync column indices in validate_headers
  (instance/validation.rs:49-63 drops them from the positional vec);
  we keep positional alignment.
- PropertiesInstanceStep demands the class identifier column name
  (processor_impl.rs:646-654) which its own fixture EAV file doesn't
  carry; we fall back to the conventional "Entity ID" column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import storage
from ..coercion import (
    coerce_boolean,
    coerce_date,
    coerce_decimal,
    coerce_integer,
    coercion_kind_flags,
)
from ..iri import expand_iri_with_base, to_kebab_case
from ..manifest import ImportStep, Manifest
from ..vocabulary import VocabularyMap

TRIPLE_COLS = ("subj", "pred", "obj", "obj_kind")

_SEP = "\x1f"  # unit separator for deterministic child hashing


# --------------------------------------------------------------------------
# driver-side header planning (P5/J1: instance/validation.rs:8-171)
# --------------------------------------------------------------------------


@dataclass
class HeaderPlan:
    index: int
    name: str
    kind: str  # datatype kind, or "ID"
    target: str | None  # URI/Picklist target class IRI
    is_label: bool = False
    pivot_group: int | None = None  # index into step.pivot_columns


def valid_property_headers(
    vocab: VocabularyMap,
    model_base_iri: str,
    class_type: str,
    pivot_columns=None,
    map_to_label: str | None = None,
) -> dict[str, tuple[str, str | None]]:
    """label → (datatype kind, target), per validation.rs:83-171."""
    out: dict[str, tuple[str, str | None]] = {}

    def add_term(term) -> None:
        if term.label is None or not term.range:
            return
        dt = term.range[0]
        out.setdefault(term.label, (dt.kind, dt.target))

    def class_range_terms(class_term) -> None:
        if not class_term.range:
            return
        targets = {r.target for r in class_term.range if r.kind in ("URI", "Picklist") and r.target}
        for prop in vocab.properties.values():
            if prop.id.final() in targets:
                add_term(prop)

    if pivot_columns:
        for pc in pivot_columns:
            pivot_iri = expand_iri_with_base(model_base_iri, pc.instance_type)
            for term in vocab.classes.values():
                if term.id.matches(pivot_iri):
                    class_range_terms(term)

    class_iri = expand_iri_with_base(model_base_iri, class_type)
    for term in vocab.classes.values():
        if term.id.final() == class_iri:
            class_range_terms(term)
            break

    for prop in vocab.properties.values():
        if prop.domain and class_iri in prop.domain:
            add_term(prop)

    return out


@dataclass
class HeaderDiags:
    """What validate_headers (validation.rs:8-81) warns/errors about:
    unknown columns (not in vocab, not ignored) and empty header cells."""

    unknown: list[str] = field(default_factory=list)
    empty: int = 0


def plan_headers(
    headers: list[str],
    vocab: VocabularyMap,
    model_base_iri: str,
    step: ImportStep,
    identifier_label: str,
) -> tuple[list[HeaderPlan | None], HeaderDiags]:
    """validate_headers (validation.rs:8-81) with positional alignment kept."""
    valid = valid_property_headers(
        vocab, model_base_iri, step.instance_type, step.pivot_columns, step.map_to_label
    )
    ignorable = set(step.ignore or [])
    pivot_of = {}
    for gi, pc in enumerate(step.pivot_columns or []):
        for col in pc.columns:
            pivot_of[col] = gi

    diags = HeaderDiags()
    plans: list[HeaderPlan | None] = []
    for i, h in enumerate(headers):
        if h == "":
            diags.empty += 1
            plans.append(None)
        elif h == identifier_label:
            plans.append(HeaderPlan(i, h, "ID", None))
        elif h in valid:
            kind, target = valid[h]
            plans.append(
                HeaderPlan(
                    i,
                    h,
                    kind,
                    target,
                    is_label=(step.map_to_label == h),
                    pivot_group=pivot_of.get(h),
                )
            )
        else:
            # unknown or ignored → dropped from emission (P4); unknown
            # additionally routed to violations (validation.rs:66-79)
            if h not in ignorable:
                diags.unknown.append(h)
            plans.append(None)
    return plans, diags


# --------------------------------------------------------------------------
# value expressions
# --------------------------------------------------------------------------


def _coerce_one(kind: str, target: str | None, c: Column, vocab: VocabularyMap,
                model_base_iri: str, namespace_iris: bool) -> Column:
    if kind == "Date":
        return coerce_date(c)
    if kind == "Integer":
        return coerce_integer(c)
    if kind == "Decimal":
        return coerce_decimal(c)
    if kind == "Boolean":
        return coerce_boolean(c)
    if kind in ("URI", "Picklist"):
        # J5 (value_processor.rs:152-245): target class is a plan-time
        # constant; only namespacing (off by default) changes the value.
        # The prefix kebab-cases the raw class key's display string
        # (value_processor.rs:236-238 uses class_id.to_string()).
        if namespace_iris and target is not None:
            raw = vocab.find_class_for_target(target, model_base_iri)
            if raw is not None:
                prefix = to_kebab_case(raw.display())
                return F.concat(F.lit(prefix + "/"), c)
        return c
    return c  # String / ID


def _values_expr(step: ImportStep, plan: HeaderPlan, c: Column,
                 vocab: VocabularyMap, model_base_iri: str,
                 namespace_iris: bool) -> Column:
    """array<struct<obj:string, obj_kind:string>> for one header cell.

    R4: non-String typed cells split on the step delimiter (default ';'),
    each piece trimmed (processor_impl.rs:188-200). Each split+trimmed
    element is coerced AND kind-typed independently — the reference types
    per value, not per cell (value_processor.rs), so '1;2' under Integer
    yields two number-kind values, and ' 42 ' is typed on the trimmed
    form.
    """
    delim = step.delimit_values_on or ";"
    if plan.kind == "String":
        raw_vals = F.array(c)
    else:
        raw_vals = F.transform(F.split(c, re.escape(delim)), lambda x: F.trim(x))
    return F.transform(
        raw_vals,
        lambda v: F.struct(
            _coerce_one(plan.kind, plan.target, v, vocab, model_base_iri, namespace_iris).alias("obj"),
            coercion_kind_flags(plan.kind, v).alias("obj_kind"),
        ),
    )


_PAIRS_T = "array<struct<obj:string,obj_kind:string>>"


def _triples_for_values(pred: str, pairs: Column) -> Column:
    """array<struct<pred,obj,obj_kind>> — one entry per value."""
    return F.transform(
        pairs,
        lambda s: F.struct(
            F.lit(pred).alias("pred"), s.obj.alias("obj"), s.obj_kind.alias("obj_kind")
        ),
    )


# --- SQL-text twins (plan-construction fast path) --------------------------
#
# The Column builders above cost ~100 py4j round-trips per Date header
# (the 20-attempt parse cascade), and a fixture manifest has dozens of
# headers; plan construction dominated fixture_triples wall time. These
# twins render the IDENTICAL expression as one string so each header is
# a single F.expr call. Semantics pinned by
# tests/test_coercion_fuzz.py::test_sql_twins_equal_column_builders and
# the byte-golden fixture hash (tests/golden/fixture_triples.csv).

_TRIPLES_T = "array<struct<pred:string,obj:string,obj_kind:string>>"


def _coerce_one_sql(kind: str, target: str | None, v: str, vocab: VocabularyMap,
                    model_base_iri: str, namespace_iris: bool) -> str:
    from ..coercion import (
        coerce_boolean_sql,
        coerce_date_sql,
        coerce_decimal_sql,
        coerce_integer_sql,
        sql_str,
    )

    if kind == "Date":
        return coerce_date_sql(v)
    if kind == "Integer":
        return coerce_integer_sql(v)
    if kind == "Decimal":
        return coerce_decimal_sql(v)
    if kind == "Boolean":
        return coerce_boolean_sql(v)
    if kind in ("URI", "Picklist"):
        if namespace_iris and target is not None:
            raw = vocab.find_class_for_target(target, model_base_iri)
            if raw is not None:
                prefix = to_kebab_case(raw.display())
                return f"concat({sql_str(prefix + '/')}, {v})"
        return v
    return v


def _values_expr_sql(step: ImportStep, plan: HeaderPlan, c: str,
                     vocab: VocabularyMap, model_base_iri: str,
                     namespace_iris: bool) -> str:
    """SQL text of _values_expr for column expression ``c`` (lambda
    variable ``v`` is reserved by this builder)."""
    from ..coercion import coercion_kind_flags_sql, sql_str

    delim = step.delimit_values_on or ";"
    if plan.kind == "String":
        raw = f"array({c})"
    else:
        raw = f"transform(split({c}, {sql_str(re.escape(delim))}), x -> trim(x))"
    obj = _coerce_one_sql(plan.kind, plan.target, "v", vocab, model_base_iri, namespace_iris)
    flags = coercion_kind_flags_sql(plan.kind, "v")
    return f"transform({raw}, v -> named_struct('obj', {obj}, 'obj_kind', {flags}))"


def _triples_for_values_sql(pred: str, pairs: str) -> str:
    from ..coercion import sql_str

    return (
        f"transform({pairs}, s -> named_struct('pred', {sql_str(pred)}, "
        "'obj', s.obj, 'obj_kind', s.obj_kind))"
    )


def _header_triples_expr(step: ImportStep, plan: HeaderPlan, vocab: VocabularyMap,
                         model_base_iri: str, namespace_iris: bool,
                         pred: str | None = None) -> Column:
    """One F.expr for a header's whole triple array (empty-cell guarded)."""
    c = f"c{plan.index}"
    pairs = _values_expr_sql(step, plan, c, vocab, model_base_iri, namespace_iris)
    trip = _triples_for_values_sql(pred or plan.name, pairs)
    return F.expr(
        f"IF({c} IS NOT NULL AND {c} != '', {trip}, CAST(array() AS {_TRIPLES_T}))"
    )


# --------------------------------------------------------------------------
# CSV scan with positional columns
# --------------------------------------------------------------------------


def csv_headers(spark: SparkSession, path: str) -> list[str]:
    """First CSV record via the driver filesystem for plain paths, or
    through Spark's Hadoop FS for scheme-qualified URIs (s3a://,
    file://, hdfs://) — S3 storage (S5/S3) must not fall over on the
    driver-side header peek."""
    import csv as _csv
    import io
    import re as _re

    if _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        first = spark.read.text(path).limit(1).collect()
        line = first[0][0] if first else ""
        return next(_csv.reader(io.StringIO(line.lstrip("\ufeff"))))
    with open(path, newline="", encoding="utf-8-sig") as f:
        return next(_csv.reader(f))


def read_csv_positional(spark: SparkSession, path: str) -> tuple[DataFrame, list[str]]:
    """RFC-4180 scan; columns renamed c0..cn so header strings with
    dots/parens never fight Spark's column resolution. Returns the raw
    header list alongside."""
    headers = csv_headers(spark, path)
    df = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    df = df.toDF(*[f"c{i}" for i in range(len(df.columns))])
    return df, headers


def read_step_positional(
    spark: SparkSession, path: str, step: ImportStep
) -> tuple[DataFrame, list[str]]:
    """Dispatch: .xlsx / sheet-bearing steps (S2, ExcelImportManifest)
    route through the driver-side sheet reader — workbooks are
    driver-sized manifest inputs, not lake tables — everything else is
    the distributed CSV scan. Empty cells normalize to null to match
    the CSV reader's semantics."""
    if step.sheet or path.lower().endswith((".xlsx", ".xlsm")):
        from ..sources.excel import read_sheet

        headers, rows = read_sheet(path, step.sheet or step.step_id())
        schema = ", ".join(f"c{i} string" for i in range(len(headers)))
        norm = [[x if x != "" else None for x in r] for r in rows]
        return spark.createDataFrame(norm, schema), headers
    return read_csv_positional(spark, path)


def _col(i: int) -> Column:
    return F.col(f"c{i}")


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (c != "")


# --------------------------------------------------------------------------
# step → triples
# --------------------------------------------------------------------------


def basic_instance_triples(
    spark: SparkSession,
    manifest: Manifest,
    vocab: VocabularyMap,
    step: ImportStep,
    base_path: str | Path,
) -> DataFrame:
    """BasicInstanceStep / PicklistStep triples only (see
    basic_instance_outputs for the planning metadata variant)."""
    return basic_instance_outputs(spark, manifest, vocab, step, base_path)[0]


def basic_instance_outputs(
    spark: SparkSession,
    manifest: Manifest,
    vocab: VocabularyMap,
    step: ImportStep,
    base_path: str | Path,
) -> tuple[DataFrame, list[HeaderPlan | None], HeaderDiags, str]:
    """BasicInstanceStep / PicklistStep (processor_impl.rs:14-338) + R1 pivot.

    Returns (triples, header plans, header diagnostics, class_type) so
    the violations builder (operators/violations.py) can route unknown
    headers and per-value coercion/picklist failures without a second
    planning pass."""
    class_type = step.instance_type or None
    if not class_type:
        from ..iri import to_pascal_case

        class_type = to_pascal_case(step.step_id())
    namespace_iris = manifest.instances.namespace_iris
    model_base = manifest.model.base_iri

    override_id = next((o.column for o in step.overrides if o.map_to == "@id"), None)
    identifier_label = vocab.get_identifier_label(class_type) or override_id
    if identifier_label is None:
        raise ValueError(f"No identifier property found for class '{class_type}'")

    path = str(storage.join_path(base_path, manifest.instances.path, step.path))
    df, headers = read_step_positional(spark, path, step)
    plans, diags = plan_headers(headers, vocab, model_base, step, identifier_label)

    id_plan = next((p for p in plans if p and p.kind == "ID"), None)
    if id_plan is None:
        raise ValueError(f"Identifier column '{identifier_label}' not found in {path}")

    subj = _col(id_plan.index)
    if namespace_iris:
        subj = F.concat(F.lit(to_kebab_case(class_type) + "/"), subj)
    df = df.filter(_nonempty(_col(id_plan.index))).withColumn("_subj", subj)

    # --- plain (non-pivot) properties → struct arrays
    prop_arrays: list[Column] = [
        F.array(
            F.struct(
                F.lit("@type").alias("pred"),
                F.lit(class_type).alias("obj"),
                F.lit("type").alias("obj_kind"),
            )
        )
    ]
    for p in plans:
        if p is None or p.kind == "ID" or p.pivot_group is not None:
            continue
        prop_arrays.append(
            _header_triples_expr(step, p, vocab, model_base, namespace_iris)
        )
        if p.is_label:
            prop_arrays.append(
                _header_triples_expr(step, p, vocab, model_base, namespace_iris, pred="label")
            )

    parent = df.select(
        F.col("_subj").alias("subj"), F.explode(F.flatten(F.array(*prop_arrays))).alias("t")
    ).select("subj", "t.pred", "t.obj", "t.obj_kind")

    out = parent

    # --- R1 pivot children: one child per (row, pivot group) with any value
    for gi, pc in enumerate(step.pivot_columns or []):
        group_plans = [p for p in plans if p is not None and p.pivot_group == gi]
        if not group_plans:
            continue
        val_cols = {}
        for p in group_plans:
            pairs = _values_expr_sql(step, p, f"c{p.index}", vocab, model_base, namespace_iris)
            val_cols[p.index] = F.expr(
                f"IF(c{p.index} IS NOT NULL AND c{p.index} != '', {pairs}, "
                f"CAST(array() AS {_PAIRS_T}))"
            )
        any_value = None
        for p in group_plans:
            cond = _nonempty(_col(p.index))
            any_value = cond if any_value is None else (any_value | cond)

        # deterministic blank-node id: hash of parent, relationship, type and
        # the processed pivot values in column order (SURVEY §2.8 #1)
        hash_parts = [F.col("_subj"), F.lit(pc.new_relationship_property), F.lit(pc.instance_type)]
        for p in group_plans:
            hash_parts.append(F.lit(p.name))
            hash_parts.append(
                F.concat_ws(_SEP, F.transform(val_cols[p.index], lambda s: s.obj))
            )
        child_id = F.sha2(F.concat_ws(_SEP, *hash_parts), 256)

        pdf = df.filter(any_value).withColumn("_child", child_id)
        child_arrays = [
            F.array(
                F.struct(
                    F.lit("@type").alias("pred"),
                    F.lit(pc.instance_type).alias("obj"),
                    F.lit("type").alias("obj_kind"),
                )
            )
        ]
        for p in group_plans:
            arr = F.when(
                _nonempty(_col(p.index)),
                _triples_for_values(p.name, val_cols[p.index]),
            ).otherwise(F.array().cast("array<struct<pred:string,obj:string,obj_kind:string>>"))
            child_arrays.append(arr)

        child_triples = pdf.select(
            F.col("_child").alias("subj"),
            F.explode(F.flatten(F.array(*child_arrays))).alias("t"),
        ).select("subj", "t.pred", "t.obj", "t.obj_kind")

        edges = pdf.select(
            F.col("_subj").alias("subj"),
            F.lit(pc.new_relationship_property).alias("pred"),
            F.col("_child").alias("obj"),
            F.lit("ref").alias("obj_kind"),
        )
        out = out.unionByName(child_triples).unionByName(edges)

    return out, plans, diags, class_type


def subclass_instance_triples(
    spark: SparkSession,
    manifest: Manifest,
    vocab: VocabularyMap,
    step: ImportStep,
    base_path: str | Path,
) -> DataFrame:
    """SubClassInstanceStep (processor_impl.rs:340-574).

    Reference behavior kept faithfully: values stay raw strings (no
    coercion/split — its TODO at :542), and the step's own `ignore` list
    is NOT applied (the reference never consults it on this path).
    R3: the subclass cell resolves against vocabulary classes (J3) to a
    normalized PascalCase type; unresolved cells pass through raw.
    """
    parent_type = step.instance_type
    namespace_iris = manifest.instances.namespace_iris
    override_id = next((o.column for o in step.overrides if o.map_to == "@id"), None)
    identifier_label = vocab.get_identifier_label(parent_type) or override_id
    if identifier_label is None:
        raise ValueError(f"No identifier property found for class '{parent_type}'")
    subclass_property = step.sub_class_property
    if not subclass_property:
        raise ValueError("SubClassInstanceStep requires subClassProperty")

    path = str(storage.join_path(base_path, manifest.instances.path, step.path))
    df, headers = read_step_positional(spark, path, step)
    try:
        id_idx = headers.index(identifier_label)
    except ValueError:
        raise ValueError(f"Identifier column '{identifier_label}' not found in {path}")
    try:
        sub_idx = headers.index(subclass_property)
    except ValueError:
        raise ValueError(f"Subclass property column '{subclass_property}' not found")

    subj = _col(id_idx)
    if namespace_iris:
        subj = F.concat(F.lit(to_kebab_case(parent_type) + "/"), subj)

    df = df.filter(_nonempty(_col(id_idx)) & _nonempty(_col(sub_idx))).withColumn("_subj", subj)

    # J3 broadcast resolve (processor_impl.rs:487-516): the cell matches a
    # class key's String id or original_id, then normalize().pascal() of the
    # raw key is the resolved type (serialized as the replacement side).
    resolve_rows = []
    for key in vocab.classes:
        raw = vocab.raw_class_keys.get(key)
        if raw is None:
            from ..vocabulary import IdOpt

            raw = IdOpt(key)
        resolve_rows.append((key, raw.normalize().pascal().final()))
    lookup = spark.createDataFrame(resolve_rows, ["_sub_raw", "_sub_resolved"])

    df = df.join(F.broadcast(lookup), df[f"c{sub_idx}"] == lookup["_sub_raw"], "left")
    resolved_type = F.coalesce(F.col("_sub_resolved"), _col(sub_idx))

    arrays = [
        F.array(
            F.struct(F.lit("@type").alias("pred"), F.lit(parent_type).alias("obj"), F.lit("type").alias("obj_kind")),
            F.struct(F.lit("@type").alias("pred"), resolved_type.alias("obj"), F.lit("type").alias("obj_kind")),
        )
    ]
    for i, h in enumerate(headers):
        if i in (id_idx, sub_idx) or h == "":
            continue
        arrays.append(
            F.when(
                _nonempty(_col(i)),
                F.array(
                    F.struct(F.lit(h).alias("pred"), _col(i).alias("obj"), F.lit("string").alias("obj_kind"))
                ),
            ).otherwise(F.array().cast("array<struct<pred:string,obj:string,obj_kind:string>>"))
        )

    return df.select(
        F.col("_subj").alias("subj"), F.explode(F.flatten(F.array(*arrays))).alias("t")
    ).select("subj", "t.pred", "t.obj", "t.obj_kind")


def properties_instance_triples(
    spark: SparkSession,
    manifest: Manifest,
    vocab: VocabularyMap,
    step: ImportStep,
    base_path: str | Path,
) -> DataFrame:
    """PropertiesInstanceStep / EAV (processor_impl.rs:576-811).

    Values stay raw strings; the property id resolves against the
    vocabulary by original id (J2) and emits under its camelCase final
    key. Entity column: class identifier label if present, else the
    conventional "Entity ID" (see module docstring on the reference bug).
    """
    class_type = step.instance_type
    namespace_iris = manifest.instances.namespace_iris
    prop_id_col = next((o.column for o in step.overrides if o.map_to == "$Property.ID"), "Property ID")
    prop_val_col = next(
        (o.column for o in step.overrides if o.map_to == "$Property.Value"), "Property Value"
    )
    identifier_label = vocab.get_identifier_label(class_type)

    path = str(storage.join_path(base_path, manifest.instances.path, step.path))
    df, headers = read_step_positional(spark, path, step)
    if identifier_label in headers:
        id_idx = headers.index(identifier_label)
    elif "Entity ID" in headers:
        id_idx = headers.index("Entity ID")
    else:
        raise ValueError(f"No identifier column found in {path}")
    pid_idx = headers.index(prop_id_col)
    pval_idx = headers.index(prop_val_col)

    subj = _col(id_idx)
    if namespace_iris:
        subj = F.concat(F.lit(to_kebab_case(class_type) + "/"), subj)

    df = df.filter(
        _nonempty(_col(id_idx)) & _nonempty(_col(pid_idx)) & _nonempty(_col(pval_idx))
    )

    # J2 broadcast property resolve (processor_impl.rs:734-755): the cell
    # matches a property key (camel original / original id); the emitted
    # predicate is that key's camel final — term.id.final() minus the base
    # (the reference's map key is the *unexpanded* camel IdOpt).
    base = manifest.model.base_iri
    rows = []
    for key, term in vocab.properties.items():
        fin = term.id.final()
        if base and fin.startswith(base):
            fin = fin[len(base):]
        rows.append((key, fin))
    lookup = spark.createDataFrame(rows, ["_pid_raw", "_pid_final"])

    df = df.join(F.broadcast(lookup), df[f"c{pid_idx}"] == lookup["_pid_raw"], "left")
    pred = F.coalesce(F.col("_pid_final"), _col(pid_idx))

    triples = df.select(
        subj.alias("subj"),
        pred.alias("pred"),
        _col(pval_idx).alias("obj"),
        F.lit("string").alias("obj_kind"),
    )
    types = df.select(
        subj.alias("subj"),
        F.lit("@type").alias("pred"),
        F.lit(class_type).alias("obj"),
        F.lit("type").alias("obj_kind"),
    )
    return triples.unionByName(types)


# --------------------------------------------------------------------------
# pipeline: all instance steps → merged triple table (A1)
# --------------------------------------------------------------------------


def build_instance_triples(
    spark: SparkSession,
    manifest: Manifest,
    vocab: VocabularyMap,
    base_path: str | Path,
) -> DataFrame:
    """PHASE B (processor/mod.rs:211-251): picklist steps first, then the
    rest in manifest order; union + dedup = the reference's merge-by-@id
    with set-union arrays (A1), expressed as one shuffle."""
    dfs: list[DataFrame] = []
    for step in manifest.instance_sequence():
        if step.has_type("SubClassInstanceStep"):
            dfs.append(subclass_instance_triples(spark, manifest, vocab, step, base_path))
        elif step.has_type("PropertiesInstanceStep"):
            dfs.append(properties_instance_triples(spark, manifest, vocab, step, base_path))
        else:
            dfs.append(basic_instance_triples(spark, manifest, vocab, step, base_path))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.dropDuplicates(["subj", "pred", "obj", "obj_kind"])
