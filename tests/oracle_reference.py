"""Pure-Python oracle reimplementing the reference's per-row semantics.

Independent from the Spark engine's column-expression builder (only the
vocabulary compiler and IRI utils are shared — they ARE the schema).
Mirrors csv-to-jsonld-lib/src/instance/{processor_impl,value_processor,
validation}.rs row by row, building the instance map with A1 set-merge,
then flattens to the triple set used for the P/R >= 0.95 gate.

Deterministic blank nodes: pivot children get the same content-hash rule
the engine uses (SURVEY §2.8 — the reference's UUIDv4 ids are matched
structurally; identical content hashing on both sides implements the
blank-node isomorphism).
"""

from __future__ import annotations

import csv
import hashlib
import re
from datetime import date
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from csv_to_jsonld_processor_spark.iri import to_kebab_case, to_pascal_case
from csv_to_jsonld_processor_spark.manifest import ImportStep, Manifest
from csv_to_jsonld_processor_spark.vocabulary import VocabularyMap

_SEP = "\x1f"

INT_RE = re.compile(r"^[+-]?[0-9]+$")
FLOAT_RE = re.compile(r"^[+-]?(([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?)$")

_MONTHS_SHORT = "jan feb mar apr may jun jul aug sep oct nov dec".split()
_MONTHS_FULL = (
    "january february march april may june july august september october november december".split()
)


def _month_no(tok: str) -> int | None:
    t = tok.lower()
    if t in _MONTHS_SHORT:
        return _MONTHS_SHORT.index(t) + 1
    if t in _MONTHS_FULL:
        return _MONTHS_FULL.index(t) + 1
    return None


class _IsoDate(str):
    def isoformat(self) -> str:  # duck-types datetime.date for callers
        return str(self)


_CHRONO_MAX_YEAR = 262143  # chrono NaiveDate year range: ±262143


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _try_date(y: int, m: int, d: int) -> "_IsoDate | date | None":
    if 1 <= y <= 9999:
        try:
            return date(y, m, d)
        except ValueError:
            return None
    # chrono's proleptic Gregorian spans ±262143 — far past Python's
    # datetime (1..9999). Validate (m, d) against a leap-aligned probe
    # year and render chrono's %Y-%m-%d form: zero-padded to >=4 digits,
    # '-' prefix for negative years (incl. year 0), '+' above 9999.
    if abs(y) > _CHRONO_MAX_YEAR:
        return None
    try:
        date(2000 if _leap(y) else 2001, m, d)
    except ValueError:
        return None
    if y < 0:
        ys = f"-{abs(y):04d}"
    elif y > 9999:
        ys = f"+{y}"
    else:
        ys = f"{y:04d}"
    return _IsoDate(f"{ys}-{m:02d}-{d:02d}")


def parse_date_oracle(value: str) -> str | None:
    """The reference's 15-format cascade (utils/mod.rs:5-21,
    value_processor.rs:17-61), implemented with explicit parsers."""
    v = value.strip()

    def num3(pattern: str, order: str) -> date | None:
        m = re.fullmatch(pattern, v)
        if not m:
            return None
        parts = {k: int(g) for k, g in zip(order, m.groups())}
        return _try_date(parts["y"], parts["m"], parts["d"])

    attempts = [
        lambda: num3(r"(\d{4})-(\d{1,2})-(\d{1,2})", "ymd"),
        lambda: num3(r"(\d{4})/(\d{1,2})/(\d{1,2})", "ymd"),
        lambda: num3(r"(\d{1,2})-(\d{1,2})-(\d{4})", "mdy"),
        lambda: num3(r"(\d{1,2})/(\d{1,2})/(\d{4})", "mdy"),
        lambda: num3(r"(\d{1,2})-(\d{1,2})-(\d{4})", "dmy"),
        lambda: num3(r"(\d{1,2})/(\d{1,2})/(\d{4})", "dmy"),
        lambda: num3(r"(\d{4})-(\d{1,2})-(\d{1,2}) \d{1,2}:\d{1,2}:\d{1,2}", "ymd"),
    ]

    def monthname_dmy() -> date | None:
        m = re.fullmatch(r"([A-Za-z]+) (\d{1,2}), (\d{4})", v)
        if not m:
            return None
        mon = _month_no(m.group(1))
        if mon is None:
            return None
        return _try_date(int(m.group(3)), mon, int(m.group(2)))

    attempts.append(monthname_dmy)

    def year_only() -> date | None:
        if re.fullmatch(r"[+-]?\d+", v):
            return _try_date(int(v), 1, 1)
        return None

    attempts.append(year_only)

    def year_month() -> date | None:
        m = re.fullmatch(r"(\d{4})[-/](\d{1,2})", v)
        if m:
            return _try_date(int(m.group(1)), int(m.group(2)), 1)
        m = re.fullmatch(r"([A-Za-z]+) (\d{4})", v)
        if m:
            mon = _month_no(m.group(1))
            if mon is not None:
                return _try_date(int(m.group(2)), mon, 1)
        # numeric month-year ("06-2024") is unreachable in the reference —
        # none of its rewrites parse it (value_processor.rs:39-58)
        return None

    attempts.append(year_month)

    for fn in attempts:
        d = fn()
        if d is not None:
            return d.isoformat()
    return None


def process_value(value: str, kind: str, ns_prefix: str | None = None) -> tuple[str, str]:
    """(obj string, obj_kind) per value_processor.rs:8-150. ``ns_prefix``
    is the J5 kebab class prefix when namespaceIris is on."""
    if kind == "Date":
        d = parse_date_oracle(value)
        return (d, "string") if d is not None else (value, "string")
    if kind == "Integer":
        cleaned = value.replace("$", "").replace("%", "").replace(",", "")
        if INT_RE.fullmatch(cleaned):
            return (str(int(cleaned)), "number")
        return (value, "string")
    if kind == "Decimal":
        cleaned = value.replace("$", "").replace("%", "").replace(",", "")
        if FLOAT_RE.fullmatch(cleaned):
            return (format_double(float(cleaned)), "number")
        return (cleaned, "string")
    if kind == "Boolean":
        low = value.lower()
        if low in ("true", "1", "yes"):
            return ("true", "boolean")
        if low in ("false", "0", "no"):
            return ("false", "boolean")
        return (value, "string")
    if kind in ("URI", "Picklist"):
        if ns_prefix is not None:
            return (f"{ns_prefix}/{value}", "ref")
        return (value, "ref")
    return (value, "string")


def format_double(x: float) -> str:
    """Canonical double rendering (parity tests canonicalize floats anyway)."""
    return repr(x)


# --------------------------------------------------------------------------


class ReferenceOracle:
    def __init__(self, manifest: Manifest, vocab: VocabularyMap, base_path: str | Path):
        self.manifest = manifest
        self.vocab = vocab
        self.base_path = Path(base_path)
        self.model_base = manifest.model.base_iri
        self.namespace_iris = manifest.instances.namespace_iris
        # instance map: id → {"types": [..], "props": {pred: [(obj, kind), ...]}}
        self.instances: dict[str, dict] = {}

    # -- shared helpers ------------------------------------------------------

    def _read(self, step: ImportStep):
        path = self.base_path / self.manifest.instances.path / step.path
        with open(path, newline="", encoding="utf-8-sig") as f:
            rdr = csv.reader(f)
            headers = next(rdr)
            rows = list(rdr)
        return headers, rows

    def _merge(self, inst_id: str, types: list[str], props: dict[str, list]) -> None:
        """A1 (types/instance.rs:20-55) as set semantics on values."""
        cur = self.instances.setdefault(inst_id, {"types": list(types), "props": {}})
        for t in types:
            if t not in cur["types"]:
                cur["types"].append(t)
        for k, vals in props.items():
            slot = cur["props"].setdefault(k, [])
            for v in vals:
                if v not in slot:
                    slot.append(v)

    def _class_for_target(self, target_iri: str):
        """Independent J5 lookup (value_processor.rs:159-180)."""
        from csv_to_jsonld_processor_spark.iri import expand_iri_with_base, normalize_label_for_iri

        for key in self.vocab.classes:
            raw = self.vocab.raw_class_keys.get(key)
            if raw is None:
                from csv_to_jsonld_processor_spark.vocabulary import IdOpt

                raw = IdOpt(key)
            if raw.replacement is None:
                fin = expand_iri_with_base(
                    self.model_base, to_pascal_case(normalize_label_for_iri(raw.original))
                )
                if fin == target_iri:
                    return raw
            else:
                if raw.original == target_iri:
                    return raw
        return None

    def _identifier_label(self, step: ImportStep, class_type: str) -> str:
        override = next((o.column for o in step.overrides if o.map_to == "@id"), None)
        label = self.vocab.get_identifier_label(class_type) or override
        if label is None:
            raise ValueError(f"no identifier for {class_type}")
        return label

    def _valid_labels(self, step: ImportStep, class_type: str) -> dict[str, tuple[str, str | None]]:
        """Independent reimplementation of validation.rs:83-171."""
        out: dict[str, tuple[str, str | None]] = {}
        base = self.model_base

        def add(term):
            if term.label is not None and term.range:
                out.setdefault(term.label, (term.range[0].kind, term.range[0].target))

        def from_class_range(cls_term):
            targets = set()
            for r in cls_term.range or []:
                if r.kind in ("URI", "Picklist") and r.target:
                    targets.add(r.target)
            for p in self.vocab.properties.values():
                if p.id.final() in targets:
                    add(p)

        from csv_to_jsonld_processor_spark.iri import expand_iri_with_base

        for pc in step.pivot_columns or []:
            piri = expand_iri_with_base(base, pc.instance_type)
            for t in self.vocab.classes.values():
                if t.id.matches(piri):
                    from_class_range(t)
        ciri = expand_iri_with_base(base, class_type)
        for t in self.vocab.classes.values():
            if t.id.final() == ciri:
                from_class_range(t)
                break
        for p in self.vocab.properties.values():
            if p.domain and ciri in p.domain:
                add(p)
        return out

    # -- steps ----------------------------------------------------------------

    def run(self) -> None:
        for step in self.manifest.instance_sequence():
            if step.has_type("SubClassInstanceStep"):
                self._subclass_step(step)
            elif step.has_type("PropertiesInstanceStep"):
                self._eav_step(step)
            else:
                self._basic_step(step)

    def _basic_step(self, step: ImportStep) -> None:
        class_type = step.instance_type or to_pascal_case(step.step_id())
        identifier_label = self._identifier_label(step, class_type)
        headers, rows = self._read(step)
        valid = self._valid_labels(step, class_type)
        pivot_of = {}
        for gi, pc in enumerate(step.pivot_columns or []):
            for c in pc.columns:
                pivot_of[c] = gi

        id_idx = headers.index(identifier_label)
        delim = step.delimit_values_on or ";"

        for row in rows:
            rid = row[id_idx] if id_idx < len(row) else ""
            if rid == "":
                continue
            subj = f"{to_kebab_case(class_type)}/{rid}" if self.namespace_iris else rid
            props: dict[str, list] = {}
            pivot_children: dict[int, dict[str, list]] = {}

            for i, h in enumerate(headers):
                if h == "" or h == identifier_label:
                    continue
                if h not in valid:
                    continue  # unknown or ignored
                val = row[i] if i < len(row) else ""
                if val == "" or val is None:
                    continue
                kind, target = valid[h]
                if kind == "ID":
                    continue
                if kind == "String":
                    pieces = [val]
                else:
                    pieces = [p.strip() for p in val.split(delim)]
                ns_prefix = None
                if self.namespace_iris and kind in ("URI", "Picklist") and target:
                    raw = self._class_for_target(target)
                    if raw is not None:
                        ns_prefix = to_kebab_case(
                            raw.original if raw.replacement is None
                            else f"{raw.original} (to be replaced by {raw.replacement})"
                        )
                processed = [process_value(p, kind, ns_prefix) for p in pieces]
                gi = pivot_of.get(h)
                if gi is not None:
                    pivot_children.setdefault(gi, {})[h] = processed
                else:
                    props.setdefault(h, []).extend(processed)
                    if step.map_to_label == h:
                        props.setdefault("label", []).extend(processed)

            self._merge(subj, [class_type], props)

            for gi, child_props in pivot_children.items():
                pc = step.pivot_columns[gi]
                hash_parts = [subj, pc.new_relationship_property, pc.instance_type]
                for p_ in [p for p in pc.columns if p in child_props]:
                    pass
                # column order follows the header plan order (engine parity)
                ordered = [h for h in headers if h in child_props]
                for h in ordered:
                    hash_parts.append(h)
                    hash_parts.append(_SEP.join(obj for obj, _k in child_props[h]))
                child_id = hashlib.sha256(_SEP.join(hash_parts).encode()).hexdigest()
                self._merge(child_id, [pc.instance_type], {h: v for h, v in child_props.items()})
                self._merge(subj, [], {pc.new_relationship_property: [(child_id, "ref")]})

    def _subclass_step(self, step: ImportStep) -> None:
        parent = step.instance_type
        identifier_label = self._identifier_label(step, parent)
        headers, rows = self._read(step)
        id_idx = headers.index(identifier_label)
        sub_idx = headers.index(step.sub_class_property)

        for row in rows:
            rid = row[id_idx] if id_idx < len(row) else ""
            sub = row[sub_idx] if sub_idx < len(row) else ""
            if rid == "" or sub == "":
                continue
            subj = f"{to_kebab_case(parent)}/{rid}" if self.namespace_iris else rid
            raw_key = self.vocab.raw_class_keys.get(sub)
            if raw_key is None and sub in self.vocab.classes:
                from csv_to_jsonld_processor_spark.vocabulary import IdOpt

                raw_key = IdOpt(sub)
            resolved = raw_key.normalize().pascal().final() if raw_key is not None else sub
            props: dict[str, list] = {}
            for i, h in enumerate(headers):
                if i in (id_idx, sub_idx) or h == "":
                    continue
                val = row[i] if i < len(row) else ""
                if val == "":
                    continue
                props.setdefault(h, []).append((val, "string"))
            self._merge(subj, [parent, resolved], props)

    def _eav_step(self, step: ImportStep) -> None:
        class_type = step.instance_type
        headers, rows = self._read(step)
        identifier_label = self.vocab.get_identifier_label(class_type)
        if identifier_label in headers:
            id_idx = headers.index(identifier_label)
        else:
            id_idx = headers.index("Entity ID")
        pid_col = next((o.column for o in step.overrides if o.map_to == "$Property.ID"), "Property ID")
        pval_col = next(
            (o.column for o in step.overrides if o.map_to == "$Property.Value"), "Property Value"
        )
        pid_idx = headers.index(pid_col)
        pval_idx = headers.index(pval_col)
        base = self.model_base

        for row in rows:
            rid = row[id_idx] if id_idx < len(row) else ""
            pid = row[pid_idx] if pid_idx < len(row) else ""
            pval = row[pval_idx] if pval_idx < len(row) else ""
            if rid == "" or pid == "" or pval == "":
                continue
            subj = f"{to_kebab_case(class_type)}/{rid}" if self.namespace_iris else rid
            term = self.vocab.properties.get(pid)
            if term is not None:
                fin = term.id.final()
                pred = fin[len(base):] if base and fin.startswith(base) else fin
            else:
                pred = pid
            self._merge(subj, [class_type], {pred: [(pval, "string")]})

    # -- flatten ---------------------------------------------------------------

    def triples(self) -> set[tuple[str, str, str, str]]:
        out = set()
        for subj, inst in self.instances.items():
            for t in inst["types"]:
                out.add((subj, "@type", t, "type"))
            for pred, vals in inst["props"].items():
                for obj, kind in vals:
                    out.add((subj, pred, obj, kind))
        return out


def oracle_triples(manifest: Manifest, vocab: VocabularyMap, base_path: str | Path):
    o = ReferenceOracle(manifest, vocab, base_path)
    o.run()
    return o.triples()
