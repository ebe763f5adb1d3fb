"""Exact-parity string/IRI functions (SURVEY §2.6 F1–F5, F10–F11).

Pure Python so they run identically on the driver (vocabulary compile)
and inside Arrow-batched pandas UDFs on executors. Semantics mirror the
reference's ``csv-to-jsonld-lib/src/utils/mod.rs:24-159`` (studied for
behavior; implementation is original).

These are deliberately *not* Spark builtins: their edge cases (empty-
fragment IRI join, URL passthrough in camelCase, url-decoding after
join) don't map onto ``regexp_replace``/``initcap`` without losing
parity. They only ever run over small schema-sized data (vocabulary
compile) or inside vectorized batches.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urljoin, urlsplit

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _split_alnum(s: str) -> list[str]:
    """Split on any non-alphanumeric char, dropping empties
    (ref: utils/mod.rs:24-35 uses char::is_alphanumeric)."""
    out, cur = [], []
    for ch in s:
        if ch.isalnum():
            cur.append(ch)
        else:
            if cur:
                out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def to_pascal_case(s: str) -> str:
    """F1 — 'Bill of Materials' → 'BillOfMaterials' (utils/mod.rs:24-35)."""
    return "".join(w[0].upper() + w[1:] for w in _split_alnum(s))


def is_valid_url(s: str) -> bool:
    """True when the string parses as an absolute URL (has a scheme),
    mirroring url::Url::parse succeeding (utils/mod.rs:37-39)."""
    if not _SCHEME_RE.match(s):
        return False
    return True


def to_camel_case(s: str) -> str:
    """F2 — PascalCase with lowered first char; URLs pass through
    (utils/mod.rs:89-99)."""
    if is_valid_url(s):
        return s
    p = to_pascal_case(s)
    return p[0].lower() + p[1:] if p else ""


def to_kebab_case(s: str) -> str:
    """F3 — PascalCase → dash-lower (utils/mod.rs:102-118)."""
    p = to_pascal_case(s)
    out = []
    for i, c in enumerate(p):
        if c.isupper():
            if i > 0:
                out.append("-")
            out.append(c.lower())
        else:
            out.append(c)
    return "".join(out)


def normalize_label_for_iri(label: str) -> str:
    """F4 — trim; // → -; non-alnum → -; collapse dashes
    (utils/mod.rs:77-86)."""
    s = label.strip().replace("//", "-")
    s = "".join(c if (c.isalnum() or c == "-") else "-" for c in s)
    return "-".join(p for p in s.split("-") if p)


def expand_iri_with_base(base_iri: str, possibly_relative_iri: str) -> str:
    """F5 — RFC-3986 join with the reference's special cases
    (utils/mod.rs:42-74): invalid base → passthrough; base with empty
    fragment appends into the fragment; base with non-empty fragment →
    passthrough; joined result is url-decoded.
    """
    if not _SCHEME_RE.match(base_iri):
        return possibly_relative_iri
    if "#" in base_iri:
        fragment = base_iri.split("#", 1)[1]
        if fragment == "":
            if _SCHEME_RE.match(possibly_relative_iri):
                return possibly_relative_iri
            return unquote(base_iri + possibly_relative_iri)
        return possibly_relative_iri
    if _SCHEME_RE.match(possibly_relative_iri):
        return possibly_relative_iri
    # urljoin refuses to resolve against unregistered schemes (s3://...):
    # splice through an http stand-in, keeping RFC-3986 reference semantics.
    parts = urlsplit(base_iri)
    scheme = parts.scheme.lower()
    if scheme in ("http", "https", "ftp", "file"):
        joined = urljoin(base_iri, possibly_relative_iri)
    else:
        fake = "http:" + base_iri[len(parts.scheme) + 1 :]
        joined = urljoin(fake, possibly_relative_iri)
        if joined.startswith("http:"):
            joined = scheme + ":" + joined[len("http:") :]
    return unquote(joined)


def namespace_iri(class_name: str, local_id: str) -> str:
    """F10 — ``kebab(Class)/id`` namespacing used when
    ``namespaceIris`` is on (instance/processor_impl.rs:165-169)."""
    return f"{to_kebab_case(class_name)}/{local_id}"


def are_conflicting(a: str | None, b: str | None) -> bool:
    """F11 — both non-empty and different (utils/mod.rs:147-159)."""
    if a is None or b is None:
        return False
    if a == "" or b == "":
        return False
    return a != b
