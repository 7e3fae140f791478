"""Canonical JSON payload encoding (the sha256-parity-critical operator).

The reference re-serializes the whole record into one JSON string payload:
JSON input via ``JSONObject.toString()`` (JC:294) and Avro input via a
``JsonEncoder`` over the logical-type-rewritten schema (JC:228-257).
``JSONObject.toString()`` normalizes whitespace and uses HashMap key order
— NOT byte-stable (SURVEY.md §3.3 hard part (a)). The engine therefore
defines an explicit canonical form and uses it on *both* the engine side
and every oracle:

  - compact separators (no spaces) — org.json emits no whitespace;
  - **input key order preserved** (json.loads keeps document order in
    Python dicts) — deterministic, unlike HashMap order;
  - non-ASCII characters emitted raw (UTF-8), not \\u-escaped — matches
    org.json for the UTF-8 round-trip test (TEST:752-832);
  - floats in repr() form (shortest round-trip, Java Double.toString parity
    for typical values).
"""

from __future__ import annotations

import json

import pandas as pd


def canonical_dumps(obj) -> str:
    """Canonical compact JSON encoding of a parsed object."""
    return json.dumps(obj, ensure_ascii=False, separators=(",", ":"))


def canonicalize_str(s: str | None) -> str | None:
    """Parse + re-emit a JSON string in canonical form (payload op, JC:294)."""
    if s is None:
        return None
    return canonical_dumps(json.loads(s))


def canonicalize_series(s: pd.Series) -> pd.Series:
    return s.map(canonicalize_str)


def canonical_series_from_objs(objs: pd.Series) -> pd.Series:
    return objs.map(lambda o: None if o is None else canonical_dumps(o))
