"""Compiled dotted-path key extraction with reference semantics.

Re-expresses the reference's per-schema compiled extraction closures:

- JSON path (JC:417-501 ``getJsonFieldInstruction``): descend ``a.b.c``;
  at each *intermediate* segment a dict is descended by key and a list is
  unwrapped to element ``[0]`` first (JC:437,457,475); a **missing
  intermediate segment is an error** (empty Optional -> orElseThrow,
  JC:444-446) while a **missing leaf returns null** (JC:497-498).
- Leaf unwrap: list -> ``[0]`` (JC:437); dict -> value of its *first key*
  — the reference streams HashMap values (JC:463,478), which is
  nondeterministic; we use the **smallest key in sorted order**
  (documented divergence, SURVEY.md §2.1 O9/O10).
- Terminal stringify: ``Object::toString`` (JC:497,660) — here a
  JSON-faithful stringify (booleans ``true``/``false``, numbers via their
  JSON rendering) so Avro/JSON inputs agree.

Compilation happens once per (schema, path) — the engine analogue of the
reference's instruction cache (JC:84-93) — and the compiled callable is
then applied vectorized over pandas Series of parsed objects.

Also provides the Spark-native fast path: a JSONPath string for
``F.get_json_object`` (JVM-side, codegen'd), used when strict-intermediate
semantics are not required (get_json_object returns null for both missing
intermediates and missing leaves — the strict check needs the compiled
path, SURVEY.md §2.1 O10).
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd


class ExtractionError(ValueError):
    """Engine analogue of Kafka Connect DataException (JC:444-446,339-343)."""


def json_stringify_scalar(v) -> str | None:
    """Terminal ``toString()`` with JSON-faithful rendering.

    Java ``Object::toString`` on org.json values: Boolean -> true/false,
    numbers -> JSON number rendering, strings pass through (JC:497,660).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        # json rendering: 12.2 -> '12.2', 12.0 -> '12.0' (Java Double.toString parity)
        return repr(v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, ensure_ascii=False, separators=(",", ":"))
    return str(v)


def _first_map_value(d: dict):
    """Deterministic surrogate for the reference's HashMap 'first value'
    (JC:463,478,668,702,719): value of the smallest key in sorted order."""
    if not d:
        return None
    return d[min(d.keys())]


def compile_path(path: tuple[str, ...]) -> Callable[[object], str | None]:
    """Compile a dotted path into a single closure over parsed JSON objects.

    Mirrors the closure composition of the reference (Function.andThen
    chains, JC:424,449) — one fused walk, no intermediate materialization.
    """
    if not path:
        raise ExtractionError("empty extraction path")

    intermediates = path[:-1]
    leaf = path[-1]

    def extract(obj) -> str | None:
        cur = obj
        for seg in intermediates:
            if isinstance(cur, list):  # arrays unwrap to [0] (JC:437,457)
                if not cur:
                    raise ExtractionError(f"empty array at intermediate {seg!r}")
                cur = cur[0]
            if not isinstance(cur, dict) or seg not in cur:
                # missing INTERMEDIATE segment is an error (JC:444-446)
                raise ExtractionError(f"missing intermediate segment {seg!r}")
            cur = cur[seg]
        if isinstance(cur, list):
            if not cur:
                return None
            cur = cur[0]
        if not isinstance(cur, dict):
            # path had depth > remaining structure; leaf lookup on a scalar
            # mirrors JSONObject.opt returning null (JC:497-498)
            return None
        v = cur.get(leaf)  # missing LEAF -> null (JC:497-498)
        if isinstance(v, list):  # leaf unwrap: array head (JC:437,533)
            v = v[0] if v else None
        if isinstance(v, dict):  # leaf unwrap: first map value (JC:463,478)
            v = _first_map_value(v)
        return json_stringify_scalar(v)

    return extract


def extract_series(compiled: Callable, objs: pd.Series) -> pd.Series:
    """Apply a compiled extractor over a Series of parsed objects."""
    return objs.map(lambda o: None if o is None else compiled(o))


def jsonpath_for(path: tuple[str, ...], *, arrays_as_head: bool = True) -> str:
    """Spark-native fast path: JSONPath for ``F.get_json_object``.

    ``('a','b')`` -> ``$.a.b``. Array-head unwrap (``[0]``) cannot be
    expressed position-independently in get_json_object's subset, so the
    fast path only matches reference semantics for object-only paths; the
    compiled path above is authoritative for array/map shapes.
    """
    return "$." + ".".join(path)


def parse_json_series(s: pd.Series) -> pd.Series:
    """UTF-8/str JSON envelope column -> parsed objects (JC:319-322).

    Array/primitive roots are rejected like the reference (JC:323-327
    expects a JSONObject); None (tombstone) passes through (JC:316-318).
    """

    def _parse(v):
        if v is None:
            return None
        o = json.loads(v)
        if not isinstance(o, dict):
            raise ExtractionError("JSON envelope root must be an object (JC:319-322)")
        return o

    return s.map(_parse)
