"""Schema identification (predicate probe) — SURVEY.md §2.1 O6/O7.

Reference: for JSON input, iterate configured ``(path, expected)`` rules;
first match names the schema (JC:328-343). ``identifySchema`` (JC:508-549)
descends objects and arrays (via ``[0]``); ``expected == "true"`` is an
existence test (JC:526-528), anything else is ``toString()`` equality
(JC:529). A record matching no rule is an error (JC:339-343). Avro-side
admission: record name must be in ``schema.names`` (JC:382-388).

Divergence: the reference iterates a HashMap of rules (JCC:97-100,
nondeterministic order); the engine evaluates rules in **declared config
order** (SURVEY.md §3.3).

Two implementations:
- ``compile_identifier``: vectorized probe over parsed objects (used
  inside the mapInPandas converter);
- ``identify_expr``: pure-Spark ``F.coalesce(F.when(...))`` chain over
  ``get_json_object`` for the JVM fast path (object-only probe paths).
"""

from __future__ import annotations

from collections.abc import Callable

from ..config import ConverterConfig, IdentifierRule
from .. import functions as _  # noqa: F401  (package init)
from ..functions.paths import json_stringify_scalar


def _probe(path: tuple[str, ...], obj) -> tuple[bool, object]:
    """Walk a probe path; returns (found, value). Arrays unwrap to [0]
    (JC:533); missing segments simply fail the probe (no error — JC:536-549
    returns empty Optional, unlike extraction's strict intermediates)."""
    cur = obj
    for seg in path:
        if isinstance(cur, list):
            if not cur:
                return False, None
            cur = cur[0]
        if not isinstance(cur, dict) or seg not in cur:
            return False, None
        cur = cur[seg]
    return True, cur


def compile_identifier(
    rules: tuple[IdentifierRule, ...],
) -> Callable[[object], str | None]:
    """Compile ordered probe rules into one closure: parsed object ->
    schema name or None (no match)."""

    def identify(obj) -> str | None:
        if obj is None:
            return None  # tombstone passthrough (JC:316-318)
        for r in rules:
            found, v = _probe(r.path, obj)
            if not found:
                continue
            if r.expected == "true":  # existence test (JC:526-528)
                return r.schema_name
            if json_stringify_scalar(v) == r.expected:  # equality (JC:529)
                return r.schema_name
        return None

    return identify


def identify_expr(config: ConverterConfig, json_col: str):
    """JVM fast path: coalesced when-chain over get_json_object.

    Only valid for object-path probes (no array-head descent — that needs
    the compiled probe). Returns a Column named ``schema_name``.
    """
    from pyspark.sql import functions as F

    branches = []
    for r in config.identifiers:
        probe = F.get_json_object(F.col(json_col), "$." + ".".join(r.path))
        if r.expected == "true":
            cond = probe.isNotNull()
        else:
            cond = probe == F.lit(r.expected)
        branches.append(F.when(cond, F.lit(r.schema_name)))
    return F.coalesce(*branches).alias("schema_name") if branches else F.lit(None).alias("schema_name")


def admission_filter(df, config: ConverterConfig, schema_col: str = "schema_name"):
    """Early admission filter (JC:382-388 / JC:339-343): keep records whose
    schema is declared; manual predicate placement *before* the parse-heavy
    UDF (SURVEY.md §4 'early admission filter')."""
    from pyspark.sql import functions as F

    return df.filter(F.col(schema_col).isin(list(config.schema_names)))
