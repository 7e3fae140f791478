"""The converter core: vectorized envelope parse + key extraction.

Re-expresses the reference's per-record hot loop (JC:314-362 JSON parse,
JC:418-501 extraction, JC:287-297 target-struct assembly) as Arrow-batched
``mapInPandas``: one compiled extractor applied vectorized per batch
instead of one closure application per record (SURVEY.md §1.1).

The reference's compile-once-per-schema instruction cache (Guava LRU,
JC:84-93, keyed by schema hash JC:785-814) becomes an **executor-local
memo dict** keyed by (config fingerprint, schema name): compiled once per
Python worker process on first sight of a schema, reused across batches
and micro-batches (worker reuse keeps the process alive).

Output: flat target schema — all extracted key columns as *optional
strings* plus one payload string column (JC:157-181 createTargetSchema),
preceded by caller-requested passthrough columns (lsn/op/offsets for the
CDC pipeline). Tombstones (null envelope) pass through with null
keys/payload (JC:316-318,371-373).

Error channel (O19): ``errors="quarantine"`` routes failures into an
``_error`` column instead of failing the task — the Spark analogue of a
corrupt-record side output; ``errors="raise"`` matches the reference's
DataException behavior.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterator

import pandas as pd

from ..config import ConverterConfig
from ..functions.canonical_json import canonical_dumps
from ..functions.paths import ExtractionError, compile_path
from .identify import compile_identifier

# executor-local instruction cache: (config_fp, schema_name) -> compiled plan
# (engine analogue of the reference's LoadingCache, JC:84-93). Bounded LRU
# like the reference's maximumSize(200) (JC:85): an unbounded dict would
# grow per-executor forever under many distinct (config, schema) pairs.
CACHE_MAX_SIZE = 200

_EXTRACTOR_CACHE: OrderedDict[tuple[int, str], list[tuple[str, object]]] = OrderedDict()


def cache_size() -> int:
    """Introspection hook, parity with getCacheSize() (JC:503-505)."""
    return len(_EXTRACTOR_CACHE)


def _config_fingerprint(config: ConverterConfig) -> int:
    return hash(
        (
            tuple(sorted((s, tuple(sorted(m.items()))) for s, m in config.keys.items())),
            config.uppercase,
            config.payload_field_name,
        )
    )


def compile_schema_extractor(
    config: ConverterConfig, schema_name: str
) -> list[tuple[str, object]]:
    """Compile one schema's key map into [(target_col, compiled_path)].

    Memoized per (config, schema) like the reference's instruction cache;
    unknown schema -> empty key list is only legal when allow_non_indexed
    (JCC:83-87), else it's a config-time error already caught by
    ConverterConfig validation.
    """
    fp = (_config_fingerprint(config), schema_name)
    plan = _EXTRACTOR_CACHE.get(fp)
    if plan is None:
        keymap = config.keys.get(schema_name, {})
        plan = [
            (config.fold(new), compile_path(tuple(old.split("."))))
            for old, new in keymap.items()
        ]
        _EXTRACTOR_CACHE[fp] = plan
        if len(_EXTRACTOR_CACHE) > CACHE_MAX_SIZE:  # evict LRU (JC:85)
            _EXTRACTOR_CACHE.popitem(last=False)
    else:
        _EXTRACTOR_CACHE.move_to_end(fp)  # mark recently used
    return plan


def convert_batch(
    pdf: pd.DataFrame,
    config: ConverterConfig,
    value_col: str = "value_json",
    schema_col: str | None = None,
    passthrough: tuple[str, ...] = (),
    errors: str = "quarantine",
) -> pd.DataFrame:
    """Pure-pandas converter over one Arrow batch (unit-testable without
    Spark). Returns passthrough + schema_name + key cols + payload + _error."""
    import json as _json

    n = len(pdf)
    out = {c: pdf[c].to_numpy() for c in passthrough}
    err: list = [None] * n
    objs: list = [None] * n

    # O4: parse (tombstones pass through as None); errors -> channel.
    # Plain-list hot loop — pandas .iat indexing is ~10x slower per element.
    loads = _json.loads
    for i, v in enumerate(pdf[value_col].tolist()):
        if v is None or (isinstance(v, float) and v != v):
            continue
        try:
            o = loads(v)
            if not isinstance(o, dict):
                raise ExtractionError("JSON envelope root must be an object (JC:319-322)")
            objs[i] = o
        except Exception as e:  # noqa: BLE001 — error channel (O19)
            if errors == "raise":
                raise
            err[i] = f"parse: {e}"

    # O6/O7: identify + admission
    if schema_col is not None and schema_col in pdf.columns:
        names = pdf[schema_col].tolist()
    else:
        ident = compile_identifier(config.identifiers)
        names = [None if o is None else ident(o) for o in objs]
    declared = set(config.schema_names)
    for i in range(n):
        if objs[i] is None:
            continue
        nm = names[i]
        if nm is None or nm not in declared:
            msg = f"identify: no declared schema matched (JC:339-343): {nm!r}"
            if errors == "raise":
                raise ExtractionError(msg)
            err[i] = err[i] or msg
            objs[i] = None  # quarantine: drop from extraction
            names[i] = None

    # O8-O12: per-schema compiled extraction, grouped per schema so the
    # compiled plan is fetched once per (schema, batch)
    target_cols = config.target_columns()
    payload_col = target_cols[-1]
    cols: dict[str, list] = {c: [None] * n for c in target_cols}

    by_schema: dict[str, list[int]] = {}
    for i in range(n):
        if objs[i] is not None:
            by_schema.setdefault(names[i], []).append(i)

    dumps = canonical_dumps
    for schema_name, idxs in by_schema.items():
        plan = compile_schema_extractor(config, schema_name)
        for tcol, extractor in plan:
            col = cols[tcol]
            for i in idxs:
                try:
                    col[i] = extractor(objs[i])
                except ExtractionError as e:
                    if errors == "raise":
                        raise
                    err[i] = err[i] or f"extract {tcol}: {e}"
        pser = cols[payload_col]  # O15: canonical payload encode
        for i in idxs:
            if err[i] is None:
                pser[i] = dumps(objs[i])

    out["schema_name"] = pd.Series(names, dtype=object)
    for c in target_cols:
        out[c] = pd.Series(cols[c], dtype=object)
    out["_error"] = pd.Series(err, dtype=object)
    return pd.DataFrame(out)


def convert_stream(
    df,
    config: ConverterConfig,
    value_col: str = "value_json",
    schema_col: str | None = None,
    passthrough: tuple[str, ...] = (),
    errors: str = "quarantine",
):
    """Distributed converter: mapInPandas over Arrow batches (N1).

    The returned DataFrame has a *fixed* output StructType (O17) so
    downstream MERGE/registry logic sees a stable shape regardless of
    which schemas appear in a given batch.
    """
    from pyspark.sql import types as T

    in_schema = dict(zip(df.schema.names, df.schema.fields))
    fields = [in_schema[c] for c in passthrough]
    fields.append(T.StructField("schema_name", T.StringType(), True))
    for c in config.target_columns():
        fields.append(T.StructField(c, T.StringType(), True))
    fields.append(T.StructField("_error", T.StringType(), True))
    out_schema = T.StructType(fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield convert_batch(
                pdf,
                config,
                value_col=value_col,
                schema_col=schema_col,
                passthrough=passthrough,
                errors=errors,
            )

    return df.mapInPandas(_run, schema=out_schema)
