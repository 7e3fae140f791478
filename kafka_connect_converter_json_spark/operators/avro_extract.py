"""Avro-path converter (O3, JC:365-415): Confluent-framed Avro bytes ->
flat target struct, vectorized over Arrow batches.

Per record (mirroring the reference):
1. wire-format deframe + registry schema resolve (JC:368-369);
2. tombstone passthrough on null value (JC:371-373);
3. admission: record name must be declared in ``schema.names``
   (JC:382-388) — quarantined or raised per the error-channel mode;
4. logical types stringified during tree rewrite (O13/O14);
5. compiled dotted-path key extraction (shared with the JSON path — the
   decoded tree is plain dicts/lists so ``compile_path`` semantics apply
   unchanged, JC:636-754);
6. canonical JSON payload encode of the rewritten tree (O15; the
   reference's GenericDatumWriter+JsonEncoder equivalent).

The registry is an in-process dict (no network); at scale it would be
a broadcast variable refreshed per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import struct

from ..config import ConverterConfig
from ..functions.canonical_json import canonical_dumps
from ..functions.paths import ExtractionError
from ..sources.avro_codec import AvroDecodeError, LocalSchemaRegistry, decode_wire, record_name
from ..sources.avro_columnar import ColumnarUnsupported, decode_batch_columns
from .extract import compile_schema_extractor


def _columnar_convert_batch(
    pdf: pd.DataFrame,
    config: ConverterConfig,
    registry,
    value_col: str,
    passthrough: tuple[str, ...],
) -> pd.DataFrame | None:
    """Columnar fast path over one Arrow batch: whole-batch numpy decode
    (sources/avro_columnar.py) grouped by Confluent schema id. Returns
    None when the batch is outside the fast path (unsupported schema
    shape, corrupt framing, missing key path) — the caller then runs the
    per-record interpreter, which produces identical output including
    quarantine rows, so this is purely an optimization."""
    n = len(pdf)
    payloads = [None if p is None else bytes(p) for p in pdf[value_col]]
    live = [i for i, p in enumerate(payloads) if p is not None]
    # framing sanity for the whole batch; any corruption -> interpreter
    # (which quarantines exactly the bad records)
    for i in live:
        p = payloads[i]
        if len(p) < 5 or p[0] != 0:
            return None

    target_cols = config.target_columns()
    payload_col = target_cols[-1]
    names: list = [None] * n
    err: list = [None] * n
    cols: dict[str, list] = {c: [None] * n for c in target_cols}

    ids = {}
    for i in live:
        ids.setdefault(struct.unpack(">I", payloads[i][1:5])[0], []).append(i)
    declared = set(config.schema_names)
    for schema_id, idxs in ids.items():
        try:
            schema = registry.schema_for(schema_id)
        except Exception:  # noqa: BLE001 — unknown id: interpreter path
            return None
        name = record_name(schema)
        if name not in declared:
            for i in idxs:
                err[i] = f"avro: record name {name!r} not in schema.names (JC:382-388)"
            continue
        keymap = config.keys.get(name, {})
        try:
            leaf_cols, payload_json = decode_batch_columns(
                schema, [payloads[i][5:] for i in idxs]
            )
        except ColumnarUnsupported:
            return None
        if any(dotted not in leaf_cols for dotted in keymap):
            return None  # missing key path: interpreter owns the error text
        for j, i in enumerate(idxs):
            names[i] = name
        for dotted, new in keymap.items():
            tcol = config.fold(new)
            col = cols[tcol]
            vals = leaf_cols[dotted]
            for j, i in enumerate(idxs):
                col[i] = vals[j]
        pcol = cols[payload_col]
        for j, i in enumerate(idxs):
            pcol[i] = payload_json[j]

    out = {c: pdf[c].to_numpy() for c in passthrough}
    out["schema_name"] = pd.Series(names, dtype=object)
    for c in target_cols:
        out[c] = pd.Series(cols[c], dtype=object)
    out["_error"] = pd.Series(err, dtype=object)
    return pd.DataFrame(out)


def avro_convert_batch(
    pdf: pd.DataFrame,
    config: ConverterConfig,
    registry: LocalSchemaRegistry,
    value_col: str = "value_bytes",
    passthrough: tuple[str, ...] = (),
    errors: str = "quarantine",
    columnar: bool = True,
) -> pd.DataFrame:
    # columnar fast path only under the quarantine error mode: its
    # admission failures land in the _error column; "raise" semantics
    # (fail the task on first bad record) stay with the interpreter
    if columnar and errors == "quarantine":
        fast = _columnar_convert_batch(pdf, config, registry, value_col, passthrough)
        if fast is not None:
            return fast
    n = len(pdf)
    out = {c: pdf[c].to_numpy() for c in passthrough}
    err = [None] * n
    names = [None] * n
    objs = [None] * n

    declared = set(config.schema_names)
    for i, payload in enumerate(pdf[value_col]):
        if payload is None:
            continue  # tombstone passthrough (JC:371-373)
        try:
            name, obj = decode_wire(registry, bytes(payload))
            if name not in declared:
                raise AvroDecodeError(
                    f"record name {name!r} not in schema.names (JC:382-388)"
                )
            names[i], objs[i] = name, obj
        except (AvroDecodeError, Exception) as e:  # noqa: BLE001
            if errors == "raise":
                raise
            err[i] = f"avro: {e}"

    target_cols = config.target_columns()
    payload_col = target_cols[-1]
    cols: dict[str, list] = {c: [None] * n for c in target_cols}
    for i in range(n):
        if objs[i] is None:
            continue
        plan = compile_schema_extractor(config, names[i])
        try:
            for tcol, extractor in plan:
                cols[tcol][i] = extractor(objs[i])
            cols[payload_col][i] = canonical_dumps(objs[i])
        except ExtractionError as e:
            if errors == "raise":
                raise
            err[i] = err[i] or f"extract: {e}"

    out["schema_name"] = pd.Series(names, dtype=object)
    for c in target_cols:
        out[c] = pd.Series(cols[c], dtype=object)
    out["_error"] = pd.Series(err, dtype=object)
    return pd.DataFrame(out)


def avro_convert_stream(
    df,
    config: ConverterConfig,
    registry: LocalSchemaRegistry,
    value_col: str = "value_bytes",
    passthrough: tuple[str, ...] = (),
    errors: str = "quarantine",
    columnar: bool = True,
):
    """Distributed Avro converter: mapInPandas, fixed output StructType
    (same shape as the JSON path, so the two sources union cleanly —
    the O2 source-dispatch pattern)."""
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
            yield avro_convert_batch(
                pdf, config, registry, value_col=value_col,
                passthrough=passthrough, errors=errors, columnar=columnar,
            )

    return df.mapInPandas(_run, schema=out_schema)
