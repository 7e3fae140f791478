"""Columnar Avro batch decoder: numpy varint scan + ragged gather.

The reference deserializes Avro in the JVM (JC:365-374,769-783); the
engine's portable decoder (``avro_codec._decode``) is a per-record Python
interpreter — correct, but the one remaining per-record-Python hot loop
at 100-TB scale. This module removes it for the common CDC envelope
shape: all records of a batch are decoded TOGETHER with numpy array
passes — one pass per schema *field*, not per record:

- payload bytes concatenate into one ``uint8`` buffer; a per-record
  position vector advances through the fields;
- varints (int/long, string lengths, union branches, enum indices)
  decode via a vectorized zigzag scan (the multi-byte continuation loop
  iterates at most ~10 times over the shrinking "still continuing" rows);
- strings/bytes/fixed gather through the ragged-range index trick
  (``np.repeat`` + ``arange`` - prefix) into a single contiguous Arrow
  StringArray — no per-record slicing;
- the canonical JSON payload (O15) is rebuilt columnar: per-leaf value
  strings (numpy ``astype(str)``, vectorized escaping with a slow-path
  map only for rows containing escapes) concatenated with the constant
  JSON skeleton of the schema.

Supported schema subset (the flat-able CDC envelope family): records
(arbitrarily nested — Avro encodes a record as the plain concatenation
of its fields, so nesting flattens to an ordered leaf list), primitives,
enum, fixed, logical types, and ``union[null, <leaf>]`` optionals.
Arrays, maps, and multi-branch/record unions are NOT flattened —
``supported()`` returns False and the caller keeps the interpreter.

Safety: the decode verifies every record's final position lands exactly
on its payload end; any mismatch, out-of-bounds read, or unexpected
branch raises ``ColumnarUnsupported`` and the caller falls back to the
per-record interpreter for the batch — identical observable behavior
(including quarantine semantics), columnar is purely an optimization.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd


class ColumnarUnsupported(Exception):
    """Schema shape or data anomaly outside the columnar fast path."""


def _check_logical(leaf: dict) -> dict:
    """Admit only logical types the columnar stringifier implements.
    An unknown logicalType (e.g. ``timestamp-nanos``) must NOT crash the
    fast path mid-decode: rejecting it here (flatten is the plan-time
    ``supported()`` probe) sends the whole batch to the interpreter,
    which quarantines the record with 'Unknown logical type' — the
    reference's behavior (JC:616-618)."""
    from ..functions.logical_types import CONVERSIONS

    if "logical" in leaf and leaf["logical"] not in CONVERSIONS and leaf["logical"] != "decimal":
        raise ColumnarUnsupported(f"logical type {leaf['logical']!r}")
    return leaf


# ---------------------------------------------------------------------------
# schema flattening
# ---------------------------------------------------------------------------

_LEAF_TYPES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


def _norm(schema):
    from .avro_codec import parse_schema

    return parse_schema(schema)


def flatten(schema, prefix: tuple[str, ...] = ()) -> list[dict]:
    """Schema -> ordered leaf list [{path, type, optional, logical, ...}].
    Raises ColumnarUnsupported outside the flat-able subset."""
    schema = _norm(schema)
    if isinstance(schema, list):  # union — only [null, leaf] supported
        branches = [_norm(b) for b in schema]
        kinds = [b if isinstance(b, str) else b.get("type") for b in branches]
        if len(branches) != 2 or "null" not in kinds:
            raise ColumnarUnsupported(f"union {kinds} not [null, leaf]")
        other = branches[kinds.index("null") ^ 1]
        inner = flatten(other, prefix)
        if len(inner) != 1 or inner[0]["path"] != prefix:
            raise ColumnarUnsupported("union of non-leaf")
        leaf = dict(inner[0])
        leaf["optional"] = True
        leaf["null_branch"] = kinds.index("null")
        return [leaf]
    if isinstance(schema, str):
        if schema in _LEAF_TYPES:
            return [{"path": prefix, "type": schema, "optional": False}]
        raise ColumnarUnsupported(f"named-type reference {schema!r}")
    t = schema.get("type")
    if t == "record":
        out: list[dict] = []
        for f in schema["fields"]:
            out.extend(flatten(f["type"], prefix + (f["name"],)))
        return out
    if t == "enum":
        return [{"path": prefix, "type": "enum", "optional": False,
                 "symbols": list(schema["symbols"])}]
    if t == "fixed":
        leaf = {"path": prefix, "type": "fixed", "optional": False,
                "size": int(schema["size"])}
        if "logicalType" in schema:  # e.g. decimal backed by fixed
            leaf["logical"] = schema["logicalType"]
            leaf["scale"] = schema.get("scale", 0)
        return [_check_logical(leaf)]
    if t in _LEAF_TYPES:
        leaf = {"path": prefix, "type": t, "optional": False}
        if "logicalType" in schema:
            leaf["logical"] = schema["logicalType"]
            leaf["scale"] = schema.get("scale", 0)
        return [_check_logical(leaf)]
    raise ColumnarUnsupported(f"type {t!r} (array/map need the interpreter)")


def supported(schema) -> bool:
    try:
        flatten(schema)
        return True
    except ColumnarUnsupported:
        return False


# ---------------------------------------------------------------------------
# vectorized primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized zigzag varint at ``pos`` (int64 positions). Returns
    (signed int64 values, advanced positions)."""
    b = buf[pos].astype(np.uint64)
    acc = b & np.uint64(0x7F)
    pos = pos + 1
    cont = (b & np.uint64(0x80)) != 0
    shift = np.uint64(7)
    while cont.any():
        idx = np.flatnonzero(cont)
        nb = buf[pos[idx]].astype(np.uint64)
        acc[idx] |= (nb & np.uint64(0x7F)) << shift
        pos[idx] += 1
        cont[idx] = (nb & np.uint64(0x80)) != 0
        shift += np.uint64(7)
        if shift > np.uint64(70):
            raise ColumnarUnsupported("varint longer than 10 bytes")
    val = (acc >> np.uint64(1)).astype(np.int64) ^ -((acc & np.uint64(1)).astype(np.int64))
    return val, pos


def _ragged_index(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Gather index for ragged slices buf[starts[i] : starts[i]+lengths[i]].

    Built as cumsum over a delta vector (ones within a slice, a jump at
    each slice boundary) — ~3x faster than the textbook repeat+arange
    form, which np.repeat dominates."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    nz = lengths > 0
    s = starts[nz]
    ln = lengths[nz]
    delta = np.ones(total, np.int64)
    delta[0] = s[0]
    if len(s) > 1:
        boundaries = np.cumsum(ln)[:-1]
        delta[boundaries] = s[1:] - (s[:-1] + ln[:-1]) + 1
    return np.cumsum(delta)


def _gather_strings(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Ragged byte slices -> object array of Python str via ONE Arrow
    StringArray build (C-level UTF-8 validation + materialization)."""
    import pyarrow as pa

    total = int(lengths.sum())
    if total >= 2**31:
        # int32 StringArray offsets would wrap silently; a >2 GiB string
        # column in one Arrow batch belongs to the interpreter path
        raise ColumnarUnsupported("string column exceeds 2 GiB per batch")
    data = buf[_ragged_index(starts, lengths)].tobytes()
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    arr = pa.StringArray.from_buffers(
        len(lengths), pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
    )
    try:
        # from_buffers does NOT validate: invalid UTF-8 must fall back to
        # the interpreter (whose .decode() raises -> quarantine), not
        # silently produce a corrupt string
        arr.validate(full=True)
    except pa.lib.ArrowInvalid as e:
        raise ColumnarUnsupported(f"non-UTF-8 string payload: {e}") from e
    return np.asarray(arr.to_pandas(), dtype=object)


def _gather_bytes(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    data = buf[_ragged_index(starts, lengths)].tobytes()
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    return np.asarray(
        [data[bounds[i]: bounds[i + 1]] for i in range(len(lengths))], dtype=object
    )


def _decode_leaf(leaf: dict, buf: np.ndarray, pos: np.ndarray):
    """Decode one leaf for all (active) rows. Returns (values, pos)."""
    t = leaf["type"]
    if t == "null":
        return np.full(len(pos), None, dtype=object), pos
    if t == "boolean":
        v = buf[pos] != 0
        return v, pos + 1
    if t in ("int", "long"):
        return _read_varint(buf, pos)
    if t in ("float", "double"):
        width = 4 if t == "float" else 8
        idx = (pos[:, None] + np.arange(width)).ravel()
        raw = buf[idx].tobytes()
        v = np.frombuffer(raw, dtype="<f4" if t == "float" else "<f8").astype(np.float64)
        return v, pos + width
    if t == "string":
        ln, pos = _read_varint(buf, pos)
        if (ln < 0).any():
            raise ColumnarUnsupported("negative string length")
        return _gather_strings(buf, pos, ln), pos + ln
    if t == "bytes":
        ln, pos = _read_varint(buf, pos)
        if (ln < 0).any():
            raise ColumnarUnsupported("negative bytes length")
        return _gather_bytes(buf, pos, ln), pos + ln
    if t == "fixed":
        size = leaf["size"]
        ln = np.full(len(pos), size, dtype=np.int64)
        return _gather_bytes(buf, pos, ln), pos + size
    if t == "enum":
        idx, pos = _read_varint(buf, pos)
        symbols = np.asarray(leaf["symbols"], dtype=object)
        if (idx < 0).any() or (idx >= len(symbols)).any():
            raise ColumnarUnsupported("enum index out of range")
        return symbols[idx], pos
    raise ColumnarUnsupported(f"leaf type {t!r}")


# vectorized logical-type stringification --------------------------------

def _stringify_logical_column(leaf: dict, values: np.ndarray) -> np.ndarray:
    from ..functions import logical_types as lt

    logical = leaf["logical"]
    if logical == "date":
        # epoch days -> ISO date, fully vectorized via datetime64
        return np.datetime_as_string(
            values.astype("datetime64[D]"), unit="D"
        ).astype(object)
    if logical == "decimal":
        scale = leaf.get("scale", 0)
        return np.asarray(
            [None if v is None else lt.decimal_to_string(v, scale) for v in values],
            dtype=object,
        )
    fn = lt.CONVERSIONS[logical]  # unreachable-unknown: flatten() admits only known types
    return np.asarray([None if v is None else fn(v) for v in values], dtype=object)


def _stringify_key_column(leaf: dict, values: np.ndarray) -> np.ndarray:
    """Terminal stringify of an extracted key column — exact
    ``functions.paths.json_stringify_scalar`` parity (Object::toString,
    JC:497,660). String-ish leaves pass through; numeric/bool leaves map
    (few key columns per schema — the vectorized wins are the scan,
    gather, and payload build)."""
    if "logical" in leaf or leaf["type"] in ("string", "enum", "bytes", "fixed", "null"):
        return values
    from ..functions.paths import json_stringify_scalar

    return np.asarray(
        [None if v is None else json_stringify_scalar(v) for v in values],
        dtype=object,
    )


# JSON fragment rendering --------------------------------------------------

_ESCAPE_RE = r'["\\\x00-\x1f]'


def _json_fragment(leaf: dict, values: np.ndarray) -> np.ndarray:
    """Per-row JSON text of a decoded leaf (canonical_dumps parity)."""
    t = leaf["type"]
    if "logical" in leaf or t in ("string", "enum", "bytes", "fixed"):
        # bytes/fixed columns are already latin-1 strings (tree parity)
        s = pd.Series(values, dtype=object)
        nn = s.notna()
        esc = nn & s.str.contains(_ESCAPE_RE, regex=True, na=False)
        out = np.full(len(s), "null", dtype=object)
        plain = nn & ~esc
        out[plain.to_numpy()] = '"' + s[plain] + '"'
        if esc.any():
            out[esc.to_numpy()] = s[esc].map(
                lambda x: json.dumps(x, ensure_ascii=False)
            )
        return out
    if t == "boolean":
        return np.where(values.astype(bool), "true", "false").astype(object)
    if t in ("int", "long"):
        return values.astype("U21").astype(object)
    if t in ("float", "double"):
        return np.asarray(
            ["null" if v is None else json.dumps(float(v)) for v in values],
            dtype=object,
        )
    if t == "null":
        return np.full(len(values), "null", dtype=object)
    raise ColumnarUnsupported(f"json fragment for {t!r}")


# ---------------------------------------------------------------------------
# batch decode
# ---------------------------------------------------------------------------

def _json_skeleton(schema, leaves: list[dict]) -> list[str]:
    """Constant JSON text between consecutive leaf values, in schema
    order: len(leaves)+1 pieces. Rebuilds canonical_dumps exactly (keys
    in schema order, compact separators, nulls kept)."""
    pieces: list[str] = []
    cur = [""]

    def walk(s, path):
        s = _norm(s)
        if isinstance(s, list):
            kinds = [(_norm(b) if isinstance(b, str) else _norm(b).get("type")) for b in s]
            other = _norm(s[kinds.index("null") ^ 1]) if "null" in kinds else None
            walk(other, path)
            return
        if isinstance(s, dict) and s.get("type") == "record":
            cur[0] += "{"
            for i, f in enumerate(s["fields"]):
                if i:
                    cur[0] += ","
                cur[0] += json.dumps(f["name"]) + ":"
                walk(f["type"], path + (f["name"],))
            cur[0] += "}"
            return
        # leaf: cut here
        pieces.append(cur[0])
        cur[0] = ""

    walk(schema, ())
    pieces.append(cur[0])
    if len(pieces) != len(leaves) + 1:
        raise ColumnarUnsupported("skeleton/leaf mismatch")
    return pieces


def decode_batch_columns(
    schema, payloads: list[bytes], build_payload: bool = True
) -> tuple[dict[str, np.ndarray], np.ndarray | None]:
    """Decode a batch of Avro bodies (no wire framing) against one writer
    schema. Returns ({dotted_path: stringified-leaf columns}, payload
    canonical-JSON strings or None). Raises ColumnarUnsupported on any
    schema/data anomaly — caller falls back to the interpreter."""
    leaves = flatten(schema)
    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    pos = bounds[:-1].astype(np.int64)
    ends = bounds[1:]

    cols: dict[str, np.ndarray] = {}
    fragments: list[np.ndarray] = []
    try:
        for leaf in leaves:
            if leaf.get("optional"):
                branch, pos = _read_varint(buf, pos)
                ok = (branch == 0) | (branch == 1)
                if not ok.all():
                    raise ColumnarUnsupported("union branch out of range")
                null_branch = leaf["null_branch"]
                present = branch != null_branch
                values = np.full(n, None, dtype=object)
                if present.any():
                    sub_pos = pos[present]
                    sub_vals, sub_pos = _decode_leaf(leaf, buf, sub_pos)
                    if "logical" in leaf:
                        sub_vals = _stringify_logical_column(leaf, sub_vals)
                    elif leaf["type"] in ("bytes", "fixed"):
                        sub_vals = np.asarray(
                            [v.decode("latin-1") for v in sub_vals], dtype=object
                        )
                    if sub_vals.dtype != object:
                        sub_vals = np.asarray(sub_vals.tolist(), dtype=object)
                    values[present] = sub_vals
                    pos = pos.copy()
                    pos[present] = sub_pos
            else:
                values, pos = _decode_leaf(leaf, buf, pos)
                if "logical" in leaf:
                    values = _stringify_logical_column(leaf, values)
                elif leaf["type"] in ("bytes", "fixed"):
                    # interpreter parity: stringify_logical renders raw
                    # bytes as latin-1 strings in the decoded tree
                    values = np.asarray(
                        [None if v is None else v.decode("latin-1") for v in values],
                        dtype=object,
                    )
            dotted = ".".join(leaf["path"])
            if values.dtype != object:
                # native Python scalars (int/float/bool), matching the
                # interpreter's decoded tree exactly
                values = np.asarray(values.tolist(), dtype=object)
            cols[dotted] = _stringify_key_column(leaf, values)
            if build_payload:
                frag = _json_fragment(
                    {**leaf, "type": "string"}
                    if "logical" in leaf
                    else leaf,
                    values,
                )
                if leaf.get("optional"):
                    frag[np.asarray([v is None for v in values])] = "null"
                fragments.append(frag)
    except (IndexError, ValueError, KeyError) as e:
        # KeyError belt-and-suspenders: any missing leaf attribute falls
        # back to the interpreter instead of failing the Spark task
        raise ColumnarUnsupported(f"decode anomaly: {e}") from e

    if not np.array_equal(pos, ends):
        raise ColumnarUnsupported("record did not consume exactly its payload")

    payload_json = None
    if build_payload:
        skeleton = _json_skeleton(schema, leaves)
        acc = pd.Series(np.full(n, skeleton[0], dtype=object))
        for frag, lit in zip(fragments, skeleton[1:]):
            acc = acc + pd.Series(frag)
            if lit:
                acc = acc + lit
        payload_json = acc.to_numpy(dtype=object)
    return cols, payload_json


# ---------------------------------------------------------------------------
# batch encode (the decoder's mirror): columns -> Avro bodies, vectorized
# ---------------------------------------------------------------------------

def _varint_column(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Zigzag-varint encode an int64 column. Returns (per-value byte
    widths, one flat uint8 buffer) — the encoder mirror of
    ``_read_varint``: one masked pass per byte position (<=10), never a
    per-value Python loop."""
    v = vals.astype(np.int64)
    u = ((v << 1) ^ (v >> 63)).astype(np.uint64)
    widths = np.ones(len(u), dtype=np.int64)
    for j in range(1, 10):
        widths += (u >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    out = np.empty(int(widths.sum()), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(widths)[:-1]])
    rem = u.copy()
    for j in range(10):
        mask = widths > j
        if not mask.any():
            break
        idx = np.flatnonzero(mask)
        byte = (rem[idx] & np.uint64(0x7F)).astype(np.uint8)
        more = widths[idx] > (j + 1)
        byte[more] |= np.uint8(0x80)
        out[starts[idx] + j] = byte
        rem[idx] >>= np.uint64(7)
    return widths, out


def _utf8_column(vals) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 encode a string column via ONE Arrow StringArray build.
    Returns (per-value byte lengths, flat uint8 buffer)."""
    import pyarrow as pa

    arr = pa.array(list(vals), type=pa.string())
    if arr.null_count:
        raise ValueError("null in non-optional string column")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: len(arr) + 1]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)[: offsets[-1]]
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return np.diff(offsets).astype(np.int64), data


def encode_batch_columns(schema, cols: dict[str, "np.ndarray | list"],
                         wire_schema_id: int | None = None) -> np.ndarray:
    """Vectorized mirror of ``decode_batch_columns``: encode a batch of
    flat-able records (leaf types long/int/string/boolean, non-optional)
    from per-leaf columns into Avro binary bodies — optionally
    Confluent-wire-framed when ``wire_schema_id`` is given. One numpy
    pass per leaf, one ragged scatter, one Arrow BinaryArray
    materialization; no per-record Python. Intended for fixture/bench
    data generation at scale (the decode contract tests prove
    round-trip parity against the per-record interpreter)."""
    import pyarrow as pa

    leaves = flatten(schema)
    n = None
    chunks: list[tuple[np.ndarray, np.ndarray]] = []  # (widths, flat bytes)
    for leaf in leaves:
        if leaf.get("optional") or "logical" in leaf:
            raise ColumnarUnsupported("encode supports non-optional plain leaves")
        dotted = ".".join(leaf["path"])
        vals = np.asarray(cols[dotted], dtype=object)
        n = len(vals) if n is None else n
        if len(vals) != n:
            raise ValueError(f"column {dotted} length {len(vals)} != {n}")
        t = leaf["type"]
        if t in ("long", "int"):
            chunks.append(_varint_column(vals.astype(np.int64)))
        elif t == "string":
            lens, data = _utf8_column(vals)
            lw, lbuf = _varint_column(lens)
            chunks.append((lw, lbuf))
            chunks.append((lens, data))
        elif t == "boolean":
            b = vals.astype(bool).astype(np.uint8)
            chunks.append((np.ones(n, dtype=np.int64), b))
        else:
            raise ColumnarUnsupported(f"encode leaf type {t!r}")
    if n is None:
        raise ValueError("schema has no leaves")

    prefix = b""
    if wire_schema_id is not None:
        prefix = bytes([0]) + int(wire_schema_id).to_bytes(4, "big")
    pw = len(prefix)

    row_len = np.full(n, pw, dtype=np.int64)
    for widths, _ in chunks:
        row_len += widths
    total = int(row_len.sum())
    out = np.empty(total, dtype=np.uint8)
    row_starts = np.concatenate([[0], np.cumsum(row_len)[:-1]])

    cursor = row_starts.copy()
    if pw:
        pre = np.frombuffer(prefix, dtype=np.uint8)
        idx = (cursor[:, None] + np.arange(pw)).ravel()
        out[idx] = np.tile(pre, n)
        cursor = cursor + pw
    for widths, flat in chunks:
        starts = np.concatenate([[0], np.cumsum(widths)[:-1]])
        out[_ragged_index(cursor, widths)] = flat[_ragged_index(starts, widths)]
        cursor = cursor + widths

    offsets = np.concatenate([[0], np.cumsum(row_len)]).astype(np.int64)
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())],
    )
    return np.asarray(arr.to_pandas(), dtype=object)
