"""Columnar Avro decoder: parity with the per-record interpreter across
the supported schema subset, and fallback behavior outside it."""

import json

import numpy as np
import pandas as pd
import pytest

from kafka_connect_converter_json_spark.config import ConverterConfig
from kafka_connect_converter_json_spark.functions.canonical_json import canonical_dumps
from kafka_connect_converter_json_spark.operators.avro_extract import avro_convert_batch
from kafka_connect_converter_json_spark.sources import avro_codec as av
from kafka_connect_converter_json_spark.sources import avro_columnar as ac

RICH_SCHEMA = {
    "type": "record",
    "name": "Rich",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "ratio", "type": "double"},
        {"name": "small", "type": "float"},
        {"name": "name", "type": "string"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "optnum", "type": ["null", "long"]},
        {"name": "color", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "raw", "type": "bytes"},
        {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
            {"name": "born", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        ]}},
    ],
}


def _rich_values(i: int) -> dict:
    return {
        "id": i * 1_000_000_007,           # multi-byte varints
        "flag": i % 2 == 0,
        "ratio": i / 7.0,
        "small": float(np.float32(i / 3.0)),
        "name": f'doc "{i}"' if i % 5 == 0 else f"doc {i}",  # escapes
        "opt": None if i % 3 == 0 else f"opt{i}",
        "optnum": None if i % 4 == 0 else -i,
        "color": ["RED", "GREEN", "BLUE"][i % 3],
        "raw": bytes([i % 256, 0, 255]),
        "meta": {"born": i - 10, "ts": 1700000000000 + i * 1001},
    }


def _bodies(n=64):
    return [av.encode(RICH_SCHEMA, _rich_values(i)) for i in range(n)]


def test_supported_classifier():
    assert ac.supported(RICH_SCHEMA)
    assert not ac.supported({"type": "record", "name": "A", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "long"}}]})
    assert not ac.supported({"type": "record", "name": "A", "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}}]})
    assert not ac.supported({"type": "record", "name": "A", "fields": [
        {"name": "u", "type": ["null", "string", "long"]}]})  # 3-branch


def test_columnar_matches_interpreter_tree():
    bodies = _bodies()
    cols, payload = ac.decode_batch_columns(RICH_SCHEMA, bodies)
    for i, body in enumerate(bodies):
        tree = av.stringify_logical(RICH_SCHEMA, av.decode(RICH_SCHEMA, body))
        assert payload[i] == canonical_dumps(tree), f"payload row {i}"
        assert cols["id"][i] == str(tree["id"])  # key stringify (JC:497,660)
        assert cols["opt"][i] == tree["opt"]
        assert cols["optnum"][i] == (
            None if tree["optnum"] is None else str(tree["optnum"])
        )
        assert cols["meta.born"][i] == tree["meta"]["born"]   # "YYYY-MM-DD"
        assert cols["meta.ts"][i] == tree["meta"]["ts"]       # ISO instant
        assert cols["raw"][i] == tree["raw"]                   # latin-1 string


def test_columnar_round_trip_json():
    _, payload = ac.decode_batch_columns(RICH_SCHEMA, _bodies(16))
    for p in payload:
        obj = json.loads(p)  # valid JSON incl. escapes
        assert set(obj) == {"id", "flag", "ratio", "small", "name", "opt",
                            "optnum", "color", "raw", "meta"}


def test_columnar_detects_corruption_and_falls_back():
    bodies = _bodies(8)
    bodies[3] = bodies[3][:-1]  # truncate one record
    with pytest.raises(ac.ColumnarUnsupported):
        ac.decode_batch_columns(RICH_SCHEMA, bodies)


def _conv_config():
    return ConverterConfig(
        payload_field_name="payload",
        input_format="avro",
        schema_names=("Rich",),
        keys={"Rich": {"id": "id_str", "meta.born": "born", "opt": "opt"}},
        identifiers=(),
        uppercase=False,
    )


def test_batch_converter_columnar_equals_interpreter():
    """avro_convert_batch with/without the columnar path must be
    byte-identical (payload, keys, errors, tombstones, admission)."""
    reg = av.LocalSchemaRegistry.of({7: RICH_SCHEMA, 9: {
        "type": "record", "name": "Undeclared", "fields": [
            {"name": "x", "type": "long"}]}})
    frames = [av.encode_wire(7, b) for b in _bodies(20)]
    frames.append(None)  # tombstone
    frames.append(av.encode_wire(9, av.encode(reg.schema_for(9), {"x": 1})))
    pdf = pd.DataFrame({"value_bytes": frames, "lsn": range(len(frames))})
    cfg = _conv_config()
    fast = avro_convert_batch(pdf, cfg, reg, passthrough=("lsn",), columnar=True)
    slow = avro_convert_batch(pdf, cfg, reg, passthrough=("lsn",), columnar=False)
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["_error"].iloc[-1].startswith("avro: record name 'Undeclared'")
    assert fast["payload"].iloc[0] is not None
    assert fast["payload"].iloc[-2] is None  # tombstone passthrough
    assert fast["payload"].iloc[-1] is None  # quarantined (admission)


NANOS_SCHEMA = {
    "type": "record", "name": "Nanos",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-nanos"}},
    ],
}


def test_unknown_logical_type_is_not_columnar():
    """An unrecognized logicalType must be rejected at plan time (probe),
    not crash mid-decode with a KeyError."""
    assert not ac.supported(NANOS_SCHEMA)
    with pytest.raises(ac.ColumnarUnsupported):
        ac.flatten(NANOS_SCHEMA)


def test_unknown_logical_type_quarantines_identically():
    """ADVICE r2 (high): a writer schema carrying e.g. timestamp-nanos
    must be quarantined with the interpreter's 'Unknown logical type'
    error under columnar=True, not fail the Spark task."""
    reg = av.LocalSchemaRegistry.of({7: RICH_SCHEMA, 11: NANOS_SCHEMA})
    frames = [av.encode_wire(7, b) for b in _bodies(4)]
    frames.append(av.encode_wire(11, av.encode(NANOS_SCHEMA, {"id": 1, "ts": 12345})))
    pdf = pd.DataFrame({"value_bytes": frames})
    cfg = ConverterConfig(
        payload_field_name="payload", input_format="avro",
        schema_names=("Rich", "Nanos"),
        keys={"Rich": {"id": "id_str"}, "Nanos": {"id": "id_str"}},
        identifiers=(), uppercase=False,
    )
    fast = avro_convert_batch(pdf, cfg, reg, columnar=True)
    slow = avro_convert_batch(pdf, cfg, reg, columnar=False)
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["_error"].iloc[-1] is not None
    assert "logical type" in fast["_error"].iloc[-1].lower()
    assert fast["_error"].iloc[:4].isna().all()  # good records unaffected


def test_encode_batch_columns_round_trip():
    """The vectorized encoder must be byte-identical to the per-record
    reference encoder, wire framing included (it generates fixture/bench
    data for the decoder under test)."""
    schema = {"type": "record", "name": "Doc", "fields": [
        {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
            {"name": "id", "type": "long"},
            {"name": "lang", "type": "string"},
            {"name": "ok", "type": "boolean"}]}},
        {"name": "content", "type": "string"},
    ]}
    n = 300
    ids = [i * 1_000_000_007 - 150_000_001_050 for i in range(n)]  # negatives, multibyte
    langs = [["en", "fr", "ñó", "x" * 200][i % 4] for i in range(n)]
    oks = [i % 3 == 0 for i in range(n)]
    contents = [f'doc "{i}" content' * (i % 5) for i in range(n)]  # incl. empty
    enc = ac.encode_batch_columns(
        schema,
        {"meta.id": ids, "meta.lang": langs, "meta.ok": oks, "content": contents},
        wire_schema_id=7,
    )
    for i in range(n):
        ref = av.encode_wire(7, av.encode(schema, {
            "meta": {"id": ids[i], "lang": langs[i], "ok": oks[i]},
            "content": contents[i],
        }))
        assert bytes(enc[i]) == ref, f"row {i}"
    # and the decoder reads its own encoder's bodies back
    cols, _ = ac.decode_batch_columns(schema, [bytes(e)[5:] for e in enc],
                                      build_payload=False)
    assert list(cols["meta.lang"]) == langs
    with pytest.raises(ac.ColumnarUnsupported):
        ac.encode_batch_columns(
            {"type": "record", "name": "O", "fields": [
                {"name": "x", "type": ["null", "long"]}]},
            {"x": [1]},
        )


def test_batch_converter_falls_back_on_corrupt_frame():
    reg = av.LocalSchemaRegistry.of({7: RICH_SCHEMA})
    frames = [av.encode_wire(7, b) for b in _bodies(6)]
    frames[2] = b"\x01garbage"  # bad magic
    pdf = pd.DataFrame({"value_bytes": frames})
    out = avro_convert_batch(pdf, _conv_config(), reg, columnar=True)
    assert out["_error"].iloc[2] is not None  # quarantined, not crashed
    assert out["_error"].drop(index=2).isna().all()


# ---------------------------------------------------------------------------
# property: random supported schemas + random values == interpreter
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_leaf_types = st.sampled_from(
    ["long", "int", "string", "boolean", "double", "float", "bytes"]
)


@st.composite
def _schemas(draw, depth=0):
    n_fields = draw(st.integers(min_value=1, max_value=4))
    fields = []
    for i in range(n_fields):
        if depth < 2 and draw(st.booleans()) and i == 0:
            ftype = draw(_schemas(depth=depth + 1))
        else:
            t = draw(_leaf_types)
            if draw(st.booleans()):
                ftype = ["null", t]
            else:
                ftype = t
        fields.append({"name": f"f{depth}_{i}", "type": ftype})
    return {"type": "record", "name": f"R{depth}", "fields": fields}


def _value_for(schema, draw):
    if isinstance(schema, list):
        t = next(b for b in schema if b != "null")
        if draw(st.booleans()):
            return None
        return _value_for(t, draw)
    if isinstance(schema, dict):
        return {f["name"]: _value_for(f["type"], draw) for f in schema["fields"]}
    return draw({
        "long": st.integers(min_value=-(2**62), max_value=2**62),
        "int": st.integers(min_value=-(2**30), max_value=2**30),
        "string": st.text(max_size=24),
        "boolean": st.booleans(),
        "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "float": st.floats(allow_nan=False, allow_infinity=False, width=32),
        "bytes": st.binary(max_size=12),
    }[schema])


@st.composite
def _schema_and_rows(draw):
    schema = draw(_schemas())
    rows = [_value_for(schema, draw) for _ in range(draw(st.integers(1, 8)))]
    return schema, rows


@settings(max_examples=60, deadline=None)
@given(_schema_and_rows())
def test_property_columnar_equals_interpreter(case):
    schema, rows = case
    bodies = [av.encode(schema, r) for r in rows]
    cols, payload = ac.decode_batch_columns(schema, bodies)
    from kafka_connect_converter_json_spark.functions.paths import (
        compile_path, json_stringify_scalar,  # noqa: F401
    )

    for i, body in enumerate(bodies):
        tree = av.stringify_logical(schema, av.decode(schema, body))
        assert payload[i] == canonical_dumps(tree)
        for dotted, col in cols.items():
            cur = tree
            for seg in dotted.split("."):
                cur = None if cur is None else cur.get(seg)
            expect = None if cur is None else (
                cur if isinstance(cur, str) else json_stringify_scalar(cur)
            )
            assert col[i] == expect, (dotted, i)


def test_invalid_utf8_falls_back_to_interpreter_quarantine():
    """A record whose string bytes are valid varint-framed but invalid
    UTF-8 must quarantine exactly like the interpreter, not produce a
    silently corrupt string."""
    schema = {"type": "record", "name": "S",
              "fields": [{"name": "s", "type": "string"}]}
    good = av.encode(schema, {"s": "ok"})
    bad = b"\x06\xff\xfe\xfd"  # length 3, invalid utf-8 bytes
    with pytest.raises(ac.ColumnarUnsupported, match="non-UTF-8"):
        ac.decode_batch_columns(schema, [good, bad])
    reg = av.LocalSchemaRegistry.of({3: schema})
    frames = [av.encode_wire(3, good), av.encode_wire(3, bad)]
    cfg = ConverterConfig(
        payload_field_name="payload", input_format="avro", schema_names=("S",),
        keys={"S": {"s": "s_out"}}, identifiers=(), uppercase=False,
    )
    out = avro_convert_batch(pd.DataFrame({"value_bytes": frames}), cfg, reg,
                             columnar=True)
    assert out["_error"].iloc[0] is None and out["s_out"].iloc[0] == "ok"
    assert out["_error"].iloc[1] is not None  # quarantined, parity with interpreter
