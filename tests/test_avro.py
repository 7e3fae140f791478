"""Avro path: from-scratch binary codec, Confluent wire format, logical
types, and the distributed Avro converter (port of the reference's
Avro round-trip tests, JsonConverterTest.java:149-229,571-750)."""

import pytest

from kafka_connect_converter_json_spark.config import ConverterConfig, IdentifierRule
from kafka_connect_converter_json_spark.operators.avro_extract import (
    avro_convert_batch,
    avro_convert_stream,
)
from kafka_connect_converter_json_spark.sources import avro_codec as av

COMPLEX = {
    "type": "record",
    "name": "ComplexSchemaName",
    "fields": [
        {"name": "int8", "type": "int"},
        {"name": "int64", "type": "long"},
        {"name": "float32", "type": "float"},
        {"name": "boolean", "type": "boolean"},
        {"name": "string", "type": "string"},
        {"name": "bytes", "type": "bytes"},
        {"name": "array", "type": {"type": "array", "items": "string"}},
        {"name": "map", "type": {"type": "map", "values": "int"}},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {
            "name": "subrecord1",
            "type": {
                "type": "record",
                "name": "Sub1",
                "fields": [
                    {
                        "name": "subrecord2",
                        "type": {
                            "type": "record",
                            "name": "Sub2",
                            "fields": [{"name": "int32", "type": "int"}],
                        },
                    }
                ],
            },
        },
    ],
}

VALUE = {
    "int8": 12,
    "int64": 12,
    "float32": 12.5,
    "boolean": True,
    "string": "stringyåøæ¤#&|§Ҋ ҈Ҏ",
    "bytes": b"foo",
    "array": ["a", "b", "c"],
    "map": {"field": 1},
    "opt": "here",
    "subrecord1": {"subrecord2": {"int32": 199}},
}

LOGICAL = {
    "type": "record",
    "name": "LogicalTypes",
    "fields": [
        {"name": "date", "type": {"type": "int", "logicalType": "date"}},
        {"name": "time", "type": {"type": "int", "logicalType": "time-millis"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "tsmicro", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "localts", "type": {"type": "long", "logicalType": "local-timestamp-millis"}},
        {"name": "uuid", "type": {"type": "string", "logicalType": "uuid"}},
        {
            "name": "decimal",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 64, "scale": 0},
        },
        {
            "name": "optdate",
            "type": ["null", {"type": "int", "logicalType": "date"}],
            "default": None,
        },
    ],
}


def test_roundtrip_all_container_types():
    body = av.encode(COMPLEX, VALUE)
    decoded = av.decode(COMPLEX, body)
    assert decoded == VALUE


def test_union_null_and_value():
    assert av.decode(COMPLEX, av.encode(COMPLEX, {**VALUE, "opt": None}))["opt"] is None


def test_logical_type_stringification_golden():
    # port of testLogicalType golden strings (TEST:571-750; conversions
    # JC:1033-1262) — raw representations to java.time toString forms
    value = {
        "date": 100,  # 1970-04-11
        "time": 13 * 3_600_000 + 14 * 60_000,  # 13:14
        "ts": 1500,  # 1970-01-01T00:00:01.500Z
        "tsmicro": 1_500_001,  # 1970-01-01T00:00:01.500001Z
        "localts": 61_000,  # 1970-01-01T00:01:01
        "uuid": "123e4567-e89b-12d3-a456-426614174000",
        "decimal": (314159).to_bytes(4, "big", signed=True),
        "optdate": 1,
    }
    decoded = av.decode(LOGICAL, av.encode(LOGICAL, value))
    s = av.stringify_logical(LOGICAL, decoded)
    assert s == {
        "date": "1970-04-11",
        "time": "13:14",
        "ts": "1970-01-01T00:00:01.500Z",
        "tsmicro": "1970-01-01T00:00:01.500001Z",
        "localts": "1970-01-01T00:01:01",
        "uuid": "123e4567-e89b-12d3-a456-426614174000",
        "decimal": "314159",
        "optdate": "1970-01-02",
    }


def test_union_wrap_and_namespace():
    """Avro JsonEncoder union encoding (F4 customer_state fixture shape):
    non-null union values wrap as {"<branch>": value}; includenamespace
    qualifies record names (JC:233-234)."""
    schema = {
        "type": "record",
        "name": "Holder",
        "fields": [
            {
                "name": "event",
                "type": [
                    "null",
                    {"type": "record", "name": "AddressAdded", "namespace": "no.nt",
                     "fields": [{"name": "x", "type": "int"}]},
                    {"type": "record", "name": "AddressRemoved", "namespace": "no.nt",
                     "fields": [{"name": "y", "type": "string"}]},
                ],
            },
            {"name": "opt", "type": ["null", "int"]},
        ],
    }
    value = {"event": {"y": "gone"}, "opt": 5}
    plain = av.stringify_logical(schema, value)
    assert plain == {"event": {"y": "gone"}, "opt": 5}
    wrapped = av.stringify_logical(schema, value, union_wrap=True)
    assert wrapped == {"event": {"AddressRemoved": {"y": "gone"}}, "opt": {"int": 5}}
    qualified = av.stringify_logical(schema, value, union_wrap=True, include_namespace=True)
    assert qualified["event"] == {"no.nt.AddressRemoved": {"y": "gone"}}
    # null union value never wraps
    assert av.stringify_logical(schema, {"event": None, "opt": None}, union_wrap=True) == {
        "event": None,
        "opt": None,
    }


def test_schema_rewrite_golden():
    """Port of the reference's one live assertion (TEST:878-879): the
    rewritten schema replaces every logical leaf with string + a JSON*
    logical type, preserving decimal precision/scale and union shape."""
    rewritten = av.rewrite_logical_schema(LOGICAL)
    by_name = {f["name"]: f["type"] for f in rewritten["fields"]}
    assert by_name["date"] == {"type": "string", "logicalType": "jsondate"}
    assert by_name["time"] == {"type": "string", "logicalType": "jsontime"}
    assert by_name["ts"] == {"type": "string", "logicalType": "jsontimestamp"}
    assert by_name["tsmicro"] == {"type": "string", "logicalType": "jsontimestampmicros"}
    assert by_name["localts"] == {"type": "string", "logicalType": "jsonlocaltimestamp"}
    assert by_name["uuid"] == {"type": "string", "logicalType": "uuid"}
    assert by_name["decimal"] == {
        "type": "string",
        "logicalType": "jsondecimal",
        "precision": 64,
        "scale": 0,
    }
    # optional union keeps its null branch, logical branch rewritten
    assert by_name["optdate"] == ["null", {"type": "string", "logicalType": "jsondate"}]
    # non-logical fields pass through untouched; unknown logical throws
    assert av.rewrite_logical_schema({"type": "int"}) == {"type": "int"}
    with pytest.raises(av.AvroDecodeError, match="Unknown logical type"):
        av.rewrite_logical_schema({"type": "fixed", "size": 12, "name": "d", "logicalType": "duration"})


def test_wire_format_and_registry():
    reg = av.LocalSchemaRegistry.of({7: COMPLEX})
    framed = av.encode_wire(7, av.encode(COMPLEX, VALUE))
    name, obj = av.decode_wire(reg, framed)
    assert name == "ComplexSchemaName"
    assert obj["subrecord1"]["subrecord2"]["int32"] == 199
    with pytest.raises(av.AvroDecodeError, match="magic"):
        av.decode_wire(reg, b"\x01junk")
    with pytest.raises(av.AvroDecodeError, match="unknown schema id"):
        av.decode_wire(reg, av.encode_wire(99, b""))


def _cfg():
    return ConverterConfig(
        payload_field_name="payload",
        input_format="avro",
        schema_names=("ComplexSchemaName",),
        keys={
            "ComplexSchemaName": {
                "int8": "intkey",
                "string": "stringkey",
                "array": "arraykey",
                "map": "mapkey",
                "subrecord1.subrecord2.int32": "nestedkey",
            }
        },
        identifiers=(),
        uppercase=True,
    )


def test_avro_convert_batch_extraction():
    import pandas as pd

    reg = av.LocalSchemaRegistry.of({1: COMPLEX})
    framed = av.encode_wire(1, av.encode(COMPLEX, VALUE))
    pdf = pd.DataFrame({"value_bytes": [framed, None]})
    out = avro_convert_batch(pdf, _cfg(), reg)
    assert out["INTKEY"].iloc[0] == "12"
    assert out["STRINGKEY"].iloc[0] == "stringyåøæ¤#&|§Ҋ ҈Ҏ"  # UTF-8 (TEST:752-832)
    assert out["ARRAYKEY"].iloc[0] == "a"  # array head (TEST:549)
    assert out["MAPKEY"].iloc[0] == "1"  # map first value
    assert out["NESTEDKEY"].iloc[0] == "199"
    assert out["PAYLOAD"].iloc[0].startswith('{"int8":12,')
    # tombstone row: all-null, no error
    assert out["PAYLOAD"].iloc[1] is None and out["_error"].iloc[1] is None


def test_avro_undeclared_record_quarantined():
    import pandas as pd

    other = {"type": "record", "name": "Other", "fields": [{"name": "x", "type": "int"}]}
    reg = av.LocalSchemaRegistry.of({1: other})
    framed = av.encode_wire(1, av.encode(other, {"x": 1}))
    out = avro_convert_batch(pd.DataFrame({"value_bytes": [framed]}), _cfg(), reg)
    assert "not in schema.names" in out["_error"].iloc[0]


def test_avro_convert_stream(spark):
    reg = av.LocalSchemaRegistry.of({1: COMPLEX})
    rows = [
        (i, av.encode_wire(1, av.encode(COMPLEX, {**VALUE, "int8": i}))) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "lsn long, value_bytes binary")
    out = avro_convert_stream(df, _cfg(), reg, passthrough=("lsn",)).orderBy("lsn").collect()
    assert [r["INTKEY"] for r in out] == ["0", "1", "2", "3", "4"]
    assert all(r["schema_name"] == "ComplexSchemaName" for r in out)
