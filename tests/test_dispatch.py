"""O2 source dispatch: JSON and Avro sources produce the identical flat
target shape and union into one stream (JC:141-155 routes per record;
the engine routes per source and unions)."""

import json

from kafka_connect_converter_json_spark.config import ConverterConfig, IdentifierRule
from kafka_connect_converter_json_spark.operators.avro_extract import avro_convert_stream
from kafka_connect_converter_json_spark.operators.extract import convert_stream
from kafka_connect_converter_json_spark.sources import avro_codec as av

SCHEMA = {
    "type": "record",
    "name": "Thing",
    "fields": [
        {"name": "k", "type": "int"},
        {"name": "name", "type": "string"},
    ],
}


def _cfg():
    return ConverterConfig(
        payload_field_name="payload",
        schema_names=("Thing",),
        keys={"Thing": {"k": "k", "name": "name"}},
        identifiers=(IdentifierRule("Thing", ("k",), "true"),),
    )


def test_union_dispatch(spark):
    cfg = _cfg()
    json_rows = [(i, json.dumps({"k": i, "name": f"j{i}"})) for i in range(3)]
    jdf = spark.createDataFrame(json_rows, "lsn long, value_json string")
    jout = convert_stream(jdf, cfg, passthrough=("lsn",))

    reg = av.LocalSchemaRegistry.of({1: SCHEMA})
    avro_rows = [
        (10 + i, av.encode_wire(1, av.encode(SCHEMA, {"k": 10 + i, "name": f"a{i}"})))
        for i in range(3)
    ]
    adf = spark.createDataFrame(avro_rows, "lsn long, value_bytes binary")
    aout = avro_convert_stream(adf, cfg, reg, passthrough=("lsn",))

    assert jout.columns == aout.columns  # identical flat target shape (O17)
    unioned = jout.unionByName(aout).orderBy("lsn")
    rows = unioned.collect()
    assert [r["K"] for r in rows] == ["0", "1", "2", "10", "11", "12"]
    assert {r["schema_name"] for r in rows} == {"Thing"}
    # payload canonical on both paths
    assert rows[0]["PAYLOAD"] == '{"k":0,"name":"j0"}'
    assert rows[3]["PAYLOAD"] == '{"k":10,"name":"a0"}'
