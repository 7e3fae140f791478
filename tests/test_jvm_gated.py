"""Jar-gated JVM fast paths: spark-avro decode + Iceberg MERGE sink.

The sandbox ships neither jar, so execution tests are skipif-gated on
the availability probes (they run on any real cluster launched with
--packages); everything buildable without the JVM classes — SQL
builders, availability probes, gating errors, schema-scope checks — is
tested unconditionally.
"""

import pytest

from kafka_connect_converter_json_spark.config import ConverterConfig
from kafka_connect_converter_json_spark.sources.avro_columnar import ColumnarUnsupported
from kafka_connect_converter_json_spark.sources import jvm_avro
from kafka_connect_converter_json_spark.streaming import iceberg_sink as ice

DOC_SCHEMA = {
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
            {"name": "id", "type": "long"}, {"name": "lang", "type": "string"}]}},
        {"name": "content", "type": "string"},
    ],
}


def _cfg():
    return ConverterConfig(
        payload_field_name="payload", input_format="avro", schema_names=("Doc",),
        keys={"Doc": {"meta.id": "id_str", "meta.lang": "lang", "content": "content"}},
        identifiers=(), uppercase=False,
    )


def test_probes_are_memoized_and_false_in_sandbox(spark):
    assert jvm_avro.spark_avro_available(spark) is jvm_avro.spark_avro_available(spark)
    if jvm_avro.spark_avro_available(spark):
        pytest.skip("spark-avro present: gating-off behavior untestable")
    assert not jvm_avro.spark_avro_available(spark)
    assert not ice.iceberg_available(spark)


def test_jvm_avro_gate_raises_clear_error(spark):
    if jvm_avro.spark_avro_available(spark):
        pytest.skip("spark-avro present")
    df = spark.createDataFrame([(b"\x00\x00\x00\x00\x01x",)], "value_bytes binary")
    with pytest.raises(RuntimeError, match="--packages"):
        jvm_avro.avro_convert_stream_jvm(df, _cfg(), __import__("json").dumps(DOC_SCHEMA), 1, "Doc")


def test_jvm_avro_rejects_logical_types(spark, monkeypatch):
    """Logical types must keep the columnar path (string parity)."""
    monkeypatch.setattr(jvm_avro, "spark_avro_available", lambda s: True)
    schema = {"type": "record", "name": "L", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}}]}
    df = spark.createDataFrame([(b"\x00\x00\x00\x00\x01x",)], "value_bytes binary")
    with pytest.raises(ColumnarUnsupported, match="logical"):
        jvm_avro.avro_convert_stream_jvm(
            df, _cfg(), __import__("json").dumps(schema), 1, "L")


def test_iceberg_gate_raises_clear_error(spark):
    if ice.iceberg_available(spark):
        pytest.skip("iceberg present")
    with pytest.raises(RuntimeError, match="--packages"):
        ice.IcebergMergeSink(spark, "lake.db.t", keys=["repo", "path"])


def test_merge_into_sql_shape():
    sql = ice.merge_into_sql(
        "lake.db.files", "_updates", ["repo", "path"],
        payload_cols=["content", "op"], order_col="lsn",
    )
    assert "MERGE INTO lake.db.files t USING _updates s" in sql
    assert "ON t.repo = s.repo AND t.path = s.path" in sql
    # delete branch carries the same order guard as update: replaying a
    # stale epoch whose winner is a delete must not remove a newer row
    assert "WHEN MATCHED AND s.op = 'd' AND s.lsn >= t.lsn THEN DELETE" in sql
    assert "WHEN MATCHED AND s.lsn >= t.lsn THEN UPDATE SET" in sql
    assert "t.content = s.content" in sql and "t.lsn = s.lsn" in sql
    assert "WHEN NOT MATCHED AND s.op <> 'd' THEN INSERT" in sql
    assert "(repo, path, content, op, lsn)" in sql


def test_create_table_sql_buckets_first_key():
    sql = ice.create_table_sql(
        "lake.db.files", ["repo", "path"], ["content"],
        num_buckets=128, col_types={"lsn": "BIGINT"},
    )
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(128, repo))" in sql
    assert "lsn BIGINT" in sql and "content STRING" in sql


# -- execution parity, runs only where the jars exist ------------------------

def test_jvm_avro_execution_parity(spark):
    if not jvm_avro.spark_avro_available(spark):
        pytest.skip("spark-avro jar absent in this environment")
    import json

    import pandas as pd
    from kafka_connect_converter_json_spark.operators.avro_extract import avro_convert_stream
    from kafka_connect_converter_json_spark.sources import avro_codec as av

    reg = av.LocalSchemaRegistry.of({1: DOC_SCHEMA})
    frames = [
        av.encode_wire(1, av.encode(DOC_SCHEMA, {
            "meta": {"id": i, "lang": "en"}, "content": f"c{i}"}))
        for i in range(50)
    ] + [None, b"\x01bad"]
    df = spark.createDataFrame(pd.DataFrame({"value_bytes": frames}))
    jvm = jvm_avro.avro_convert_stream_jvm(
        df, _cfg(), json.dumps(DOC_SCHEMA), 1, "Doc").toPandas()
    ref = avro_convert_stream(df, _cfg(), reg).toPandas()
    for c in ("schema_name", "id_str", "lang", "content"):
        assert list(jvm[c]) == list(ref[c])


def test_iceberg_sink_execution(spark, tmp_path):
    if not ice.iceberg_available(spark):
        pytest.skip("iceberg jar absent in this environment")
    # requires a configured catalog; exercised on real clusters only
    sink = ice.IcebergMergeSink(spark, "spark_catalog.default.cdc_t", keys=["k"])
    assert sink.committed_epochs() == set()
