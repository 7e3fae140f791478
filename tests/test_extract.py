"""Converter core: convert_batch / convert_stream (FIXTURES.md F3/F6;
cache reuse port of JsonConverterTest.java:394-484)."""

import json

import pandas as pd
import pytest

from kafka_connect_converter_json_spark.config import (
    ConfigError,
    ConverterConfig,
    IdentifierRule,
)
from kafka_connect_converter_json_spark.operators import extract as ex

F3 = {
    "int8": 12,
    "int32": 12,
    "string": "stringyåøæ¤#&|§Ҋ ҈Ҏ",
    "array": ["a", "b", "c"],
    "subrecord1": {"subrecord2": {"int32": 199}},
}
SIMPLE = {"int8": 112, "intkey": 112, "keyname": "simple-name"}


def _config(**kw):
    return ConverterConfig(
        payload_field_name="payload",
        schema_names=("ComplexSchemaName", "SimpleSchemaName"),
        keys={
            "ComplexSchemaName": {"int32": "intkey", "string": "stringkey"},
            "SimpleSchemaName": {"intkey": "intkey", "keyname": "stringkey"},
        },
        identifiers=(
            IdentifierRule("ComplexSchemaName", ("int32",), "true"),
            IdentifierRule("SimpleSchemaName", ("intkey",), "true"),
        ),
        **kw,
    )


def test_convert_batch_multi_schema_shared_columns():
    # F6: two schemas land on shared target columns INTKEY/STRINGKEY
    cfg = _config()
    pdf = pd.DataFrame({"value_json": [json.dumps(F3), json.dumps(SIMPLE), None]})
    out = ex.convert_batch(pdf, cfg)
    assert list(out["INTKEY"]) == ["12", "112", None]
    assert list(out["STRINGKEY"]) == ["stringyåøæ¤#&|§Ҋ ҈Ҏ", "simple-name", None]
    # tombstone passthrough: null payload, no error (JC:316-318)
    assert out["PAYLOAD"].iloc[2] is None and out["_error"].iloc[2] is None
    # payload is canonical compact JSON preserving input key order
    assert out["PAYLOAD"].iloc[1] == '{"int8":112,"intkey":112,"keyname":"simple-name"}'


def test_case_folding_lowercase():
    cfg = _config(uppercase=False)
    pdf = pd.DataFrame({"value_json": [json.dumps(F3)]})
    out = ex.convert_batch(pdf, cfg)
    assert "intkey" in out.columns and "payload" in out.columns


def test_unidentified_schema_quarantined_vs_raise():
    cfg = _config()
    pdf = pd.DataFrame({"value_json": [json.dumps({"zzz": 1})]})
    out = ex.convert_batch(pdf, cfg, errors="quarantine")
    assert out["_error"].iloc[0] is not None and out["PAYLOAD"].iloc[0] is None
    with pytest.raises(Exception):
        ex.convert_batch(pdf, cfg, errors="raise")


def test_corrupt_json_error_channel():
    cfg = _config()
    pdf = pd.DataFrame({"value_json": ["{not json"]})
    out = ex.convert_batch(pdf, cfg)
    assert "parse:" in out["_error"].iloc[0]


def test_array_root_rejected():
    # JC:319-322: array/primitive roots rejected
    cfg = _config()
    out = ex.convert_batch(pd.DataFrame({"value_json": ["[1,2]"]}), cfg)
    assert out["_error"].iloc[0] is not None


def test_instruction_cache_reuse():
    # port of testCacheReuseOnMultipleComplex (TEST:394-484): one compile
    # per schema across many records
    cfg = _config()
    before = ex.cache_size()
    pdf = pd.DataFrame({"value_json": [json.dumps(F3)] * 5 + [json.dumps(SIMPLE)] * 5})
    ex.convert_batch(pdf, cfg)
    ex.convert_batch(pdf, cfg)
    after = ex.cache_size()
    assert after - before <= 2  # at most one entry per schema


def test_key_name_consistency_invariant():
    # JCC:81-89: schema missing a shared target column is a config error
    with pytest.raises(ConfigError):
        ConverterConfig(
            schema_names=("A", "B"),
            keys={"A": {"x": "k1", "y": "k2"}, "B": {"x": "k1"}},
            identifiers=(
                IdentifierRule("A", ("x",), "true"),
                IdentifierRule("B", ("x",), "true"),
            ),
        )


def test_convert_stream_fixed_output_schema(spark):
    cfg = _config()
    df = spark.createDataFrame(
        [(1, json.dumps(F3)), (2, json.dumps(SIMPLE)), (3, None)],
        "lsn long, value_json string",
    )
    out = ex.convert_stream(df, cfg, passthrough=("lsn",))
    assert out.columns == ["lsn", "schema_name", "INTKEY", "STRINGKEY", "PAYLOAD", "_error"]
    rows = {r["lsn"]: r for r in out.collect()}
    assert rows[1]["INTKEY"] == "12"
    assert rows[2]["schema_name"] == "SimpleSchemaName"
    assert rows[3]["PAYLOAD"] is None


def test_instruction_cache_lru_bounded():
    # reference caps the instruction cache at 200 (Guava maximumSize, JC:85);
    # distinct configs beyond the cap evict least-recently-used entries
    base = dict(
        payload_field_name="payload",
        schema_names=("S",),
        identifiers=(IdentifierRule("S", ("k",), "true"),),
        uppercase=False,
    )
    for i in range(ex.CACHE_MAX_SIZE + 40):
        cfg = ConverterConfig(keys={"S": {"k": f"col{i}"}}, **base)
        ex.compile_schema_extractor(cfg, "S")
        assert ex.cache_size() <= ex.CACHE_MAX_SIZE
    assert ex.cache_size() == ex.CACHE_MAX_SIZE
