"""Dotted-path extraction semantics (FIXTURES.md F3; reference semantics
JsonConverter.java:417-501,636-754)."""

import pytest

from kafka_connect_converter_json_spark.functions.paths import (
    ExtractionError,
    compile_path,
    json_stringify_scalar,
)

F3 = {
    "int8": 12,
    "int16": 12,
    "int32": 12,
    "int64": 12,
    "float32": 12.2,
    "boolean": True,
    "string": "stringyåøæ¤#&|§Ҋ ҈Ҏ",
    "bytes": "Zm9v",
    "array": ["a", "b", "c"],
    "map": {"field": 1},
    "subrecord1": {"subrecord2": {"int32": 199}, "array": ["x"]},
}


def test_scalar_extraction_and_stringify():
    assert compile_path(("int32",))(F3) == "12"
    assert compile_path(("float32",))(F3) == "12.2"
    assert compile_path(("boolean",))(F3) == "true"  # Java Boolean.toString
    assert compile_path(("string",))(F3) == "stringyåøæ¤#&|§Ҋ ҈Ҏ"  # UTF-8 (TEST:752-832)


def test_array_head():
    # element [0] only (JC:437,561-562; TEST:549,556)
    assert compile_path(("array",))(F3) == "a"
    assert compile_path(("subrecord1", "array"))(F3) == "x"


def test_map_first_value_sorted_key():
    # deterministic sorted-key surrogate for HashMap first-value (JC:463,478)
    assert compile_path(("map",))(F3) == "1"
    obj = {"m": {"zz": "late", "aa": "early"}}
    assert compile_path(("m",))(obj) == "early"


def test_nested_descent():
    assert compile_path(("subrecord1", "subrecord2", "int32"))(F3) == "199"


def test_missing_intermediate_is_error():
    # JC:444-446: empty Optional -> orElseThrow
    with pytest.raises(ExtractionError):
        compile_path(("nosuch", "leaf"))(F3)


def test_missing_leaf_is_null():
    # JC:497-498
    assert compile_path(("subrecord1", "nosuch"))(F3) is None
    assert compile_path(("nosuch",))(F3) is None


def test_array_intermediate_descends_first_element():
    obj = {"a": [{"b": {"c": 7}}, {"b": {"c": 8}}]}
    assert compile_path(("a", "b", "c"))(obj) == "7"


def test_stringify_forms():
    assert json_stringify_scalar(None) is None
    assert json_stringify_scalar(False) == "false"
    assert json_stringify_scalar(12.0) == "12.0"
    assert json_stringify_scalar([1, "x"]) == '[1,"x"]'
    assert json_stringify_scalar({"a": 1}) == '{"a":1}'
