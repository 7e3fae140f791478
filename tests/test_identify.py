"""Schema identification probes (JsonConverter.java:508-549,328-343)."""

from kafka_connect_converter_json_spark.config import IdentifierRule
from kafka_connect_converter_json_spark.operators.identify import compile_identifier

F3 = {"int32": 12, "nested": {"kind": "B"}, "arr": [{"tag": "C"}]}


def test_existence_probe():
    ident = compile_identifier((IdentifierRule("ComplexSchemaName", ("int32",), "true"),))
    assert ident(F3) == "ComplexSchemaName"  # TEST:368 json.ComplexSchemaName.int32=true
    assert ident({"other": 1}) is None


def test_equality_probe():
    ident = compile_identifier((IdentifierRule("B", ("nested", "kind"), "B"),))
    assert ident(F3) == "B"
    assert ident({"nested": {"kind": "X"}}) is None


def test_equality_stringifies_value():
    # o.toString().equals(test) — JC:529
    ident = compile_identifier((IdentifierRule("N", ("int32",), "12"),))
    assert ident(F3) == "N"


def test_first_match_wins_in_declared_order():
    rules = (
        IdentifierRule("First", ("int32",), "true"),
        IdentifierRule("Second", ("int32",), "12"),
    )
    assert compile_identifier(rules)(F3) == "First"


def test_array_descent_in_probe():
    ident = compile_identifier((IdentifierRule("C", ("arr", "tag"), "C"),))
    assert ident(F3) == "C"


def test_tombstone_passthrough():
    ident = compile_identifier((IdentifierRule("X", ("a",), "true"),))
    assert ident(None) is None
