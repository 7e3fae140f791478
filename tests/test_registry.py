"""Schema registry: additive widening, promotion, conflicts, persistence."""

import pytest
from pyspark.sql import types as T

from kafka_connect_converter_json_spark.plans.registry import (
    SchemaConflict,
    SchemaRegistry,
    fingerprint,
    widen,
    widen_struct,
)


def _st(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


@pytest.fixture(autouse=True)
def _session(spark):
    # StructType.fromDDL needs an active session in PySpark 4
    yield


def test_additive_new_field_nullable():
    a = _st("a INT")
    b = _st("a INT, b STRING")
    m = widen_struct(a, b)
    assert [f.name for f in m.fields] == ["a", "b"]
    assert all(f.nullable for f in m.fields if f.name == "b")


def test_numeric_promotion():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DoubleType(), T.IntegerType()) == T.DoubleType()


def test_string_fallback():
    # universal stringify fallback (JC:497,660)
    assert widen(T.LongType(), T.StringType()) == T.StringType()
    assert widen(T.StringType(), T.BooleanType()) == T.StringType()


def test_nested_struct_and_array_widening():
    a = _st("s STRUCT<x: INT>, arr ARRAY<INT>")
    b = _st("s STRUCT<x: LONG, y: STRING>, arr ARRAY<LONG>")
    m = widen_struct(a, b)
    s = dict((f.name, f.dataType) for f in m.fields)
    assert s["s"] == _st("x LONG, y STRING")
    assert s["arr"] == T.ArrayType(T.LongType(), True)


def test_conflict_raises():
    with pytest.raises(SchemaConflict):
        widen(T.ArrayType(T.IntegerType()), _st("a INT"))


def test_registry_observe_and_fingerprint_cache():
    r = SchemaRegistry()
    s1 = _st("a INT")
    s2 = _st("a INT, b STRING")
    got, evolved = r.observe("S", s1)
    assert evolved and got == s1
    got, evolved = r.observe("S", s1)  # same fingerprint -> cache hit
    assert not evolved
    got, evolved = r.observe("S", s2)
    assert evolved and [f.name for f in got.fields] == ["a", "b"]
    assert r.size() == 1 and r.evolutions == 1


def test_registry_persistence_roundtrip():
    r = SchemaRegistry()
    r.observe("S", _st("a INT, s STRUCT<x: STRING>"))
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.get("S") == r.get("S")
    _, evolved = r2.observe("S", _st("a INT, s STRUCT<x: STRING>"))
    assert not evolved  # fingerprints restored


def test_fingerprint_deterministic():
    assert fingerprint(_st("a INT")) == fingerprint(_st("a INT"))
    assert fingerprint(_st("a INT")) != fingerprint(_st("a LONG"))
