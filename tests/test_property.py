"""Property-based tests (hypothesis): random nested envelopes vs an
independently-written reference-semantics oracle; canonicalization and
codec idempotence/round-trip properties."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_converter_json_spark.functions.canonical_json import (
    canonical_dumps,
    canonicalize_str,
)
from kafka_connect_converter_json_spark.functions.paths import (
    ExtractionError,
    compile_path,
    json_stringify_scalar,
)
from kafka_connect_converter_json_spark.sources import avro_codec as av

# --- strategies -------------------------------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=20),
)
json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)
envelopes = st.dictionaries(st.text(min_size=1, max_size=8), json_values, min_size=1, max_size=5)
paths = st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=3).map(tuple)


# --- independent oracle for the dotted-path semantics ------------------------

def _oracle_extract(path, obj):
    """Second, independent implementation of JC:417-501 semantics."""
    cur = obj
    for seg in path[:-1]:
        if isinstance(cur, list):
            if not cur:
                raise ExtractionError("empty array")
            cur = cur[0]
        if not (isinstance(cur, dict) and seg in cur):
            raise ExtractionError("missing intermediate")
        cur = cur[seg]
    if isinstance(cur, list):
        cur = cur[0] if cur else None
    if not isinstance(cur, dict):
        return None
    leaf = cur.get(path[-1])
    if isinstance(leaf, list):
        leaf = leaf[0] if leaf else None
    if isinstance(leaf, dict):
        leaf = leaf[min(leaf)] if leaf else None
    return json_stringify_scalar(leaf)


@settings(max_examples=300, deadline=None)
@given(envelopes, paths)
def test_extraction_matches_oracle(obj, path):
    compiled = compile_path(path)
    try:
        expected = _oracle_extract(path, obj)
        raised = None
    except ExtractionError:
        expected, raised = None, True
    try:
        got = compiled(obj)
        assert raised is None
        assert got == expected
    except ExtractionError:
        assert raised is True


@settings(max_examples=200, deadline=None)
@given(envelopes)
def test_canonicalization_idempotent(obj):
    s = canonical_dumps(obj)
    assert canonicalize_str(s) == s  # fixpoint
    assert json.loads(s) == obj  # lossless


@settings(max_examples=200, deadline=None)
@given(envelopes, paths)
def test_extraction_invariant_under_canonicalization(obj, path):
    """ingest(ingest(x)) == ingest(x): extraction over the canonical
    re-parse equals extraction over the original parse."""
    compiled = compile_path(path)
    reparsed = json.loads(canonical_dumps(obj))
    try:
        a = compiled(obj)
    except ExtractionError:
        a = "__ERR__"
    try:
        b = compiled(reparsed)
    except ExtractionError:
        b = "__ERR__"
    assert a == b


# --- schema-widening laws -----------------------------------------------------

import pytest as _pytest
from pyspark.sql import types as T

from kafka_connect_converter_json_spark.plans.registry import SchemaConflict, widen_struct

_leaf_types = st.sampled_from(
    [T.IntegerType(), T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType()]
)
_field_names = st.sampled_from(list("abcdef"))


@st.composite
def _structs(draw, depth=2):
    n = draw(st.integers(1, 4))
    names = draw(st.lists(_field_names, min_size=n, max_size=n, unique=True))
    fields = []
    for nm in names:
        if depth > 0 and draw(st.booleans()):
            dt = draw(_structs(depth=depth - 1))
        else:
            dt = draw(_leaf_types)
        fields.append(T.StructField(nm, dt, True))
    return T.StructType(fields)


@settings(max_examples=150, deadline=None)
@given(_structs())
def test_widen_idempotent(spark_schemas):
    a = spark_schemas
    assert widen_struct(a, a) == T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in a.fields]
    )


@settings(max_examples=150, deadline=None)
@given(_structs(), _structs())
def test_widen_absorbing(a, b):
    """widen(widen(a,b), b) == widen(a,b): re-observing a schema after it
    was admitted never evolves again (the registry fixpoint law)."""
    try:
        ab = widen_struct(a, b)
    except SchemaConflict:
        return  # conflicting shapes are rejected consistently
    assert widen_struct(ab, b) == ab
    # and the original schema also stays admitted
    assert widen_struct(ab, a) == ab


# --- avro codec round-trip ----------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}

avro_values = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**62), max_value=2**62),
        "s": st.text(max_size=30),
        "o": st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
        "arr": st.lists(st.text(max_size=10), max_size=5),
        "m": st.dictionaries(st.text(min_size=1, max_size=6), st.integers(-1000, 1000), max_size=4),
    }
)


@settings(max_examples=300, deadline=None)
@given(avro_values)
def test_avro_roundtrip(value):
    assert av.decode(AVRO_SCHEMA, av.encode(AVRO_SCHEMA, value)) == value


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip(n):
    r = av._Reader(av._zz(n))
    assert r.zigzag() == n


# ---------------------------------------------------------------------------
# property: columnar batch ENCODER == per-record encoder, random flat schemas
# ---------------------------------------------------------------------------

_enc_leaf = st.sampled_from(["long", "int", "string", "boolean"])


@st.composite
def _enc_schema_and_rows(draw):
    n_fields = draw(st.integers(1, 5))
    names = draw(st.lists(st.sampled_from(list("abcdefgh")),
                          min_size=n_fields, max_size=n_fields, unique=True))
    types = [draw(_enc_leaf) for _ in range(n_fields)]
    # one optional nesting level (avro flattens records to leaf order)
    nest = draw(st.booleans()) and n_fields >= 2
    if nest:
        inner = {"type": "record", "name": "In", "fields": [
            {"name": names[i], "type": types[i]} for i in range(2)]}
        fields = [{"name": "nested", "type": inner}] + [
            {"name": names[i], "type": types[i]} for i in range(2, n_fields)]
    else:
        fields = [{"name": names[i], "type": types[i]} for i in range(n_fields)]
    schema = {"type": "record", "name": "R", "fields": fields}

    def val(t):
        if t in ("long", "int"):
            lim = 2**62 if t == "long" else 2**31 - 1
            return draw(st.integers(min_value=-lim, max_value=lim))
        if t == "string":
            return draw(st.text(max_size=25))
        return draw(st.booleans())

    n_rows = draw(st.integers(1, 8))
    rows = []
    for _ in range(n_rows):
        row = {}
        for i, t in enumerate(types):
            row[names[i]] = val(t)
        if nest:
            row = {"nested": {names[0]: row[names[0]], names[1]: row[names[1]]},
                   **{names[i]: row[names[i]] for i in range(2, n_fields)}}
        rows.append(row)
    return schema, rows


@settings(max_examples=150, deadline=None)
@given(_enc_schema_and_rows())
def test_columnar_encoder_matches_reference(case):
    """encode_batch_columns must be byte-identical to av.encode on any
    flat-able schema of supported leaves (unicode, negatives, empties)."""
    from kafka_connect_converter_json_spark.sources import avro_columnar as ac

    schema, rows = case
    leaves = ac.flatten(schema)
    cols = {
        ".".join(leaf["path"]): [
            (r["nested"][leaf["path"][1]] if leaf["path"][0] == "nested" else r[leaf["path"][0]])
            for r in rows
        ]
        for leaf in leaves
    }
    enc = ac.encode_batch_columns(schema, cols, wire_schema_id=3)
    for i, r in enumerate(rows):
        assert bytes(enc[i]) == av.encode_wire(3, av.encode(schema, r)), f"row {i}"
