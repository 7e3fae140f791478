"""As-of join: union-window plan vs a brute-force python oracle."""

import random

import pytest

from kafka_connect_converter_json_spark.operators.asof import asof_join


def _brute(left, right, tiebreak=False):
    """O(L*R) reference: latest right (t <= left t) per key; ties by
    (t, tiebreak) greatest."""
    out = {}
    for lk, lt, lid in left:
        best = None
        for rk, rt, rv, tie in right:
            if rk == lk and rt <= lt:
                cand = (rt, tie if tiebreak else 0, rv)
                if best is None or cand[:2] > best[:2]:
                    best = cand
        out[lid] = (best[0], best[2]) if best else (None, None)
    return out


def test_asof_matches_brute_force(spark):
    rng = random.Random(7)
    left = [(f"k{rng.randrange(6)}", rng.randrange(100), i) for i in range(200)]
    right = [
        (f"k{rng.randrange(6)}", rng.randrange(100), rng.randrange(1000), i)
        for i in range(150)
    ]
    ldf = spark.createDataFrame(left, "k string, t long, lid long")
    rdf = spark.createDataFrame(right, "k string, rt long, rv long, lsn long")
    got = {
        r.lid: (r.rt_asof, r.rv_asof)
        for r in asof_join(ldf, rdf, ["k"], "t", "rt",
                           right_cols=["rv"], tiebreak="lsn").collect()
    }
    assert got == _brute(left, right, tiebreak=True)


def test_asof_inclusive_and_unmatched(spark):
    ldf = spark.createDataFrame([("a", 5, 1), ("a", 4, 2), ("b", 9, 3)],
                                "k string, t long, lid long")
    rdf = spark.createDataFrame([("a", 5, 77, 0)],
                                "k string, rt long, rv long, lsn long")
    got = {r.lid: r.rv_asof for r in asof_join(
        ldf, rdf, ["k"], "t", "rt", tiebreak="lsn").collect()}
    assert got == {1: 77, 2: None, 3: None}  # inclusive at equal t


def test_asof_preserves_left_cardinality_and_columns(spark):
    """No range-join fan-out: exactly one output row per left row, left
    columns intact (the property the union-window form guarantees)."""
    ldf = spark.createDataFrame(
        [("a", t, f"x{t}") for t in range(50)], "k string, t long, extra string")
    rdf = spark.createDataFrame(
        [("a", t, t * 10) for t in range(0, 50, 3)], "k string, rt long, rv long")
    out = asof_join(ldf, rdf, ["k"], "t", "rt")
    assert out.count() == 50
    assert out.columns == ["k", "t", "extra", "rt_asof", "rv_asof"]
    row = {r.t: r for r in out.collect()}
    assert row[7].rv_asof == 60 and row[7].extra == "x7"  # latest rt=6


def test_asof_handles_columns_needing_backquotes(spark):
    """Payload/left column names with spaces and hyphens must survive the
    null-placeholder cast (built from the DataType object, not its
    simpleString, which would fail to parse unquoted). ADVICE r3."""
    ldf = spark.createDataFrame(
        [("a", 5, "L")], "k string, t long, `left col` string")
    rdf = spark.createDataFrame(
        [("a", 3, 30), ("b", 1, 10)], "k string, rt long, `r-val` long")
    out = asof_join(ldf, rdf, ["k"], "t", "rt")
    row = out.collect()[0]
    assert row["left col"] == "L" and row["r-val_asof"] == 30
