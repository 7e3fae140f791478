"""Interval join + sessionize vs brute-force python oracles."""

import random

import pytest

from kafka_connect_converter_json_spark.operators.intervals import (
    interval_join,
    session_stats,
    sessionize,
)


def test_interval_join_matches_brute_force(spark):
    rng = random.Random(13)
    points = [(f"u{rng.randrange(5)}", rng.randrange(1000), i) for i in range(120)]
    ivs = [
        (f"u{rng.randrange(5)}", s, s + rng.randrange(0, 400), i)
        for i, s in enumerate(rng.randrange(900) for _ in range(60))
    ]
    p = spark.createDataFrame(points, "user string, t long, p_id long")
    i = spark.createDataFrame(ivs, "user string, s long, e long, iv_id long")
    got = {
        (r.p_id, r.iv_id)
        for r in interval_join(p, i, ["user"], "t", "s", "e", chunk=100).collect()
    }
    want = {
        (pid, ivid)
        for (pu, t, pid) in points
        for (iu, s, e, ivid) in ivs
        if pu == iu and s <= t <= e
    }
    assert got == want


def test_interval_join_left_and_chunk_spans(spark):
    p = spark.createDataFrame(
        [("a", 5, 1), ("a", 9999, 2), ("b", 50, 3)], "user string, t long, p_id long")
    # one interval spanning MANY chunks (0..10000 with chunk=100)
    i = spark.createDataFrame(
        [("a", 0, 10000, 7)], "user string, s long, e long, iv_id long")
    out = interval_join(p, i, ["user"], "t", "s", "e", chunk=100, how="left")
    rows = {r.p_id: r.iv_id for r in out.collect()}
    assert rows == {1: 7, 2: 7, 3: None}  # b unmatched, kept with nulls
    assert out.count() == 3


def test_interval_join_validates_columns(spark):
    p = spark.createDataFrame([("a", 1, 2)], "user string, t long, x long")
    i = spark.createDataFrame([("a", 0, 5, 9)], "user string, s long, e long, x long")
    with pytest.raises(ValueError, match="key columns"):
        interval_join(p, i, ["user"], "t", "s", "e")  # x collides


def test_sessionize_gap_boundary_and_stats(spark):
    # gaps: exactly == gap stays in session; gap+1 splits
    rows = [("u", 0, 1), ("u", 30, 2), ("u", 61, 3), ("u", 62, 4), ("x", 5, 5)]
    df = spark.createDataFrame(rows, "user string, t long, eid long")
    s = {r.eid: r.session_id for r in
         sessionize(df, ["user"], "t", gap=30, order_tiebreak="eid").collect()}
    assert s == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}  # 61-30=31 > 30 splits
    stats = {(r.user, r.session_id): (r.n_events, r.session_start, r.session_end, r.duration)
             for r in session_stats(df, ["user"], "t", gap=30,
                                    order_tiebreak="eid").collect()}
    assert stats == {
        ("u", 0): (2, 0, 30, 30),
        ("u", 1): (2, 61, 62, 1),
        ("x", 0): (1, 5, 5, 0),
    }


def test_sessionize_matches_brute_force(spark):
    rng = random.Random(29)
    rows = [(f"u{rng.randrange(4)}", rng.randrange(500), i) for i in range(300)]
    df = spark.createDataFrame(rows, "user string, t long, eid long")
    got = {r.eid: (r.user, r.session_id) for r in
           sessionize(df, ["user"], "t", gap=20, order_tiebreak="eid").collect()}

    want = {}
    by_user: dict = {}
    for u, t, eid in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_user.setdefault(u, []).append((t, eid))
    for u, evs in by_user.items():
        sid, prev = -1, None
        for t, eid in evs:
            if prev is None or t - prev > 20:
                sid += 1
            want[eid] = (u, sid)
            prev = t
    assert got == want