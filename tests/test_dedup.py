"""LWW dedup: plain vs salted vs pandas oracle (SURVEY.md N3/N4)."""

import pandas as pd

from kafka_connect_converter_json_spark.operators.dedup import (
    lww_apply_cdc,
    lww_latest,
    lww_latest_salted,
)
from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events


def _oracle_lww(pdf: pd.DataFrame, keys, order_col):
    idx = pdf.groupby(keys)[order_col].idxmax()
    return pdf.loc[idx].sort_values(keys).reset_index(drop=True)


def test_lww_latest_matches_pandas_oracle(spark):
    ev = gen_events(spark, 3000, n_repos=10, paths_per_repo=20, seed=7)
    df = ev.select("repo", "path", "lsn", "op", "key_json")
    got = lww_latest(df, ["repo", "path"], "lsn").toPandas()
    exp = _oracle_lww(df.toPandas(), ["repo", "path"], "lsn")
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)[exp.columns]
    pd.testing.assert_frame_equal(got, exp)


def test_salted_equals_unsalted(spark):
    ev = gen_events(spark, 3000, n_repos=3, skew=6.0, seed=11)  # hot-repo skew
    df = ev.select("repo", "path", "lsn", "op", "key_json")
    a = lww_latest(df, ["repo", "path"], "lsn").orderBy("repo", "path").collect()
    b = (
        lww_latest_salted(df, ["repo", "path"], "lsn", salt_buckets=8)
        .orderBy("repo", "path")
        .collect()
    )
    assert a == b


def test_cdc_apply_deletes_win(spark):
    rows = [
        ("r", "p1", 1, "c", "v1"),
        ("r", "p1", 5, "d", None),
        ("r", "p2", 2, "c", "v2"),
        ("r", "p2", 3, "u", "v3"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, lsn long, op string, content string")
    out = lww_apply_cdc(df, ["repo", "path"], "lsn").collect()
    assert len(out) == 1 and out[0]["path"] == "p2" and out[0]["content"] == "v3"


def test_generator_parallelism_independence(spark):
    # identical output at any partition count — the determinism contract
    a = gen_events(spark, 500, seed=5, num_partitions=2).orderBy("lsn").collect()
    b = gen_events(spark, 500, seed=5, num_partitions=16).orderBy("lsn").collect()
    assert a == b


def test_generator_slice_equals_filter(spark):
    # binlog-tail property: start-sliced generation == filtered full stream
    full = (
        gen_events(spark, 400, seed=5)
        .filter("lsn >= 150 and lsn < 300")
        .orderBy("lsn")
        .collect()
    )
    sliced = gen_events(spark, 150, seed=5, start=150).orderBy("lsn").collect()
    assert full == sliced
