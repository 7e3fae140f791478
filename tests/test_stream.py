"""Structured Streaming front end: availableNow drain into the MERGE
sink with checkpoint resume, and the cross-batch stateful LWW operator."""

import hashlib

import pandas as pd
import pytest

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.stream import (
    EVENT_SCHEMA,
    stateful_lww,
    stream_ingest,
)

N = 1200


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    ev = gen_events(spark, N, n_repos=10, paths_per_repo=15, seed=21)
    # two producer "epochs" landing as separate files (a tailed directory)
    ev.filter("lsn < 600").select(*[f.name for f in EVENT_SCHEMA.fields]).write.parquet(
        str(d / "p0")
    )
    ev.filter("lsn >= 600").select(*[f.name for f in EVENT_SCHEMA.fields]).write.parquet(
        str(d / "p1")
    )
    return str(d)


def _state_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    h = hashlib.sha256()
    for r in pdf.itertuples():
        h.update(f"{r.repo}|{r.path}|{hashlib.sha256(r.content.encode()).hexdigest()}|{r.lsn}".encode())
    return h.hexdigest()


def test_stream_ingest_matches_batch_replay(spark, source_dir, tmp_path):
    from kafka_connect_converter_json_spark.streaming.ingest import ingest
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    # streaming drain
    stream_ingest(
        spark,
        source_dir + "/*",
        str(tmp_path / "tbl_stream"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
    )
    got = BucketedMergeSink.open(spark, str(tmp_path / "tbl_stream")).read()

    # batch replay of the same events
    ev = gen_events(spark, N, n_repos=10, paths_per_repo=15, seed=21)
    sink = ingest(spark, ev, str(tmp_path / "tbl_batch"), N, n_epochs=2, num_buckets=8)
    exp = sink.read()

    cols = ["repo", "path", "content", "lsn"]
    assert _state_hash(got.select(cols).toPandas()) == _state_hash(exp.select(cols).toPandas())


def test_stream_restart_is_idempotent(spark, source_dir, tmp_path):
    root = str(tmp_path / "tbl_restart")
    ckpt = str(tmp_path / "ckpt_restart")
    stream_ingest(spark, source_dir + "/*", root, ckpt, num_buckets=8)
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    before = BucketedMergeSink.open(spark, root).read().count()
    # re-run with same checkpoint: no new data -> no change
    stream_ingest(spark, source_dir + "/*", root, ckpt, num_buckets=8)
    after = BucketedMergeSink.open(spark, root).read().count()
    assert before == after


def test_stateful_lww_changelog(spark, source_dir, tmp_path):
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(source_dir + "/*")
        .select(
            "repo",
            "path",
            "lsn",
            F.coalesce(F.get_json_object("value_json", "$.content"), F.lit("")).alias("content"),
            "op",
        )
    )
    out = stateful_lww(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_changelog")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.sql("select * from lww_changelog").toPandas()
    assert len(res) > 0
    # per key, the emitted lsn never decreases across emissions
    for _, grp in res.groupby(["repo", "path"]):
        assert grp["lsn"].is_monotonic_increasing or len(grp) == 1
