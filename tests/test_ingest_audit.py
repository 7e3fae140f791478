"""Per-epoch WAP audits on the ingest driver: ``ingest(audit=...)``
routes every epoch through stage -> audit_staged -> publish instead of a
direct merge — the reference's per-record fail-fast admission
(JsonConverter.java:508-549) generalized to a declarative per-epoch
quality gate on the real replay path. A failing epoch raises
IngestAuditError and (default policy) stays staged for inspection."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import (
    IngestAuditError,
    ingest,
)
from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

N = 2000
OK = {"min_rows": 1, "not_null": ["content"], "max_delete_fraction": 0.5}


@pytest.fixture(scope="module")
def events(spark):
    return gen_events(spark, N, n_repos=10, paths_per_repo=20, seed=31).cache()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_audited_ingest_matches_plain_ingest(spark, events, tmp_path):
    audited = ingest(
        spark, events, str(tmp_path / "a"), N, n_epochs=3, num_buckets=8,
        audit=OK,
    )
    plain = ingest(
        spark, events, str(tmp_path / "p"), N, n_epochs=3, num_buckets=8,
    )
    assert _rows(audited.read()) == _rows(plain.read())
    assert sorted(audited.committed_epochs()) == sorted(plain.committed_epochs())
    assert audited.staged_epochs() == set()
    # lineage written at publish: exact event accounting holds
    assert audited.read_lineage().agg(
        F.sum("n_events").alias("s")
    ).collect()[0]["s"] == N


def test_failing_audit_raises_and_keeps_staged(spark, events, tmp_path):
    root = str(tmp_path / "f")
    with pytest.raises(IngestAuditError) as ei:
        ingest(spark, events, root, N, n_epochs=3, num_buckets=8,
               audit={"max_rows": 10})
    assert ei.value.epoch == 0
    assert not ei.value.report["passed"]
    assert "max_rows" in str(ei.value)
    sink = BucketedMergeSink.open(spark, root)
    assert sink.committed_epochs() == set()   # nothing published
    assert sink.staged_epochs() == {0}        # kept for inspection
    assert sink.read_staged_delta(0).count() > 10
    # relaxing the gate resumes: the already-staged epoch re-audits and
    # publishes without being rewritten, then the tail ingests normally
    done = ingest(spark, events, root, N, n_epochs=3, num_buckets=8,
                  audit=OK)
    plain = ingest(spark, events, str(tmp_path / "p"), N, n_epochs=3,
                   num_buckets=8)
    assert _rows(done.read()) == _rows(plain.read())
    assert done.staged_epochs() == set()


def test_discard_policy_leaves_no_staged_trace(spark, events, tmp_path):
    root = str(tmp_path / "d")
    with pytest.raises(IngestAuditError):
        ingest(spark, events, root, N, n_epochs=3, num_buckets=8,
               audit={"max_rows": 10}, audit_on_fail="discard")
    sink = BucketedMergeSink.open(spark, root)
    assert sink.committed_epochs() == set()
    assert sink.staged_epochs() == set()


def test_audited_ingest_resumes_after_crash(spark, events, tmp_path):
    root = str(tmp_path / "c")
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest(spark, events, root, N, n_epochs=4, num_buckets=8,
               audit=OK, fail_after_epochs=2)
    sink = ingest(spark, events, root, N, n_epochs=4, num_buckets=8,
                  audit=OK)
    plain = ingest(spark, events, str(tmp_path / "p"), N, n_epochs=4,
                   num_buckets=8)
    assert _rows(sink.read()) == _rows(plain.read())
    assert sorted(sink.committed_epochs()) == [0, 1, 2, 3]


def test_audit_on_fail_validation(spark, events, tmp_path):
    with pytest.raises(ValueError, match="keep.*discard"):
        ingest(spark, events, str(tmp_path / "v"), N, n_epochs=2,
               audit=OK, audit_on_fail="zap")
