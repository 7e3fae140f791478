"""Metadata tables (Iceberg history/snapshots/files analogue):
``history()`` / ``maintenance_log()`` from the manifest alone,
``files()`` with distributed footer-only row/byte stats."""

import os

import pytest

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import ingest

N = 2000


@pytest.fixture(scope="module")
def events(spark):
    return gen_events(spark, N, n_repos=10, paths_per_repo=20, seed=23).cache()


def test_history_one_row_per_epoch_with_exact_event_accounting(spark, events, tmp_path):
    sink = ingest(spark, events, str(tmp_path / "h"), N, n_epochs=4, num_buckets=8,
                  merge_mode="mor")
    h = sink.history().orderBy("epoch").collect()
    assert [r["epoch"] for r in h] == [0, 1, 2, 3]
    # embedded lineage stats account for every event exactly once
    assert sum(r["n_events"] for r in h) == N
    # per-epoch max_lsn agrees with the lineage parquet (independent path)
    lin = {
        r["epoch"]: r["mx"]
        for r in sink.read_lineage().groupBy("epoch").agg({"max_lsn": "max"})
        .withColumnRenamed("max(max_lsn)", "mx").collect()
    }
    for r in h:
        assert r["max_lsn"] == lin[r["epoch"]]
    # MOR: delta dirs accumulate per snapshot, base stays empty pre-compact
    assert all(r["base_files"] == 0 for r in h)
    assert [r["delta_dirs"] for r in h] == sorted(r["delta_dirs"] for r in h)
    # each snapshot records the bucket count its layout was written under
    assert all(r["num_buckets"] == 8 for r in h)
    assert all(r["vacuumed"] is False for r in h)


def test_files_footer_stats_match_data(spark, events, tmp_path):
    sink = ingest(spark, events, str(tmp_path / "f"), N, n_epochs=3, num_buckets=4,
                  merge_mode="mor")
    files = sink.files().collect()
    assert files and all(f["kind"] == "delta" for f in files)
    assert all(f["source"].startswith("e") for f in files)
    assert {f["bucket"] for f in files} <= set(range(4))
    # footer row counts sum to the physical delta row count (incl.
    # tombstone markers), independently measured by reading the dirs
    deltas = [os.path.join(sink.root, rel) for rel in sink._manifest["deltas"]]
    physical = spark.read.parquet(*deltas).count()
    assert sum(f["rows"] for f in files) == physical
    # byte sizes are the real on-disk sizes
    for f in files[:5]:
        assert f["bytes"] == os.path.getsize(os.path.join(sink.root, f["path"]))


def test_files_and_maintenance_after_compact(spark, events, tmp_path):
    sink = ingest(spark, events, str(tmp_path / "c"), N, n_epochs=3, num_buckets=4,
                  merge_mode="mor")
    sink.compact()
    files = sink.files().collect()
    assert files and all(f["kind"] == "base" for f in files)
    assert all(f["source"].startswith("c") for f in files)
    # compacted base is tombstone-free: footer rows == live table rows
    assert sum(f["rows"] for f in files) == sink.read().count()
    m = sink.maintenance_log().collect()
    assert len(m) == 1 and m[0]["op"] == "compact" and m[0]["deltas_folded"] > 0


def test_history_marks_vacuumed_snapshots(spark, events, tmp_path):
    sink = ingest(spark, events, str(tmp_path / "v"), N, n_epochs=3, num_buckets=4)
    sink.vacuum(keep_epochs=1)
    h = {r["epoch"]: r["vacuumed"] for r in sink.history().collect()}
    assert h[2] is False  # kept snapshot still time-travelable
    assert h[0] is True and h[1] is True


def test_cow_files_are_base_and_match_live_rows(spark, events, tmp_path):
    sink = ingest(spark, events, str(tmp_path / "w"), N, n_epochs=2, num_buckets=4,
                  merge_mode="cow")
    files = sink.files().collect()
    assert files and all(f["kind"] == "base" for f in files)
    assert sum(f["rows"] for f in files) == sink.read().count()


def test_empty_sink_metadata_tables(spark, tmp_path):
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    sink = BucketedMergeSink(spark, str(tmp_path / "e"), keys=["repo", "path"],
                             order_col="lsn", num_buckets=4)
    assert sink.history().count() == 0
    assert sink.files().count() == 0
    assert sink.maintenance_log().count() == 0


def test_files_report_stats_and_bloom_coverage(spark, tmp_path):
    from kafka_connect_converter_json_spark.streaming.sink import (
        BucketedMergeSink,
    )

    def _batch(ids, lsn0):
        return spark.createDataFrame(
            [(f"r-{i % 5}", f"p-{i:03d}", lsn0 + j, "u") for j, i in
             enumerate(ids)],
            "repo string, path string, lsn long, op string",
        )

    sink = BucketedMergeSink(
        spark, str(tmp_path / "cov"), keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_batch(range(40), 0), epoch=1)
    # unanalyzed: every file reports empty evidence arrays
    assert all(
        r["stats_cols"] == [] and r["bloom_cols"] == []
        for r in sink.files().collect()
    )
    sink.analyze(cols=["lsn"], bloom_cols=["repo"])
    rows = sink.files().collect()
    assert rows and all(r["stats_cols"] == ["lsn"] for r in rows)
    assert all(r["bloom_cols"] == ["repo"] for r in rows)
    # files landed AFTER analyze report empty coverage until re-analyzed
    sink.merge(_batch(range(40, 50), 1000), epoch=2)
    cov = {r["path"]: r["stats_cols"] for r in sink.files().collect()}
    assert [] in cov.values() and ["lsn"] in cov.values()
