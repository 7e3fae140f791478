"""Corrupt-envelope quarantine (O19 in the ingest pipeline): corrupt
updates must never LWW-win; quarantined rows are preserved as a side
output and replay re-quarantines identically."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import ingest

N = 800


@pytest.fixture(scope="module")
def corrupted_events(spark):
    ev = gen_events(spark, N, n_repos=8, paths_per_repo=10, seed=31)
    # corrupt every 10th envelope (op!='d' rows only keep their key)
    return ev.withColumn(
        "value_json",
        F.when(
            (F.col("lsn") % 10 == 3) & F.col("value_json").isNotNull(),
            F.concat(F.lit("{CORRUPT"), F.col("value_json")),
        ).otherwise(F.col("value_json")),
    ).cache()


def test_corrupt_rows_quarantined_not_merged(spark, corrupted_events, tmp_path):
    root = str(tmp_path / "tbl")
    sink = ingest(
        spark, corrupted_events, root, N, n_epochs=2, num_buckets=8, quarantine=True
    )
    final = sink.read()
    # no corrupt winner: every row has non-null content
    assert final.filter(F.col("content").isNull()).count() == 0
    q = spark.read.parquet(root + "/quarantine/*")
    n_corrupt = corrupted_events.filter(
        (F.col("lsn") % 10 == 3) & F.col("value_json").isNotNull()
    ).count()
    assert q.count() == n_corrupt
    # quarantined rows keep their CDC key (recovered from key_json)
    assert q.filter(F.col("repo").isNull()).count() == 0


def test_corrupt_winner_excluded_from_state(spark, tmp_path):
    """If the latest event for a key is corrupt, the previous good version
    must remain (the corrupt row cannot win)."""
    base = gen_events(spark, 100, n_repos=2, paths_per_repo=2, seed=77, delete_pct=0)
    ev = base.withColumn(
        "value_json",
        F.when(F.col("lsn") >= 90, F.lit("{broken")).otherwise(F.col("value_json")),
    )
    sink = ingest(spark, ev, str(tmp_path / "t2"), 100, n_epochs=1, num_buckets=4,
                  quarantine=True)
    final = sink.read()
    assert final.filter(F.col("lsn") >= 90).count() == 0
    assert final.filter(F.col("content").isNull()).count() == 0


def test_quarantine_preserves_raw_envelope(spark, corrupted_events, tmp_path):
    """Quarantined rows must carry the original value_json/key_json so they
    can be inspected, repaired, and replayed (ADVICE r1)."""
    root = str(tmp_path / "tblraw")
    ingest(spark, corrupted_events, root, N, n_epochs=2, num_buckets=8, quarantine=True)
    q = spark.read.parquet(root + "/quarantine/*")
    assert "value_json" in q.columns and "key_json" in q.columns
    # every quarantined row keeps its raw (corrupt) envelope verbatim
    assert q.filter(F.col("value_json").isNull()).count() == 0
    assert q.filter(~F.col("value_json").startswith("{CORRUPT")).count() == 0
    # ...and the merged table never carries the raw columns
    sink = ingest(spark, corrupted_events, root, N, n_epochs=2, num_buckets=8,
                  quarantine=True)
    assert "value_json" not in sink.read().columns
