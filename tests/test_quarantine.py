"""Corrupt-envelope quarantine (O19 in the ingest pipeline): corrupt
updates must never LWW-win; quarantined rows are preserved as a side
output and replay re-quarantines identically."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import ingest
from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

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


def test_replay_quarantine_repairs_and_merges(spark, tmp_path):
    """The O19 dead-letter closure: corrupt rows quarantined at ingest are
    repaired, replayed as a new exactly-once epoch, and land in the table
    under normal LWW rules; a second replay is a no-op."""
    from kafka_connect_converter_json_spark.streaming.ingest import replay_quarantine

    root = str(tmp_path / "tbl")
    base = gen_events(spark, 400, n_repos=4, paths_per_repo=10, seed=13, delete_pct=0)
    ev = base.withColumn(
        "value_json",
        F.when(
            (F.col("lsn") % 7 == 2) & F.col("value_json").isNotNull(),
            F.concat(F.lit("XX"), F.col("value_json")),
        ).otherwise(F.col("value_json")),
    ).cache()
    sink = ingest(spark, ev, root, 400, n_epochs=2, num_buckets=8, quarantine=True)
    before = sink.read()
    n_quarantined = spark.read.parquet(root + "/quarantine/*").count()
    assert n_quarantined > 0

    # repair: strip the injected prefix
    def repair(df):
        return df.withColumn(
            "value_json", F.regexp_replace("value_json", r"^XX", "")
        )

    out = replay_quarantine(spark, root, repair)
    assert out["replayed"] == n_quarantined
    assert out["still_corrupt"] == 0
    assert out["epoch"] == 2

    # final state must equal a clean ingest of the UNCORRUPTED stream
    from kafka_connect_converter_json_spark.streaming.ingest import ingest as ing2
    clean_root = str(tmp_path / "clean")
    expected = ing2(spark, base, clean_root, 400, n_epochs=2, num_buckets=8).read()
    got = BucketedMergeSink.open(spark, root).read()
    cols = sorted(set(expected.columns) & set(got.columns))
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expected.select(*cols).collect())
    )

    # second replay: everything already consumed
    again = replay_quarantine(spark, root, repair)
    assert again["replayed"] == 0 and again["epoch"] is None


def test_replay_quarantine_requarantines_unfixed(spark, tmp_path):
    """An identity 'repair' must re-quarantine every row (and the replay
    epoch still commits, marking the originals consumed)."""
    from kafka_connect_converter_json_spark.streaming.ingest import replay_quarantine

    root = str(tmp_path / "tbl")
    ev = gen_events(spark, 200, n_repos=3, paths_per_repo=5, seed=5, delete_pct=0)
    ev = ev.withColumn(
        "value_json",
        F.when(F.col("lsn") % 9 == 1, F.lit("{nope")).otherwise(F.col("value_json")),
    )
    ingest(spark, ev, root, 200, n_epochs=1, num_buckets=4, quarantine=True)
    n_q = spark.read.parquet(root + "/quarantine/*").count()

    out = replay_quarantine(spark, root, lambda df: df)
    assert out["replayed"] == 0
    assert out["still_corrupt"] == n_q
    # the still-corrupt rows are themselves pending for the NEXT replay
    out2 = replay_quarantine(
        spark, root, lambda df: df.withColumn(
            "value_json", F.regexp_replace("value_json", r"^\{nope$", "")
        )
    )
    # {nope rows had no recoverable envelope: repaired to empty -> treated
    # as tombstone-like null? No: empty string is corrupt JSON, so they
    # re-quarantine again rather than merging nulls.
    assert out2["replayed"] == 0
