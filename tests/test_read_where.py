"""Stats-pruned scans: ``analyze()`` + ``read_where`` (data skipping).

The Iceberg manifest-level file-skipping analogue over the sink's
bucketed-parquet layout — file-level column min/max recorded from parquet
footers, scans pruned by predicate/stat disjointness, with the LWW-merge
soundness rules (key predicates prune anywhere; order_col LOWER bounds
prune anywhere; other non-key predicates prune only delta-free buckets)
proven by parity against ``read().filter``.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_batch(spark, ids, lsn0, op="u", score=None, n_repos=7):
    rows = [
        (
            f"repo-{i % n_repos:04d}",
            f"f_{i:05d}",
            lsn0 + j,
            op,
            score if score is not None else (i % n_repos) * 1000 + i,
        )
        for j, i in enumerate(ids)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, lsn long, op string, score long"
    )


@pytest.fixture()
def cow_sink(spark, tmp_path):
    # bucket_cols=[repo]: files correlate with repo, so repo-correlated
    # column ranges are tight per file and stats can actually skip
    root = str(tmp_path / "cow")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=8,
        merge_mode="cow", bucket_cols=["repo"],
    )
    sink.merge(_mk_batch(spark, range(400), 0), epoch=1)
    return sink


def test_cow_read_where_parity(spark, cow_sink):
    cow_sink.analyze(cols=["repo", "path", "lsn", "score"])
    got = cow_sink.read_where({"score": (1000, 2000)})
    want = cow_sink.read().filter(F.col("score").between(1000, 2000))
    assert _rows(got) == _rows(want)


def test_cow_nonkey_pred_prunes_files(spark, cow_sink):
    cow_sink.analyze(cols=["score"])
    # score < 1000 only in repo-0000's files: other buckets' stats skip
    got = cow_sink.read_where({"score": (None, 900)})
    want = cow_sink.read().filter(F.col("score") <= 900)
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(cow_sink.read().inputFiles())


def test_key_predicate_prunes(spark, cow_sink):
    cow_sink.analyze()
    got = cow_sink.read_where({"repo": ("repo-0000", "repo-0000")})
    want = cow_sink.read().filter(F.col("repo") == "repo-0000")
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(cow_sink.read().inputFiles())


def test_unanalyzed_sink_is_correct_never_pruned(spark, cow_sink):
    got = cow_sink.read_where({"score": (None, 900)})
    want = cow_sink.read().filter(F.col("score") <= 900)
    assert _rows(got) == _rows(want)
    assert len(got.inputFiles()) == len(cow_sink.read().inputFiles())


def test_mor_nonkey_pred_does_not_resurrect_old_versions(spark, tmp_path):
    """The soundness trap: a key's OLD version sits inside the predicate
    range, its NEWER delta version outside it. File-pruning by the
    non-key column on a delta-pending bucket would resurrect the old row;
    read_where must match read().filter exactly."""
    root = str(tmp_path / "mor")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, range(100), 0), epoch=1)
    sink.analyze(cols=["repo", "path", "lsn", "score"])
    # epoch 2 moves ids 0..49 OUT of the range [0, 490] (score -> 9999)
    sink.merge(_mk_batch(spark, range(50), 1000, score=9999), epoch=2)
    got = sink.read_where({"score": (0, 490)})
    want = sink.read().filter(F.col("score").between(0, 490))
    assert _rows(got) == _rows(want)
    assert got.filter(F.col("score") == 9999).count() == 0  # nothing resurrected


def test_order_col_upper_bound_never_prunes_pending_deltas(spark, tmp_path):
    """lsn <= hi on a delta-pending bucket must NOT prune the delta file
    above hi — it may hold the winner masking an in-range old version."""
    root = str(tmp_path / "morub")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, range(100), 0), epoch=1)
    sink.merge(_mk_batch(spark, range(50), 1000, op="d"), epoch=2)  # deletes
    sink.analyze()
    got = sink.read_where({"lsn": (None, 99)})
    want = sink.read().filter(F.col("lsn") <= 99)
    assert _rows(got) == _rows(want)
    assert got.count() == 50  # the 50 deleted keys stay deleted


def test_order_col_lower_bound_prunes_pending_deltas(spark, tmp_path):
    """The CDC tail-scan shape: lsn >= X skips old epochs' delta files
    even in delta-pending buckets (a below-bound row either loses LWW or
    is removed by the exact post-merge filter)."""
    root = str(tmp_path / "mortail")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, range(100), 0), epoch=1)        # lsn 0..99
    sink.merge(_mk_batch(spark, range(50), 1000), epoch=2)      # lsn 1000..1049
    sink.analyze()
    got = sink.read_where({"lsn": (1000, None)})
    want = sink.read().filter(F.col("lsn") >= 1000)
    assert _rows(got) == _rows(want)
    assert got.count() == 50
    assert 0 < len(got.inputFiles()) < len(sink.read().inputFiles())


def test_mor_key_pred_prunes_with_pending_deltas(spark, tmp_path):
    root = str(tmp_path / "mor2")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=8,
        merge_mode="mor", compact_every=None, bucket_cols=["repo"],
    )
    sink.merge(_mk_batch(spark, range(200), 0), epoch=1)
    sink.merge(_mk_batch(spark, range(0, 200, 3), 1000), epoch=2)
    sink.analyze()
    got = sink.read_where({"repo": ("repo-0000", "repo-0000")})
    want = sink.read().filter(F.col("repo") == "repo-0000")
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(sink.read().inputFiles())


def test_analyze_incremental_and_survives_reopen(spark, tmp_path):
    root = str(tmp_path / "inc")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, range(60), 0), epoch=1)
    r1 = sink.analyze()
    assert r1["files_analyzed"] == r1["files_total"] > 0
    r2 = sink.analyze()
    assert r2["files_analyzed"] == 0  # files are immutable: nothing new
    sink.merge(_mk_batch(spark, range(60, 120), 1000), epoch=2)
    r3 = sink.analyze()
    assert 0 < r3["files_analyzed"] < r3["files_total"]
    # stats ride the manifest: a reopened sink prunes without re-analyzing
    sink2 = BucketedMergeSink.open(spark, root, compact_every=None)
    got = sink2.read_where({"lsn": (1000, None)})
    want = sink2.read().filter(F.col("lsn") >= 1000)
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(sink2.read().inputFiles())


def test_analyze_after_compact_gcs_dead_paths(spark, tmp_path):
    root = str(tmp_path / "cmp")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, range(80), 0), epoch=1)
    sink.analyze()
    pre = set(sink._read_stats()["minmax"])
    sink.merge(_mk_batch(spark, range(40), 1000), epoch=2)
    sink.compact()
    sink.analyze()
    post = set(sink._read_stats()["minmax"])
    assert post.isdisjoint(pre)  # compaction rewrote every live file
    assert post == {e[0] for e in sink._live_file_entries()}
    got = sink.read_where({"lsn": (1000, None)})
    want = sink.read().filter(F.col("lsn") >= 1000)
    assert _rows(got) == _rows(want)


def test_all_files_pruned_returns_empty_with_live_schema(spark, cow_sink):
    cow_sink.analyze(cols=["lsn"])
    got = cow_sink.read_where({"lsn": (10_000_000, None)})
    assert got.count() == 0
    assert got.columns == cow_sink.read().columns


def test_read_where_validates(spark, cow_sink):
    with pytest.raises(ValueError):
        cow_sink.read_where({})
    with pytest.raises(ValueError):
        cow_sink.read_where({"lsn": (None, None)})


def test_analyze_incremental_per_column(spark, tmp_path):
    """Min/max records are incremental per COLUMN as well as per file: a
    later analyze() naming a new column re-opens only files missing its
    record, and unavailable columns memoize a no-evidence marker."""
    root = str(tmp_path / "percol")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=8, merge_mode="cow",
        bucket_cols=["repo"],  # repo-correlated files: score ranges tight
    )
    sink.merge(_mk_batch(spark, range(80), 0), epoch=1)
    r1 = sink.analyze(cols=["lsn"])
    assert r1["files_analyzed"] == r1["files_total"] > 0
    assert sink.analyze(cols=["lsn"])["files_analyzed"] == 0
    # a NEW column re-opens every file once...
    r3 = sink.analyze(cols=["score"])
    assert r3["files_analyzed"] == r3["files_total"]
    # ...keeps the old records, and is itself memoized
    assert sink.analyze(cols=["score", "lsn"])["files_analyzed"] == 0
    got = sink.read_where({"score": (None, 900), "lsn": (0, None)})
    want = sink.read().filter(F.col("score") <= 900)
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(sink.read().inputFiles())
    # a column absent from the files memoizes too
    r5 = sink.analyze(cols=["no_such_col"])
    assert r5["files_analyzed"] == r5["files_total"]
    assert sink.analyze(cols=["no_such_col"])["files_analyzed"] == 0
