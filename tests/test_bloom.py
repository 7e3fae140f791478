"""Per-file Bloom-filter data skipping: ``analyze(bloom_cols=...)`` +
equality predicates in ``read_where`` (the Delta bloom-filter-index /
Parquet column-bloom analogue).

Min/max skipping is blind on high-cardinality columns whose per-file
ranges overlap (a commit-hash or path point lookup touches every file);
a per-file Bloom filter proves value ABSENCE and skips those files.
Soundness: bloom evidence rides the same key/delta gating as min/max —
it answers the same "can this file hold a matching row?" question — and
false positives only keep files (the exact filter always re-applies).

Fixtures are built so ranges overlap by construction (score = id,
interleaved across repo-correlated files) — the regime where ONLY the
bloom can prune.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.streaming.sink import (
    BucketedMergeSink,
    _bloom_maybe_contains,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, ids, lsn0, op="u", score_of=None, n_repos=7):
    score_of = score_of if score_of is not None else (lambda i: i)
    rows = [
        (
            f"repo-{i % n_repos:04d}",
            f"f_{i:05d}",
            lsn0 + j,
            op,
            score_of(i),
        )
        for j, i in enumerate(ids)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, lsn long, op string, score long"
    )


@pytest.fixture()
def cow_sink(spark, tmp_path):
    # bucket_cols=[repo] + score=id: each repo's file holds scores
    # {i : i % 7 == r}, so every file's [min, max] spans nearly the whole
    # domain (ranges overlap) while the VALUE sets are disjoint — min/max
    # cannot prune an equality probe, the bloom can.
    root = str(tmp_path / "cowb")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=8,
        merge_mode="cow", bucket_cols=["repo"],
    )
    sink.merge(_mk(spark, range(400), 0), epoch=1)
    return sink


def test_bloom_prunes_where_minmax_cannot(spark, cow_sink):
    cow_sink.analyze(cols=["score"])
    want = cow_sink.read().filter(F.col("score") == 5)
    got_mm = cow_sink.read_where({"score": (5, 5)})
    assert _rows(got_mm) == _rows(want)
    # overlapping ranges: min/max alone keeps every file
    assert len(got_mm.inputFiles()) == len(cow_sink.read().inputFiles())
    r = cow_sink.analyze(cols=["score"], bloom_cols=["score"])
    assert r["files_bloomed"] == r["files_total"] > 0
    got_bl = cow_sink.read_where({"score": (5, 5)})
    assert _rows(got_bl) == _rows(want)
    assert got_bl.count() == 1
    assert 0 < len(got_bl.inputFiles()) < len(cow_sink.read().inputFiles())


def test_bloom_absent_value_is_empty_with_live_schema(spark, cow_sink):
    cow_sink.analyze(cols=["score"], bloom_cols=["score"])
    got = cow_sink.read_where({"score": (999_999, 999_999)})
    assert got.count() == 0
    assert got.schema == cow_sink.read().schema


def test_bloom_key_point_lookup_mor_pending_deltas(spark, tmp_path):
    """High-cardinality KEY equality (the commit-hash shape): default
    all-keys bucketing spreads paths across every file, so per-file path
    ranges overlap and min/max keeps everything; the bloom prunes — and
    key-column evidence legally prunes even delta-pending buckets."""
    root = str(tmp_path / "morb")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=8,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(400), 0), epoch=1)
    sink.merge(_mk(spark, range(0, 400, 3), 1000), epoch=2)  # pending deltas
    sink.analyze()  # min/max on keys + lsn
    want = sink.read().filter(F.col("path") == "f_00200")
    got_mm = sink.read_where({"path": ("f_00200", "f_00200")})
    assert _rows(got_mm) == _rows(want)
    assert len(got_mm.inputFiles()) == len(sink.read().inputFiles())
    sink.analyze(bloom_cols=["path"])
    got_bl = sink.read_where({"path": ("f_00200", "f_00200")})
    assert _rows(got_bl) == _rows(want)
    assert got_bl.count() == 1
    assert 0 < len(got_bl.inputFiles()) < len(sink.read().inputFiles())
    # a path that never existed: every file is provably clean
    assert sink.read_where({"path": ("f_99999", "f_99999")}).count() == 0


def test_bloom_nonkey_gating_beats_evidence_on_pending_deltas(
    spark, tmp_path
):
    """Non-key bloom evidence must NOT prune delta-pending buckets, no
    matter how conclusive: the delta may hold the version that moves a
    key into (or out of) the probed value."""
    root = str(tmp_path / "morg")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(100), 0), epoch=1)
    # epoch 2 rewrites ids 0..49 to score 777777 — every bucket now has
    # a pending delta
    sink.merge(
        _mk(spark, range(50), 1000, score_of=lambda i: 777_777), epoch=2
    )
    sink.analyze(cols=["score"], bloom_cols=["score"])
    # old value: correct answer is empty (the version moved away)
    got_old = sink.read_where({"score": (7, 7)})
    want_old = sink.read().filter(F.col("score") == 7)
    assert _rows(got_old) == _rows(want_old) == []
    # new value: lives only in delta files; base blooms all say "absent"
    # but the delta-pending gating keeps every file
    got_new = sink.read_where({"score": (777_777, 777_777)})
    want_new = sink.read().filter(F.col("score") == 777_777)
    assert _rows(got_new) == _rows(want_new)
    assert got_new.count() == 50
    assert len(got_new.inputFiles()) == len(sink.read().inputFiles())
    # after compaction the buckets are delta-free: bloom now prunes
    sink.compact()
    sink.analyze(cols=["score"], bloom_cols=["score"])
    got_c = sink.read_where({"score": (777_777, 777_777)})
    assert _rows(got_c) == _rows(sink.read().filter(F.col("score") == 777_777))
    assert 0 < len(got_c.inputFiles()) <= len(sink.read().inputFiles())
    assert sink.read_where({"score": (424_242, 424_242)}).count() == 0


def test_bloom_incremental_and_survives_reopen(spark, tmp_path):
    root = str(tmp_path / "incb")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(60), 0), epoch=1)
    r1 = sink.analyze(bloom_cols=["path"])
    assert r1["files_bloomed"] == r1["files_total"] > 0
    r2 = sink.analyze(bloom_cols=["path"])
    assert r2["files_bloomed"] == 0  # files immutable: nothing re-read
    sink.merge(_mk(spark, range(60, 120), 1000), epoch=2)
    r3 = sink.analyze(bloom_cols=["path"])
    assert 0 < r3["files_bloomed"] < r3["files_total"]
    sink2 = BucketedMergeSink.open(spark, root, compact_every=None)
    want = sink2.read().filter(F.col("path") == "f_00090")
    got = sink2.read_where({"path": ("f_00090", "f_00090")})
    assert _rows(got) == _rows(want)
    assert 0 < len(got.inputFiles()) < len(sink2.read().inputFiles())


def test_legacy_flat_stats_file_still_reads_and_upgrades(spark, tmp_path):
    root = str(tmp_path / "leg")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4,
        merge_mode="cow",
    )
    sink.merge(_mk(spark, range(80), 0), epoch=1)
    sink.analyze(cols=["lsn"])
    # rewrite the stats file in the pre-bloom flat layout
    rel = sink._manifest["stats_file"]
    p = os.path.join(root, rel)
    with open(p) as fh:
        new_layout = json.load(fh)
    assert set(new_layout) == {"minmax", "bloom"}
    with open(p, "w") as fh:
        json.dump(new_layout["minmax"], fh)
    sink2 = BucketedMergeSink.open(spark, root)
    got = sink2.read_where({"lsn": (40, None)})
    want = sink2.read().filter(F.col("lsn") >= 40)
    assert _rows(got) == _rows(want)  # legacy minmax still prunes/reads
    r = sink2.analyze(cols=["lsn"], bloom_cols=["path"])  # upgrades layout
    assert r["files_analyzed"] == 0 and r["files_bloomed"] > 0
    got2 = sink2.read_where({"path": ("f_00007", "f_00007")})
    assert _rows(got2) == _rows(
        sink2.read().filter(F.col("path") == "f_00007")
    )
    assert 0 < len(got2.inputFiles()) < len(sink2.read().inputFiles())


def test_bloom_unsupported_type_is_skipped_not_wrong(spark, tmp_path):
    root = str(tmp_path / "flt")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=4, merge_mode="cow",
    )
    df = spark.createDataFrame(
        [(f"r-{i % 3}", f"f_{i:03d}", i, "u", float(i) / 4.0)
         for i in range(60)],
        "repo string, path string, lsn long, op string, ratio double",
    )
    sink.merge(df, epoch=1)
    sink.analyze(bloom_cols=["ratio"])  # double: no bloom evidence
    stats = sink._read_stats()
    assert stats["bloom"] and all(
        e.get("ratio") is None for e in stats["bloom"].values()
    )
    # the no-evidence marker memoizes: files are not re-opened forever
    r2 = sink.analyze(bloom_cols=["ratio"])
    assert r2["files_bloomed"] == 0
    got = sink.read_where({"ratio": (2.5, 2.5)})
    want = sink.read().filter(F.col("ratio") == 2.5)
    assert _rows(got) == _rows(want)
    assert got.count() == 1
    assert len(got.inputFiles()) == len(sink.read().inputFiles())


def test_bloom_probe_kind_mismatch_keeps_file():
    import base64

    entry = {
        "m": 64, "k": 1, "kind": "str",
        "b64": base64.b64encode(bytes(8)).decode(),
    }
    # all-zero filter proves any str absent, but an int probe is not
    # evidence about a str column
    assert _bloom_maybe_contains(entry, 7) is True
    assert _bloom_maybe_contains(entry, "x") is False
    assert _bloom_maybe_contains(entry, 3.5) is True  # unsupported kind
    assert _bloom_maybe_contains({"kind": "str"}, "x") is True  # malformed
    truncated = {"m": 64, "k": 1, "kind": "str", "b64": "AAAA"}  # 3 bytes
    assert _bloom_maybe_contains(truncated, "x") is True


def test_bloom_fpp_validation(spark, cow_sink):
    with pytest.raises(ValueError):
        cow_sink.analyze(bloom_cols=["score"], bloom_fpp=0.0)
    with pytest.raises(ValueError):
        cow_sink.analyze(bloom_cols=["score"], bloom_fpp=1.5)


def test_read_key_skips_files_within_bucket(spark, tmp_path):
    """compact(files_per_bucket=k) cuts each bucket into several files;
    an analyze()d point lookup then reads only the files whose recorded
    key evidence can hold the key — key equality prunes ANY file."""
    root = str(tmp_path / "rk")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(400), 0), epoch=1)
    # zorder by the NON-key column: path values interleave across the
    # bucket's files, so only the bloom (not min/max) can skip them
    sink.compact(zorder=["score"], files_per_bucket=4)
    by_bucket = {}
    for p, _k, b, _s in sink._live_file_entries():
        by_bucket.setdefault(b, []).append(p)
    assert all(len(v) == 4 for v in by_bucket.values())
    sink.analyze(bloom_cols=["repo", "path"])
    want = sink.read().filter(
        (F.col("repo") == "repo-0003") & (F.col("path") == "f_00003")
    )
    got = sink.read_key("repo-0003", "f_00003")
    assert _rows(got) == _rows(want)
    assert got.count() == 1
    assert 0 < len(got.inputFiles()) < 4  # skipped files inside the bucket
    # absent key: every file of the bucket is provably clean
    none = sink.read_key("repo-9999", "f_99999")
    assert none.count() == 0
    assert none.schema == sink.read().schema


def test_read_key_as_of_with_unanalyzed_snapshot_files(spark, tmp_path):
    """Snapshot files superseded by compaction carry no stats (analyze
    covers live files): the as-of lookup keeps them and stays exact."""
    root = str(tmp_path / "rka")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(100), 0), epoch=1)
    sink.merge(_mk(spark, range(30), 1000, op="d"), epoch=2)  # delete 0..29
    sink.compact(zorder=["score"], files_per_bucket=3)
    sink.analyze(bloom_cols=["repo", "path"])
    # live: id 7 was deleted
    assert sink.read_key("repo-0000", "f_00007").count() == 0
    # as-of epoch 1 it existed; those files are unanalyzed -> kept
    got = sink.read_key("repo-0000", "f_00007", as_of=1)
    want = sink.read_as_of(1).filter(
        (F.col("repo") == "repo-0000") & (F.col("path") == "f_00007")
    )
    assert _rows(got) == _rows(want)
    assert got.count() == 1


def test_read_prefix_stats_parity(spark, tmp_path):
    root = str(tmp_path / "rp")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None, bucket_cols=["repo"],
    )
    sink.merge(_mk(spark, range(200), 0), epoch=1)
    sink.compact(zorder=["score"], files_per_bucket=3)
    sink.analyze(bloom_cols=["repo"])
    got = sink.read_prefix("repo-0003")
    want = sink.read().filter(F.col("repo") == "repo-0003")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_composite_bloom_prunes_pair_lookup(spark, tmp_path):
    """The composite-key trap: each member column alone appears in every
    file (20 repos x 20 shared paths), so per-column blooms cannot prune
    a (repo, path) lookup — the tuple bloom can."""
    root = str(tmp_path / "comp")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    # coprime member cycles (40, 41) + consecutive scores: every curve
    # segment of a few hundred rows contains (almost) every repo AND
    # path value, so per-column evidence keeps (almost) every file;
    # 1600 of the 1640 combos exist, so absent pairs with both members
    # present exist
    rows = [
        (f"r{n % 40}", f"p{n % 41}", n, "u", n) for n in range(1600)
    ]
    pairs = {(r, p) for r, p, *_ in rows}
    df = spark.createDataFrame(
        rows, "repo string, path string, lsn long, op string, score long"
    )
    sink.merge(df, epoch=1)
    sink.compact(zorder=["score"], files_per_bucket=4)
    sink.analyze(bloom_cols=["repo", "path"])
    probe = ("r0", "p0")  # n = 0
    want = sink.read().filter(
        (F.col("repo") == probe[0]) & (F.col("path") == probe[1])
    )
    got_single = sink.read_key(*probe)
    assert _rows(got_single) == _rows(want)
    files_single = len(got_single.inputFiles())
    assert files_single >= 3  # members nearly everywhere
    r = sink.analyze(bloom_cols=[("repo", "path")])
    assert r["files_bloomed"] > 0
    got_tuple = sink.read_key(*probe)
    assert _rows(got_tuple) == _rows(want)
    files_tuple = len(got_tuple.inputFiles())
    assert 0 < files_tuple <= 2  # the unique pair lives in one file (+fp)
    assert files_tuple < files_single
    # members present, pair absent: the tuple bloom proves every file
    # clean (r0,p1 <-> n ≡ 1600 mod 1640, outside the generated range)
    absent = ("r0", "p1")
    assert absent not in pairs
    none = sink.read_key(*absent)
    assert none.count() == 0
    # coverage column renders the composite name readably
    covs = {c for row in sink.files().collect() for c in row["bloom_cols"]}
    assert "repo+path" in covs
    # validation: a 1-element tuple is a mistake
    with pytest.raises(ValueError, match="tuple bloom"):
        sink.analyze(bloom_cols=[("repo",)])
