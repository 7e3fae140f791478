"""Named snapshot refs (Iceberg TAG analogue): ``tag``/``drop_tag``/
``tags``, tag names accepted wherever an epoch id is (``read_as_of``,
``restore``, ``read_changes``, ``read_key(as_of=...)``), and — the
operational point — ``vacuum()`` protecting tagged snapshots' files so
a pinned state stays time-travel readable under any retention setting.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, ids, lsn0, op="u"):
    rows = [
        (f"repo-{i % 5:03d}", f"f_{i:04d}", lsn0 + j, op, lsn0 + i)
        for j, i in enumerate(ids)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, lsn long, op string, score long"
    )


@pytest.fixture()
def cow3(spark, tmp_path):
    """COW sink with 3 epochs — every epoch rewrites its buckets, so
    each snapshot owns distinct files (vacuum has something to delete)."""
    sink = BucketedMergeSink(
        spark, str(tmp_path / "t"), keys=["repo", "path"], num_buckets=4,
        merge_mode="cow",
    )
    sink.merge(_mk(spark, range(40), 0), epoch=1)
    sink.merge(_mk(spark, range(20), 1000), epoch=2)
    sink.merge(_mk(spark, range(10, 30), 2000), epoch=3)
    return sink


def test_tag_read_parity_and_default_latest(spark, cow3):
    r = cow3.tag("v2", epoch=2)
    assert r == {"tag": "v2", "epoch": 2, "skipped": False}
    cow3.tag("latest")  # defaults to the newest committed epoch
    assert cow3.tags() == {"v2": 2, "latest": 3}
    assert _rows(cow3.read_as_of("v2")) == _rows(cow3.read_as_of(2))
    assert _rows(cow3.read_as_of("latest")) == _rows(cow3.read())


def test_tag_validation(spark, cow3):
    with pytest.raises(ValueError, match="not committed"):
        cow3.tag("bad", epoch=99)
    with pytest.raises(ValueError, match="non-empty string"):
        cow3.tag("")
    cow3.tag("pin", epoch=1)
    assert cow3.tag("pin", epoch=1)["skipped"] is True  # idempotent
    with pytest.raises(ValueError, match="replace=True"):
        cow3.tag("pin", epoch=2)
    assert cow3.tag("pin", epoch=2, replace=True)["epoch"] == 2
    with pytest.raises(ValueError, match="unknown tag"):
        cow3.read_as_of("nope")
    with pytest.raises(TypeError):
        cow3.read_as_of(3.5)


def test_drop_tag(spark, cow3):
    cow3.tag("gone", epoch=2)
    assert cow3.drop_tag("gone")["dropped"] is True
    assert "gone" not in cow3.tags()
    with pytest.raises(ValueError, match="unknown tag"):
        cow3.read_as_of("gone")
    with pytest.raises(ValueError, match="unknown tag"):
        cow3.drop_tag("gone")


def test_vacuum_protects_tagged_snapshot(spark, cow3):
    cow3.tag("pin", epoch=1)
    want_pin = _rows(cow3.read_as_of(1))
    removed = cow3.vacuum()  # keep only the current state + tagged pins
    assert removed  # epoch 2's superseded files actually went away
    assert _rows(cow3.read_as_of("pin")) == want_pin
    # untagged intermediate snapshot lost its files
    with pytest.raises(Exception):
        cow3.read_as_of(2).collect()
    # history: the tagged epoch below the vacuum mark is NOT marked lost
    hist = {r["epoch"]: r["vacuumed"] for r in cow3.history().collect()}
    assert hist[1] is False and hist[2] is True
    # dropping the tag releases the pin; the next vacuum collects it
    cow3.drop_tag("pin")
    removed2 = cow3.vacuum()
    assert removed2
    with pytest.raises(Exception):
        cow3.read_as_of(1).collect()


def test_restore_to_tag_survives_vacuum(spark, cow3):
    cow3.tag("pin", epoch=1)
    want_pin = _rows(cow3.read_as_of(1))
    cow3.vacuum()
    with pytest.raises(ValueError, match="vacuum"):
        cow3.restore(to_epoch=2, as_epoch=9)  # untagged: files gone
    r = cow3.restore(to_epoch="pin", as_epoch=10)
    assert r["restored_to"] == 1
    assert _rows(cow3.read()) == want_pin


def test_changes_and_point_lookup_by_tag(spark, tmp_path):
    sink = BucketedMergeSink(
        spark, str(tmp_path / "m"), keys=["repo", "path"], num_buckets=4,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk(spark, range(30), 0), epoch=1)
    sink.merge(_mk(spark, range(10), 1000), epoch=2)
    sink.tag("t1", epoch=1)
    got = sink.read_changes(to_epoch=2, from_epoch="t1")
    want = sink.read_changes(to_epoch=2, from_epoch=1)
    assert _rows(got) == _rows(want)
    got_k = sink.read_key("repo-000", "f_0005", as_of="t1")
    want_k = sink.read_as_of(1).filter(
        (F.col("repo") == "repo-000") & (F.col("path") == "f_0005")
    )
    assert _rows(got_k) == _rows(want_k)


def test_tags_survive_reopen_and_are_audited(spark, cow3):
    root = cow3.root
    cow3.tag("rel", epoch=2)
    cow3.drop_tag("rel")
    cow3.tag("rel2", epoch=3)
    sink2 = BucketedMergeSink.open(spark, root)
    assert sink2.tags() == {"rel2": 3}
    ops = [r["op"] for r in sink2.maintenance_log().collect()]
    assert ops.count("tag") == 2 and ops.count("drop_tag") == 1
