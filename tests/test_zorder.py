"""Z-order clustering at compaction (Delta OPTIMIZE ZORDER BY / Iceberg
rewrite_data_files(zorder) analogue): each bucket is re-clustered along a
Morton curve over the named columns and cut into equal-count files, so
``analyze()`` + ``read_where`` skip files on EVERY zorder column at once
— where a single-column sort makes one column prunable and scatters the
rest."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.streaming.sink import (
    BucketedMergeSink,
    _z_interleave,
    _z_scaled_raw,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk_batch(spark, n, lsn0=0):
    # x and y are independent lanes; cat is a low-cardinality string lane
    rows = [
        (
            f"repo-{i % 3:04d}",
            f"f_{i:05d}",
            lsn0 + i,
            "u",
            i % 100,
            (i * 37) % 100,
            f"cat-{(i * 13) % 50:03d}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "repo string, path string, lsn long, op string, "
        "x long, y long, cat string",
    )


@pytest.fixture(scope="module")
def zsink(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("z") / "sink")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, 4000), epoch=1)
    sink.merge(_mk_batch(spark, 4000, lsn0=10_000), epoch=2)  # full overwrite
    return sink


def test_zorder_compact_preserves_state(spark, zsink):
    before = _rows(zsink.read())
    out = zsink.compact(zorder=["x", "y"], files_per_bucket=8)
    assert out["compacted"] and out["deltas_folded"] == 4  # 2 epochs x 2 buckets
    assert zsink._manifest["deltas"] == []
    assert _rows(zsink.read()) == before
    m = zsink._manifest["maintenance"][-1]
    assert m["zorder"] == ["x", "y"] and m["files_per_bucket"] == 8


def test_zorder_files_prune_on_both_columns(spark, zsink):
    # depends on the module-scoped compact above having run
    if not zsink._manifest.get("maintenance"):
        zsink.compact(zorder=["x", "y"], files_per_bucket=8)
    zsink.analyze(cols=["x", "y"])
    total = len(zsink._live_file_entries())
    assert total == 16  # 2 buckets x 8 slices, one file per slice

    for col in ("x", "y"):
        got = zsink.read_where({col: (0, 9)})
        want = zsink.read().filter(F.col(col).between(0, 9))
        assert _rows(got) == _rows(want)
        scanned = len(got.inputFiles())
        # a decile query on EITHER lane must skip at least half the files
        assert scanned <= total // 2, f"{col}: {scanned}/{total} files scanned"


def test_single_column_sort_cannot_prune_the_other_lane(spark, tmp_path):
    """Contrast case: sorting by x alone leaves y scattered — a y-range
    query scans (nearly) everything, while the z-ordered twin skips."""
    root = str(tmp_path / "s")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, 4000), epoch=1)
    sink.compact(zorder=["x"], files_per_bucket=8)  # 1-lane curve == sort by x
    sink.analyze(cols=["x", "y"])
    total = len(sink._live_file_entries())
    x_scanned = len(sink.read_where({"x": (0, 9)}).inputFiles())
    y_scanned = len(sink.read_where({"y": (0, 9)}).inputFiles())
    assert x_scanned <= total // 2          # sorted lane prunes
    assert y_scanned >= total - 2           # scattered lane cannot


def test_zorder_string_column(spark, tmp_path):
    root = str(tmp_path / "s")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, 4000), epoch=1)
    before = _rows(sink.read())
    sink.compact(zorder=["cat", "y"], files_per_bucket=8)
    assert _rows(sink.read()) == before
    sink.analyze(cols=["cat", "y"])
    total = len(sink._live_file_entries())
    got = sink.read_where({"cat": ("cat-000", "cat-009")})
    want = sink.read().filter(F.col("cat").between("cat-000", "cat-009"))
    assert _rows(got) == _rows(want)
    assert len(got.inputFiles()) <= total // 2


def test_zorder_pure_recluster_cow(spark, tmp_path):
    """zorder with NO pending deltas is a valid OPTIMIZE on a COW table."""
    root = str(tmp_path / "s")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2, merge_mode="cow",
    )
    sink.merge(_mk_batch(spark, 4000), epoch=1)
    before = _rows(sink.read())
    out = sink.compact(zorder=["x", "y"], files_per_bucket=8)
    assert out["compacted"] and out["deltas_folded"] == 0
    assert _rows(sink.read()) == before
    sink.analyze(cols=["x", "y"])
    total = len(sink._live_file_entries())
    scanned = len(sink.read_where({"y": (40, 49)}).inputFiles())
    assert scanned <= total // 2
    # plain compact() without zorder on a delta-free table stays a no-op
    assert sink.compact() == {"compacted": False, "deltas_folded": 0}


def test_zorder_validation(spark, tmp_path):
    root = str(tmp_path / "s")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    # empty sink: nothing to recluster
    assert sink.compact(zorder=["x"]) == {"compacted": False, "deltas_folded": 0}
    sink.merge(_mk_batch(spark, 200), epoch=1)
    with pytest.raises(ValueError, match="not in table columns"):
        sink.compact(zorder=["nope"])
    with pytest.raises(ValueError, match="files_per_bucket"):
        sink.compact(zorder=["x"], files_per_bucket=0)
    with pytest.raises(ValueError, match="at least one column"):
        sink.compact(zorder=[])
    b = _mk_batch(spark, 10).withColumn("arr", F.array(F.lit(1)))
    sink2 = BucketedMergeSink(
        spark, str(tmp_path / "s2"), keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink2.merge(b, epoch=1)
    with pytest.raises(ValueError, match="unsupported type"):
        sink2.compact(zorder=["arr"])


def test_z_interleave_bit_layout(spark):
    """Morton property on known lanes: bit i of lane j lands at i*k+j."""
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 0), (65535, 65535)], "a long, b long")
    z = [
        r.z
        for r in df.select(
            _z_interleave([F.col("a"), F.col("b")]).alias("z")
        ).collect()
    ]
    assert z[0] == 1            # a bit0 -> z bit0
    assert z[1] == 2            # b bit0 -> z bit1
    assert z[2] == 1 + 4        # a bits 0,1 -> z bits 0,2
    assert z[3] == (1 << 32) - 1  # all 32 bits set


def test_z_scaled_string_prefix_is_monotonic(spark):
    from pyspark.sql.types import StringType

    df = spark.createDataFrame(
        [("abc",), ("abd",), ("abcd",), ("",), ("abcdefgh",)], "s string"
    )
    vals = {
        r.s: r.v
        for r in df.select(
            "s", _z_scaled_raw("s", StringType()).alias("v")
        ).collect()
    }
    # lexicographic byte order preserved by the 6-byte prefix value
    assert vals[""] < vals["abc"] < vals["abcd"] < vals["abd"]
    # beyond 6 bytes the prefix saturates: equal prefixes map equal
    assert vals["abcdefgh"] == vals["abcdefgh"]


def test_zorder_survives_further_epochs_and_compactions(spark, tmp_path):
    root = str(tmp_path / "s")
    sink = BucketedMergeSink(
        spark, root, keys=["repo", "path"], num_buckets=2,
        merge_mode="mor", compact_every=None,
    )
    sink.merge(_mk_batch(spark, 2000), epoch=1)
    sink.compact(zorder=["x", "y"], files_per_bucket=4)
    sink.merge(_mk_batch(spark, 2000, lsn0=10_000), epoch=2)
    twin_rows = _rows(sink.read())
    # second z-compact folds the new delta and re-clusters
    sink.compact(zorder=["x", "y"], files_per_bucket=4)
    assert _rows(sink.read()) == twin_rows
    # time travel to the epoch-1 snapshot still resolves pre-vacuum
    assert sink.read_as_of(1).count() == 2000
