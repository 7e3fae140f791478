"""Snapshot bootstrap + binlog handoff (streaming.bootstrap).

Oracle: the full-replay final state — both the engine's own full replay
and the independent pure-pandas reduction from test_ingest_e2e. A
bootstrap from the state at snapshot_lsn plus the tail after it must
land byte-identically where replaying the whole stream lands.
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.bootstrap import bootstrap_ingest
from kafka_connect_converter_json_spark.streaming.ingest import ingest

from test_ingest_e2e import _oracle_final_state

N_EVENTS = 3000
SNAP_LSN = 1499  # snapshot covers lsn <= 1499; tail covers 1500..2999

STATE_COLS = ["repo", "path", "commit", "lang", "content", "lsn"]


@pytest.fixture(scope="module")
def events(spark):
    return gen_events(spark, N_EVENTS, n_repos=20, paths_per_repo=30, seed=42).cache()


@pytest.fixture(scope="module")
def full_state(events, tmp_path_factory):
    """Engine full replay of the whole stream — the parity target."""
    root = str(tmp_path_factory.mktemp("full") / "tbl")
    sink = ingest(events.sparkSession, events, root, N_EVENTS, n_epochs=3)
    return _sorted(sink.read().select(*STATE_COLS).toPandas())


@pytest.fixture(scope="module")
def snapshot(events, tmp_path_factory):
    """Consistent state at SNAP_LSN, built by the engine itself from the
    stream prefix (each row carries its true last-modified lsn)."""
    root = str(tmp_path_factory.mktemp("snap") / "tbl")
    sink = ingest(
        events.sparkSession,
        events.filter(F.col("lsn") <= SNAP_LSN),
        root,
        SNAP_LSN + 1,
        n_epochs=2,
    )
    return sink.read().select(*STATE_COLS).cache()


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["repo", "path"]).reset_index(drop=True)


def _hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in _sorted(pdf).itertuples():
        h.update(
            "|".join(
                [row.repo, row.path, row.commit, row.lang,
                 hashlib.sha256(row.content.encode()).hexdigest(), str(row.lsn)]
            ).encode()
        )
    return h.hexdigest()


def _boot_state(sink) -> pd.DataFrame:
    return _sorted(sink.read().select(*STATE_COLS).toPandas())


def test_bootstrap_matches_full_replay(spark, events, snapshot, full_state, tmp_path):
    """Snapshot at S + tail after S == replay of everything, and both
    match the independent pandas reduction."""
    sink = bootstrap_ingest(
        spark, snapshot, events, str(tmp_path / "tbl"), N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=3, snapshot_epochs=2,
    )
    got = _boot_state(sink)
    assert _hash(got) == _hash(full_state)
    oracle = _oracle_final_state(
        events.select("lsn", "op", "repo", "path", "value_json").toPandas()
    )
    assert _hash(got) == _hash(oracle)


def test_bootstrap_cow_mode_parity(spark, events, snapshot, full_state, tmp_path):
    sink = bootstrap_ingest(
        spark, snapshot, events, str(tmp_path / "tbl"), N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=1, merge_mode="cow",
    )
    assert _hash(_boot_state(sink)) == _hash(full_state)


def test_snapshot_without_lsn_column(spark, events, snapshot, full_state, tmp_path):
    """A snapshot with no per-row lsn defaults every row to snapshot_lsn:
    tail events (> S) still win LWW, so parity must hold."""
    sink = bootstrap_ingest(
        spark, snapshot.drop("lsn"), events, str(tmp_path / "tbl"), N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=3, snapshot_epochs=2,
    )
    got = _boot_state(sink)
    # lsn differs for rows last modified before the snapshot (defaulted to
    # SNAP_LSN), so compare the content state only.
    want = full_state.drop(columns=["lsn"])
    got = got.drop(columns=["lsn"])
    assert got.equals(_sorted(want)[got.columns.tolist()])


def test_redelivered_tail_is_safe(spark, events, snapshot, full_state, tmp_path):
    """An at-least-once tail that replays from lsn 0 (everything at or
    below the snapshot redelivered) must not perturb the final state —
    the hard cut filters it, and LWW would reject it anyway."""
    sink = bootstrap_ingest(
        spark, snapshot, events, str(tmp_path / "tbl"), N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=1,
    )
    assert _hash(_boot_state(sink)) == _hash(full_state)
    # keys deleted before the snapshot stayed deleted (no resurrection):
    # every (repo,path) in the final state appears in the oracle too
    assert len(_boot_state(sink)) == len(full_state)


def test_resume_mid_snapshot(spark, events, snapshot, full_state, tmp_path):
    """Crash after 1 of 3 snapshot chunks; resume skips the committed
    chunk and lands byte-identical."""
    root = str(tmp_path / "tbl")
    with pytest.raises(RuntimeError, match="injected crash"):
        bootstrap_ingest(
            spark, snapshot, events, root, N_EVENTS,
            snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=3,
            fail_after_chunks=1,
        )
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink
    partial = BucketedMergeSink(
        spark, root, keys=["repo", "path"], order_col="lsn", num_buckets=64
    )
    assert partial.committed_epochs() == {0}
    sink = bootstrap_ingest(
        spark, snapshot, events, root, N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=3,
    )
    assert sink.committed_epochs() == {0, 1, 2, 3, 4}
    assert _hash(_boot_state(sink)) == _hash(full_state)


def test_resume_mid_tail(spark, events, snapshot, full_state, tmp_path):
    """Crash after 1 of 3 tail epochs; resume completes the tail."""
    root = str(tmp_path / "tbl")
    with pytest.raises(RuntimeError, match="injected crash"):
        bootstrap_ingest(
            spark, snapshot, events, root, N_EVENTS,
            snapshot_lsn=SNAP_LSN, n_epochs=3, snapshot_epochs=1,
            fail_after_epochs=1,
        )
    sink = bootstrap_ingest(
        spark, snapshot, events, root, N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=3, snapshot_epochs=1,
    )
    assert _hash(_boot_state(sink)) == _hash(full_state)


def test_rerun_is_idempotent(spark, events, snapshot, full_state, tmp_path):
    root = str(tmp_path / "tbl")
    first = bootstrap_ingest(
        spark, snapshot, events, root, N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=2,
    )
    epochs_before = sorted(first.committed_epochs())
    again = bootstrap_ingest(
        spark, snapshot, events, root, N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=2,
    )
    assert sorted(again.committed_epochs()) == epochs_before
    assert _hash(_boot_state(again)) == _hash(full_state)


def test_chunking_is_partition_independent(spark, events, snapshot, full_state, tmp_path):
    """snapshot_epochs=1 vs 4 and a repartitioned snapshot input all land
    on the same state."""
    a = bootstrap_ingest(
        spark, snapshot.repartition(7), events, str(tmp_path / "a"), N_EVENTS,
        snapshot_lsn=SNAP_LSN, n_epochs=2, snapshot_epochs=4,
    )
    assert _hash(_boot_state(a)) == _hash(full_state)
