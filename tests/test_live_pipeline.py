"""End-to-end live-pipeline composition: ONE CDC sink feeding THREE
derived states — an incremental aggregate view (N20), the LSH near-dup
index (N21), and the IVF embedding index (N22) — all refreshed from the
same preimage changelog, epoch by epoch.

The unit tests for each component prove it against its own batch
oracle; this test proves the COMPOSITION: the three derived states stay
in lockstep with the sink's as-of state after every epoch while sharing
one change feed, one manifest discipline, and one set of key/order
semantics. This is the shape a production deployment runs — a binlog
tail landing in the lake with its aggregates, dedup index, and vector
index all maintained incrementally behind it.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ann_index import (
    IncrementalANNIndex,
)
from kafka_connect_converter_json_spark.streaming.ingest import ingest
from kafka_connect_converter_json_spark.streaming.lsh_index import (
    IncrementalLSHIndex,
)
from kafka_connect_converter_json_spark.streaming.view import IncrementalAggView

N = 2000
DIM = 5
K_CENTS = 6
EPOCHS = 4


def _vec_expr():
    # pure Column function of content → retractions reproduce stored rows
    return F.array(*[
        (
            F.pmod(F.xxhash64(F.col("content"), F.lit(j)), F.lit(1000))
            .cast("double") / F.lit(500.0) - F.lit(1.0)
        )
        for j in range(DIM)
    ])


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Ingest 4 epochs, then replay the derived-state refreshes epoch by
    epoch, snapshotting each component's parity inputs after every
    refresh (the sink's as-of states are immutable, so the comparison
    stays honest even though ingest ran ahead)."""
    tmp = tmp_path_factory.mktemp("live")
    events = gen_events(spark, N, n_repos=10, paths_per_repo=20, seed=23)
    sink = ingest(
        spark, events, str(tmp / "sink"), N, n_epochs=EPOCHS, num_buckets=8,
        merge_mode="mor",
    )
    view = IncrementalAggView(
        spark, str(tmp / "view"), sink, group_cols=["repo"],
        aggs={"n": ("count", None), "max_lsn": ("max", "lsn")},
        strategy="hybrid",
    )
    lsh = IncrementalLSHIndex(spark, str(tmp / "lsh"), sink, num_buckets=8)
    ann = IncrementalANNIndex(
        spark, str(tmp / "ann"), sink, vec_expr=_vec_expr(),
        vec_tag="hashproj-5", n_centroids=K_CENTS,
    )
    per_epoch = []
    for e in sorted(sink.committed_epochs()):
        view.refresh(to_epoch=e)
        lsh.refresh(to_epoch=e)
        ann.refresh(to_epoch=e)
        state = sink.read_as_of(e)
        per_epoch.append({
            "epoch": e,
            "view_got": _rows(view.read()),
            "view_exp": _rows(
                state.groupBy("repo").agg(
                    F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn")
                )
            ),
            "lsh_got": _rows(lsh.read_bands()),
            "lsh_exp": _rows(lsh._band_rows(state)),
            "ann_got": _rows(ann.read_assignments()),
            "ann_exp": _rows(
                ann._assign(ann._vec_rows(state), ann.centroids)
            ),
        })
    return sink, view, lsh, ann, per_epoch


def test_all_three_derived_states_lockstep_every_epoch(pipeline):
    _, _, _, _, per_epoch = pipeline
    assert len(per_epoch) == EPOCHS
    for snap in per_epoch:
        e = snap["epoch"]
        assert snap["view_got"] == snap["view_exp"], f"view diverged at epoch {e}"
        assert snap["lsh_got"] == snap["lsh_exp"], f"LSH index diverged at epoch {e}"
        assert snap["ann_got"] == snap["ann_exp"], f"ANN index diverged at epoch {e}"
        assert len(snap["view_got"]) > 0
        assert len(snap["lsh_got"]) > 0
        assert len(snap["ann_got"]) > 0


def test_derived_states_share_one_changelog_not_one_refresh_order(
    spark, pipeline, tmp_path_factory
):
    """Refreshing a second set of derived states in one jump (0 → last)
    reproduces the epoch-by-epoch states exactly: refresh granularity
    is an operational choice, not a correctness parameter."""
    sink, _, _, _, per_epoch = pipeline
    tmp = tmp_path_factory.mktemp("live_jump")
    last = max(s["epoch"] for s in per_epoch)
    view2 = IncrementalAggView(
        spark, str(tmp / "view"), sink, group_cols=["repo"],
        aggs={"n": ("count", None), "max_lsn": ("max", "lsn")},
        strategy="hybrid",
    )
    lsh2 = IncrementalLSHIndex(spark, str(tmp / "lsh"), sink, num_buckets=8)
    ann2 = IncrementalANNIndex(
        spark, str(tmp / "ann"), sink, vec_expr=_vec_expr(),
        vec_tag="hashproj-5", n_centroids=K_CENTS,
    )
    view2.refresh(to_epoch=last)
    lsh2.refresh(to_epoch=last)
    ann2.refresh(to_epoch=last)
    final = per_epoch[-1]
    assert _rows(view2.read()) == final["view_exp"]
    assert _rows(lsh2.read_bands()) == final["lsh_exp"]
    # the jump index trains its codebook on the FULL final corpus while
    # the epoch-by-epoch one froze a bootstrap-time codebook — cell ids
    # may differ, but the live (id → vec) membership must be identical
    assert _rows(ann2.read_assignments().select("id", "vec")) == sorted(
        (r[0], r[2]) for r in final["ann_exp"]
    )


def test_stale_and_idempotent_refresh_across_components(pipeline):
    sink, view, lsh, ann, per_epoch = pipeline
    last = max(s["epoch"] for s in per_epoch)
    for comp in (view, lsh, ann):
        out = comp.refresh(to_epoch=last)
        assert out["refreshed"] is False
        assert comp.last_epoch == last
    final = per_epoch[-1]
    assert _rows(view.read()) == final["view_exp"]
    assert _rows(lsh.read_bands()) == final["lsh_exp"]
    assert _rows(ann.read_assignments()) == final["ann_exp"]


def test_rollback_propagates_to_all_derived_states(
    spark, pipeline, tmp_path_factory
):
    """N25 × N20-N23: restore the sink to an earlier epoch, refresh, and
    every derived state — aggregate view, LSH band table, ANN
    assignments, BM25 postings — must retract the rolled-back versions
    through the reverting preimage changelog and land exactly on the
    restored state's batch expectation. No component has rollback code;
    the changelog's pure-function-of-state property carries all of it.
    (Defined last: it mutates the shared sink.)"""
    from kafka_connect_converter_json_spark.streaming.text_index import (
        IncrementalBM25Index,
    )

    sink, view, lsh, ann, per_epoch = pipeline
    tmp = tmp_path_factory.mktemp("live_rb")
    last = max(s["epoch"] for s in per_epoch)
    bm25 = IncrementalBM25Index(spark, str(tmp / "bm25"), sink, num_buckets=8)
    bm25.refresh(to_epoch=last)

    target = per_epoch[1]["epoch"]
    sink.restore(target, as_epoch=100)
    state = sink.read_as_of(100)
    for comp in (view, lsh, ann, bm25):
        assert comp.refresh(to_epoch=100)["refreshed"] is True

    assert _rows(view.read()) == _rows(
        state.groupBy("repo").agg(
            F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn")
        )
    )
    assert _rows(lsh.read_bands()) == _rows(lsh._band_rows(state))
    assert _rows(ann.read_assignments()) == _rows(
        ann._assign(ann._vec_rows(state), ann.centroids)
    )
    assert _rows(bm25.read_postings()) == _rows(
        bm25._posting_rows(state).select("term", "id", "tf")
    )
