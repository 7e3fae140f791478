"""Audit branches: multi-epoch WAP chains (the Iceberg audit-BRANCH
analogue). ``stage(..., branch=name)`` stacks several invisible epochs
on a named chain; ``read_branch`` is the chain's candidate state;
``audit_branch`` runs expectations over the chain; ``fast_forward``
lands it epoch-by-epoch through the ordinary publish CAS (resumable
mid-way); ``discard_branch`` drops it without trace. Sound because each
staged delta is LWW-reduced and LWW is order-insensitive on the order
column — the chain's merged state equals publishing in any order.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk(spark, ids, lsn0, op="u", n_repos=5):
    rows = [
        (f"repo-{i % n_repos:04d}", f"f_{i:05d}", lsn0 + j, op, i * 10)
        for j, i in enumerate(ids)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, lsn long, op string, score long"
    )


def _sink(spark, root, mode):
    return BucketedMergeSink(
        spark, str(root), keys=["repo", "path"], num_buckets=4,
        merge_mode=mode, compact_every=None,
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_branch_invisible_until_fast_forward_matches_twin(
    spark, tmp_path, mode
):
    br = _sink(spark, tmp_path / "br", mode)
    twin = _sink(spark, tmp_path / "twin", mode)
    b0 = _mk(spark, range(40), 0)
    b1 = _mk(spark, range(20, 60), 100)            # overlap = updates
    b2 = _mk(spark, range(0, 10), 200, op="d")     # deletes
    br.merge(b0, epoch=1)
    twin.merge(b0, epoch=1)
    br.stage(b1, epoch=2, branch="audit")
    br.stage(b2, epoch=3, branch="audit")
    # chain is invisible to every reader until fast_forward
    assert _rows(br.read()) == _rows(twin.read())
    assert br.branches() == {"audit": [2, 3]}
    # candidate state == the twin actually merging the chain
    twin.merge(b1, epoch=2)
    twin.merge(b2, epoch=3)
    assert _rows(br.read_branch("audit")) == _rows(twin.read())
    r = br.fast_forward("audit")
    assert r["published"] == [2, 3]
    assert _rows(br.read()) == _rows(twin.read())
    assert br.branches() == {}  # chain consumed
    # redelivered fast_forward on a consumed branch refuses (no epochs)
    with pytest.raises(ValueError, match="no staged epochs"):
        br.fast_forward("audit")


def test_fast_forward_resumes_after_partial_publish(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    twin = _sink(spark, tmp_path / "twin", "mor")
    for b, e in [(_mk(spark, range(30), 0), 1)]:
        br.merge(b, e)
        twin.merge(b, e)
    c1, c2 = _mk(spark, range(10, 40), 100), _mk(spark, range(5), 200, op="d")
    br.stage(c1, epoch=2, branch="x")
    br.stage(c2, epoch=3, branch="x")
    br.publish(2)  # crash-mid-fast-forward stand-in: prefix already landed
    r = br.fast_forward("x")
    assert r["published"] == [3]  # only the remainder
    twin.merge(c1, epoch=2)
    twin.merge(c2, epoch=3)
    assert _rows(br.read()) == _rows(twin.read())
    assert sorted(br.committed_epochs()) == [1, 2, 3]


def test_audit_branch_chain_expectations(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    br.merge(_mk(spark, range(20), 0), epoch=1)
    br.stage(_mk(spark, range(20, 35), 100), epoch=2, branch="q")
    br.stage(_mk(spark, range(35, 50), 200), epoch=3, branch="q")
    # delta-level: union of both chain epochs = 30 live rows
    rep = br.audit_branch("q", {"min_rows": 30, "not_null": ["score"]})
    assert rep["passed"] and rep["epochs"] == [2, 3]
    assert rep["checks"]["min_rows"]["observed"] == 30
    # state-level: candidate state holds all 50 keys — true only with
    # BOTH chain epochs applied
    rep2 = br.audit_branch(
        "q", {"expect_state": {"scores": "score >= 0 and score < 500"}}
    )
    assert rep2["passed"]
    assert br.read_branch("q").count() == 50
    # failing expectation reports, nothing mutates
    bad = br.audit_branch("q", {"min_rows": 31})
    assert not bad["passed"]
    assert _rows(br.read()) == _rows(br.read_as_of(1))


def test_discard_branch_leaves_no_trace(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    br.merge(_mk(spark, range(20), 0), epoch=1)
    before = _rows(br.read())
    br.stage(_mk(spark, range(50, 70), 100), epoch=2, branch="bad")
    br.stage(_mk(spark, range(70, 90), 200), epoch=3, branch="bad")
    r = br.discard_branch("bad")
    assert r["discarded"] == [2, 3]
    assert br.branches() == {}
    assert br.staged_epochs() == set()
    assert _rows(br.read()) == before
    # epochs are re-stageable after discard
    assert br.stage(_mk(spark, range(5), 300), epoch=2)["staged"] is True


def test_branches_are_independent(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    br.merge(_mk(spark, range(10), 0), epoch=1)
    br.stage(_mk(spark, range(10, 20), 100), epoch=2, branch="a")
    br.stage(_mk(spark, range(20, 30), 200), epoch=3, branch="b")
    assert br.branches() == {"a": [2], "b": [3]}
    assert br.read_branch("a").count() == 20  # does not see branch b
    assert br.read_branch("b").count() == 20
    br.fast_forward("a")
    assert br.read().count() == 20
    assert br.branches() == {"b": [3]}
    br.discard_branch("b")
    assert br.branches() == {}


def test_branch_sees_interleaved_plain_merge(spark, tmp_path):
    """A plain merge() landing while a branch is staged: the branch
    candidate reflects the new base, and fast_forward converges to the
    same state as any serial ordering (LWW order-insensitivity)."""
    br = _sink(spark, tmp_path / "br", "mor")
    twin = _sink(spark, tmp_path / "twin", "mor")
    b0, bmid, bch = (
        _mk(spark, range(30), 0),
        _mk(spark, range(15, 45), 100),
        _mk(spark, range(40, 55), 200),
    )
    br.merge(b0, epoch=1)
    twin.merge(b0, epoch=1)
    br.stage(bch, epoch=3, branch="late")
    br.merge(bmid, epoch=2)  # lands under the staged branch
    assert br.read_branch("late").count() == 55
    br.fast_forward("late")
    twin.merge(bmid, epoch=2)
    twin.merge(bch, epoch=3)
    assert _rows(br.read()) == _rows(twin.read())


def test_branch_validation(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    br.merge(_mk(spark, range(10), 0), epoch=1)
    with pytest.raises(ValueError, match="non-empty string"):
        br.stage(_mk(spark, range(5), 100), epoch=2, branch="")
    with pytest.raises(ValueError, match="no staged epochs"):
        br.read_branch("ghost")
    with pytest.raises(ValueError, match="no staged epochs"):
        br.discard_branch("ghost")
    # unlabeled staged epochs are not branch members
    br.stage(_mk(spark, range(5), 100), epoch=2)
    assert br.branches() == {}


def test_fast_forward_refuses_stale_bucket_layout_upfront(spark, tmp_path):
    br = _sink(spark, tmp_path / "br", "mor")
    br.merge(_mk(spark, range(30), 0), epoch=1)
    br.stage(_mk(spark, range(30, 40), 100), epoch=2, branch="r")
    br.stage(_mk(spark, range(40, 50), 200), epoch=3, branch="r")
    br.rebucket(8)
    with pytest.raises(ValueError, match="bucket count"):
        br.fast_forward("r")
    # nothing was published before the refusal
    assert sorted(br.committed_epochs()) == [1]
    br.discard_branch("r")
