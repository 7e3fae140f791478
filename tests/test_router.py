"""Multi-table routed ingest (streaming/router.py): demux one binlog into
per-table exactly-once sinks. Oracle: pure-pandas per-table LWW replay."""

import json

import pytest

from kafka_connect_converter_json_spark.config import ConverterConfig, IdentifierRule
from kafka_connect_converter_json_spark.functions.canonical_json import canonical_dumps
from kafka_connect_converter_json_spark.streaming.router import (
    read_unroutable,
    route_ingest,
    table_key_columns,
)

N = 300


def _cfg() -> ConverterConfig:
    return ConverterConfig(
        payload_field_name="payload",
        schema_names=("Code", "Users"),
        keys={
            "Code": {"meta.repo": "repo", "meta.path": "path"},
            "Users": {"user.id": "uid"},
        },
        identifiers=(
            IdentifierRule("Code", ("table",), "code"),
            IdentifierRule("Users", ("table",), "users"),
        ),
        uppercase=False,
        allow_non_indexed=True,  # the two tables have different key sets
    )


def _envelope(i: int, ghosts: frozenset[int]) -> tuple[str, str]:
    """Deterministic mixed-table event i -> (op, envelope json)."""
    if i in ghosts:
        return "u", json.dumps({"table": "ghost", "x": i})
    if i % 2 == 0:  # Code table
        op = "d" if i % 20 == 18 else "u"
        env = {
            "table": "code",
            "meta": {"repo": f"r{(i // 2) % 5}", "path": f"p{(i // 3) % 7}"},
            "commit": {"id": f"c{i}"},
            "content": f"body-{i}",
        }
    else:  # Users table
        op = "d" if i % 21 == 13 else "u"
        uid = (i // 2) % 11
        env = {"table": "users", "user": {"id": str(uid)}, "email": f"u{uid}+{i}@x.io"}
    return op, json.dumps(env)


def _mk_events(spark, n: int = N, ghosts: frozenset[int] = frozenset()):
    rows = [(i, *_envelope(i, ghosts)) for i in range(n)]
    return spark.createDataFrame(rows, "lsn long, op string, value_json string")


def _oracle(n: int, table_tag: str, key_paths: list[list[str]]):
    """Pandas LWW replay for one table: {key_tuple: (lsn, payload)}."""
    state: dict[tuple, tuple] = {}
    for i in range(n):
        op, vj = _envelope(i, frozenset())
        env = json.loads(vj)
        if env.get("table") != table_tag:
            continue
        key = tuple(
            env[p[0]][p[1]] if len(p) == 2 else env[p[0]] for p in key_paths
        )
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = (i, canonical_dumps(env))
    return state


def _sink_state(sink, key_cols: list[str]):
    rows = sink.read().select(*key_cols, "lsn", "payload").collect()
    return {tuple(r[k] for k in key_cols): (r["lsn"], r["payload"]) for r in rows}


CODE_ORACLE = lambda: _oracle(N, "code", [["meta", "repo"], ["meta", "path"]])  # noqa: E731
USERS_ORACLE = lambda: _oracle(N, "users", [["user", "id"]])  # noqa: E731


def test_route_final_state_matches_per_table_oracle(spark, tmp_path):
    sinks = route_ingest(
        spark, _mk_events(spark), str(tmp_path / "t"), N, _cfg(),
        n_epochs=3, num_buckets=4,
    )
    kc = table_key_columns(_cfg())
    # key_cols sorted: Code -> [path, repo]; oracle keys are (repo, path)
    code = _sink_state(sinks["Code"], ["repo", "path"])
    users = _sink_state(sinks["Users"], ["uid"])
    assert code == CODE_ORACLE()
    assert users == {(k[0],): v for k, v in USERS_ORACLE().items()}
    assert kc == {"Code": ["path", "repo"], "Users": ["uid"]}


def test_redelivery_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    ev = _mk_events(spark)
    s1 = route_ingest(spark, ev, root, N, _cfg(), n_epochs=3, num_buckets=4)
    before = _sink_state(s1["Code"], ["repo", "path"])
    s2 = route_ingest(spark, ev, root, N, _cfg(), n_epochs=3, num_buckets=4)
    assert _sink_state(s2["Code"], ["repo", "path"]) == before == CODE_ORACLE()
    for t in ("Code", "Users"):
        assert sorted(s2[t].committed_epochs()) == [0, 1, 2]


def test_crash_mid_epoch_resumes_per_table(spark, tmp_path):
    """Crash after 3 table-merges = mid-epoch-1 (epoch 0 fully committed,
    epoch 1 committed for Code only); resume must redo only Users@1 on."""
    root = str(tmp_path / "t")
    ev = _mk_events(spark)
    with pytest.raises(RuntimeError, match="injected crash"):
        route_ingest(spark, ev, root, N, _cfg(), n_epochs=3, num_buckets=4, fail_after=3)
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    assert sorted(
        BucketedMergeSink.open(spark, f"{root}/Code").committed_epochs()
    ) == [0, 1]
    assert sorted(
        BucketedMergeSink.open(spark, f"{root}/Users").committed_epochs()
    ) == [0]
    sinks = route_ingest(spark, ev, root, N, _cfg(), n_epochs=3, num_buckets=4)
    assert _sink_state(sinks["Code"], ["repo", "path"]) == CODE_ORACLE()
    assert _sink_state(sinks["Users"], ["uid"]) == {
        (k[0],): v for k, v in USERS_ORACLE().items()
    }


def test_unknown_error_raises(spark, tmp_path):
    ev = _mk_events(spark, ghosts=frozenset({50}))
    with pytest.raises(ValueError, match="unroutable event at lsn=50"):
        route_ingest(spark, ev, str(tmp_path / "t"), N, _cfg(), n_epochs=2, num_buckets=4)


def test_unknown_drop_and_quarantine(spark, tmp_path):
    ghosts = frozenset({50, 51, 250})
    ev = _mk_events(spark, ghosts=ghosts)
    dropped = route_ingest(
        spark, ev, str(tmp_path / "d"), N, _cfg(),
        n_epochs=2, num_buckets=4, unknown="drop",
    )
    qroot = str(tmp_path / "q")
    quarantined = route_ingest(
        spark, ev, qroot, N, _cfg(), n_epochs=2, num_buckets=4, unknown="quarantine",
    )
    # ghost keys never reach either table; both policies agree on state
    for key_cols, t in ((["repo", "path"], "Code"), (["uid"], "Users")):
        assert _sink_state(dropped[t], key_cols) == _sink_state(quarantined[t], key_cols)
    q = read_unroutable(spark, qroot)
    got = sorted(r["lsn"] for r in q.collect())
    assert got == sorted(ghosts)
    assert read_unroutable(spark, str(tmp_path / "d")) is None


def test_route_audited_matches_plain(spark, tmp_path):
    from kafka_connect_converter_json_spark.streaming.ingest import (
        IngestAuditError,
    )

    audited = route_ingest(
        spark, _mk_events(spark), str(tmp_path / "a"), N, _cfg(),
        n_epochs=3, num_buckets=4,
        audit={"min_rows": 1, "not_null": ["payload"],
               "max_delete_fraction": 0.5},
    )
    plain = route_ingest(
        spark, _mk_events(spark), str(tmp_path / "p"), N, _cfg(),
        n_epochs=3, num_buckets=4,
    )
    for t in ("Code", "Users"):
        kc = ["repo", "path"] if t == "Code" else ["uid"]
        assert _sink_state(audited[t], kc) == _sink_state(plain[t], kc)
        assert audited[t].staged_epochs() == set()
        assert sorted(audited[t].committed_epochs()) == [0, 1, 2]

    # failing gate: the error names the table, the failing epoch stays
    # staged (keep policy), earlier tables of the epoch keep commits
    root = str(tmp_path / "f")
    with pytest.raises(IngestAuditError) as ei:
        route_ingest(
            spark, _mk_events(spark), root, N, _cfg(),
            n_epochs=3, num_buckets=4, audit={"max_rows": 3},
        )
    assert ei.value.table in ("Code", "Users") and ei.value.epoch == 0
    assert ei.value.table in str(ei.value)
    # resume with a satisfiable gate converges to the plain state
    done = route_ingest(
        spark, _mk_events(spark), root, N, _cfg(),
        n_epochs=3, num_buckets=4, audit={"min_rows": 1},
    )
    for t in ("Code", "Users"):
        kc = ["repo", "path"] if t == "Code" else ["uid"]
        assert _sink_state(done[t], kc) == _sink_state(plain[t], kc)

    with pytest.raises(ValueError, match="keep.*discard"):
        route_ingest(
            spark, _mk_events(spark), str(tmp_path / "v"), N, _cfg(),
            n_epochs=2, num_buckets=4, audit={"min_rows": 1},
            audit_on_fail="zap",
        )
