"""Schema evolution end-to-end (SURVEY.md N2, north-star contract):
envelopes gain a new nullable field mid-stream; the registry widens
additively per epoch; pre-evolution rows read the new target column as
null; replay parity holds including across crash/resume."""

import json

import pandas as pd
import pytest

from kafka_connect_converter_json_spark.config import ConverterConfig, IdentifierRule
from kafka_connect_converter_json_spark.plans.registry import SchemaRegistry
from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import ingest

N = 2000
EVOLVE_AT = 1000


def _config() -> ConverterConfig:
    return ConverterConfig(
        payload_field_name="payload",
        schema_names=("SourceChange",),
        keys={
            "SourceChange": {
                "meta.repo": "repo",
                "meta.path": "path",
                "commit.id": "commit",
                "lang": "lang",
                "content": "content",
                "branch": "branch",  # appears in envelopes at lsn >= EVOLVE_AT
            }
        },
        identifiers=(IdentifierRule("SourceChange", ("meta", "repo"), "true"),),
        uppercase=False,
    )


@pytest.fixture(scope="module")
def events(spark):
    return gen_events(
        spark, N, n_repos=15, paths_per_repo=20, seed=9, evolve_at=EVOLVE_AT
    ).cache()


def _oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    state = {}
    for row in events_pdf.sort_values("lsn").itertuples():
        key = (row.repo, row.path)
        if row.op == "d":
            state.pop(key, None)
        else:
            env = json.loads(row.value_json)
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "content": env["content"],
                "branch": env.get("branch"),
                "lsn": row.lsn,
            }
    return (
        pd.DataFrame(list(state.values()))
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    return [
        (r.repo, r.path, r.content, r.branch if isinstance(r.branch, str) else None, r.lsn)
        for r in pdf.itertuples()
    ]


def test_evolution_replay_parity_and_registry(spark, events, tmp_path):
    registry = SchemaRegistry()
    sink = ingest(
        spark, events, str(tmp_path / "tbl"), N, n_epochs=4,
        config=_config(), registry=registry, num_buckets=8,
    )
    got = sink.read().select("repo", "path", "content", "branch", "lsn").toPandas()
    exp = _oracle(events.select("lsn", "op", "repo", "path", "value_json").toPandas())
    assert _normalize(got) == _normalize(exp)
    # the registry actually widened (branch observed mid-replay)
    assert registry.evolutions >= 1
    env = registry.get("SourceChange")
    assert "branch" in env.fieldNames()
    # winners predating evolution carry null branch; later ones a value
    vals = got["branch"]
    assert vals.isna().any() and vals.notna().any()


def test_evolution_crash_resume(spark, events, tmp_path):
    root = str(tmp_path / "tbl_resume")
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest(
            spark, events, root, N, n_epochs=4, config=_config(),
            num_buckets=8, fail_after_epochs=1,  # crash BEFORE evolution epoch
        )
    # fresh registry on resume (driver restart): must re-widen and converge
    sink = ingest(spark, events, root, N, n_epochs=4, config=_config(), num_buckets=8)
    got = sink.read().select("repo", "path", "content", "branch", "lsn").toPandas()
    exp = _oracle(events.select("lsn", "op", "repo", "path", "value_json").toPandas())
    assert _normalize(got) == _normalize(exp)


def test_registry_snapshot_restored_after_crash(spark, tmp_path):
    """Crash AFTER the epoch that observed a field which later epochs'
    envelopes no longer carry: the resume must restore the widened schema
    from the sink manifest (N2+N7), not re-infer from the remaining
    epochs — and converge byte-identically with an uninterrupted run."""
    from pyspark.sql import functions as F

    base = gen_events(spark, N, n_repos=15, paths_per_repo=20, seed=13)
    # 'branch' exists ONLY in epoch-1 envelopes (lsn 500..999 of 4x500)
    ev = base.withColumn(
        "value_json",
        F.when(
            (F.col("lsn") >= 500) & (F.col("lsn") < 1000) & F.col("value_json").isNotNull(),
            F.regexp_replace("value_json", r"^\{", '{"branch": "b1", '),
        ).otherwise(F.col("value_json")),
    ).cache()

    root = str(tmp_path / "tbl_snap")
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest(spark, ev, root, N, n_epochs=4, config=_config(), num_buckets=8,
               fail_after_epochs=2)  # epochs 0,1 committed; crash before 2

    fresh = SchemaRegistry()  # driver restart: empty registry
    sink = ingest(spark, ev, root, N, n_epochs=4, config=_config(),
                  registry=fresh, num_buckets=8)
    # restored from the manifest even though epochs 2/3 never carry it
    assert "branch" in fresh.get("SourceChange").fieldNames()

    # byte-identical with an uninterrupted run
    uroot = str(tmp_path / "tbl_uninterrupted")
    usink = ingest(spark, ev, uroot, N, n_epochs=4, config=_config(), num_buckets=8)
    cols = ["repo", "path", "content", "branch", "lsn"]
    got = sorted(map(tuple, sink.read().select(*cols).collect()))
    want = sorted(map(tuple, usink.read().select(*cols).collect()))
    assert got == want
    # epoch-1 winners keep their branch value through the resume
    assert any(r[3] == "b1" for r in got)
