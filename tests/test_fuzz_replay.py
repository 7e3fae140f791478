"""Seeded randomized differential replay (fuzz) — SURVEY.md §5.2.

The structured e2e tests replay ``gen_events`` streams, whose shape is
benign by construction (dense unique LSNs, ASCII keys, every epoch
non-empty). This fuzz generates adversarial streams the generator
cannot produce — sparse shuffled LSNs (empty epochs), delete→re-insert
cycles, updates landing after a delete (LWW resurrection), unicode /
empty / multiline content, mid-stream additive schema evolution with
per-row optional fields — and runs each through the FULL ingest
(random epoch count, bucket count, sink mode, and a mid-replay
injected crash + resume) against the same independent pandas LWW
reduction the e2e suite uses. Any divergence in the sha256 state hash
fails. Seeds are fixed, so failures reproduce exactly.
"""

import hashlib
import json
import random

import pandas as pd
import pytest
from pyspark.sql import types as T

from kafka_connect_converter_json_spark.streaming.ingest import ingest

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("value_json", T.StringType(), True),
        T.StructField("key_json", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("kafka_partition", T.IntegerType(), False),
        T.StructField("kafka_offset", T.LongType(), False),
    ]
)

LANGS = ["py", "rs", "go", "java", "ts"]

CONTENT_SHAPES = [
    lambda rng: "",  # empty file
    lambda rng: "x = %d\n" % rng.randrange(10**9),
    lambda rng: ("def f_%x():\n    pass\n" % rng.getrandbits(32)) * rng.randint(1, 40),
    lambda rng: "λ→∑ 中文テスト 🚀 %d\n\ttab\"quote\\back\n" % rng.randrange(999),
    lambda rng: "\n".join("line %d" % i for i in range(rng.randint(1, 30))) + "\n",
]


def _gen_stream(seed: int):
    """Deterministic adversarial stream + the case's replay parameters."""
    rng = random.Random(1000 + seed)
    repos = ["repo-%02d" % i for i in range(rng.randint(2, 5))] + ["répo-ü"]
    keys = [
        (r, "src dir/fïle_%03d.%s" % (i, rng.choice(LANGS)))
        for r in repos
        for i in range(rng.randint(2, 8))
    ]
    n_events = rng.randint(500, 1000)
    # sparse LSNs over a 1-3x span: some epoch windows may be EMPTY
    span = n_events * rng.randint(1, 3)
    lsns = rng.sample(range(span), n_events)
    evolve_at = rng.randrange(span) if rng.random() < 0.7 else None

    rows = []
    for lsn in lsns:
        repo, path = rng.choice(keys)
        op = "d" if rng.random() < 0.15 else rng.choice(["c", "u"])
        key_json = json.dumps({"repo": repo, "path": path})
        if op == "d":
            value_json = None
        else:
            env = {
                "meta": {"repo": repo, "path": path},
                "commit": {"id": "%016x" % rng.getrandbits(64), "lsn": lsn},
                "lang": path.rsplit(".", 1)[1],
                "tags": [path.rsplit(".", 1)[1], "code"],
                "content": rng.choice(CONTENT_SHAPES)(rng),
                "op": op,
            }
            # additive schema evolution mid-stream, optional PER ROW:
            # the registry must widen from sampled envelopes and rows
            # missing the field must read back as null without error
            if evolve_at is not None and lsn >= evolve_at and rng.random() < 0.6:
                env["branch"] = "b-%d" % rng.randrange(5)
                env["extra"] = {"n": rng.randrange(100), "tags2": ["a", "b"]}
            value_json = json.dumps(env, ensure_ascii=False)
        rows.append(
            (lsn, op, "SourceChange", value_json, key_json, repo, path, 0, lsn)
        )

    params = {
        "span": span,
        "n_epochs": rng.randint(1, 6),
        "num_buckets": rng.choice([1, 4, 8]),
        "merge_mode": "mor" if seed % 2 == 0 else "cow",
    }
    params["fail_after"] = (
        rng.randint(1, params["n_epochs"] - 1) if params["n_epochs"] >= 3 else None
    )
    return rows, params


def _oracle(rows) -> pd.DataFrame:
    """Independent LWW reduction over the raw python rows (no engine code)."""
    state: dict[tuple, dict] = {}
    for lsn, op, _, value_json, _, repo, path, _, _ in sorted(rows):
        key = (repo, path)
        if op == "d":
            state.pop(key, None)
        else:
            env = json.loads(value_json)
            state[key] = {
                "repo": env["meta"]["repo"],
                "path": env["meta"]["path"],
                "commit": env["commit"]["id"],
                "lang": env["lang"],
                "content": env["content"],
                "lsn": lsn,
            }
    cols = ["repo", "path", "commit", "lang", "content", "lsn"]
    out = pd.DataFrame(list(state.values()), columns=cols)
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def _state_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    h = hashlib.sha256()
    for row in pdf.itertuples():
        h.update(
            "|".join(
                [
                    row.repo,
                    row.path,
                    row.commit,
                    row.lang,
                    hashlib.sha256(row.content.encode()).hexdigest(),
                    str(row.lsn),
                ]
            ).encode()
        )
    return h.hexdigest()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_replay_matches_oracle(spark, tmp_path, seed):
    rows, p = _gen_stream(seed)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    root = str(tmp_path / f"fuzz{seed}")
    kw = dict(
        n_epochs=p["n_epochs"],
        num_buckets=p["num_buckets"],
        merge_mode=p["merge_mode"],
    )
    if p["fail_after"] is not None:
        with pytest.raises(RuntimeError, match="injected crash"):
            ingest(spark, events, root, p["span"], fail_after_epochs=p["fail_after"], **kw)
    sink = ingest(spark, events, root, p["span"], **kw)
    got = sink.read().select("repo", "path", "commit", "lang", "content", "lsn").toPandas()
    assert _state_hash(got) == _state_hash(_oracle(rows))
    # exactly-once: every epoch committed once, no duplicates
    assert sorted(e["epoch"] for e in sink._manifest["epochs"]) == list(
        range(p["n_epochs"])
    )


def test_fuzz_all_keys_deleted_yields_empty_state(spark, tmp_path):
    """Every key inserted then deleted — final table must be EMPTY and
    still readable (the all-tombstone edge no structured test hits)."""
    rows = []
    for i in range(6):
        repo, path = "repo-z", "f_%d.py" % i
        env = {
            "meta": {"repo": repo, "path": path},
            "commit": {"id": "%016x" % i, "lsn": 2 * i},
            "lang": "py",
            "tags": ["py", "code"],
            "content": "pass\n",
            "op": "c",
        }
        key_json = json.dumps({"repo": repo, "path": path})
        rows.append((2 * i, "c", "SourceChange", json.dumps(env), key_json, repo, path, 0, 2 * i))
        rows.append((2 * i + 1, "d", "SourceChange", None, key_json, repo, path, 0, 2 * i + 1))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    sink = ingest(
        spark, events, str(tmp_path / "allz"), 12, n_epochs=2, num_buckets=4,
        merge_mode="mor",
    )
    assert sink.read().count() == 0
    oracle = _oracle(rows)
    assert len(oracle) == 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_restore_roundtrip(spark, tmp_path, seed):
    """Randomized rollback differential: ingest the full adversarial
    stream, apply a random maintenance prefix (compact/rebucket — the
    operations whose guards restore must compose with), restore to a
    random epoch, and check the state against the oracle reduced over
    ONLY that epoch window's LSNs; then replay the tail LSN range as
    fresh epochs and check the state reconverges to the FULL oracle —
    rollback followed by re-delivery loses and resurrects nothing."""
    rows, p = _gen_stream(seed)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    root = str(tmp_path / f"fzr{seed}")
    kw = dict(
        n_epochs=p["n_epochs"],
        num_buckets=p["num_buckets"],
        merge_mode=p["merge_mode"],
    )
    sink = ingest(spark, events, root, p["span"], **kw)

    rng = random.Random(7000 + seed)
    if p["merge_mode"] == "mor" and rng.random() < 0.5:
        sink.compact()
    if rng.random() < 0.4:
        sink.rebucket(rng.choice([2, 6]))
    e = rng.randrange(p["n_epochs"])
    sink.restore(e, as_epoch=100)
    assert sink.num_buckets == p["num_buckets"]  # snapshot's own count

    per_epoch = max(1, -(-p["span"] // p["n_epochs"]))
    cut = (e + 1) * per_epoch
    partial = [r for r in rows if r[0] < cut]
    cols = ["repo", "path", "commit", "lang", "content", "lsn"]
    got = sink.read().select(*cols).toPandas()
    assert _state_hash(got) == _state_hash(_oracle(partial))

    sink2 = ingest(
        spark, events, root, p["span"], n_epochs=2,
        num_buckets=sink.num_buckets, merge_mode=p["merge_mode"],
        epoch_offset=101, lsn_lo=cut,
    )
    got2 = sink2.read().select(*cols).toPandas()
    assert _state_hash(got2) == _state_hash(_oracle(rows))


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_audited_ingest_matches_oracle(spark, tmp_path, seed):
    """ingest(audit=...) with satisfiable expectations must be a state
    no-op vs the oracle on adversarial streams: the per-epoch WAP gate
    (stage -> audit -> publish) composes with sparse/EMPTY epochs,
    injected crashes, and both sink modes without perturbing LWW state.
    (seed 0 = mor, seed 1 = cow; empty staged epochs exercise the
    metadata-only publish path.)"""
    rows, p = _gen_stream(seed)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    root = str(tmp_path / f"fza{seed}")
    kw = dict(
        n_epochs=p["n_epochs"],
        num_buckets=p["num_buckets"],
        merge_mode=p["merge_mode"],
        audit={
            "min_rows": 0,
            "max_delete_fraction": 1.0,
            "expect": {"lsn_nonneg": "lsn >= 0"},
        },
    )
    if p["fail_after"] is not None:
        with pytest.raises(RuntimeError, match="injected crash"):
            ingest(
                spark, events, root, p["span"],
                fail_after_epochs=p["fail_after"], **kw,
            )
    sink = ingest(spark, events, root, p["span"], **kw)
    got = sink.read().select(
        "repo", "path", "commit", "lang", "content", "lsn"
    ).toPandas()
    assert _state_hash(got) == _state_hash(_oracle(rows))
    assert sink.staged_epochs() == set()
    assert sorted(e["epoch"] for e in sink._manifest["epochs"]) == list(
        range(p["n_epochs"])
    )
