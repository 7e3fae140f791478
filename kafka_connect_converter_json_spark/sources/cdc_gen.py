"""Deterministic synthetic CDC event stream over the source-code table.

FIXTURES.md F1: one row per change event with
``(lsn, op, schema_name, value_json, kafka_partition, kafka_offset)``
over the north-star target shape F2 ``(repo, path, commit, lang,
content)``. Envelope shape exercises the reference's extraction paths
(nested structs JC:553-558, array head JC:561-562):

    {"meta": {"repo": r, "path": p},
     "commit": {"id": c, "lsn": n},
     "lang": l, "tags": [l, "code"],
     "content": "...", "op": "c|u|d"}

Determinism contract (BASELINE.md: "never use wall-clock-dependent data
generation"): every column is a pure function of the row id via
``xxhash64`` — identical output for any partition count or executor
count, which is what makes the N-vs-4N scaling benchmark and the
restart-from-checkpoint parity test meaningful.

Skew knob: repo popularity follows a power law (repo_idx =
floor(n_repos * u^skew) for uniform u), so repo-0 dominates — the
hot-repo fixture for salted dedup (N4).

Everything is JVM-side (``F.*`` expressions, whole-stage codegen); no
Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "go", "rs", "ts", "c", "rb", "scala"]


def _h(col, seed: int):
    """Deterministic per-row 64-bit hash stream, keyed by seed."""
    return F.xxhash64(col, F.lit(seed))


def gen_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    skew: float = 3.0,
    delete_pct: int = 5,
    seed: int = 42,
    num_partitions: int | None = None,
    start: int = 0,
    evolve_at: int | None = None,
) -> DataFrame:
    """Generate the F1 change-event stream; ``lsn`` is the total order.

    ``start`` slices the stream without generating the prefix: every
    column is a pure function of the row id, so
    ``gen_events(..., start=lo, n_events=hi-lo)`` equals
    ``gen_events(..., n_events=hi).filter(lsn >= lo)`` row-for-row —
    the binlog-tail property (an epoch reads only its own range).
    """
    end = start + n_events
    rng = (
        spark.range(start, end, 1, num_partitions)
        if num_partitions
        else spark.range(start, end)
    )
    id_ = F.col("id")

    u = (F.pmod(_h(id_, seed), F.lit(1_000_000)).cast("double") / 1_000_000.0)
    repo_idx = F.least(
        F.lit(n_repos - 1), F.floor(F.lit(float(n_repos)) * F.pow(u, F.lit(skew)))
    ).cast("long")
    path_idx = F.pmod(_h(id_, seed + 1), F.lit(paths_per_repo))
    opv = F.pmod(_h(id_, seed + 2), F.lit(100))
    op = (
        F.when(opv < delete_pct, F.lit("d"))
        .when(opv < 50, F.lit("u"))
        .otherwise(F.lit("c"))
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (F.pmod(path_idx, F.lit(len(LANGS))) + 1).cast("int")
    )
    repo = F.concat(F.lit("repo-"), F.lpad(repo_idx.cast("string"), 4, "0"))
    # path determined solely by path_idx so the key space is exactly
    # n_repos x paths_per_repo (controls the update:insert ratio of the
    # CDC replay — more events per key = more LWW work, the honest case)
    path = F.concat(
        F.lit("src/dir_"),
        F.lpad(F.pmod(path_idx, F.lit(37)).cast("string"), 2, "0"),
        F.lit("/file_"),
        F.lpad(path_idx.cast("string"), 5, "0"),
        F.lit("."),
        lang,
    )
    commit = F.lpad(F.hex(_h(id_, seed + 4)), 16, "0")
    # deterministic pseudo-source content; length varies 1..6 blocks
    block = F.concat(
        F.lit("def fn_"),
        F.lower(F.hex(_h(id_, seed + 5))),
        F.lit("(x):\n    return x * "),
        F.pmod(_h(id_, seed + 6), F.lit(1000)).cast("string"),
        F.lit("  # "),
        repo,
        F.lit(":"),
        path,
        F.lit("\n"),
    )
    content = F.repeat(block, (F.pmod(_h(id_, seed + 7), F.lit(6)) + 1).cast("int"))

    env_fields = [
        F.struct(repo.alias("repo"), path.alias("path")).alias("meta"),
        F.struct(commit.alias("id"), id_.alias("lsn")).alias("commit"),
        lang.alias("lang"),
        F.array(lang, F.lit("code")).alias("tags"),
        content.alias("content"),
        op.alias("op"),
    ]
    if evolve_at is not None:
        # additive schema evolution mid-stream (FIXTURES F1 + SURVEY N2):
        # events at lsn >= evolve_at carry a new nullable field — the
        # registry must widen, earlier rows read back as null
        env_fields.append(
            F.when(
                id_ >= evolve_at,
                F.concat(F.lit("branch-"), F.pmod(_h(id_, seed + 8), F.lit(5)).cast("string")),
            ).alias("branch")
        )
    envelope = F.to_json(F.struct(*env_fields))

    return rng.select(
        id_.alias("lsn"),
        op.alias("op"),
        F.lit("SourceChange").alias("schema_name"),
        F.when(op == "d", F.lit(None).cast("string")).otherwise(envelope).alias("value_json"),
        # tombstones still carry the key (CDC delete events are keyed)
        F.to_json(F.struct(repo.alias("repo"), path.alias("path"))).alias("key_json"),
        repo.alias("repo"),
        path.alias("path"),
        F.pmod(F.xxhash64(repo), F.lit(8)).cast("int").alias("kafka_partition"),
        id_.alias("kafka_offset"),
    )
