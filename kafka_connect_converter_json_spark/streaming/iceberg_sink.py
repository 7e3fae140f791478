"""Optional real-Iceberg MERGE sink, gated on the iceberg-spark runtime jar.

``BucketedMergeSink`` (sink.py) reproduces the event-store semantics the
reference feeds (JsonConverter.java:96-99,184-186) — COW bucket pruning,
exactly-once epochs, time travel, vacuum, optimistic concurrency — on
plain parquet + a JSON manifest, because this sandbox has no Iceberg
jar. This module is the documented swap-in for a real cluster
(``--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>``
plus a catalog config): same ``merge(batch, epoch)`` /
``committed_epochs()`` / ``read()`` surface, backed by Iceberg's own
MERGE INTO, snapshots, and time travel.

Exactly-once story (and its precise boundary): each epoch runs one
atomic ``MERGE INTO`` guarded by the LWW order column, then appends the
epoch id to a one-column ledger table ``{table}_epochs``. A crash
between the two commits re-delivers that epoch on restart. Re-merging
epoch e is harmless under ordered replay — Structured Streaming's
foreachBatch re-delivers only the LAST in-flight batch, so no later
epoch has touched the table yet, and the merge is idempotent given
that precondition: upserts re-apply behind the ``s.order >= t.order``
guard, deletes of absent rows no-op, and the delete-then-reinsert
anomaly would need a LATER committed epoch, which cannot exist. (A
single-commit variant — epoch id in the snapshot summary via Iceberg's
CommitMetadata — removes even that window but needs a JVM callback;
the ledger form is what plain PySpark can express.)

All SQL builders are pure functions unit-tested without the jar
(tests/test_jvm_gated.py); execution tests are skipif-gated on
``iceberg_available``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_AVAIL: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime is on the JVM classpath."""
    key = id(spark)
    if key not in _AVAIL:
        try:
            spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _AVAIL[key] = True
        except Exception:  # noqa: BLE001
            _AVAIL[key] = False
    return _AVAIL[key]


def merge_into_sql(
    table: str,
    updates_view: str,
    keys: list[str],
    payload_cols: list[str],
    order_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
) -> str:
    """One-epoch CDC MERGE. Source must be pre-reduced to one row per
    key (operators.dedup.lww_latest — same contract as
    BucketedMergeSink). The ``order`` guard on BOTH the update and the
    delete branch makes re-merging a stale or already-applied epoch a
    no-op for matched rows — without it on DELETE, replaying an old
    epoch whose per-key winner is a delete would remove a newer live
    row (ADVICE r3)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(
        f"t.{c} = s.{c}" for c in [*payload_cols, order_col]
    )
    ins_cols = ", ".join([*keys, *payload_cols, order_col])
    ins_vals = ", ".join(f"s.{c}" for c in [*keys, *payload_cols, order_col])
    return (
        f"MERGE INTO {table} t USING {updates_view} s ON {on} "
        f"WHEN MATCHED AND s.{op_col} = '{delete_op}' "
        f"AND s.{order_col} >= t.{order_col} THEN DELETE "
        f"WHEN MATCHED AND s.{order_col} >= t.{order_col} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED AND s.{op_col} <> '{delete_op}' THEN "
        f"INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def create_table_sql(
    table: str, keys: list[str], payload_cols: list[str],
    order_col: str = "lsn", num_buckets: int = 64,
    col_types: dict[str, str] | None = None,
) -> str:
    """Target DDL: bucket-partitioned on the first key (the same layout
    BucketedMergeSink uses — co-locates every version of a key for
    merge-on-read locality and scan pruning)."""
    t = col_types or {}
    cols = ", ".join(
        f"{c} {t.get(c, 'STRING')}"
        for c in [*keys, *payload_cols]
    ) + f", {order_col} {t.get(order_col, 'BIGINT')}"
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg "
        f"PARTITIONED BY (bucket({num_buckets}, {keys[0]}))"
    )


class IcebergMergeSink:
    """Drop-in for BucketedMergeSink on a cluster with Iceberg present.

    ``table`` is a catalog-qualified name (e.g. ``lake.cdc.files``).
    The epoch ledger lives at ``{table}_epochs``.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        keys: list[str],
        order_col: str = "lsn",
        op_col: str = "op",
        delete_op: str = "d",
        num_buckets: int = 64,
    ) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark runtime is not on the classpath; launch with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>:<ver> "
                "and a spark.sql.catalog.<name> config, or use "
                "streaming.sink.BucketedMergeSink (the jar-free stand-in)"
            )
        self.spark = spark
        self.table = table
        self.keys = keys
        self.order_col = order_col
        self.op_col = op_col
        self.delete_op = delete_op
        self.num_buckets = num_buckets
        self.ledger = f"{table}_epochs"
        spark.sql(f"CREATE TABLE IF NOT EXISTS {self.ledger} (epoch BIGINT) USING iceberg")

    def committed_epochs(self) -> set[int]:
        return {r.epoch for r in self.spark.sql(f"SELECT epoch FROM {self.ledger}").collect()}

    def merge(self, batch: DataFrame, epoch: int) -> dict:
        """Apply one epoch. Idempotent on ``epoch`` (see module docstring
        for the exactly-once boundary)."""
        if epoch in self.committed_epochs():
            return {"epoch": epoch, "skipped": True}
        from ..operators.dedup import lww_latest

        payload_cols = [
            c for c in batch.columns
            if c not in self.keys and c not in (self.order_col, self.op_col)
        ]
        reduced = lww_latest(batch, self.keys, self.order_col)
        view = f"_cdc_updates_{epoch}"
        reduced.createOrReplaceTempView(view)
        self.spark.sql(create_table_sql(
            self.table, self.keys, payload_cols, self.order_col, self.num_buckets,
            col_types={c: dict(zip(batch.schema.names, (f.dataType.simpleString() for f in batch.schema.fields))).get(c, "string").upper() for c in [*self.keys, *payload_cols, self.order_col]},
        ))
        self.spark.sql(merge_into_sql(
            self.table, view, self.keys, payload_cols,
            self.order_col, self.op_col, self.delete_op,
        ))
        self.spark.createDataFrame([(epoch,)], "epoch bigint").writeTo(self.ledger).append()
        return {"epoch": epoch, "skipped": False}

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    def read_as_of(self, snapshot_id: int) -> DataFrame:
        return self.spark.read.option("snapshot-id", snapshot_id).table(self.table)

    def read_lineage(self) -> DataFrame:
        """Iceberg's own per-commit record: the snapshots metadata table."""
        return self.spark.sql(
            f"SELECT committed_at, snapshot_id, operation, summary FROM {self.table}.snapshots"
        )
