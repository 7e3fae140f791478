"""Exactly-once idempotent MERGE sink — SURVEY.md §2.2 N5/N6/N8.

Semantics of an Iceberg ``MERGE INTO tgt USING src ON keys WHEN MATCHED
AND op='d' THEN DELETE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
INSERT``, with idempotent snapshot commits keyed by epoch. The Iceberg
runtime jar is not available in this sandbox (SURVEY.md §7), so the sink
is a thin interface with a **bucketed-parquet + atomic-manifest**
implementation that reproduces the two properties that matter:

1. **Copy-on-write granularity**: the table is hash-bucketed on the merge
   keys (``pmod(xxhash64(keys), num_buckets)``); a MERGE rewrites only the
   buckets containing batch keys. At 100 TB with thousands of buckets this
   bounds the per-epoch rewrite to O(touched data), not O(table) — the
   same file-level pruning a real Iceberg MERGE gets from its partition
   spec + bloom filters.

2. **Exactly-once commits** (N6): the manifest (``_manifest.json``) is the
   single atomic commit point (``os.replace``). It records committed
   epochs; re-delivering a committed epoch is a no-op (idempotent —
   the ``foreachBatch(batch_id)`` dedup pattern). A crash between data
   write and manifest swap leaves orphan files but never a partially
   visible epoch.

Ordering contract: epochs are applied in LSN order (a binlog/WAL tail is
ordered); within an epoch LWW by ``order_col`` arbitrates, and the stored
``order_col`` arbitrates across epochs, so replaying any suffix of epochs
is convergent.

Lineage (N8): per (epoch, kafka_partition) rows — counts, offset ranges,
max LSN — written under ``lineage/`` *before* the manifest swap, so a
committed epoch always has its lineage (generalizes getCacheSize()
introspection, JC:503-505).

Tombstone handling generalizes the reference's null-value passthrough
(JC:316-318,371-373) into MERGE DELETE.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lww_latest

MANIFEST = "_manifest.json"


class BucketedMergeSink:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: list[str],
        order_col: str = "lsn",
        op_col: str = "op",
        delete_op: str = "d",
        num_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.root = root
        self.keys = keys
        self.order_col = order_col
        self.op_col = op_col
        self.delete_op = delete_op
        self.num_buckets = num_buckets
        os.makedirs(root, exist_ok=True)
        self._manifest = self._load_manifest()

    # ----- manifest ------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {
            "keys": self.keys,
            "order_col": self.order_col,
            "num_buckets": self.num_buckets,
            "epochs": [],
            "buckets": {},
        }

    def _commit_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic commit point
        self._manifest = manifest

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self._manifest["epochs"]}

    # ----- merge ---------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(self.num_buckets))

    def merge(self, batch: DataFrame, epoch: int, lineage_cols: tuple[str, ...] = ()) -> dict:
        """Apply one epoch's CDC events. Idempotent on ``epoch``.

        ``batch`` columns: keys + order_col + op_col + payload (+ optional
        kafka_partition/kafka_offset for lineage).
        """
        if epoch in self.committed_epochs():
            return {"epoch": epoch, "skipped": True}

        payload_cols = [
            c
            for c in batch.columns
            if c not in self.keys
            and c not in (self.order_col, self.op_col, "kafka_partition", "kafka_offset")
        ]

        # lineage BEFORE commit (visible only once manifest flips)
        lineage_stats = self._write_lineage(batch, epoch)

        # collapse the batch: one winner per key (map-side combine + one shuffle)
        collapsed = lww_latest(
            batch.select(*self.keys, self.order_col, self.op_col, *payload_cols),
            self.keys,
            self.order_col,
            payload_cols + [self.op_col],
        ).withColumn("_bucket", self._bucket_expr())

        touched = sorted(
            r["_bucket"] for r in collapsed.select("_bucket").distinct().collect()
        )
        buckets_map = dict(self._manifest["buckets"])
        current_paths = [
            os.path.join(self.root, buckets_map[str(b)]) for b in touched if str(b) in buckets_map
        ]

        sides = [collapsed]
        if current_paths:
            cur = (
                self.spark.read.parquet(*current_paths)
                .withColumn(self.op_col, F.lit("u"))
                .withColumn("_bucket", self._bucket_expr())
            )
            sides.append(cur.select(*collapsed.columns))

        unioned = sides[0] if len(sides) == 1 else sides[0].unionByName(sides[1])
        merged = (
            lww_latest(unioned, self.keys + ["_bucket"], self.order_col, payload_cols + [self.op_col])
            .filter(F.col(self.op_col) != self.delete_op)
            .drop(self.op_col)
        )

        epoch_rel = f"data/e{epoch:06d}"
        epoch_dir = os.path.join(self.root, epoch_rel)
        if os.path.exists(epoch_dir):  # orphan from a crashed attempt
            shutil.rmtree(epoch_dir)
        (
            merged.repartition(max(1, len(touched)), "_bucket")
            .write.partitionBy("_bucket")
            .parquet(epoch_dir)
        )

        # buckets that still exist after the merge (all-deleted buckets vanish)
        written = {
            int(d.split("=", 1)[1]): f"{epoch_rel}/{d}"
            for d in os.listdir(epoch_dir)
            if d.startswith("_bucket=")
        }
        for b in touched:
            if b in written:
                buckets_map[str(b)] = written[b]
            else:
                buckets_map.pop(str(b), None)

        stats = {
            "epoch": epoch,
            "touched_buckets": len(touched),
            "lineage": lineage_stats,
        }
        manifest = dict(self._manifest)
        manifest["buckets"] = buckets_map
        manifest["epochs"] = manifest["epochs"] + [stats]
        self._commit_manifest(manifest)
        return stats

    def _write_lineage(self, batch: DataFrame, epoch: int) -> list[dict]:
        if "kafka_partition" not in batch.columns:
            return []
        lin = (
            batch.groupBy("kafka_partition")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("kafka_offset").alias("min_offset"),
                F.max("kafka_offset").alias("max_offset"),
                F.max(self.order_col).alias("max_lsn"),
            )
            .withColumn("epoch", F.lit(epoch))
        )
        lin_dir = os.path.join(self.root, "lineage", f"e{epoch:06d}")
        if os.path.exists(lin_dir):
            shutil.rmtree(lin_dir)
        lin.coalesce(1).write.parquet(lin_dir)
        return [r.asDict() for r in lin.collect()]

    # ----- read ----------------------------------------------------------

    def read(self) -> DataFrame:
        paths = [os.path.join(self.root, rel) for rel in self._manifest["buckets"].values()]
        if not paths:
            raise ValueError("sink is empty — no committed buckets")
        return self.spark.read.parquet(*paths)

    def read_lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "lineage", "*"))
