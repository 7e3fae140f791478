"""Snapshot bootstrap + binlog handoff (initial load for the CDC engine).

The reference converter only ever sees the change stream — key-only
tombstones and envelope records (JsonConverter.java:316-415) — so it
implicitly assumes the binlog reaches back to the beginning of time. Real
sources truncate their binlog: ingestion of an existing table must start
from a CONSISTENT SNAPSHOT taken at some ``snapshot_lsn`` and hand off to
the binlog tail from ``snapshot_lsn + 1`` (the Debezium
``snapshot.mode=initial`` / Flink-CDC hybrid-source pattern). This module
adds that engine-side phase in front of :func:`streaming.ingest.ingest`,
reusing the sink's manifest checkpoint so BOTH phases are resumable and
exactly-once.

Correctness contract (the classic snapshot-handoff races, each tested in
``tests/test_bootstrap.py`` against the full-replay state):

- **LWW safety under at-least-once tails.** Snapshot rows enter the sink
  as ``op='r'`` READ upserts carrying their true last-modified LSN when
  the snapshot provides an ``lsn`` column, else ``snapshot_lsn``. Either
  way a re-delivered tail event with ``lsn <= snapshot_lsn`` loses the
  sink's last-writer-wins reduce to the snapshot row, and a genuine new
  event (``lsn > snapshot_lsn``) beats it.
- **No resurrection of pre-snapshot deletes.** A key deleted before the
  snapshot is simply ABSENT from it; an old re-delivered insert for that
  key has no snapshot row to lose LWW against, so the tail is hard-cut to
  ``lsn > snapshot_lsn`` here rather than trusting LWW alone.
- **Resumable initial load.** The snapshot commits in ``snapshot_epochs``
  deterministic hash-chunks (``pmod(xxhash64(keys), chunks)`` — the same
  rule that buckets the sink), one manifest epoch per chunk, so a
  10^10-row initial load that dies mid-snapshot resumes from the last
  committed chunk; the tail phase resumes through the identical
  manifest-checkpoint mechanism ``ingest`` already has.

Scale shape: each snapshot chunk is a plain bucket-partitioned MERGE of
~|table|/chunks rows — no shuffle beyond the sink's own bucket
repartition, no driver materialization; the chunk filter is a pure
projection Catalyst pushes into the snapshot scan.

Deliberate non-feature: the snapshot phase completes BEFORE the tail
starts (Debezium's classic initial mode), not interleaved with it
(DBLog / Debezium incremental snapshots). Interleaving would let a
lower-LSN chunk row merge AFTER a higher-LSN delete — and this sink
drops delete history at COW merge / MOR compaction (by design: retained
tombstones are a per-key cost forever), so the late chunk row would
resurrect the key. Sequential phases make LWW sufficient; a 10^10-row
initial load is still chunk-resumable, which is the property that
matters at that scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ConverterConfig
from ..plans.registry import SchemaRegistry
from .ingest import ingest
from .sink import BucketedMergeSink

SNAPSHOT_OP = "r"  # Debezium READ op code


def bootstrap_ingest(
    spark: SparkSession,
    snapshot: DataFrame,
    events: DataFrame,
    sink_root: str,
    n_events: int,
    snapshot_lsn: int,
    n_epochs: int = 4,
    snapshot_epochs: int = 1,
    parse_mode: str = "native",
    config: ConverterConfig | None = None,
    registry: SchemaRegistry | None = None,
    num_buckets: int = 64,
    fail_after_chunks: int | None = None,
    fail_after_epochs: int | None = None,
    **sink_kwargs,
) -> BucketedMergeSink:
    """Initial-load bootstrap: commit ``snapshot`` (the table state at
    ``snapshot_lsn``) as epochs ``0 .. snapshot_epochs-1``, then tail
    ``events`` with ``lsn > snapshot_lsn`` as epochs ``snapshot_epochs ..
    snapshot_epochs + n_epochs - 1``.

    ``snapshot`` columns: the sink keys (repo, path) + payload columns
    (commit, lang, content, ...), optionally an ``lsn`` column with each
    row's true last-modified LSN (defaulted to ``snapshot_lsn`` when
    absent — see the module contract). ``events`` is the raw change
    stream in :func:`ingest`'s shape; it may include events at or below
    ``snapshot_lsn`` (an at-least-once tail) — they are filtered here.

    ``fail_after_chunks`` injects a crash after k snapshot chunks (the
    mid-initial-load resume test hook); ``fail_after_epochs`` passes
    through to the tail phase. Idempotent end-to-end: re-running skips
    every committed chunk and epoch via the sink manifest.
    """
    if snapshot_epochs < 1:
        raise ValueError(f"snapshot_epochs must be >= 1, got {snapshot_epochs}")
    sink = BucketedMergeSink(
        spark, sink_root, keys=["repo", "path"], order_col="lsn",
        num_buckets=num_buckets, **sink_kwargs,
    )

    snap = snapshot
    if "lsn" not in snap.columns:
        snap = snap.withColumn("lsn", F.lit(snapshot_lsn).cast("long"))
    snap = snap.withColumn("op", F.lit(SNAPSHOT_OP))

    # Deterministic chunking on the merge keys: partition-layout
    # independent, and every chunk filter is a pushed-down projection of
    # the same xxhash64 the sink buckets on.
    chunk_expr = F.pmod(
        F.xxhash64(*[F.col(k) for k in sink.keys]), F.lit(snapshot_epochs)
    )
    done_chunks = 0
    committed = sink.committed_epochs()
    for chunk in range(snapshot_epochs):
        if chunk not in committed:
            sink.merge(
                snap.filter(chunk_expr == chunk),
                chunk,
                meta={
                    "bootstrap": {
                        "phase": "snapshot",
                        "chunk": chunk,
                        "of": snapshot_epochs,
                        "snapshot_lsn": snapshot_lsn,
                    }
                },
            )
            done_chunks += 1
            if fail_after_chunks is not None and done_chunks >= fail_after_chunks:
                raise RuntimeError(
                    f"injected crash after {done_chunks} snapshot chunks (test hook)"
                )

    # Handoff: tail strictly AFTER the snapshot point. The hard cut (not
    # LWW) is what keeps pre-snapshot deletes deleted — see module doc.
    tail_from = snapshot_lsn + 1
    if tail_from < n_events:
        ingest(
            spark,
            events.filter(F.col("lsn") >= tail_from),
            sink_root,
            n_events,
            n_epochs=n_epochs,
            parse_mode=parse_mode,
            config=config,
            registry=registry,
            num_buckets=num_buckets,
            fail_after_epochs=fail_after_epochs,
            epoch_offset=snapshot_epochs,
            lsn_lo=tail_from,
            **sink_kwargs,
        )

    # Reopen so the returned handle sees the tail phase's manifest state.
    return BucketedMergeSink(
        spark, sink_root, keys=["repo", "path"], order_col="lsn",
        num_buckets=num_buckets, **sink_kwargs,
    )
