"""Last-writer-wins dedup per key by LSN — SURVEY.md §2.2 N3/N4.

Generalizes the reference's indexed-event-store intent (JC:96-99,184-186):
the target table holds one row per key, the latest version wins. The
reference itself never dedups (Connect sinks upsert); the engine must.

Two physical strategies, both single-logical-pass:

1. ``lww_latest`` — ``groupBy(keys).agg(max_by(struct(payload), order))``.
   Spark plans this as partial aggregation (map-side combine) + final
   aggregation after one shuffle on the keys. This is the default: at
   100 TB the map-side combine collapses each input partition to one row
   per key before the shuffle, so shuffle volume is bounded by
   |distinct keys x partitions|, not |events|.

2. ``lww_latest_salted`` — explicit two-level reduce for *hot-key skew*
   (one repo dominating a Zipf distribution): first reduce per
   ``(keys, salt)`` where ``salt = pmod(xxhash64(order_col), S)``, then
   reduce the S partials per key. AQE skew handling cannot split a
   single aggregation key across tasks; salting can (SURVEY.md §4
   custom-#1/#2 — the partial+final agg pattern done by hand).

Both are null-safe on keys and deterministic: ``order_col`` must be a
total order (ties impossible by construction in the CDC fixture — lsn is
a monotone commit sequence, FIXTURES.md F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _payload_cols(df: DataFrame, keys: list[str], order_col: str) -> list[str]:
    return [c for c in df.columns if c not in keys and c != order_col]


def lww_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the payload of the max ``order_col`` version.

    Output columns: ``keys + [order_col] + payload_cols`` (original names).
    """
    payload_cols = payload_cols or _payload_cols(df, keys, order_col)
    winner = F.max_by(F.struct(*payload_cols), F.col(order_col)).alias("_w")
    agg = df.groupBy(*keys).agg(F.max(order_col).alias(order_col), winner)
    return agg.select(*keys, order_col, *[F.col("_w")[c].alias(c) for c in payload_cols])


def lww_latest_salted(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    payload_cols: list[str] | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-defeating two-level LWW reduce.

    Level 1 shuffles on ``(keys, salt)`` — a hot key fans out over
    ``salt_buckets`` reducers; level 2 reduces the (at most)
    ``salt_buckets`` partials per key — trivially small. Correctness:
    max_by is associative/commutative over a total order, so the
    two-level reduce equals the one-level reduce (SURVEY.md hard part (d)).
    """
    payload_cols = payload_cols or _payload_cols(df, keys, order_col)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)))
    partial = lww_latest(salted, keys + ["_salt"], order_col, payload_cols)
    final = lww_latest(partial.drop("_salt"), keys, order_col, payload_cols)
    return final


def lww_apply_cdc(
    events: DataFrame,
    keys: list[str],
    order_col: str,
    op_col: str = "op",
    delete_op: str = "d",
    payload_cols: list[str] | None = None,
    salted: bool = False,
    salt_buckets: int = 32,
) -> DataFrame:
    """Collapse a CDC event stream to final table state.

    The winner per key is the *latest* event; if that event is a delete
    (tombstone passthrough, JC:316-318,371-373) the key is absent from the
    final state — exactly the semantics of a MERGE with
    ``WHEN MATCHED AND op='d' THEN DELETE`` replayed to quiescence.
    """
    payload_cols = payload_cols or [
        c for c in events.columns if c not in keys and c not in (order_col, op_col)
    ]
    fn = lww_latest_salted if salted else lww_latest
    kwargs = {"salt_buckets": salt_buckets} if salted else {}
    latest = fn(events, keys, order_col, payload_cols + [op_col], **kwargs)
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)
