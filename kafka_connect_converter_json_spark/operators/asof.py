"""As-of (point-in-time) join — the temporal lookup Spark lacks natively.

For every left row (key, t), attach the LATEST right row with the same
key and right time <= t (inclusive). The classic CDC-analytics join:
"what was the dimension's state when this event happened" against a
change table like this engine's sink.

Implementation is the union-window form, NOT a range join:

- naive form: ``l JOIN r ON key AND r.t <= l.t`` + row_number — the
  join explodes to |matches| rows per left row (quadratic in version
  count per key) before the filter; unusable at 10^10 rows.
- union-window form (here): tag both sides, union, ONE shuffle keyed by
  key ordered by (t, side, tiebreak); running ``last(right_payload,
  ignorenulls=True)`` carries the latest right state forward onto each
  left row. Cost: one shuffle of |L|+|R| rows, zero fan-out, and the
  window is a running accumulator (no per-row scan back). Right rows
  sort BEFORE left rows at equal t, making the match inclusive.

At 100 TB both sides usually arrive bucketed by key (this engine's sink
layout); the union preserves that partitioning so the sort is the only
real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the right payload of the
    latest right row with the same ``keys`` and ``right_time`` <=
    ``left_time`` (null payload when no such row exists).

    ``right_cols``: right payload columns to attach (default: all
    non-key, non-time). Attached as ``<col><suffix>`` along with
    ``<right_time><suffix>``. ``tiebreak``: optional right column that
    orders equal-timestamp right rows (the greatest wins — e.g. an LSN);
    without it, equal-time right duplicates are resolved arbitrarily, so
    pass one when the right side can carry same-instant versions.
    """
    reserved = {"_t", "_side", "_tie", "_p", "_l", "_m"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"input columns collide with internal names: {sorted(clash)}")
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]
    payload = F.struct(
        F.col(right_time).alias(f"{right_time}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    l_tag = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("_tie"),
        payload.alias("_p"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
            .schema["_l"].dataType
        ).alias("_l"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{right_time}{suffix}").alias(f"{right_time}{suffix}"))
    out_cols.extend(
        F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols
    )
    return matched.select(*out_cols)
