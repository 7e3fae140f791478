"""Range (interval) join + session windows — two temporal operators
Spark's equi-join/tumbling-window machinery doesn't cover.

``interval_join``: left points t against right intervals [start, end]
with equality keys. Spark plans a bare non-equi predicate as
BroadcastNestedLoopJoin (O(|points| x |intervals|) per key) — unusable
at scale. The chunked form manufactures an equality column: time is cut
into fixed-width chunks, each interval explodes onto every chunk it
overlaps, points join on (keys, chunk), and the exact containment
predicate filters. Shuffle cost O(|P| + |I| x avg_chunks_per_interval),
per-chunk fan-out bounded by interval density — the standard
interval-bucketing trick (what range-join hints do in engines that have
them).

``sessionize``: gaps-and-islands session ids per key — consecutive
events closer than ``gap`` belong to one session. One window pass: a
boundary flag (gap exceeded) cumulative-summed in event order. The
DuckDB oracle replicates it with lag()+sum() — an independent
formulation of the same definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    time_col: str,
    start_col: str,
    end_col: str,
    chunk: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row sharing ``keys`` whose
    [``start_col``, ``end_col``] contains ``time_col`` (inclusive).

    ``keys`` are natural join columns (same name on both sides); every
    other column name must be distinct across the two frames. Time
    columns are numeric (epoch seconds or any monotone long). ``chunk``
    is the bucket width — tune toward the typical interval length: too
    small explodes long intervals onto many chunks, too large piles
    unrelated intervals into each chunk.

    ``how='left'`` keeps unmatched points with null interval columns.
    A point matching several intervals yields several rows (standard
    range-join semantics). Left mode costs a second pass (an anti-join
    of points against the matched set) — prefer inner where the
    unmatched rows aren't needed.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if "_chunk" in points.columns or "_chunk" in intervals.columns:
        raise ValueError("input columns collide with internal name '_chunk'")
    shared = [c for c in points.columns if c in set(intervals.columns)]
    if sorted(shared) != sorted(keys):
        raise ValueError(
            f"sides must share exactly the key columns; shared={shared} keys={keys}"
        )
    p = points.withColumn("_chunk", F.floor(F.col(time_col) / chunk).cast("long"))
    i = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / chunk).cast("long"),
                F.floor(F.col(end_col) / chunk).cast("long"),
            )
        ),
    )
    contained = (F.col(time_col) >= F.col(start_col)) & (
        F.col(time_col) <= F.col(end_col)
    )
    matched = (
        p.join(i, [*keys, "_chunk"], "inner").filter(contained).drop("_chunk")
    )
    if how == "inner":
        return matched
    # left: one row per unmatched point, interval columns null
    iv_cols = [c for c in intervals.columns if c not in keys]
    unmatched = p.join(
        matched.select(*points.columns).distinct(),
        points.columns,
        "left_anti",
    ).drop("_chunk")
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)


def sessionize(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    gap: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a session id per key: events whose gap to the previous
    event (same key, event-time order) exceeds ``gap`` start a new
    session. Output: input columns + ``session_id`` (0-based per key,
    ordered) — one window pass, shuffle keyed by ``keys`` only.

    ``order_tiebreak``: column ordering equal-time events
    deterministically (recommended whenever timestamps can collide)."""
    order = [F.col(time_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_t = F.lag(time_col).over(w)
    boundary = F.when(
        prev_t.isNull() | (F.col(time_col) - prev_t > gap), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1,
    )


def session_stats(
    df: DataFrame, keys: list[str], time_col: str, gap: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregate: (keys, session_id, n_events, start, end,
    duration) — the session-window rollup over ``sessionize``."""
    s = sessionize(df, keys, time_col, gap, order_tiebreak)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )
