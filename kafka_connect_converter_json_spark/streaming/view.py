"""Incremental materialized-view maintenance — SURVEY.md §2.2 N20.

The canonical consumer of the sink's change-data-feed: a derived
aggregate table (``GROUP BY g: count / sum / avg / min / max``) kept
fresh from ``read_changes`` deltas instead of full recomputation — what
Iceberg/Delta docs call *incremental refresh* and the literature calls
incremental view maintenance (IVM). The reference converter feeds
sinks that downstream jobs aggregate (JC:1-40 context: converter →
topic → table); at 10^10 events the derived tables are exactly what a
re-aggregation cannot afford to rebuild per epoch.

Two maintenance strategies, chosen per view:

- ``strategy="delta"`` (count / sum / avg): the update is computed from
  the changelog ALONE — O(changed keys + |view|) per refresh, never
  touching the base table. Each change row contributes with a sign
  (+1 for ``insert``/``update_postimage``, −1 for ``delete``/
  ``update_preimage`` — the pre-image rows are why
  ``read_changes(include_preimages=True)`` exists); the signed
  contributions union with the stored accumulator state and re-group.
  SUM keeps a hidden non-null count per column so a group whose every
  value is NULL finalizes to NULL (SQL semantics), and groups whose
  row count reaches 0 vanish. min/max are refused here: they are not
  subtractable (retracting the current min needs the base table).
- ``strategy="recompute"`` (any aggregate): the changelog only
  *localizes* the work — the distinct grouping keys among change rows
  (pre- AND post-images, so a row migrating between groups dirties
  both) are recomputed from ``read_as_of(to_epoch)`` via a null-safe
  semi-join, everything else is carried over — O(affected groups'
  data), not O(table).

Exactly-once: each refresh writes a full state snapshot under
``state_e{to_epoch}/`` and then atomically swaps ``_view_manifest.json``
(same ``ManifestWriter`` seam and optimistic-concurrency check as the
sink). Re-delivering a committed refresh is a no-op; a crash between
state write and manifest swap leaves an orphan directory the next
refresh overwrites — never a partially visible state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import BucketedMergeSink, ConcurrentCommitError, ManifestWriter

VIEW_MANIFEST = "_view_manifest.json"

_DELTA_FNS = {"count", "sum", "avg"}
_ALL_FNS = {"count", "sum", "avg", "min", "max"}
_CNT = "_view_rows"  # hidden per-group live-row count (group GC + count())


class IncrementalAggView:
    """A materialized ``GROUP BY`` over a :class:`BucketedMergeSink`,
    refreshed incrementally from the sink's changelog.

    ``aggs`` maps output column name → ``(fn, input_col)``; ``fn`` in
    {count, sum, avg, min, max}, ``input_col`` ignored for ``count``
    (row count per group). ``read()`` returns the finalized public
    schema ``group_cols + aggs`` as of ``last_epoch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        sink: BucketedMergeSink,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str | None]],
        strategy: str = "delta",
        manifest_writer: ManifestWriter | None = None,
    ) -> None:
        if strategy not in ("delta", "recompute"):
            raise ValueError(f"unknown strategy {strategy!r}")
        allowed = _DELTA_FNS if strategy == "delta" else _ALL_FNS
        for out, (fn, _col) in aggs.items():
            if fn not in allowed:
                raise ValueError(
                    f"{out}: {fn} is not maintainable under strategy="
                    f"{strategy!r} ({fn} is not subtractable — use "
                    "strategy='recompute')"
                    if strategy == "delta" and fn in _ALL_FNS
                    else f"{out}: unsupported aggregate {fn!r}"
                )
        bad = [c for c in group_cols if c in aggs]
        if bad:
            raise ValueError(f"grouping columns also named as aggregates: {bad}")
        self.spark = spark
        self.root = root
        self.sink = sink
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        self.strategy = strategy
        self._writer = manifest_writer or ManifestWriter()
        os.makedirs(root, exist_ok=True)
        self._manifest = self._writer.read(os.path.join(root, VIEW_MANIFEST)) or {
            "last_epoch": None,
            "state": None,
            "strategy": strategy,
            "version": 0,
        }
        if self._manifest.get("strategy") != strategy:
            raise ValueError(
                f"view at {root} was materialized with strategy="
                f"{self._manifest.get('strategy')!r}; reopen with that"
            )

    # ----- public surface ---------------------------------------------------

    @property
    def last_epoch(self) -> int | None:
        return self._manifest["last_epoch"]

    def read(self) -> DataFrame:
        """Finalized view state as of ``last_epoch``."""
        raw = self._read_raw()
        if raw is None:
            raise ValueError("view has never been refreshed")
        if self.strategy == "recompute":
            return raw.select(*self.group_cols, *self.aggs)
        sel = [F.col(c) for c in self.group_cols]
        for out, (fn, _col) in self.aggs.items():
            if fn == "count":
                sel.append(F.col(_CNT).alias(out))
            elif fn == "sum":
                sel.append(
                    F.when(F.col(f"_nn_{out}") > 0, F.col(f"_sum_{out}"))
                    .alias(out)
                )
            else:  # avg = running sum / running non-null count
                sel.append(
                    F.when(
                        F.col(f"_nn_{out}") > 0,
                        F.col(f"_sum_{out}") / F.col(f"_nn_{out}"),
                    ).alias(out)
                )
        return raw.select(*sel)

    def refresh(self, to_epoch: int | None = None) -> dict:
        """Advance the view to ``to_epoch`` (default: the sink's latest
        committed epoch). Idempotent: a target at or behind
        ``last_epoch`` is a committed-refresh no-op."""
        committed = self.sink.committed_epochs()
        if not committed:
            raise ValueError("sink has no committed epochs")
        if to_epoch is None:
            to_epoch = max(committed)
        elif to_epoch not in committed:
            raise ValueError(f"epoch {to_epoch} is not committed in the sink")
        last = self._manifest["last_epoch"]
        if last is not None and to_epoch <= last:
            return {"refreshed": False, "last_epoch": last}
        try:
            changes = self.sink.read_changes(
                to_epoch, from_epoch=last, include_preimages=True
            )
        except ValueError as e:
            if "identical" in str(e) or "no new deltas" in str(e):
                self._commit(to_epoch, self._manifest["state"])
                return {"refreshed": True, "last_epoch": to_epoch, "changes": 0}
            raise
        if self.strategy == "delta":
            state = self._delta_state(changes)
        else:
            state = self._recompute_state(changes, to_epoch)
        rel = f"state_e{to_epoch}"
        state.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        self._commit(to_epoch, rel)
        return {"refreshed": True, "last_epoch": to_epoch}

    def vacuum(self) -> list[str]:
        """Drop state snapshots the manifest no longer references."""
        live = {self._manifest["state"]}
        gone = []
        for d in sorted(os.listdir(self.root)):
            if d.startswith("state_e") and d not in live:
                shutil.rmtree(os.path.join(self.root, d))
                gone.append(d)
        return gone

    # ----- strategies -------------------------------------------------------

    def _delta_state(self, changes: DataFrame) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        contrib = [F.col(c) for c in self.group_cols]
        contrib.append(sign.alias(_CNT))
        for out, (fn, col) in self.aggs.items():
            if fn == "count":
                continue  # row count is _CNT
            val = F.col(col)
            contrib.append(
                F.when(val.isNotNull(), sign * val).otherwise(F.lit(0)).alias(
                    f"_sum_{out}"
                )
            )
            contrib.append(
                F.when(val.isNotNull(), sign).otherwise(F.lit(0)).alias(
                    f"_nn_{out}"
                )
            )
        delta = changes.select(*contrib)
        prior = self._read_raw()
        merged = delta if prior is None else prior.unionByName(delta)
        acc = [F.sum(_CNT).alias(_CNT)]
        for out, (fn, _col) in self.aggs.items():
            if fn == "count":
                continue
            acc.append(F.sum(f"_sum_{out}").alias(f"_sum_{out}"))
            acc.append(F.sum(f"_nn_{out}").alias(f"_nn_{out}"))
        # groups whose live-row count reached 0 leave the view
        return merged.groupBy(*self.group_cols).agg(*acc).filter(F.col(_CNT) > 0)

    def _recompute_state(self, changes: DataFrame, to_epoch: int) -> DataFrame:
        # pre- and post-image rows both appear in `changes`, so a key that
        # migrated between groups dirties BOTH its old and new group.
        # The dirty side is aliased: base/prior read the same parquet
        # files the changelog does, and shared attribute ids would make
        # an unaliased self-join condition ambiguous.
        dirty = changes.select(
            *[F.col(c).alias(f"_dirty_{c}") for c in self.group_cols]
        ).distinct()
        base = self.sink.read_as_of(to_epoch)

        def _nullsafe(left: DataFrame):
            cond = None
            for c in self.group_cols:
                eq = left[c].eqNullSafe(F.col(f"_dirty_{c}"))
                cond = eq if cond is None else (cond & eq)
            return cond

        exprs = []
        for out, (fn, col) in self.aggs.items():
            if fn == "count":
                exprs.append(F.count(F.lit(1)).alias(out))
            else:
                exprs.append(getattr(F, fn)(F.col(col)).alias(out))
        fresh = (
            base.join(dirty, _nullsafe(base), "left_semi")
            .groupBy(*self.group_cols)
            .agg(*exprs)
        )
        prior = self._read_raw()
        if prior is None:
            return fresh
        kept = prior.join(dirty, _nullsafe(prior), "left_anti")
        return kept.unionByName(fresh)

    # ----- state & commit ---------------------------------------------------

    def _read_raw(self) -> DataFrame | None:
        rel = self._manifest["state"]
        if rel is None:
            return None
        return self.spark.read.parquet(os.path.join(self.root, rel))

    def _commit(self, to_epoch: int, state_rel: str | None) -> None:
        path = os.path.join(self.root, VIEW_MANIFEST)
        current = self._writer.read(path)
        cur_ver = (current or {}).get("version", 0)
        if cur_ver != self._manifest["version"]:
            raise ConcurrentCommitError(
                f"view manifest advanced underneath us (v{cur_ver} != "
                f"v{self._manifest['version']}) — reopen and retry"
            )
        nxt = {
            "last_epoch": to_epoch,
            "state": state_rel,
            "strategy": self.strategy,
            "version": self._manifest["version"] + 1,
        }
        self._writer.commit(path, nxt)
        self._manifest = nxt
