"""Incrementally-maintained MinHash-LSH near-duplicate index (N21).

The batch near-dup operators (``operators/textdedup.py``) re-shingle,
re-minhash and re-self-join the WHOLE corpus every run — fine for a
one-shot curation pass, O(corpus) per epoch for a live one. At the
10^10-document regime the north rule describes, the corpus is a CDC
sink that changes by a few million rows per epoch, and the question a
training-data pipeline actually asks is incremental: *which incoming
documents are near-duplicates of anything already admitted?*

``IncrementalLSHIndex`` maintains the banded-signature table as a
derived state of a ``BucketedMergeSink``, fed by the sink's changelog
(N10/N20 machinery, ``read_changes(include_preimages=True)``):

- **adds** (``insert`` / ``update_postimage``): the new text version is
  shingled, minhashed and banded ONCE — cost O(changed docs), never
  O(corpus).
- **retractions** (``delete`` / ``update_preimage``): the OLD text
  version's band rows are recomputed from the pre-image payload and
  written with a −1 count. Banding is a pure md5 function of the text,
  so the retraction reproduces the stored rows exactly; the live view
  is ``sum(count) > 0`` per (id, band) — an update whose text is
  unchanged nets to zero delta.
- **probe**: each refresh joins the epoch's add rows against the
  post-refresh live band table and emits the NEW candidate pairs — the
  admission signal. The band table is laid out in
  ``pmod(xxhash64(band), num_buckets)`` partition dirs (the sink's
  bucketing pattern), so the probe's band-equality join prunes to the
  buckets the delta actually touches; the shuffle carries (band, id)
  only — text and signatures never move.

Exactly-once through the same atomic-manifest CAS as the sink/view
(state dirs written first, manifest swap is the commit point; stale or
redelivered refresh is a committed no-op; orphan dirs from a crash are
overwritten on retry and collectable by ``vacuum``). ``compact()``
folds deltas into a base exactly like the sink's MOR path.

Invariant (tested): after any epoch, ``read_bands()`` equals batch
banding of the sink's live docs, and ``candidate_pairs()`` equals
``operators.textdedup.minhash_lsh_candidates`` over the same corpus —
while the union of per-refresh ``read_pairs()`` covers every final
candidate pair (each pair is emitted at the refresh that added its
later endpoint).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textdedup import band_frequency_cut, minhash_signatures
from .sink import BucketedMergeSink, ConcurrentCommitError, ManifestWriter

IDX_MANIFEST = "_lsh_index_manifest.json"
# ASCII unit separator: joins composite sink keys into the index's doc id
KEY_SEP = "\x1f"


class IncrementalLSHIndex:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        sink: BucketedMergeSink,
        text_col: str = "content",
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
        num_buckets: int = 16,
        max_band_freq: int | None = None,
        manifest_writer: ManifestWriter | None = None,
    ) -> None:
        assert num_hashes % bands == 0
        self.spark = spark
        self.root = root
        self.sink = sink
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.num_buckets = num_buckets
        self.max_band_freq = max_band_freq
        self._writer = manifest_writer or ManifestWriter()
        os.makedirs(root, exist_ok=True)
        self._manifest = self._writer.read(os.path.join(root, IDX_MANIFEST)) or {
            "version": 0,
            "last_epoch": None,
            "base": None,
            "deltas": [],
            "pairs": {},
            "params": self._params(),
        }
        if self._manifest["params"] != self._params():
            raise ValueError(
                "index exists with different hashing/banding params "
                f"{self._manifest['params']}; reopen with those "
                f"(got {self._params()})"
            )

    def _params(self) -> dict:
        return {
            "text_col": self.text_col,
            "n": self.n,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "num_buckets": self.num_buckets,
        }

    # ----- banding (pure function of text; shared by add + retract) -------

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        """(id, band) rows for one text version per key — exactly the
        banding of ``minhash_lsh_candidates`` so the live view is
        interchangeable with the batch operator's."""
        keyed = docs.select(
            F.concat_ws(KEY_SEP, *[F.col(k) for k in self.sink.keys]).alias("_id"),
            F.col(self.text_col),
        ).filter(F.col(self.text_col).isNotNull())
        sig = minhash_signatures(
            keyed, self.text_col, "_id", self.n, self.num_hashes
        )
        r = self.num_hashes // self.bands
        band_cols = [
            F.concat_ws(
                "|", F.lit(str(b)), *[F.col(f"h{b * r + j}") for j in range(r)]
            ).alias("band")
            for b in range(self.bands)
        ]
        return sig.select(
            F.col("id"), F.explode(F.array(*band_cols)).alias("band")
        )

    def _bucket(self):
        return F.pmod(F.xxhash64(F.col("band")), F.lit(self.num_buckets))

    # ----- state reads -----------------------------------------------------

    def _state_dirs(self) -> list[str]:
        rels = ([self._manifest["base"]] if self._manifest["base"] else []) + list(
            self._manifest["deltas"]
        )
        return [os.path.join(self.root, rel) for rel in rels]

    # explicit schemas: an all-netted-out delta writes an EMPTY
    # partitioned dir (no part files), which schema inference refuses
    _BAND_SCHEMA = "id string, band string, _n bigint, _bucket bigint"

    def _raw(self, dirs: list[str]) -> DataFrame | None:
        """Union of state dirs, each read under its OWN basePath — the
        ``_bucket=`` partition layout is per-dir, so one shared basePath
        would conflict; per-dir reads keep partition pruning intact."""
        if not dirs:
            return None
        parts = [
            self.spark.read.schema(self._BAND_SCHEMA)
            .option("basePath", d)
            .parquet(d)
            for d in dirs
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _live(self, dirs: list[str], buckets: list[int] | None = None) -> DataFrame:
        """sum(count) > 0 per (id, band). ``buckets`` prunes the scan to
        the partition dirs a probe can possibly match (band equality
        fixes the bucket) — at 10^10 rows this is the difference between
        reading the delta's neighborhood and the whole index."""
        raw = self._raw(dirs)
        if raw is None:
            return self.spark.createDataFrame([], "id string, band string")
        if buckets is not None:
            raw = raw.filter(F.col("_bucket").isin(buckets))  # partition pruning
        return (
            raw.groupBy("id", "band")
            .agg(F.sum("_n").alias("_n"))
            .filter(F.col("_n") > 0)
            .select("id", "band")
        )

    def read_bands(self) -> DataFrame:
        """Live (id, band) view — ≡ batch banding of the sink's live docs."""
        return self._live(self._state_dirs())

    def candidate_pairs(self) -> DataFrame:
        """Full candidate set from the index alone — ≡
        ``minhash_lsh_candidates(live_docs, ...)`` without touching any
        text. The band self-join's fan-out bound (``max_band_freq``)
        applies exactly as in the batch operator."""
        live = band_frequency_cut(self.read_bands(), "band", self.max_band_freq)
        a = live.select("band", F.col("id").alias("id_a"))
        b = live.select("band", F.col("id").alias("id_b"))
        return (
            a.join(b, "band")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def read_pairs(self, epoch: int | None = None) -> DataFrame:
        """Per-refresh emitted NEW candidate pairs (``epoch``), or the
        union over all refreshes. A pair involving a since-updated or
        deleted document version stays in its epoch's output — this is
        the admission *log*; filter against current state via
        ``candidate_pairs()`` when only live pairs matter."""
        rels = (
            [self._manifest["pairs"][str(epoch)]]
            if epoch is not None
            else list(self._manifest["pairs"].values())
        )
        if not rels:
            return self.spark.createDataFrame([], "id_a string, id_b string")
        return self.spark.read.schema("id_a string, id_b string").parquet(
            *[os.path.join(self.root, rel) for rel in rels]
        ).select("id_a", "id_b")

    @property
    def last_epoch(self) -> int | None:
        return self._manifest["last_epoch"]

    # ----- refresh -----------------------------------------------------------

    def refresh(self, to_epoch: int | None = None) -> dict:
        """Advance the index to the sink's ``to_epoch`` (default
        latest). Idempotent; per-refresh cost O(changed docs + their
        band neighborhoods), never O(corpus)."""
        committed = self.sink.committed_epochs()
        if not committed:
            raise ValueError("sink has no committed epochs")
        if to_epoch is None:
            to_epoch = max(committed)
        elif to_epoch not in committed:
            raise ValueError(f"epoch {to_epoch} is not committed in the sink")
        last = self._manifest["last_epoch"]
        if last is not None and to_epoch <= last:
            return {"refreshed": False, "last_epoch": last, "new_pairs": 0}
        try:
            changes = self.sink.read_changes(
                to_epoch, from_epoch=last, include_preimages=True
            )
        except ValueError as e:
            if "identical" in str(e) or "no new deltas" in str(e):
                self._commit(to_epoch, None, None)
                return {"refreshed": True, "last_epoch": to_epoch, "new_pairs": 0}
            raise
        ct = F.col("_change_type")
        adds = self._band_rows(changes.filter(ct.isin("insert", "update_postimage")))
        dels = self._band_rows(changes.filter(ct.isin("delete", "update_preimage")))
        delta = (
            adds.withColumn("_n", F.lit(1))
            .unionByName(dels.withColumn("_n", F.lit(-1)))
            .groupBy("id", "band")
            .agg(F.sum("_n").alias("_n"))
            .filter(F.col("_n") != 0)  # text-unchanged updates net out
            .withColumn("_bucket", self._bucket())
        )
        delta_rel = f"bands_e{to_epoch}"
        delta_dir = os.path.join(self.root, delta_rel)
        if os.path.exists(delta_dir):  # orphan from a crashed attempt
            shutil.rmtree(delta_dir)
        delta.write.partitionBy("_bucket").parquet(delta_dir)

        # probe: this epoch's adds vs the post-refresh live view, pruned
        # to the buckets the adds can match (band equality fixes the
        # bucket). The cap below keeps the collect bounded: past half
        # the buckets, pruning buys nothing — scan them all.
        written = (
            self.spark.read.schema(self._BAND_SCHEMA)
            .option("basePath", delta_dir)
            .parquet(delta_dir)
        )
        add_rows = written.filter(F.col("_n") > 0).select("id", "band", "_bucket")
        hot = [
            r._bucket
            for r in add_rows.select("_bucket").distinct().limit(
                self.num_buckets // 2 + 1
            ).collect()
        ]
        buckets = hot if len(hot) <= self.num_buckets // 2 else None
        post_live = self._live(self._state_dirs() + [delta_dir], buckets)
        post_live = band_frequency_cut(post_live, "band", self.max_band_freq)
        probe = band_frequency_cut(
            add_rows.select("id", "band"), "band", self.max_band_freq
        )
        pairs = (
            probe.withColumnRenamed("id", "_pid")
            .join(post_live, "band")
            .filter(F.col("id") != F.col("_pid"))
            .select(
                F.least("id", "_pid").alias("id_a"),
                F.greatest("id", "_pid").alias("id_b"),
            )
            .distinct()
        )
        pairs_rel = f"pairs_e{to_epoch}"
        pairs_dir = os.path.join(self.root, pairs_rel)
        if os.path.exists(pairs_dir):
            shutil.rmtree(pairs_dir)
        pairs.write.parquet(pairs_dir)
        n_pairs = (
            self.spark.read.schema("id_a string, id_b string")
            .parquet(pairs_dir)
            .count()
        )
        self._commit(to_epoch, delta_rel, pairs_rel)
        return {"refreshed": True, "last_epoch": to_epoch, "new_pairs": n_pairs}

    # ----- maintenance -------------------------------------------------------

    def compact(self) -> dict:
        """Fold base + deltas into one base dir (the sink's MOR
        ``compact()`` pattern); state unchanged, read amplification
        reset. Old dirs stay on disk until ``vacuum``."""
        if not self._manifest["deltas"]:
            return {"compacted": False, "deltas_folded": 0}
        folded = len(self._manifest["deltas"])
        rel = f"base_e{self._manifest['last_epoch']}"
        out = os.path.join(self.root, rel)
        if os.path.exists(out):
            shutil.rmtree(out)
        (
            self.read_bands()
            .withColumn("_n", F.lit(1))
            .withColumn("_bucket", self._bucket())
            .write.partitionBy("_bucket")
            .parquet(out)
        )
        cur = dict(self._manifest)
        cur["base"], cur["deltas"] = rel, []
        self._swap(cur)
        return {"compacted": True, "deltas_folded": folded}

    def vacuum(self) -> list[str]:
        live = set(self._manifest["deltas"]) | set(self._manifest["pairs"].values())
        if self._manifest["base"]:
            live.add(self._manifest["base"])
        gone = []
        for d in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, d)
            if os.path.isdir(p) and d not in live:
                shutil.rmtree(p)
                gone.append(d)
        return gone

    # ----- commit ------------------------------------------------------------

    def _commit(self, to_epoch: int, delta_rel: str | None, pairs_rel: str | None):
        cur = dict(self._manifest)
        cur["last_epoch"] = to_epoch
        if delta_rel:
            cur["deltas"] = list(cur["deltas"]) + [delta_rel]
        if pairs_rel:
            cur["pairs"] = {**cur["pairs"], str(to_epoch): pairs_rel}
        self._swap(cur)

    def _swap(self, cur: dict) -> None:
        path = os.path.join(self.root, IDX_MANIFEST)
        stored = self._writer.read(path)
        if stored is not None and stored["version"] != self._manifest["version"]:
            raise ConcurrentCommitError(
                f"index manifest moved to v{stored['version']} (loaded "
                f"v{self._manifest['version']}) — reopen and retry"
            )
        cur["version"] = self._manifest["version"] + 1
        self._writer.commit(path, cur)
        self._manifest = cur
