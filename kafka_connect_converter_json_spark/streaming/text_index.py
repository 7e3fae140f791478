"""Incrementally-maintained inverted / BM25 text index (N23).

The batch keyword scorer (``operators/corpus_filters.py::bm25_topk``)
re-tokenizes the WHOLE corpus per query batch — fine one-shot, O(corpus)
per run for a live one. At the 10^10-document regime the north rule
describes, the corpus is a CDC sink changing by a few million rows per
epoch, and keyword search needs a *maintained* inverted index: per-epoch
cost proportional to the changed documents, with queries that read only
the postings of the queried terms.

``IncrementalBM25Index`` is the text-search member of the derived-state
family (N20 aggregate views, N21 LSH near-dup, N22 IVF ANN): all four
hang off the sink's preimage changelog (N10/N20,
``read_changes(include_preimages=True)``) and commit through the same
atomic-manifest CAS. Two state tables:

- **postings** ``(term, id, _tf)`` — signed term frequencies.
  Adds (``insert``/``update_postimage``) tokenize the NEW text version
  once and write ``+tf``; retractions (``delete``/``update_preimage``)
  re-tokenize the OLD version from the pre-image payload and write
  ``-tf``. Tokenization is a pure function of the text, so the
  retraction reproduces the stored rows exactly; the live view is
  ``sum(_tf) > 0`` per (term, id), and an update whose text is
  unchanged nets to a provably EMPTY delta. Laid out in
  ``pmod(xxhash64(term), num_buckets)`` partition dirs, so a query
  prunes the scan, at the PATH level, to the buckets its terms hash
  into — the index-lookup analogue of the sink's bucket pruning.
- **doclens** ``(id, _dl, _n)`` — signed whitespace-token document
  lengths plus a signed row count. Global BM25 corpus stats need NO
  grouping: adds and retractions of the same version cancel, so
  ``n_docs = sum(_n)`` and ``sum_dl = sum(_dl)`` over the raw state are
  exact — one partial-aggregated scan of a 3-column table, no shuffle.

``search(terms, k)`` scores with the same Lucene-BM25 formulation as
the batch operator and is invariant-tested ``==`` against it: for
word-character-only terms (``\\w+`` — the batch operator's ``\\b``
boundary semantics and this index's ``\\W+`` tokenizer agree exactly on
those), ``search(terms, k)`` over the index equals
``bm25_topk(live_docs, terms, k)`` recomputed from scratch.

Exactly-once through the manifest CAS (state dirs first, manifest swap
is the commit; stale/redelivered refresh is a committed no-op; orphan
dirs from a crash are overwritten on retry and collectable by
``vacuum``). ``compact()`` folds deltas into a base exactly like the
sink's MOR path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sink import BucketedMergeSink, ConcurrentCommitError, ManifestWriter

IDX_MANIFEST = "_bm25_index_manifest.json"
# ASCII unit separator: joins composite sink keys into the index's doc id
KEY_SEP = "\x1f"


class IncrementalBM25Index:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        sink: BucketedMergeSink,
        text_col: str = "content",
        num_buckets: int = 16,
        k1: float = 1.2,
        b: float = 0.75,
        manifest_writer: ManifestWriter | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.sink = sink
        self.text_col = text_col
        self.num_buckets = num_buckets
        self.k1 = k1
        self.b = b
        self._writer = manifest_writer or ManifestWriter()
        os.makedirs(root, exist_ok=True)
        self._manifest = self._writer.read(os.path.join(root, IDX_MANIFEST)) or {
            "version": 0,
            "last_epoch": None,
            "base": None,
            "deltas": [],
            "params": self._params(),
        }
        if self._manifest["params"] != self._params():
            raise ValueError(
                "index exists with different tokenizer/scoring params "
                f"{self._manifest['params']}; reopen with those "
                f"(got {self._params()})"
            )

    def _params(self) -> dict:
        return {
            "text_col": self.text_col,
            "num_buckets": self.num_buckets,
            "k1": self.k1,
            "b": self.b,
        }

    # ----- tokenization (pure function of text; shared by add + retract) ---

    def _keyed(self, docs: DataFrame) -> DataFrame:
        return docs.select(
            F.concat_ws(KEY_SEP, *[F.col(c) for c in self.sink.keys]).alias("_id"),
            F.col(self.text_col).alias("_text"),
        )

    def _posting_rows(self, docs: DataFrame) -> DataFrame:
        """(term, id, tf) for one text version per key. ``\\W+`` token
        split: on word-only terms this agrees exactly with the batch
        operator's ``\\b<term>\\b`` regexp counts."""
        toks = F.filter(
            F.split(F.lower(F.col("_text")), r"\W+"), lambda t: t != F.lit("")
        )
        return (
            self._keyed(docs)
            .filter(F.col("_text").isNotNull())
            .select(F.col("_id").alias("id"), F.explode(toks).alias("term"))
            .groupBy("term", "id")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )

    def _doclen_rows(self, docs: DataFrame) -> DataFrame:
        """(id, dl) for one text version per key — the batch operator's
        whitespace-field count (null/blank text → 0, and the doc still
        counts toward ``n_docs``, matching its ``count(1)``)."""
        t = F.trim(F.col("_text"))
        dl = (
            F.when(t.isNull() | (t == ""), F.lit(0))
            .otherwise(F.size(F.split(t, r"\s+")))
            .cast("long")
        )
        return self._keyed(docs).select(F.col("_id").alias("id"), dl.alias("dl"))

    def _bucket(self):
        return F.pmod(F.xxhash64(F.col("term")), F.lit(self.num_buckets))

    # ----- state reads ------------------------------------------------------

    # explicit schemas: an all-netted-out delta writes an EMPTY
    # partitioned dir (no part files), which schema inference refuses
    _POST_SCHEMA = "term string, id string, _tf bigint, _bucket bigint"
    _DLEN_SCHEMA = "id string, _dl bigint, _n bigint"

    def _state_rels(self) -> list[str]:
        return ([self._manifest["base"]] if self._manifest["base"] else []) + list(
            self._manifest["deltas"]
        )

    def _post_raw(self, buckets: list[int] | None = None) -> DataFrame | None:
        """Union of postings state dirs, each under its OWN basePath (the
        ``_bucket=`` layout is per-dir); ``buckets`` prunes each read at
        the PATH level — only the ``_bucket=<b>`` subdirectories the
        queried terms can live in are handed to the reader, so unprobed
        buckets' files never appear in the scan (asserted via
        ``inputFiles()`` in the tests)."""
        parts = []
        for rel in self._state_rels():
            d = os.path.join(self.root, rel, "post")
            if buckets is None:
                paths = [d]
            else:
                paths = [
                    p
                    for b in buckets
                    if os.path.isdir(p := os.path.join(d, f"_bucket={b}"))
                ]
                if not paths:  # delta netted out / terms miss this dir
                    continue
            parts.append(
                self.spark.read.schema(self._POST_SCHEMA)
                .option("basePath", d)
                .parquet(*paths)
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _dlen_raw(self) -> DataFrame | None:
        dirs = [os.path.join(self.root, r, "dlen") for r in self._state_rels()]
        if not dirs:
            return None
        return self.spark.read.schema(self._DLEN_SCHEMA).parquet(*dirs)

    def read_postings(self) -> DataFrame:
        """Live (term, id, tf) view — ≡ tokenizing the sink's live docs."""
        raw = self._post_raw()
        if raw is None:
            return self.spark.createDataFrame([], "term string, id string, tf bigint")
        return (
            raw.groupBy("term", "id")
            .agg(F.sum("_tf").alias("tf"))
            .filter(F.col("tf") > 0)
        )

    def read_doclens(self) -> DataFrame:
        """Live (id, dl) view — one row per live document."""
        raw = self._dlen_raw()
        if raw is None:
            return self.spark.createDataFrame([], "id string, dl bigint")
        return (
            raw.groupBy("id")
            .agg(F.sum("_dl").alias("dl"), F.sum("_n").alias("_n"))
            .filter(F.col("_n") > 0)
            .select("id", "dl")
        )

    def corpus_stats(self) -> tuple[int, int]:
        """(n_docs, sum_dl) — exact from ONE ungrouped scan: a version's
        add and retraction rows cancel, so the signed sums over the raw
        state equal the live totals (no per-id shuffle)."""
        raw = self._dlen_raw()
        if raw is None:
            return 0, 0
        row = raw.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
            F.coalesce(F.sum("_dl"), F.lit(0)).alias("s"),
        ).collect()[0]
        return int(row.n), int(row.s)

    @property
    def last_epoch(self) -> int | None:
        return self._manifest["last_epoch"]

    # ----- query --------------------------------------------------------------

    def search(self, terms: list[str], k: int = 20) -> DataFrame:
        """BM25 top-``k`` docs per term — ≡ ``bm25_topk(live_docs, terms,
        k)`` for word-only terms, but reading ONLY the queried terms'
        postings buckets (path-pruned) instead of the corpus."""
        if not terms:
            raise ValueError("terms must be non-empty")
        empty = self.spark.createDataFrame(
            [], "term string, id string, score double, rnk int"
        )
        # bounded |terms|-row job: partition ids of the queried terms
        buckets = [
            r.b
            for r in self.spark.createDataFrame(
                [(t,) for t in terms], "term string"
            ).select(self._bucket().alias("b")).distinct().collect()
        ]
        raw = self._post_raw(buckets)
        if raw is None:
            return empty
        n_docs, sum_dl = self.corpus_stats()
        if n_docs == 0 or sum_dl == 0:
            return empty
        live = (
            raw.filter(F.col("term").isin(terms))
            .groupBy("term", "id")
            .agg(F.sum("_tf").alias("tf"))
            .filter(F.col("tf") > 0)
        )
        dfreq = live.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
        # candidate docs only: semi-join the RAW doclen state before its
        # groupBy, so the per-id shuffle is bounded by the queried terms'
        # postings, never the corpus
        dlen = (
            self._dlen_raw()
            .join(live.select("id").distinct(), "id", "left_semi")
            .groupBy("id")
            .agg(F.sum("_dl").alias("dl"), F.sum("_n").alias("_n"))
            .filter(F.col("_n") > 0)
            .select("id", "dl")
        )
        scored = (
            live.join(dlen, "id")
            .join(F.broadcast(dfreq), "term")
            .withColumn(
                "idf",
                F.log(
                    (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5))
                    + F.lit(1.0)
                ),
            )
            .withColumn(
                "score",
                F.round(
                    F.col("idf")
                    * (F.col("tf") * F.lit(self.k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(self.k1)
                        * (
                            F.lit(1.0 - self.b)
                            + F.lit(self.b)
                            * F.col("dl")
                            * F.lit(float(n_docs))
                            / F.lit(float(sum_dl))
                        )
                    ),
                    6,
                ),
            )
        )
        w = Window.partitionBy("term").orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("term", "id", "score", "rnk")
        )

    # ----- refresh --------------------------------------------------------------

    def refresh(self, to_epoch: int | None = None) -> dict:
        """Advance the index to the sink's ``to_epoch`` (default latest).
        Idempotent; per-refresh cost O(changed docs · their tokens),
        never O(corpus)."""
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
                self._commit(to_epoch, None)
                return {"refreshed": True, "last_epoch": to_epoch}
            raise
        ct = F.col("_change_type")
        adds = changes.filter(ct.isin("insert", "update_postimage"))
        dels = changes.filter(ct.isin("delete", "update_preimage"))
        post_delta = (
            self._posting_rows(adds)
            .unionByName(
                self._posting_rows(dels).withColumn("tf", -F.col("tf"))
            )
            .groupBy("term", "id")
            .agg(F.sum("tf").alias("_tf"))
            .filter(F.col("_tf") != 0)  # text-unchanged updates net out
            .withColumn("_bucket", self._bucket())
        )
        dlen_delta = (
            self._doclen_rows(adds)
            .select("id", F.col("dl").alias("_dl"), F.lit(1).cast("long").alias("_n"))
            .unionByName(
                self._doclen_rows(dels).select(
                    "id",
                    (-F.col("dl")).alias("_dl"),
                    F.lit(-1).cast("long").alias("_n"),
                )
            )
            .groupBy("id")
            .agg(F.sum("_dl").alias("_dl"), F.sum("_n").alias("_n"))
            .filter((F.col("_dl") != 0) | (F.col("_n") != 0))
        )
        rel = f"e{to_epoch}"
        out = os.path.join(self.root, rel)
        if os.path.exists(out):  # orphan from a crashed attempt
            shutil.rmtree(out)
        post_delta.write.partitionBy("_bucket").parquet(os.path.join(out, "post"))
        dlen_delta.write.parquet(os.path.join(out, "dlen"))
        self._commit(to_epoch, rel)
        return {"refreshed": True, "last_epoch": to_epoch}

    # ----- maintenance ------------------------------------------------------------

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
            self.read_postings()
            .select("term", "id", F.col("tf").alias("_tf"))
            .withColumn("_bucket", self._bucket())
            .write.partitionBy("_bucket")
            .parquet(os.path.join(out, "post"))
        )
        (
            self.read_doclens()
            .select("id", F.col("dl").alias("_dl"), F.lit(1).cast("long").alias("_n"))
            .write.parquet(os.path.join(out, "dlen"))
        )
        cur = dict(self._manifest)
        cur["base"], cur["deltas"] = rel, []
        self._swap(cur)
        return {"compacted": True, "deltas_folded": folded}

    def vacuum(self) -> list[str]:
        live = set(self._state_rels())
        gone = []
        for d in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, d)
            if os.path.isdir(p) and d not in live:
                shutil.rmtree(p)
                gone.append(d)
        return gone

    # ----- commit -------------------------------------------------------------------

    def _commit(self, to_epoch: int, delta_rel: str | None) -> None:
        cur = dict(self._manifest)
        cur["last_epoch"] = to_epoch
        if delta_rel:
            cur["deltas"] = list(cur["deltas"]) + [delta_rel]
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
