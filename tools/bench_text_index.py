"""Evidence for the N23 claim: an incremental BM25-index refresh costs
O(changed docs), while batch keyword scoring re-tokenizes the whole
corpus per query batch — so the win widens with corpus size at a fixed
change rate; and a search over the index reads only the queried terms'
postings buckets instead of the corpus.

Protocol: bootstrap a document sink at two corpus sizes (D and 4D),
then apply E epochs of C changed docs each (updates of existing keys —
the retraction + add path). Per epoch, time (a) the index refresh +
a 4-term search over it and (b) the batch recompute (``bm25_topk``
over the full live corpus, the operator a pipeline without the index
must rerun). Report medians per corpus size.

Prints one JSON line and appends a section to BENCH.md. Run alone:
never benchmark concurrently with other Spark work on this host.

Env knobs: SPARK_GRAFT_TXTBENCH_DOCS (D, default 100_000),
_CHANGES (C, default 2_000), _EPOCHS (E, default 3), _CPUS (32).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    d_base = int(os.environ.get("SPARK_GRAFT_TXTBENCH_DOCS", "100000"))
    n_changes = int(os.environ.get("SPARK_GRAFT_TXTBENCH_CHANGES", "2000"))
    n_epochs = int(os.environ.get("SPARK_GRAFT_TXTBENCH_EPOCHS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    from kafka_connect_converter_json_spark.operators.corpus_filters import bm25_topk
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink
    from kafka_connect_converter_json_spark.streaming.text_index import (
        IncrementalBM25Index,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local-txtbench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # queried terms: "alpha"/"beta" are planted on key-determined slices
    # of the corpus, "kappa0"/"kappa7" come from the body vocabulary
    terms = ["alpha", "beta", "kappa0", "kappa7"]

    def content(ver: int):
        # ~40 pseudo-words from a 16k-word vocabulary ("kappa<j>"), a
        # pure function of (doc key, version), plus a key-determined
        # planted head term so the queried terms genuinely score.
        head = F.when(
            F.pmod(F.xxhash64("k"), F.lit(5)) == 0, F.lit("alpha ")
        ).otherwise(
            F.when(F.pmod(F.xxhash64("k"), F.lit(5)) == 1, F.lit("beta "))
            .otherwise(F.lit(""))
        )
        body = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("kappa"),
                    F.pmod(
                        F.xxhash64(F.col("k"), F.lit(ver), F.lit(j)), F.lit(16384)
                    ).cast("string"),
                )
                for j in range(40)
            ],
        )
        return F.concat(head, body).alias("content")

    def run_size(n_docs: int) -> dict:
        tmp = tempfile.mkdtemp(dir="/dev/shm")
        try:
            sink = BucketedMergeSink(
                spark, os.path.join(tmp, "sink"), keys=["k"],
                order_col="lsn", num_buckets=32,
            )
            idx = IncrementalBM25Index(
                spark, os.path.join(tmp, "idx"), sink, num_buckets=32
            )
            base = spark.range(n_docs).select(
                F.concat(F.lit("doc-"), F.col("id")).alias("k"),
                F.col("id").alias("lsn"),
            ).select("k", "lsn", content(0), F.lit("u").alias("op"))
            sink.merge(base, epoch=0)
            t0 = time.time()
            idx.refresh(to_epoch=0)
            t_bootstrap = time.time() - t0

            refresh_s, search_s, batch_s = [], [], []
            for e in range(1, n_epochs + 1):
                changed = (
                    spark.range(n_docs)
                    .filter(
                        F.pmod(
                            F.xxhash64("id", F.lit(e)),
                            F.lit(max(1, n_docs // n_changes)),
                        )
                        == 0
                    )
                    .select(
                        F.concat(F.lit("doc-"), F.col("id")).alias("k"),
                        (F.lit(e) * n_docs + F.col("id")).alias("lsn"),
                    )
                    .select("k", "lsn", content(e), F.lit("u").alias("op"))
                )
                sink.merge(changed, epoch=e)
                t0 = time.time()
                idx.refresh(to_epoch=e)
                refresh_s.append(round(time.time() - t0, 2))
                t0 = time.time()
                idx.search(terms, k=20).count()
                search_s.append(round(time.time() - t0, 2))
                live = sink.read().select(F.col("k").alias("_id"), "content")
                t0 = time.time()
                bm25_topk(
                    live, terms, k=20, id_col="_id", text_col="content"
                ).count()
                batch_s.append(round(time.time() - t0, 2))
            return {
                "docs": n_docs,
                "changes_per_epoch": n_changes,
                "bootstrap_refresh_sec": round(t_bootstrap, 2),
                "refresh_sec": refresh_s,
                "search_sec": search_s,
                "batch_recompute_sec": batch_s,
                "refresh_median": round(statistics.median(refresh_s), 2),
                "search_median": round(statistics.median(search_s), 2),
                "batch_median": round(statistics.median(batch_s), 2),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    small = run_size(d_base)
    large = run_size(d_base * 4)

    def incr(d):  # what the pipeline pays per epoch with the index
        return d["refresh_median"] + d["search_median"]

    result = {
        "metric": "incremental BM25 index refresh+search vs batch bm25_topk recompute",
        "small": small,
        "large": large,
        "batch_growth_4x_docs": round(
            large["batch_median"] / max(small["batch_median"], 1e-9), 2
        ),
        "incremental_growth_4x_docs": round(incr(large) / max(incr(small), 1e-9), 2),
        "speedup_at_4x": round(large["batch_median"] / max(incr(large), 1e-9), 2),
    }
    print(json.dumps(result))

    section = f"""
## Incremental BM25 index vs batch keyword recompute (N23)

Fixed change rate ({n_changes:,} changed docs/epoch, {n_epochs} epochs),
two corpus sizes. Batch = ``bm25_topk`` over the full live corpus (what
a pipeline without the index reruns per query batch); incremental =
``IncrementalBM25Index.refresh`` (changelog-fed signed postings +
doclen deltas, exactly-once commit included) plus a 4-term
``search()`` over the maintained index.

| corpus | bootstrap refresh | per-epoch refresh (median) | search (median) | per-epoch batch (median) | batch/(refresh+search) |
|---|---|---|---|---|---|
| {small['docs']:,} docs | {small['bootstrap_refresh_sec']}s | {small['refresh_median']}s | {small['search_median']}s | {small['batch_median']}s | {round(small['batch_median']/max(incr(small),1e-9),1)}x |
| {large['docs']:,} docs | {large['bootstrap_refresh_sec']}s | {large['refresh_median']}s | {large['search_median']}s | {large['batch_median']}s | {round(large['batch_median']/max(incr(large),1e-9),1)}x |

4x the corpus grows the batch recompute {result['batch_growth_4x_docs']}x while the
incremental refresh+search grows {result['incremental_growth_4x_docs']}x. The refresh's
COMPUTE (tokenize + net) is strictly O(changed docs); search reads only
the queried terms' `_bucket=` postings dirs (path-pruned) plus a
candidate-bounded doclen join — never the text. As with the N21/N22
benches, a fixed per-refresh job-overhead floor dominates at toy scale
(the honest crossover); at the 10^10-doc regime the batch rerun is not
schedulable per epoch at all. (The bootstrap refresh IS the one
O(corpus) pass — paid once.) Reproduce:
``python tools/bench_text_index.py``.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(section)
    spark.stop()


if __name__ == "__main__":
    main()
