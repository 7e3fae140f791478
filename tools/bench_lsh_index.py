"""Evidence for the N21 claim: an incremental LSH-index refresh costs
O(changed docs), while batch near-dup detection re-shingles the whole
corpus — so the win widens with corpus size at a fixed change rate.

Protocol: bootstrap a document sink at two corpus sizes (D and 4D),
then apply E epochs of C changed docs each (updates of existing keys —
the retraction + add path). Per epoch, time (a) the index refresh and
(b) the batch recompute (``minhash_lsh_candidates`` over the full live
corpus, the operator a pipeline without the index must rerun). Report
medians per corpus size: refresh time should stay ~flat from D to 4D
while batch time grows ~linearly.

Prints one JSON line and appends a section to BENCH.md. Run alone:
never benchmark concurrently with other Spark work on this host.

Env knobs: SPARK_GRAFT_LSHBENCH_DOCS (D, default 50_000),
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
    d_base = int(os.environ.get("SPARK_GRAFT_LSHBENCH_DOCS", "50000"))
    n_changes = int(os.environ.get("SPARK_GRAFT_LSHBENCH_CHANGES", "2000"))
    n_epochs = int(os.environ.get("SPARK_GRAFT_LSHBENCH_EPOCHS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    from kafka_connect_converter_json_spark.operators.textdedup import (
        minhash_lsh_candidates,
    )
    from kafka_connect_converter_json_spark.streaming.lsh_index import (
        IncrementalLSHIndex,
    )
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local-lshbench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def content(ver: int):
        # 40 pseudo-words, a pure function of (doc key, version) — unique
        # per doc so shingling cost is honest; near-dup HITS are not the
        # point here, per-epoch COST is.
        return F.concat_ws(
            " ",
            *[
                F.lower(F.hex(F.xxhash64(F.col("k"), F.lit(ver), F.lit(j))))
                for j in range(40)
            ],
        ).alias("content")

    def run_size(n_docs: int) -> dict:
        tmp = tempfile.mkdtemp(dir="/dev/shm")
        try:
            sink = BucketedMergeSink(
                spark, os.path.join(tmp, "sink"), keys=["k"],
                order_col="lsn", num_buckets=32,
            )
            idx = IncrementalLSHIndex(
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

            refresh_s, batch_s = [], []
            for e in range(1, n_epochs + 1):
                changed = (
                    spark.range(n_docs)
                    .filter(
                        F.pmod(F.xxhash64("id", F.lit(e)), F.lit(max(1, n_docs // n_changes))) == 0
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
                live = sink.read().select(F.col("k").alias("_id"), "content")
                t0 = time.time()
                minhash_lsh_candidates(
                    live, "content", "_id", n=3, num_hashes=16, bands=4,
                    max_band_freq=None,
                ).count()
                batch_s.append(round(time.time() - t0, 2))
            return {
                "docs": n_docs,
                "changes_per_epoch": n_changes,
                "bootstrap_refresh_sec": round(t_bootstrap, 2),
                "refresh_sec": refresh_s,
                "batch_recompute_sec": batch_s,
                "refresh_median": round(statistics.median(refresh_s), 2),
                "batch_median": round(statistics.median(batch_s), 2),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    small = run_size(d_base)
    large = run_size(d_base * 4)
    result = {
        "metric": "incremental LSH index refresh vs batch near-dup recompute",
        "small": small,
        "large": large,
        "batch_growth_4x_docs": round(
            large["batch_median"] / max(small["batch_median"], 1e-9), 2
        ),
        "refresh_growth_4x_docs": round(
            large["refresh_median"] / max(small["refresh_median"], 1e-9), 2
        ),
        "speedup_at_4x": round(
            large["batch_median"] / max(large["refresh_median"], 1e-9), 2
        ),
    }
    print(json.dumps(result))

    section = f"""
## Incremental LSH index vs batch near-dup recompute (N21)

Fixed change rate ({n_changes:,} changed docs/epoch, {n_epochs} epochs),
two corpus sizes. Batch = ``minhash_lsh_candidates`` over the full live
corpus (what a pipeline without the index reruns per epoch); refresh =
``IncrementalLSHIndex.refresh`` (changelog-fed adds + preimage
retractions + new-pair probe, exactly-once commit included).

| corpus | bootstrap refresh | per-epoch refresh (median) | per-epoch batch (median) | batch/refresh |
|---|---|---|---|---|
| {small['docs']:,} docs | {small['bootstrap_refresh_sec']}s | {small['refresh_median']}s | {small['batch_median']}s | {round(small['batch_median']/max(small['refresh_median'],1e-9),1)}x |
| {large['docs']:,} docs | {large['bootstrap_refresh_sec']}s | {large['refresh_median']}s | {large['batch_median']}s | {round(large['batch_median']/max(large['refresh_median'],1e-9),1)}x |

4x the corpus grows the batch recompute {result['batch_growth_4x_docs']}x while the
incremental refresh grows {result['refresh_growth_4x_docs']}x. The refresh's COMPUTE
(shingle + minhash + band) is strictly O(changed docs); what grows with
the corpus is only the probe's scan of the stored (id, band) table —
two narrow columns, no text, no hashing — and a ~5s fixed floor of
per-refresh job overhead (changelog read, delta write, exactly-once
commit) that dominates at toy scale, which is why batch wins below the
crossover. Batch re-runs the full text pipeline over every doc every
epoch; at the 10^10-doc regime that rerun is not schedulable per epoch
at all, while the index's per-epoch cost is the change volume plus a
columnar scan. (The bootstrap refresh IS the one O(corpus) pass — paid
once.) Reproduce: ``python tools/bench_lsh_index.py``.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(section)
    spark.stop()


if __name__ == "__main__":
    main()
