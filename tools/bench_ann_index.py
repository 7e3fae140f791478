"""Evidence for the N22 claim: an incremental ANN-index refresh costs
O(changed docs · K), while batch IVF search re-assigns the whole corpus
per run — so the win widens with corpus size at a fixed change rate.

Protocol: bootstrap an embedding sink at two corpus sizes (D and 4D),
then apply E epochs of C changed docs each (updates of existing keys —
the retraction + add path). Per epoch, time (a) the index refresh PLUS
a search over a fixed query panel (what the index serves) and (b) the
batch recompute (``ivf_topk`` over the full live corpus with the same
panel — the operator a pipeline without the index must rerun, codebook
training included because batch has nowhere to persist one). Report
medians per corpus size: refresh+search should stay ~flat from D to 4D
while batch grows ~linearly.

Prints one JSON line and appends a section to BENCH.md. Run alone:
never benchmark concurrently with other Spark work on this host.

Env knobs: SPARK_GRAFT_ANNBENCH_DOCS (D, default 200_000),
_CHANGES (C, default 2_000), _EPOCHS (E, default 3), _QUERIES
(default 64), _DIM (default 64 — production embeddings are
hundreds-dimensional; a toy dim hides the per-doc assignment cost the
bench exists to measure), _CPUS (32).
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

DIM = int(os.environ.get("SPARK_GRAFT_ANNBENCH_DIM", "64"))


def main() -> None:
    d_base = int(os.environ.get("SPARK_GRAFT_ANNBENCH_DOCS", "200000"))
    n_changes = int(os.environ.get("SPARK_GRAFT_ANNBENCH_CHANGES", "2000"))
    n_epochs = int(os.environ.get("SPARK_GRAFT_ANNBENCH_EPOCHS", "3"))
    n_queries = int(os.environ.get("SPARK_GRAFT_ANNBENCH_QUERIES", "64"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    from kafka_connect_converter_json_spark.operators.similarity import ivf_topk
    from kafka_connect_converter_json_spark.streaming.ann_index import (
        IncrementalANNIndex,
    )
    from kafka_connect_converter_json_spark.streaming.sink import BucketedMergeSink

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local-annbench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def vec(ver: int):
        # deterministic dense vector, a pure function of (doc key,
        # version): DIM signed hash components in [-1, 1)
        return F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("k"), F.lit(ver), F.lit(j)), F.lit(2000))
                    .cast("double")
                    / 1000.0
                    - 1.0
                )
                for j in range(DIM)
            ]
        ).alias("emb")

    queries = spark.range(n_queries).select(
        F.concat(F.lit("q-"), F.col("id")).alias("query_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64("id", F.lit(999), F.lit(j)), F.lit(2000))
                    .cast("double")
                    / 1000.0
                    - 1.0
                )
                for j in range(DIM)
            ]
        ).alias("vec"),
    ).cache()
    queries.count()

    def run_size(n_docs: int) -> dict:
        tmp = tempfile.mkdtemp(dir="/dev/shm")
        try:
            sink = BucketedMergeSink(
                spark, os.path.join(tmp, "sink"), keys=["k"],
                order_col="lsn", num_buckets=32,
            )
            idx = IncrementalANNIndex(
                spark, os.path.join(tmp, "idx"), sink,
                vec_col="emb", n_centroids=32,
            )
            base = spark.range(n_docs).select(
                F.concat(F.lit("doc-"), F.col("id")).alias("k"),
                F.col("id").alias("lsn"),
            ).select("k", "lsn", vec(0), F.lit("u").alias("op"))
            sink.merge(base, epoch=0)
            t0 = time.time()
            idx.refresh(to_epoch=0)
            t_bootstrap = time.time() - t0

            refresh_s, batch_s = [], []
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
                    .select("k", "lsn", vec(e), F.lit("u").alias("op"))
                )
                sink.merge(changed, epoch=e)
                t0 = time.time()
                idx.refresh(to_epoch=e)
                idx.search(queries, k=10, nprobe=4).count()
                refresh_s.append(round(time.time() - t0, 2))
                live = sink.read().select(
                    F.col("k").alias("vec_id"), F.col("emb").alias("embedding")
                )
                t0 = time.time()
                ivf_topk(
                    live, queries.select(
                        F.col("query_id").alias("vec_id"),
                        F.col("vec").alias("embedding"),
                    ),
                    k=10, n_centroids=32, nprobe=4,
                ).count()
                batch_s.append(round(time.time() - t0, 2))
            return {
                "docs": n_docs,
                "changes_per_epoch": n_changes,
                "bootstrap_refresh_sec": round(t_bootstrap, 2),
                "refresh_plus_search_sec": refresh_s,
                "batch_recompute_sec": batch_s,
                "refresh_median": round(statistics.median(refresh_s), 2),
                "batch_median": round(statistics.median(batch_s), 2),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    small = run_size(d_base)
    large = run_size(d_base * 4)
    result = {
        "metric": "incremental ANN index refresh+search vs batch IVF recompute",
        "queries": n_queries,
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
## Incremental ANN index vs batch IVF recompute (N22)

Fixed change rate ({n_changes:,} changed docs/epoch, {n_epochs} epochs),
{n_queries}-query panel, dim-{DIM} embeddings, two corpus sizes. Batch = ``ivf_topk`` over the
full live corpus (codebook training included — a pipeline without the
index has nowhere to persist one); incremental = ``refresh()`` (changelog
adds + preimage retractions, exactly-once commit) PLUS a ``search()``
over the same panel against the live index.

| corpus | bootstrap refresh | per-epoch refresh+search (median) | per-epoch batch (median) | batch/refresh |
|---|---|---|---|---|
| {small['docs']:,} docs | {small['bootstrap_refresh_sec']}s | {small['refresh_median']}s | {small['batch_median']}s | {round(small['batch_median'] / max(small['refresh_median'], 1e-9), 1)}x |
| {large['docs']:,} docs | {large['bootstrap_refresh_sec']}s | {large['refresh_median']}s | {large['batch_median']}s | {round(large['batch_median'] / max(large['refresh_median'], 1e-9), 1)}x |

4x the corpus grows the batch recompute {result['batch_growth_4x_docs']}x while the
incremental refresh+search grows {result['refresh_growth_4x_docs']}x. The refresh's
COMPUTE (assign changed vectors to the frozen codebook) is strictly
O(changed docs · K); what grows with the corpus is only the probed
cells' share of the search scan — nprobe/n_centroids of the stored
(id, cell, vec) table, path-pruned to the ``_cell=`` dirs — plus the
fixed per-refresh job overhead (changelog read, delta write,
exactly-once commit) that dominates at toy scale. Batch re-trains and
re-assigns every vector every epoch; at the 10^10-doc regime that pass
is not schedulable per epoch, while the index's cost is the change
volume plus a cell-pruned scan. (The bootstrap refresh IS the one
O(corpus) pass — paid once.) Reproduce: ``python tools/bench_ann_index.py``.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(section)
    spark.stop()


if __name__ == "__main__":
    main()
