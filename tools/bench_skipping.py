"""Data-skipping micro-bench: what analyze()/bloom evidence buys a
point lookup against the same table, same session, same cache state.

Builds ONE bucketed sink from a deterministic CDC replay, compacts it
into multi-file buckets (Z-order on a non-key column so key ranges
interleave — the regime where only the bloom can skip), analyzes
min/max + blooms, then times three ways to answer the same
high-cardinality point query (a (repo, path) key fetch — the
commit-hash-lookup shape of the north rule's table):

  full_scan   read().filter(keys = v)          — no layout knowledge
  bucket_only read_key before analyze()        — 1/num_buckets pruning
  bucket_stats read_key after analyze(bloom)   — + within-bucket file skip

Each timed best-of-N over a panel of existing keys (plus absent keys,
where the bloom proves every file clean). Appends a section to BENCH.md
and prints one JSON line. Run solo; ~2-3 min.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
    from kafka_connect_converter_json_spark.streaming.ingest import ingest

    n_events = int(os.environ.get("SPARK_GRAFT_SKIP_EVENTS", "2000000"))
    n_keys = int(os.environ.get("SPARK_GRAFT_SKIP_PANEL", "8"))
    files_per_bucket = 8
    num_buckets = 16

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root0 = tempfile.mkdtemp(prefix="skipbench_", dir="/dev/shm")
    try:
        events = gen_events(
            spark, n_events, n_repos=500, paths_per_repo=400, skew=3.0
        )
        src = os.path.join(root0, "ev")
        events.write.mode("overwrite").parquet(src)
        events = spark.read.parquet(src)
        tbl = os.path.join(root0, "tbl")
        sink = ingest(
            spark, events, tbl, n_events, n_epochs=4,
            num_buckets=num_buckets, merge_mode="mor",
        )
        # multi-file buckets clustered on a NON-key axis: key ranges
        # interleave across files, so min/max alone cannot skip them
        sink.compact(zorder=["lsn"], files_per_bucket=files_per_bucket)

        panel = [
            (r["repo"], r["path"])
            for r in sink.read()
            .select("repo", "path")
            .orderBy(F.md5(F.concat("repo", "path")))
            .limit(n_keys)
            .collect()
        ]
        absent = [(f"repo-none-{i}", f"no/such_{i}.py") for i in range(n_keys)]

        def timed(fn, reps: int = 3) -> float:
            best = None
            for _ in range(reps):
                t0 = time.time()
                for args in panel:
                    fn(*args)
                dt = (time.time() - t0) / len(panel)
                best = dt if best is None or dt < best else best
            return best * 1000  # ms per lookup

        def full_scan(repo, path):
            sink.read().filter(
                (F.col("repo") == repo) & (F.col("path") == path)
            ).count()

        def key_lookup(repo, path):
            sink.read_key(repo, path).count()

        t_full = timed(full_scan)
        t_bucket = timed(key_lookup)  # pre-analyze: whole-bucket read
        stats = sink.analyze(bloom_cols=["repo", "path", ("repo", "path")])
        t_stats = timed(key_lookup)   # + within-bucket file skipping
        t0 = time.time()
        for repo, path in absent:
            sink.read_key(repo, path).count()
        t_absent = (time.time() - t0) / len(absent) * 1000

        files_read = len(sink.read_key(*panel[0]).inputFiles())
        result = {
            "n_events": n_events,
            "live_rows": sink.read().count(),
            "num_buckets": num_buckets,
            "files_per_bucket": files_per_bucket,
            "panel": n_keys,
            "ms_full_scan": round(t_full, 1),
            "ms_bucket_only": round(t_bucket, 1),
            "ms_bucket_plus_stats": round(t_stats, 1),
            "ms_absent_key": round(t_absent, 1),
            "files_read_stats_lookup": files_read,
            "files_bloomed": stats["files_bloomed"],
            "speedup_vs_full": round(t_full / t_stats, 1),
            "speedup_vs_bucket": round(t_bucket / t_stats, 2),
        }
        print(json.dumps(result))

        section = f"""
## Data-skipping lookup bench (analyze + bloom, {n_events / 1e6:.0f}M events)

One {result['live_rows']:,}-key table ({num_buckets} buckets x
{files_per_bucket} files, Z-ordered on `lsn` so key ranges interleave
across files — min/max alone cannot skip), same session and cache for
every arm; per-lookup ms, best-of-3 over an {n_keys}-key panel:

| arm | ms/lookup | what prunes |
|---|---|---|
| `read().filter(key)` | {result['ms_full_scan']} | nothing — full scan |
| `read_key` (no stats) | {result['ms_bucket_only']} | bucket hash: 1/{num_buckets} of files |
| `read_key` (analyze + bloom) | {result['ms_bucket_plus_stats']} | + per-file key evidence: {files_read}/{files_per_bucket} files of the bucket |
| `read_key`, ABSENT key | {result['ms_absent_key']} | every file proven clean |

**{result['speedup_vs_full']}x vs the full scan, {result['speedup_vs_bucket']}x
on top of bucket pruning.** At the 10^10 design point the bucket count
grows with the table (thousands), so the absolute win scales with table
size while the lookup cost stays O(bucket/files_per_bucket); the bloom
arm's advantage widens with `files_per_bucket` (more files skipped per
probe) and is what makes the commit-hash point-lookup shape practical
against a Z-ordered table clustered for OTHER query axes. Reproduce:
`python tools/bench_skipping.py` (env: SPARK_GRAFT_SKIP_EVENTS/_PANEL).
"""
        with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
            fh.write(section)
    finally:
        shutil.rmtree(root0, ignore_errors=True)


if __name__ == "__main__":
    main()
