"""N-vs-4N scaling-efficiency evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north rule's two-cluster
criterion is evidenced by running the IDENTICAL ingest job (same seed,
same event count) at two parallelism levels — local[8] and local[32] —
in separate JVMs, reporting throughput at both plus

    efficiency = (throughput_32 / throughput_8) / 4

Writes BENCH.md and prints the JSON result. Each run is a fresh
``spark-submit``-equivalent subprocess so no JVM state is shared.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
from kafka_connect_converter_json_spark.streaming.ingest import ingest

cores = {cores}
n = {n_events}
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(cores))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
root = {root!r}
shutil.rmtree(root, ignore_errors=True)
params = dict(n_repos=500, paths_per_repo=400, skew=3.0, num_partitions=cores * 4)
events = gen_events(spark, n, **params)
src = lambda lo, hi: gen_events(spark, hi - lo, start=lo, **params)
# warm the JVM/codegen once on a small prefix so we measure steady state
ingest(spark, events.limit(10000), root + "_warm", 10000, n_epochs=1, num_buckets=16)
t0 = time.time()
ingest(spark, events, root, n, n_epochs={epochs}, num_buckets=64, epoch_source=src)
dt = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "sec": round(dt, 2),
      "events_per_sec": round(n / dt)}}))
"""


def run_at(cores: int, n_events: int, epochs: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"scale_{cores}_")
    script = RUN_TEMPLATE.format(
        repo=REPO, cores=cores, n_events=n_events, root=os.path.join(root, "tbl"), epochs=epochs
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=1800,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "4000000"))
    epochs = int(os.environ.get("SPARK_GRAFT_SCALE_EPOCHS", "4"))
    lo = run_at(8, n_events, epochs)
    hi = run_at(32, n_events, epochs)
    eff = round((hi["events_per_sec"] / lo["events_per_sec"]) / 4, 3)
    result = {
        "n_events": n_events,
        "epochs": epochs,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_8_to_32": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (N vs 4N parallelism)

Protocol (BASELINE.md): the identical CDC ingest job — deterministic
seeded event stream (seed 42, {n_events:,} events, 500 repos x 400
paths, Zipf skew 3.0), native JVM parse path, LWW dedup, {epochs}
exactly-once MERGE epochs into the bucketed sink — run in two fresh
JVMs at two parallelism levels on the same machine (the sandbox stand-in
for N and 4N executors; no real cluster available).

| parallelism | wall sec | events/sec |
|---|---|---|
| local[8]  (N)  | {lo['sec']} | {lo['events_per_sec']:,} |
| local[32] (4N) | {hi['sec']} | {hi['events_per_sec']:,} |

**Scaling efficiency (T32/T8)/4 = {eff}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Throughput above includes everything: envelope generation, JSON parse,
key extraction, LWW shuffle, and the copy-on-write MERGE rewrites of
touched buckets each epoch. Run ``python tools/bench_scaling.py`` to
reproduce; ``bench.py`` reports the per-query headline suite.
"""
        )


if __name__ == "__main__":
    main()
