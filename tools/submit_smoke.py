"""spark-submit --py-files smoke job (the north rule's launch mode).

Run:
    python tools/make_pyfiles.py
    spark-submit --master local[4] --py-files dist/cdc_engine.zip \
        tools/submit_smoke.py

The job imports the engine ONLY from the shipped zip (the repo dir is
scrubbed from sys.path first), replays a small deterministic CDC stream
through the full pipeline — native parse, LWW, 3 exactly-once MERGE
epochs — and verifies final-state row count, idempotent re-delivery,
and exact lineage. Exit code 0 = the packaged artifact is launchable
as the production entry point. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # imports must resolve from the --py-files zip, not the checkout
    sys.path = [p for p in sys.path if os.path.abspath(p or ".") != repo]

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_connect_converter_json_spark.sources.cdc_gen import gen_events
    from kafka_connect_converter_json_spark.streaming.ingest import ingest

    zip_sourced = "cdc_engine.zip" in (
        __import__("kafka_connect_converter_json_spark").__file__ or ""
    )

    n = 30000
    root = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        events = gen_events(spark, n, n_repos=40, paths_per_repo=30,
                            skew=2.0, num_partitions=4)
        src = tempfile.mkdtemp(prefix="submit_events_")
        events.write.mode("overwrite").parquet(src)
        stored = spark.read.parquet(src)
        sink = ingest(spark, stored, root, n, n_epochs=3,
                      parse_mode="native", num_buckets=8)
        keys = sink.read().count()
        # idempotent re-delivery: nothing changes
        sink2 = ingest(spark, stored, root, n, n_epochs=3,
                       parse_mode="native", num_buckets=8)
        assert sink2.read().count() == keys, "re-delivery changed state"
        lineage = sink.read_lineage().groupBy().sum("n_events").collect()[0][0]
        assert lineage == n, f"lineage {lineage} != {n}"
        print(json.dumps({
            "submit_smoke": "ok",
            "engine_from_zip": bool(zip_sourced),
            "events": n,
            "final_keys": int(keys),
            "lineage_events": int(lineage),
        }))
        shutil.rmtree(src, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
