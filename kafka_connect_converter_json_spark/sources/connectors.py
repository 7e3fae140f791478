"""Production source connectors: Kafka readStream wiring + Confluent
schema-registry HTTP client.

The sandbox has neither a Kafka broker nor the spark-sql-kafka connector
jar, so this module separates what IS testable here from what needs the
real infrastructure:

- ``kafka_source_options`` / ``events_from_kafka`` — pure plan builders
  (option map, column mapping from Kafka's record schema to the engine's
  EVENT_SCHEMA) — fully unit-tested against static DataFrames.
- ``kafka_stream`` — the one-line ``readStream.format("kafka")`` wiring
  itself (the framework boundary, the analogue of Connect calling
  ``toConnectData`` per record, JC:142-155). Raises a clear error when
  the connector jar is absent.
- ``HttpSchemaRegistry`` — Confluent REST ``GET /schemas/ids/{id}`` with
  an in-process memo, replacing the sandbox's ``LocalSchemaRegistry``
  dict stand-in (CachedSchemaRegistryClient, JC:107-115). The HTTP fetch
  is injectable so the cache/decode discipline is tested without a
  network. At scale: construct on the driver, let executors lazily fetch
  + memo per process (schema ids are tiny and immutable — at most one
  fetch per (executor, id)), or pre-resolve known ids and broadcast.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .avro_codec import AvroDecodeError, parse_schema


# ---------------------------------------------------------------------------
# Kafka source
# ---------------------------------------------------------------------------

def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    **extra: str,
) -> dict[str, str]:
    """Option map for ``readStream.format("kafka")`` (public Spark-Kafka
    integration options only). ``max_offsets_per_trigger`` bounds the
    micro-batch size — the epoch-sizing knob at 10^10-event scale."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def events_from_kafka(
    records: DataFrame, value_format: str = "json", op_from: str = "tombstone",
) -> DataFrame:
    """Map Kafka's record schema (key/value binary, partition, offset) to
    the engine's event columns.

    - ``lsn`` := kafka offset. Kafka guarantees order per partition and a
      CDC connector keys records by primary key, so every version of a
      key lives in ONE partition — per-key LWW ordering by (offset) is
      exactly the binlog contract the engine needs. Cross-partition
      ordering is neither provided nor required.
    - tombstone (null value) -> ``op='d'`` with keys recovered from the
      record key (JC:316-318 null-value passthrough as MERGE DELETE).
    - ``op_from`` selects how deletes are recognized for NON-tombstone
      records (ADVICE r2: sources like Debezium without
      ``tombstones.on.delete`` encode deletes *inside* the value):

      - ``"tombstone"`` — only null-value records are deletes; every
        non-null value is an upsert. Correct ONLY for topics where the
        connector emits tombstones for deletes (Debezium default,
        JDBC-sink conventions). A delete encoded in the payload would
        LWW-win as an upsert under this mode — pick ``"envelope"`` there.
      - ``"envelope"`` — ``op`` is read from the payload's top-level
        ``op`` field (Debezium: c/r/u/d); ``d`` maps to delete, anything
        else (or a missing field) to upsert. JSON values only: Avro op
        extraction happens after decode, downstream of this mapping.
    - ``value_format="avro"`` keeps the raw bytes for the Avro converter
      (Confluent framing decoded there); ``"json"`` casts to string.
    """
    if op_from not in ("tombstone", "envelope"):
        raise ValueError(f"op_from must be tombstone|envelope, got {op_from!r}")
    if op_from == "envelope" and value_format != "json":
        raise ValueError(
            "op_from='envelope' requires value_format='json' (Avro op fields "
            "are extracted post-decode by the Avro converter)"
        )
    value_json = (
        F.col("value").cast("string")
        if value_format == "json"
        else F.lit(None).cast("string")
    )
    if op_from == "envelope":
        op = F.when(F.col("value").isNull(), F.lit("d")).otherwise(
            F.when(
                F.get_json_object(F.col("value").cast("string"), "$.op") == "d",
                F.lit("d"),
            ).otherwise(F.lit("u"))
        )
    else:
        op = F.when(F.col("value").isNull(), F.lit("d")).otherwise(F.lit("u"))
    cols = [
        F.col("offset").cast("long").alias("lsn"),
        op.alias("op"),
        F.lit(None).cast("string").alias("schema_name"),
        value_json.alias("value_json"),
        F.col("key").cast("string").alias("key_json"),
        F.col("partition").cast("int").alias("kafka_partition"),
        F.col("offset").cast("long").alias("kafka_offset"),
    ]
    if value_format == "avro":
        cols.append(F.col("value").alias("value_bytes"))
    return records.select(*cols)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_format: str = "json",
    **option_kwargs,
) -> DataFrame:
    """``readStream.format("kafka")`` -> engine event columns. Requires
    the spark-sql-kafka connector on the classpath (not present in this
    sandbox — the wiring is still the production entry point)."""
    opts = kafka_source_options(bootstrap_servers, topic, **option_kwargs)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        records = reader.load()
    except Exception as e:  # noqa: BLE001 — missing connector jar
        raise RuntimeError(
            "kafka connector unavailable (add spark-sql-kafka-0-10 to the "
            "classpath); use streaming.stream.stream_ingest's file source "
            "as the sandbox stand-in"
        ) from e
    return events_from_kafka(records, value_format=value_format)


# ---------------------------------------------------------------------------
# Confluent schema-registry HTTP client
# ---------------------------------------------------------------------------

def _default_fetch(url: str, timeout: float) -> str:
    from urllib.request import urlopen  # stdlib only; no extra deps

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 — http(s) registry URL
        return resp.read().decode("utf-8")


class HttpSchemaRegistry:
    """Confluent REST registry client with the reference's resolve-once
    memo (CachedSchemaRegistryClient, JC:107-115): ``schema_for(id)``
    fetches ``GET {base_url}/schemas/ids/{id}`` once per process and
    caches the parsed schema forever (registry ids are immutable).

    Drop-in for ``LocalSchemaRegistry`` anywhere a ``schema_for`` is
    consumed (operators/avro_extract.py). Pickles cleanly into executor
    closures: the memo is rebuilt per worker process (at most one HTTP
    round-trip per (worker, schema id))."""

    def __init__(
        self,
        base_url: str,
        timeout: float = 10.0,
        fetch: Callable[[str, float], str] | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._fetch = fetch or _default_fetch
        self._memo: dict[int, dict] = {}

    def __getstate__(self):  # executor closure: drop the live memo
        state = dict(self.__dict__)
        state["_memo"] = {}
        return state

    def schema_for(self, schema_id: int) -> dict:
        schema = self._memo.get(schema_id)
        if schema is None:
            try:
                body = self._fetch(f"{self.base_url}/schemas/ids/{schema_id}", self.timeout)
            except Exception as e:  # noqa: BLE001
                raise AvroDecodeError(f"registry fetch failed for id {schema_id}: {e}") from e
            payload = json.loads(body)
            schema = parse_schema(payload["schema"])
            self._memo[schema_id] = schema
        return schema

    def cache_size(self) -> int:
        return len(self._memo)
