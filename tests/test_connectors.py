"""Kafka source wiring + HTTP schema-registry client (network-free)."""

import json

import pytest

from kafka_connect_converter_json_spark.sources.avro_codec import AvroDecodeError
from kafka_connect_converter_json_spark.sources import connectors as cx


def test_kafka_source_options():
    opts = cx.kafka_source_options(
        "b1:9092,b2:9092", "cdc.events", max_offsets_per_trigger=2_000_000,
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "cdc.events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "2000000",
    }


def test_events_from_kafka_mapping(spark):
    """Static DataFrame shaped like Kafka's record output -> event cols."""
    rows = [
        (b'{"repo":"r1","path":"p"}', b'{"content":"x"}', "t", 0, 7, None),
        (b'{"repo":"r1","path":"q"}', None, "t", 1, 9, None),  # tombstone
    ]
    records = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
    )
    out = {r.lsn: r for r in cx.events_from_kafka(records).collect()}
    assert out[7].op == "u" and out[7].value_json == '{"content":"x"}'
    assert out[9].op == "d" and out[9].value_json is None  # delete keeps key only
    assert out[9].key_json == '{"repo":"r1","path":"q"}'
    assert out[7].kafka_partition == 0 and out[9].kafka_offset == 9

    avro = cx.events_from_kafka(records, value_format="avro").collect()
    by = {r.lsn: r for r in avro}
    assert by[7].value_bytes == b'{"content":"x"}' and by[7].value_json is None


def test_events_from_kafka_envelope_op(spark):
    """ADVICE r2: Debezium-style deletes encoded in the value payload
    (op:'d', no tombstone) must map to delete, not LWW-win as an upsert."""
    rows = [
        (b'{"k":1}', b'{"op":"u","after":{"x":1}}', "t", 0, 1, None),
        (b'{"k":1}', b'{"op":"d","before":{"x":1}}', "t", 0, 2, None),  # payload delete
        (b'{"k":2}', b'{"after":{"x":2}}', "t", 0, 3, None),            # no op field
        (b'{"k":2}', None, "t", 0, 4, None),                            # tombstone
    ]
    records = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
    )
    out = {r.lsn: r.op for r in cx.events_from_kafka(records, op_from="envelope").collect()}
    assert out == {1: "u", 2: "d", 3: "u", 4: "d"}
    # default tombstone mode keeps the documented only-tombstones contract
    legacy = {r.lsn: r.op for r in cx.events_from_kafka(records).collect()}
    assert legacy == {1: "u", 2: "u", 3: "u", 4: "d"}
    with pytest.raises(ValueError):
        cx.events_from_kafka(records, value_format="avro", op_from="envelope")
    with pytest.raises(ValueError):
        cx.events_from_kafka(records, op_from="bogus")


def test_http_registry_fetch_once_and_memo():
    calls = []

    def fake_fetch(url, timeout):
        calls.append(url)
        return json.dumps({"schema": json.dumps({"type": "record", "name": "R", "fields": []})})

    reg = cx.HttpSchemaRegistry("http://sr:8081/", fetch=fake_fetch)
    s1 = reg.schema_for(42)
    s2 = reg.schema_for(42)
    assert s1 == s2 == {"type": "record", "name": "R", "fields": []}
    assert calls == ["http://sr:8081/schemas/ids/42"]  # resolve-once (JC:107-115)
    assert reg.cache_size() == 1


def test_http_registry_error_wrapped():
    def boom(url, timeout):
        raise OSError("connection refused")

    reg = cx.HttpSchemaRegistry("http://sr:8081", fetch=boom)
    with pytest.raises(AvroDecodeError, match="registry fetch failed for id 7"):
        reg.schema_for(7)


def test_http_registry_pickles_without_memo():
    import pickle

    def fake_fetch(url, timeout):
        return json.dumps({"schema": '"string"'})

    reg = cx.HttpSchemaRegistry("http://sr:8081", fetch=fake_fetch)
    reg.schema_for(1)
    assert reg.cache_size() == 1
    # the injectable fetch is a closure only in tests; production default
    # (urllib) pickles — emulate by restoring the default before pickling
    reg._fetch = cx._default_fetch
    clone = pickle.loads(pickle.dumps(reg))
    assert clone.cache_size() == 0 and clone.base_url == reg.base_url


def test_http_registry_decodes_wire_format():
    """End-to-end: HTTP-resolved schema drives the Confluent-framed decode."""
    from kafka_connect_converter_json_spark.sources import avro_codec as av

    schema = {"type": "record", "name": "Doc",
              "fields": [{"name": "id", "type": "long"}]}

    def fake_fetch(url, timeout):
        return json.dumps({"schema": json.dumps(schema)})

    reg = cx.HttpSchemaRegistry("http://sr:8081", fetch=fake_fetch)
    framed = av.encode_wire(5, av.encode(schema, {"id": 99}))
    name, tree = av.decode_wire(reg, framed)
    assert name == "Doc" and tree == {"id": 99}
