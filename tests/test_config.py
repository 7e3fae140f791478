"""Config-prefix parser (O21, JCC:36-121) and validation behavior."""

import pytest

from kafka_connect_converter_json_spark.config import (
    ConfigError,
    ConverterConfig,
    IdentifierRule,
)


def test_from_connect_map_full():
    cfg = ConverterConfig.from_connect_map(
        {
            "payload.field.name": "payload",
            "input.format": "json",
            "schema.names": "ComplexSchemaName, SimpleSchemaName",
            "uppercase": "true",
            "ComplexSchemaName.int32": "intkey",
            "ComplexSchemaName.subrecord1.subrecord2.int32": "nestedkey",
            "SimpleSchemaName.intkey": "intkey",
            "SimpleSchemaName.keyname": "nestedkey",
            "json.ComplexSchemaName.int32": "true",
            "json.SimpleSchemaName.keyname": "simple-name",
        }
    )
    assert cfg.schema_names == ("ComplexSchemaName", "SimpleSchemaName")
    assert cfg.keys["ComplexSchemaName"]["subrecord1.subrecord2.int32"] == "nestedkey"
    assert cfg.identifiers[0] == IdentifierRule("ComplexSchemaName", ("int32",), "true")
    assert cfg.identifiers[1].expected == "simple-name"
    assert cfg.target_columns() == ["INTKEY", "NESTEDKEY", "PAYLOAD"]


def test_bad_input_format_rejected():
    with pytest.raises(ConfigError, match="json|avro"):
        ConverterConfig.from_connect_map(
            {"input.format": "xml", "schema.names": "S", "S.a": "k", "json.S.a": "true"}
        )


def test_unrecognized_key_rejected():
    with pytest.raises(ConfigError, match="unrecognized"):
        ConverterConfig.from_connect_map(
            {"schema.names": "S", "S.a": "k", "json.S.a": "true", "Other.x": "y"}
        )


def test_missing_identifier_for_json_schema():
    with pytest.raises(ConfigError, match="identifier"):
        ConverterConfig.from_connect_map({"schema.names": "S", "S.a": "k"})


def test_bad_boolean_flag():
    with pytest.raises(ConfigError, match="true\\|false"):
        ConverterConfig.from_connect_map(
            {"schema.names": "S", "S.a": "k", "json.S.a": "true", "uppercase": "yes"}
        )


def test_avro_does_not_require_identifiers():
    cfg = ConverterConfig.from_connect_map(
        {"input.format": "avro", "schema.names": "S", "S.a": "k"}
    )
    assert cfg.identifiers == ()


def test_lowercase_fold():
    cfg = ConverterConfig.from_connect_map(
        {"schema.names": "S", "S.a": "KeyName", "json.S.a": "true", "uppercase": "false"}
    )
    assert cfg.target_columns() == ["keyname", "event"]  # default payload col, JCC:57


def test_payload_field_default_is_event():
    # JCC:57 — payload.field.name defaults to "event"
    cfg = ConverterConfig(
        schema_names=("S",),
        keys={"S": {"k": "k"}},
        identifiers=(IdentifierRule("S", ("k",), "true"),),
    )
    assert cfg.payload_field_name == "event"
    assert cfg.payload_column == "EVENT"
    cfg2 = ConverterConfig.from_connect_map(
        {"schema.names": "S", "S.k": "k", "json.S.k": "true"}
    )
    assert cfg2.payload_field_name == "event"
