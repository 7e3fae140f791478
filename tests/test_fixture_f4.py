"""F4 customer_state fixture (FIXTURES.md; port of testCustomerStateTopic,
JsonConverterTest.java:60-138): deeply nested business envelope with an
array-of-structs and a union event field."""

import json

import pandas as pd

from kafka_connect_converter_json_spark.config import ConverterConfig, IdentifierRule
from kafka_connect_converter_json_spark.operators.extract import convert_batch

F4 = {
    "CustomerState": {
        "customerId": "id01",
        "Name": {"firstname": "Jørn", "lastname": "Hanserud"},
        "Address": [
            {"type": "hjemme", "address1": "Ajervegen 2"},
            {"type": "hytta", "address1": "Meksikovegen 893"},
        ],
    },
    "Event": {"AddressRemoved": {"Address": {"type": "hytta", "address1": None}}},
}


def _cfg():
    return ConverterConfig(
        payload_field_name="payload",
        schema_names=("CustomerStateTopic",),
        keys={
            "CustomerStateTopic": {
                "CustomerState.customerId": "customerid",
                "CustomerState.Name.lastname": "lastname",
                # array-of-structs: element [0] then field (JC:561-562)
                "CustomerState.Address.type": "firstaddresstype",
                # union branch descent: map-first-value surrogate picks the
                # single branch deterministically (SURVEY.md §2.1 O9)
                "Event.AddressRemoved.Address.type": "removedtype",
            }
        },
        identifiers=(
            IdentifierRule("CustomerStateTopic", ("CustomerState", "customerId"), "true"),
        ),
        uppercase=True,
    )


def test_f4_extraction():
    pdf = pd.DataFrame({"value_json": [json.dumps(F4, ensure_ascii=False)]})
    out = convert_batch(pdf, _cfg())
    row = out.iloc[0]
    assert row["_error"] is None
    assert row["CUSTOMERID"] == "id01"
    assert row["LASTNAME"] == "Hanserud"
    assert row["FIRSTADDRESSTYPE"] == "hjemme"  # array element [0]
    assert row["REMOVEDTYPE"] == "hytta"
    # UTF-8 content preserved through the canonical payload (TEST:752-832)
    assert "Jørn" in row["PAYLOAD"]
    assert json.loads(row["PAYLOAD"]) == F4


def test_f4_union_branch_absent_is_strict_intermediate():
    """Missing union branch in the path is a missing INTERMEDIATE ->
    error channel (JC:444-446), not a silent null."""
    variant = {**F4, "Event": {"AddressAdded": {"Address": {"type": "ny"}}}}
    pdf = pd.DataFrame({"value_json": [json.dumps(variant, ensure_ascii=False)]})
    out = convert_batch(pdf, _cfg(), errors="quarantine")
    assert "missing intermediate" in out.iloc[0]["_error"]
