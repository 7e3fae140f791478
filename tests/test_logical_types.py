"""Logical-type stringification golden strings (FIXTURES.md F5; port of
testLogicalType / testSchemaLogicalTypeToStringConversion,
JsonConverterTest.java:571-750,834-880)."""

import pandas as pd
import pytest

from kafka_connect_converter_json_spark.functions import logical_types as lt


def test_date():
    assert lt.date_to_string(100) == "1970-04-11"
    assert lt.date_to_string(0) == "1970-01-01"
    assert lt.date_to_string(-1) == "1969-12-31"
    assert lt.date_to_string(19723) == "2024-01-01"


def test_time_millis_localtime_tostring_parity():
    # LocalTime.toString(): HH:mm when sec+nanos zero, trim subsecond groups
    assert lt.time_millis_to_string(0) == "00:00"
    assert lt.time_millis_to_string(60_000) == "00:01"
    assert lt.time_millis_to_string(61_000) == "00:01:01"
    assert lt.time_millis_to_string(61_500) == "00:01:01.500"
    assert lt.time_millis_to_string(13 * 3_600_000 + 14 * 60_000) == "13:14"


def test_time_micros():
    assert lt.time_micros_to_string(0) == "00:00"
    assert lt.time_micros_to_string(1_000_000) == "00:00:01"
    assert lt.time_micros_to_string(1_500_000) == "00:00:01.500"
    assert lt.time_micros_to_string(1_500_001) == "00:00:01.500001"


def test_timestamp_instant_tostring_parity():
    # Instant.toString(): seconds always printed, subseconds trimmed by 3s
    assert lt.timestamp_millis_to_string(0) == "1970-01-01T00:00:00Z"
    assert lt.timestamp_millis_to_string(1_000) == "1970-01-01T00:00:01Z"
    assert lt.timestamp_millis_to_string(1_500) == "1970-01-01T00:00:01.500Z"
    assert lt.timestamp_micros_to_string(1_500_001) == "1970-01-01T00:00:01.500001Z"
    assert lt.timestamp_micros_to_string(1_704_067_200_000_000) == "2024-01-01T00:00:00Z"
    # pre-epoch
    assert lt.timestamp_millis_to_string(-500) == "1969-12-31T23:59:59.500Z"


def test_local_timestamp_localdatetime_tostring_parity():
    # LocalDateTime.toString(): omits :ss when sec+nanos zero, no zone
    assert lt.local_timestamp_millis_to_string(0) == "1970-01-01T00:00"
    assert lt.local_timestamp_millis_to_string(60_000) == "1970-01-01T00:01"
    assert lt.local_timestamp_millis_to_string(61_000) == "1970-01-01T00:01:01"
    assert lt.local_timestamp_micros_to_string(61_000_001) == "1970-01-01T00:01:01.000001"


def test_uuid():
    u = "123e4567-e89b-12d3-a456-426614174000"
    assert lt.uuid_to_string(u) == u


def test_decimal_bigdecimal_tostring_parity():
    # FIXTURES F5: decimal(64,0) value 314159 -> "314159"
    assert lt.decimal_to_string((314159).to_bytes(4, "big", signed=True), 0) == "314159"
    assert lt.decimal_to_string((314159).to_bytes(4, "big", signed=True), 2) == "3141.59"
    assert lt.decimal_to_string((-5).to_bytes(1, "big", signed=True), 1) == "-0.5"


def test_unknown_logical_type_raises():
    # JC:616-618 UnknownFormatConversionException parity
    with pytest.raises(ValueError):
        lt.convert("duration", 1)


def test_series_convert_vectorized():
    s = pd.Series([0, 1_000, None], dtype=object)
    out = lt.series_convert("timestamp-millis", s)
    assert list(out) == ["1970-01-01T00:00:00Z", "1970-01-01T00:00:01Z", None]


def test_decimal_high_precision_no_rounding():
    # >28 significant digits (precision 38 is routine in CDC) must NOT be
    # rounded by a default-context Decimal nor flip to scientific notation
    unscaled = 10**37 + 1  # 38 significant digits
    b = unscaled.to_bytes(17, "big", signed=True)
    assert lt.decimal_to_string(b, 2) == "1" + "0" * 35 + ".01"
    assert lt.decimal_to_string(b, 0) == str(unscaled)
    neg = (-(10**30 + 7)).to_bytes(14, "big", signed=True)
    assert lt.decimal_to_string(neg, 5) == "-" + "1" + "0" * 20 + "00000.00007"


def test_decimal_bigdecimal_scientific_layout():
    # BigDecimal.toString() scientific cases: scale<0 or adjusted < -6
    one = (1).to_bytes(1, "big", signed=True)
    five = (5).to_bytes(1, "big", signed=True)
    assert lt.decimal_to_string(one, 10) == "1E-10"       # new BigDecimal(1, 10)
    assert lt.decimal_to_string(five, -3) == "5E+3"       # negative scale
    assert lt.decimal_to_string((123).to_bytes(1, "big"), 9) == "1.23E-7"
    assert lt.decimal_to_string((0).to_bytes(1, "big"), 2) == "0.00"
    assert lt.decimal_to_string((-1).to_bytes(1, "big", signed=True), 10) == "-1E-10"
