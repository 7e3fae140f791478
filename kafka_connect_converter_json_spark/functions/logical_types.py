"""Logical-type -> string conversions with java.time ``toString()`` parity.

The reference registers nine one-way ``Conversion`` classes (JC:1033-1262,
logical-type defs JC:816-958) so that JSON encoding emits human-readable
strings instead of raw ints/longs/bytes; the schema rewrite that forces
them is JC:551-633 (``createLogicalTypesStringSchema``). This module is
the vectorized PySpark-side equivalent: pure scalar functions over the raw
Avro representations plus pandas-Series fast paths for use inside
``mapInPandas`` batches, and Spark Column builders for the JVM fast path.

Parity rules (SURVEY.md §2.3 — all verified against java.time docs):

- ``LocalDate.toString()``      -> ``yyyy-MM-dd``                  (JC:1229-1231)
- ``LocalTime.toString()``      -> ``HH:mm`` when sec+nanos == 0;
                                   ``HH:mm:ss`` when nanos == 0;
                                   else subseconds trimmed in groups
                                   of 3 (.SSS / .SSSSSS / .SSSSSSSSS)
                                                                    (JC:1177-1179,1203-1205)
- ``Instant.toString()``        -> ISO-8601 UTC with ``Z``; seconds
                                   always printed; subseconds only when
                                   nonzero, trimmed in groups of 3    (JC:1125-1127,1151-1153)
- ``LocalDateTime.toString()``  -> same but no zone and ``:ss``
                                   omitted when sec+nanos == 0       (JC:1050-1052,1099-1101)
- ``UUID.toString()``           -> canonical lowercase uuid          (JC:1073-1075)
- ``BigDecimal.toString()``     -> plain scale-preserving string for
                                   typical (p,s)                     (JC:1259-1261)

All conversions are one-way (typed -> string), exactly like the reference
(every ``fromCharSequence`` throws, e.g. JC:1046-1048).
"""

from __future__ import annotations

import datetime as _dt
import uuid as _uuid

import pandas as pd

_EPOCH = _dt.date(1970, 1, 1)


def _subsec_suffix(nanos: int) -> str:
    """java.time subsecond rendering: trimmed in groups of three digits."""
    if nanos == 0:
        return ""
    if nanos % 1_000_000 == 0:
        return f".{nanos // 1_000_000:03d}"
    if nanos % 1_000 == 0:
        return f".{nanos // 1_000:06d}"
    return f".{nanos:09d}"


def date_to_string(days: int) -> str:
    """Avro ``date`` (days since epoch) -> LocalDate.toString()."""
    return (_EPOCH + _dt.timedelta(days=int(days))).isoformat()


def _time_nanos_to_string(nanos_of_day: int) -> str:
    h, rem = divmod(int(nanos_of_day), 3_600_000_000_000)
    m, rem = divmod(rem, 60_000_000_000)
    s, nanos = divmod(rem, 1_000_000_000)
    if s == 0 and nanos == 0:
        return f"{h:02d}:{m:02d}"
    return f"{h:02d}:{m:02d}:{s:02d}{_subsec_suffix(nanos)}"


def time_millis_to_string(millis: int) -> str:
    """Avro ``time-millis`` -> LocalTime.toString() (JC:1160-1185)."""
    return _time_nanos_to_string(int(millis) * 1_000_000)


def time_micros_to_string(micros: int) -> str:
    """Avro ``time-micros`` -> LocalTime.toString() (JC:1187-1210)."""
    return _time_nanos_to_string(int(micros) * 1_000)


def _instant_to_string(epoch_sec: int, nanos: int) -> str:
    if nanos < 0:  # normalize for pre-epoch instants
        epoch_sec -= 1
        nanos += 1_000_000_000
    base = _dt.datetime.fromtimestamp(epoch_sec, tz=_dt.timezone.utc)
    return base.strftime("%Y-%m-%dT%H:%M:%S") + _subsec_suffix(nanos) + "Z"


def timestamp_millis_to_string(millis: int) -> str:
    """Avro ``timestamp-millis`` -> Instant.toString() (JC:1108-1133)."""
    sec, ms = divmod(int(millis), 1000)
    return _instant_to_string(sec, ms * 1_000_000)


def timestamp_micros_to_string(micros: int) -> str:
    """Avro ``timestamp-micros`` -> Instant.toString() (JC:1135-1158)."""
    sec, us = divmod(int(micros), 1_000_000)
    return _instant_to_string(sec, us * 1_000)


def _local_dt_to_string(epoch_sec: int, nanos: int) -> str:
    base = _dt.datetime.fromtimestamp(epoch_sec, tz=_dt.timezone.utc)
    head = base.strftime("%Y-%m-%dT%H:%M")
    sec = base.second
    if sec == 0 and nanos == 0:
        return head
    return f"{head}:{sec:02d}{_subsec_suffix(nanos)}"


def local_timestamp_millis_to_string(millis: int) -> str:
    """Avro ``local-timestamp-millis`` -> LocalDateTime.toString() (JC:1033-1057)."""
    sec, ms = divmod(int(millis), 1000)
    return _local_dt_to_string(sec, ms * 1_000_000)


def local_timestamp_micros_to_string(micros: int) -> str:
    """Avro ``local-timestamp-micros`` -> LocalDateTime.toString() (JC:1082-1106)."""
    sec, us = divmod(int(micros), 1_000_000)
    return _local_dt_to_string(sec, us * 1_000)


def uuid_to_string(value) -> str:
    """Avro ``uuid`` -> UUID.toString() (JC:1059-1080)."""
    return str(_uuid.UUID(str(value)))


def decimal_to_string(unscaled_bytes: bytes, scale: int) -> str:
    """Avro ``decimal`` (two's-complement big-endian unscaled bytes + scale)
    -> BigDecimal.toString() (JC:1238-1262).

    Built from the unscaled int digits directly — NOT via ``Decimal.scaleb``
    under the default 28-digit context, which silently rounds >28-sig-digit
    values (precision 38 is routine in CDC) and flips to scientific
    notation. Layout mirrors BigDecimal.toString(): plain notation when
    scale == 0, or scale > 0 with adjusted exponent >= -6; scientific
    (``dEsign`` with '+' on non-negative exponents) otherwise.
    """
    unscaled = int.from_bytes(unscaled_bytes, byteorder="big", signed=True)
    sign = "-" if unscaled < 0 else ""
    digits = str(abs(unscaled))
    if scale == 0:
        return sign + digits
    adjusted = (len(digits) - 1) - scale
    if scale > 0 and adjusted >= -6:  # plain notation
        if len(digits) > scale:
            return f"{sign}{digits[:-scale]}.{digits[-scale:]}"
        return f"{sign}0.{'0' * (scale - len(digits))}{digits}"
    # scientific: one integer digit, then fraction, then E<adjusted>
    coeff = digits[0] + (f".{digits[1:]}" if len(digits) > 1 else "")
    return f"{sign}{coeff}E{'+' if adjusted >= 0 else ''}{adjusted}"


#: dispatch table keyed by avro logical-type name -> scalar converter.
#: Unknown logical types raise, matching JC:616-618.
CONVERSIONS = {
    "date": date_to_string,
    "time-millis": time_millis_to_string,
    "time-micros": time_micros_to_string,
    "timestamp-millis": timestamp_millis_to_string,
    "timestamp-micros": timestamp_micros_to_string,
    "local-timestamp-millis": local_timestamp_millis_to_string,
    "local-timestamp-micros": local_timestamp_micros_to_string,
    "uuid": uuid_to_string,
    # decimal handled separately (needs scale)
}


def convert(logical_type: str, value, scale: int | None = None):
    """Scalar dispatch. Raises on unknown logical type (JC:616-618)."""
    if value is None:
        return None
    if logical_type == "decimal":
        return decimal_to_string(value, scale or 0)
    fn = CONVERSIONS.get(logical_type)
    if fn is None:
        raise ValueError(f"Unknown logical type: {logical_type!r}")  # JC:616-618
    return fn(value)


# ---------------------------------------------------------------------------
# Vectorized pandas fast paths (for mapInPandas batches)
# ---------------------------------------------------------------------------

def series_convert(logical_type: str, s: pd.Series, scale: int | None = None) -> pd.Series:
    """Vectorized conversion of a pandas Series of raw representations."""
    if logical_type == "decimal":
        return s.map(lambda b: None if b is None else decimal_to_string(b, scale or 0))
    fn = CONVERSIONS.get(logical_type)
    if fn is None:
        raise ValueError(f"Unknown logical type: {logical_type!r}")
    return s.map(lambda v: None if v is None else fn(v))


# ---------------------------------------------------------------------------
# Spark Column builders (JVM fast path — whole-stage-codegen friendly)
# ---------------------------------------------------------------------------

def spark_date_iso(col):
    """DateType column -> 'yyyy-MM-dd' string, JVM-side."""
    from pyspark.sql import functions as F

    return F.date_format(col, "yyyy-MM-dd")


def spark_decimal_plain(col):
    """DecimalType column -> scale-preserving plain string, JVM-side."""
    from pyspark.sql import functions as F

    return col.cast("string") if not isinstance(col, str) else F.col(col).cast("string")
