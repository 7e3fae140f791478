"""Optional JVM Avro fast path (spark-avro), gated on the jar at runtime.

The reference deserializes Avro in the JVM (JsonConverter.java:365-374,
769-783). This engine's default is the from-scratch columnar numpy
decoder (``avro_columnar``) — portable, zero jars — which lands ~1.3x
off the pure-JVM ``from_json`` envelope path (BENCH.md). On any real
cluster the spark-avro package is one ``--packages
org.apache.spark:spark-avro_2.13:<spark-version>`` away; this module
closes the last 1.3x there:

- Confluent wire framing (magic 0x00 + 4-byte big-endian schema id,
  JC:769-783) is stripped JVM-side with ``substring``; the id is
  validated per row and mismatches quarantine into ``_error`` — the
  same observable contract as ``avro_convert_stream``.
- ``from_avro`` deserializes the body; keys extract as struct-field
  projections; the canonical JSON payload is ``to_json`` with
  ``ignoreNullFields=false`` (nulls kept, JC:497 canonical form).
- Whole path is zero-Python: scan -> substring -> from_avro ->
  projections -> to_json, all inside whole-stage codegen.

Scope: single known writer schema (the common CDC shape — one topic,
one subject) with plain leaves. Schemas carrying Avro logical types
keep the columnar path: ``from_avro`` maps them to Spark DATE/TIMESTAMP
whose string forms differ from the reference's java.time rendering
(functions/logical_types.py), and silently different strings are worse
than a slower exact path. Float/double key strings render via Spark's
(Java) formatting, which can differ from Python repr at extremes
(1e16 vs 1.0E16) — integer/string/boolean keys are exact.

The sandbox has no spark-avro jar, so execution tests are
``skipif not spark_avro_available(spark)`` (tests/test_jvm_gated.py);
the plan builder itself is exercised for its availability error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ConverterConfig
from .avro_columnar import ColumnarUnsupported, flatten

_AVAIL: dict[int, bool] = {}


def spark_avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro jar is on the JVM classpath (classload
    probe, memoized per session)."""
    key = id(spark)
    if key not in _AVAIL:
        try:
            spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
                "org.apache.spark.sql.avro.AvroDataToCatalyst"
            )
            _AVAIL[key] = True
        except Exception:  # noqa: BLE001 — any classload failure = absent
            _AVAIL[key] = False
    return _AVAIL[key]


def avro_convert_stream_jvm(
    df: DataFrame,
    config: ConverterConfig,
    schema_json: str,
    schema_id: int,
    schema_name: str,
    value_col: str = "value_bytes",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """JVM-native Avro converter for one known writer schema. Output
    columns match ``avro_convert_stream`` (passthrough + schema_name +
    target columns + _error) so the two paths swap behind one flag.

    Raises RuntimeError when spark-avro is absent, and
    ColumnarUnsupported for schemas whose stringification the JVM path
    cannot reproduce exactly (logical types / non-flat shapes).
    """
    spark = df.sparkSession
    if not spark_avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; launch with --packages "
            "org.apache.spark:spark-avro_2.13:<spark-version> or keep the "
            "default columnar decoder (operators.avro_extract)"
        )
    from pyspark.sql.avro.functions import from_avro

    for leaf in flatten(schema_json):  # raises ColumnarUnsupported if non-flat
        if "logical" in leaf:
            raise ColumnarUnsupported(
                "logical types render differently under from_avro; use the "
                "columnar decoder for exact reference-string parity"
            )

    v = F.col(value_col)
    magic_ok = F.expr(f"substring({value_col}, 1, 1)") == F.lit(bytes([0]))
    # bytes 1-4: big-endian schema id, read via hex -> base-16 conv
    rid = F.conv(F.hex(F.expr(f"substring({value_col}, 2, 4)")), 16, 10).cast("long")
    frame_ok = v.isNotNull() & (F.length(v) >= 5) & magic_ok & (rid == schema_id)
    body = F.expr(f"substring({value_col}, 6, 2147483647)")

    decoded = df.select(
        *passthrough,
        v.alias("_raw"),
        frame_ok.alias("_ok"),
        F.when(
            frame_ok,
            from_avro(body, schema_json, {"mode": "PERMISSIVE"}),
        ).alias("_e"),
    )

    declared = schema_name in config.schema_names
    target_cols = config.target_columns()
    payload_col = target_cols[-1]
    keymap = config.keys.get(schema_name, {})
    out_cols: list = list(passthrough)
    admitted = F.col("_ok") & F.lit(declared)
    out_cols.append(F.when(admitted, F.lit(schema_name)).alias("schema_name"))
    for tcol in target_cols[:-1]:
        src = next((p for p, t in keymap.items() if t == tcol), None)
        if src is None:
            out_cols.append(F.lit(None).cast("string").alias(tcol))
        else:
            out_cols.append(
                F.when(admitted, F.col("_e." + src).cast("string")).alias(tcol)
            )
    out_cols.append(
        F.when(
            admitted,
            F.to_json(F.col("_e"), {"ignoreNullFields": "false"}),
        ).alias(payload_col)
    )
    out_cols.append(
        F.when(F.col("_raw").isNull(), F.lit(None).cast("string"))  # tombstone
        .when(~F.col("_ok"), F.lit("avro: bad wire framing or schema id"))
        .when(~F.lit(declared), F.lit(f"avro: record name {schema_name!r} not in schema.names (JC:382-388)"))
        .otherwise(F.lit(None).cast("string"))
        .alias("_error")
    )
    return decoded.select(*out_cols)
