"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — typed metadata schema,
Arrow-batched ``mapInPandas`` decode/feature/resize/frame-sample UDF
signatures, partitioning by size class — while the actual codec calls
are STUBBED (image/audio libraries are not in this container): the
decode step raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake (hash-derived dimensions/features)
stands in so the pipeline shape is exercised end-to-end.

At 100 TB: binary payloads dominate I/O, so every operator here projects
metadata *without* deserializing payloads when possible (length/sha are
JVM-side), and the Python decode path receives only the rows that need
pixels, pre-partitioned by ``size_bucket`` so one giant video doesn't
straggle a task of thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata projection WITHOUT decoding: byte length + sha256 are
    JVM-side; zero Python, zero shuffle."""
    return df.select(
        "media_id",
        "kind",
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col(payload_col), 256)).alias("sha256"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: dimensions/frames derived from content
    bytes (stable across runs and engines)."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") if payload else 0
    if kind == "image":
        return {"width": 16 + h % 1024, "height": 16 + (h >> 10) % 1024, "n_frames": 1}
    if kind == "video":
        return {"width": 16 + h % 1024, "height": 16 + (h >> 10) % 1024, "n_frames": 1 + h % 300}
    return {"width": None, "height": None, "n_frames": 1 + h % 1000}  # audio: frames=chunks


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Real decode is stubbed (no codec libs in this container): raises
    NotImplementedError unless ``fake=True``. The fake path produces
    deterministic hash-derived dims + an ``feature_dim``-float signature
    so schema/batching/partitioning are exercised for real.
    """
    import hashlib

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic stub"
                )
            # Columnar batch shape: whole-Series C-level maps for the two
            # content hashes (per-payload by nature — a real codec call
            # sits exactly here), numpy for everything derived from them.
            # No per-row Python frames/dicts (the r1 itertuples loop).
            payloads = pdf[payload_col].map(
                lambda b: b"" if b is None else bytes(b)
            )
            digests = payloads.map(lambda p: hashlib.sha256(p).digest())
            h = np.fromiter(
                (int.from_bytes(p[:8].ljust(8, b"\0"), "big") for p in payloads),
                dtype=np.uint64,
                count=len(pdf),
            )
            kind = pdf["kind"].to_numpy()
            visual = (kind == "image") | (kind == "video")
            width = np.where(visual, 16 + h % 1024, 0).astype("float64")
            height = np.where(visual, 16 + (h >> np.uint64(10)) % 1024, 0).astype("float64")
            n_frames = np.select(
                [kind == "image", kind == "video"],
                [np.ones_like(h, dtype="float64"), (1 + h % 300).astype("float64")],
                default=(1 + h % 1000).astype("float64"),  # audio: chunks
            )
            width[~visual] = np.nan  # audio: no dimensions
            height[~visual] = np.nan
            feats = digests.map(
                lambda d: [
                    float(int.from_bytes(d[4 * i : 4 * i + 4], "big") % 1000) / 1000.0
                    for i in range(feature_dim)
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kind,
                    "n_bytes": payloads.map(len).to_numpy(),
                    "sha256": digests.map(bytes.hex).to_numpy(),
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "features": feats.to_numpy(),
                }
            )

    # size-class partitioning: keep giant payloads from straggling a task
    bucketed = df.withColumn(
        "_size_bucket", F.floor(F.log2(F.greatest(F.length(payload_col), F.lit(1))))
    ).repartition("_size_bucket")
    return bucketed.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Frame sampling plan for video: one output row per sampled frame
    index (frame extraction itself stubbed behind the fake decode)."""
    feats = decode_features(df.filter(F.col("kind") == "video"), fake=fake)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload from hashes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")).alias(
            "kind"
        ),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(
            F.repeat(F.hex(F.xxhash64("id", F.lit(seed + 1))), (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(64)) + 1).cast("int")),
            "utf-8",
        ).alias("payload"),
    )
