"""Deterministic hash-based sampling and splitting for training-data
pipelines.

``df.sample()`` is seed-dependent on partitioning (a repartition changes
which rows survive), which is unacceptable for reproducible corpus
construction: the keep/drop decision must be a pure function of the ROW,
not of its physical placement. These operators decide per-key from an
md5-derived uniform value, so the same row is kept in every run, on any
partitioning, in any engine (the formula is plain SQL — the DuckDB
oracles replicate it verbatim).

At scale both are embarrassingly parallel filters/projections — zero
shuffle, fully pushed into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = float(1 << 32)


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform 32-bit value in [0, 2^32) from md5(salt:key) —
    engine-portable (``('0x' || substr(md5(..),1,8))::UBIGINT`` in DuckDB)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str | None = None,
    fractions: dict[str, float] | None = None,
    default: float = 1.0,
    salt: str = "s0",
) -> DataFrame:
    """Deterministic (optionally stratified) sample: keep a row iff
    hash(salt:key) < fraction * 2^32, where fraction comes from the row's
    stratum (``fractions[strata_col]``, else ``default``). Changing the
    salt draws an independent sample; the expected kept share per stratum
    is its fraction (md5 output is uniform)."""
    frac: Column = F.lit(float(default))
    if fractions:
        if strata_col is None:
            raise ValueError("fractions requires strata_col")
        for stratum, fr in sorted(fractions.items()):
            frac = F.when(F.col(strata_col) == stratum, F.lit(float(fr))).otherwise(frac)
    return df.filter(_hash_unit(F.col(key_col), salt) < frac * F.lit(_BUCKETS))


def train_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    test_fraction: float = 0.1,
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/test assignment: adds ``split`` ('train'/'test')
    as a pure projection. The same key lands in the same split across
    runs, engines, and repartitions — the property that prevents
    train/test contamination when the corpus is rebuilt."""
    is_test = _hash_unit(F.col(key_col), salt) < F.lit(float(test_fraction)) * F.lit(
        _BUCKETS
    )
    return df.withColumn("split", F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def take_per_stratum(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    k: int = 10,
    salt: str = "s0",
) -> DataFrame:
    """Exactly-k-per-stratum balanced subset (class balancing): within
    each stratum, rank rows by the deterministic hash and keep the first
    k. Unlike fraction sampling the output size is exact (min(k, |stratum|)),
    and unlike ``ORDER BY rand()`` the subset is stable across runs,
    engines, and repartitions.

    Only (key, stratum, hash) moves through the ranking shuffle — the
    window runs over a narrow projection, and the winners (k x |strata|
    rows: tiny by construction) broadcast back as a map-side semi-join,
    so full rows never shuffle at all."""
    from pyspark.sql import Window

    h = _hash_unit(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy(F.asc("_h"), F.asc(key_col))
    keep = (
        df.select(key_col, strata_col)
        .withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(key_col)
    )
    return df.join(F.broadcast(keep), key_col, "left_semi")
