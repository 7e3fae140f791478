"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and **broadcast**; the corpus side streams
  through one codegen'd projection (zip_with dot product in doubles) and
  a per-query top-k window. No shuffle of the corpus except the final
  k-row-per-query window over |Q| x |corpus| scored pairs — at scale,
  replace the window with a per-partition top-k + global top-k merge
  (two-level, implemented below as the default).

- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH. The
  hyperplane sign weights are derived **at plan-build time** from
  ``md5(f"{table}:{h}:{d}")`` (deterministic, engine-independent — any
  engine regenerates them offline) and embedded as Column literals, so
  the hot path is pure arithmetic: zero hash calls per row. Projections
  accumulate as round(x*w, 9) decimals — exact, order-independent
  addition, so the sketch bit (sign of the projection) is reproducible
  bit-for-bit across engines regardless of summation order (a float sum
  near 0 could flip sign under reassociation). Candidates are vectors
  sharing a bucket with the query in any of ``tables`` sketch tables;
  exact cosine re-ranks candidates only. Probe cost drops from O(N) to
  O(N / 2^bits * tables) per query at a small recall cost.

Embedding-cosine near-dup pairs (the "embedding near-dup" dedup family)
reuse the same machinery via ``cosine_near_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # The higher-order-function fold. r6 A/B note: an unrolled flat
    # 64-term sum (element_at chain) measured 3-10x SLOWER everywhere —
    # the giant expression tree defeats codegen and is evaluated
    # interpreted per node — so the fold form is deliberate.
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
    """Exact brute-force top-k neighbors per query vector, two-level.

    Output: (query_id, neighbor_id, cos) — self-matches excluded, ties
    broken by neighbor id ascending. The query side is broadcast; scores
    round to ``round_digits`` for cross-engine determinism.

    Scale shape: a single ``row_number`` window partitioned by query_id
    would funnel ALL |corpus| scored rows of each query into one task —
    the straggler at 10^10 rows. Instead level 1 takes top-k per
    (query_id, corpus scan partition): the shuffle key carries the scan
    partition id, so work spreads over every partition and no task sees
    more than one partition's rows per query. Level 2 re-ranks only the
    <= k * num_partitions survivors per query. Both levels use the same
    total order (cos desc, neighbor_id asc), so every global top-k row
    ranks <= k inside its own partition — the result is EXACTLY the
    single-level answer. LSH/IVF (below) remain the candidate-pruned
    scale paths; this is the exact baseline.
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
            F.spark_partition_id().alias("_pid"),
        )
    )
    order = [F.col("cos").desc(), F.col("neighbor_id")]
    w1 = Window.partitionBy("query_id", "_pid").orderBy(*order)
    survivors = (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_pid", "_r1")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return survivors.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def hyperplane_weights(bits: int, table: int, dim: int) -> list[list[float]]:
    """Plan-time +/-1 hyperplane weights: w[h][d] = +1 iff the first hex
    digit of md5(f"{table}:{h}:{d}") is < '8'. Pure public hashlib — any
    engine (the DuckDB oracle included) regenerates the identical matrix,
    and the runtime plan carries them as literals (zero per-row hashing)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{table}:{h}:{d}".encode()).hexdigest()[0] < "8" else -1.0
            for d in range(dim)
        ]
        for h in range(bits)
    ]


def _decimal_projection(vec, w):
    """sum_d decimal9(vec[d]*w[d]) as exact decimal — order-independent
    addition, so the sign (the sketch bit) is engine-reproducible. The
    double->decimal cast rounds the exact binary value to scale 9; with
    +/-1 weights the product is exactly +/-vec[d], so both engines
    quantize the identical value. ``w`` is an array<double> Column."""
    terms = F.zip_with(
        vec, w, lambda x, wd: (x.cast("double") * wd).cast("decimal(28,9)")
    )
    return F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,9)"),
        lambda acc, x: (acc + x).cast("decimal(38,9)"),
    )


# |decimal projection - float projection| is bounded by the per-term
# decimal(28,9) quantization (dim * 0.5e-9) plus float summation error
# (~dim^2 * ulp) — ~3.3e-8 at dim 64. Any float projection farther from
# zero than this bound has the decimal fold's sign for certain.
_SIGN_EPS = 1e-6


def _sketch_sql(vec_name: str, bits: int, table: int, dim: int) -> str:
    """The ``dim`` hyperplane sketch as ONE SQL expression string.

    Semantically identical to the Column-API form below (same
    zip_with/aggregate operation sequence, same float-first sign with
    the decimal(38,9) boundary fallback — differential-tested equal),
    but built with a single JVM parse instead of ~600 py4j round trips
    per sketch: profiling showed ann_lsh spending 3.7s of DRIVER time
    per build in py4j socket latency (19.7k calls) before any job ran —
    a scale-independent cost the bench pays on every repeat."""
    ws = hyperplane_weights(bits, table, dim)
    col = f"`{vec_name}`"
    parts = []
    for h in range(bits):
        arr = "array(" + ",".join("1.0D" if x > 0 else "-1.0D" for x in ws[h]) + ")"
        pf = (
            f"aggregate(zip_with({col}, {arr}, (x, wd) -> CAST(x AS DOUBLE) * wd), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        dec = (
            f"aggregate(zip_with({col}, {arr}, "
            "(x, wd) -> CAST(CAST(x AS DOUBLE) * wd AS DECIMAL(28,9))), "
            "CAST(0 AS DECIMAL(38,9)), (acc, x) -> CAST(acc + x AS DECIMAL(38,9)))"
        )
        sign = (
            f"CASE WHEN {pf} > 1.0E-6D THEN true WHEN {pf} < -1.0E-6D THEN false "
            f"ELSE {dec} >= CAST(0 AS DECIMAL(38,9)) END"
        )
        parts.append(
            f"(CASE WHEN {sign} THEN shiftleft(CAST(1 AS BIGINT), {h}) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    expr = parts[0]
    for p in parts[1:]:
        expr = f"({expr} | {p})"
    return expr


def hyperplane_sketch(vec, bits: int, table: int = 0, dim: int | None = None):
    """Deterministic random-hyperplane sign sketch: bit h of the sketch =
    sign of sum_d(w[h,d] * vec[d]).

    With ``dim`` (the fixed embedding dimension): plan-time md5-derived
    literal weights, evaluated float-first — the cheap double fold decides
    the bit whenever |projection| > _SIGN_EPS (where float and decimal
    signs provably agree); only boundary rows pay the decimal-exact fold,
    so the sketch stays bit-for-bit oracle-reproducible at float cost
    (VERDICT r2 #3: the all-decimal fold was the suite's cost center).
    Without ``dim`` (dynamic-width vectors): per-row xxhash64-derived
    weights and float fold — cheap and Spark-reproducible, but not
    cross-engine-exact.

    ``vec`` may be a plain column NAME (str): with ``dim`` set this
    takes the single-parse SQL fast path (``_sketch_sql``) — identical
    values, ~600x fewer py4j calls at plan-build time."""
    if isinstance(vec, str):
        if dim is not None:
            return F.expr(_sketch_sql(vec, bits, table, dim))
        vec = F.col(vec)
    one = F.lit(1).cast("long")

    if dim is not None:
        ws = hyperplane_weights(bits, table, dim)
        # r6: ONE array<array<double>> literal for the whole weight
        # matrix, rows picked with element_at — the per-bit 64-literal
        # CreateArray form cost thousands of py4j Column calls at
        # DataFrame-BUILD time (measured 9.3s of driver time for
        # ann_lsh's 4 tables x 4 bits before any job ran) and bloated
        # the codegen'd projection. Same values, same zip_with/aggregate
        # operation sequence => bit-for-bit identical sketches.
        W = F.lit(ws)

        def bit(h: int):
            w = F.element_at(W, h + 1)
            pf = F.aggregate(
                F.zip_with(vec, w, lambda x, wd: x.cast("double") * wd),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sign = F.when(pf > _SIGN_EPS, True).when(pf < -_SIGN_EPS, False).otherwise(
                _decimal_projection(vec, w) >= 0  # boundary rows only
            )
            return F.when(sign, F.shiftleft(one, h)).otherwise(F.lit(0).cast("long"))
    else:

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
    dim: int | None = None,
    max_bucket_freq: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing an LSH bucket with
    the query in any table; exact cosine re-rank on candidates only.
    ``max_bucket_freq`` drops corpus rows in degenerate hot buckets (a
    bucket holding f vectors contributes f candidates *per probing query*
    — the unbounded fan-out at scale); queries always keep their buckets."""
    def sketched(df, idname):
        # ids + buckets ONLY: the 64-float vectors never enter the bucket
        # join or the distinct shuffle — they are joined back per distinct
        # candidate pair, which is strictly less data movement
        buckets = F.array(
            *[
                F.concat_ws(
                    ":", F.lit(str(t)),
                    hyperplane_sketch(vec_col, bits, t, dim=dim).cast("string"),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(idname), F.explode(buckets).alias("bucket")
        )

    c = sketched(corpus, "neighbor_id")
    if max_bucket_freq is not None:
        from .textdedup import band_frequency_cut

        # r6: with a frequency cut the corpus bucket table is referenced
        # by the cut aggregation AND the probe join — localCheckpoint it
        # so the tables*bits hyperplane folds run once per action, not
        # once per branch (ids+buckets only, O(corpus*tables) small
        # rows). Without a cut it is consumed exactly once and the
        # checkpoint would be pure overhead, so it is conditional.
        c = band_frequency_cut(c.localCheckpoint(), "bucket", max_bucket_freq)
    q = sketched(queries, "query_id")
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id",
    vec_col: str = "embedding", lloyd_rounds: int = 0,
) -> list[list[float]]:
    """Deterministic IVF codebook: the ``n_centroids`` corpus vectors
    with the smallest md5(id) (hash-random sample, ordered by the hash)
    — ANY fixed codebook is a valid IVF-flat index, and the hash rule is
    reproducible in every engine with md5, with no RNG state.

    ``lloyd_rounds`` > 0 runs that many fixed k-means (Lloyd) updates:
    assign every corpus vector to its nearest current centroid, replace
    each centroid with its cell's elementwise mean (rounded to 6dp so
    summation order cannot perturb downstream argmin ties), keep the old
    centroid for empty cells. Hash-sampled codebooks are cell-imbalanced
    on clustered corpora — hot cells degrade nprobe recall at scale —
    and 2-3 rounds tighten that. Cost per round: ONE aggregation job
    whose result is n_centroids x dim rows (driver-side codebooks are
    always a tiny separate training phase); rounds=0 preserves the pure
    hash rule."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r._v] for r in rows]
    for _ in range(int(lloyd_rounds)):
        darr = F.array(*[_sq_dist(F.col("_v"), c) for c in cents])
        stats = (
            corpus.select(F.col(vec_col).alias("_v"))
            .select(
                (F.array_position(darr, F.array_min(darr)) - 1).alias("_cell"),
                F.posexplode(F.col("_v")).alias("_pos", "_x"),
            )
            .groupBy("_cell", "_pos")
            .agg(F.avg(F.col("_x").cast("double")).alias("_mean"))
            .collect()
        )
        means: dict[int, dict[int, float]] = {}
        for r in stats:
            means.setdefault(int(r._cell), {})[int(r._pos)] = float(r._mean)
        cents = [
            [round(means[ci][p], 6) for p in range(len(cents[ci]))]
            if ci in means else cents[ci]
            for ci in range(len(cents))
        ]
    return cents


def _sq_dist(vec, centroid: list[float]):
    """Rounded squared L2 distance to a literal centroid. The 6dp round
    absorbs float-summation noise so argmin/rank ties break identically
    across engines."""
    c = F.array(*[F.lit(x) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(
                vec, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _sq_dist_sql(vec_name: str, centroid: list[float]) -> str:
    """``_sq_dist`` as SQL text — identical zip_with/aggregate operation
    sequence (repr() round-trips each double exactly), one JVM parse
    instead of ~80 py4j calls per centroid (the sketch lesson, §_sketch_sql)."""
    arr = "array(" + ",".join(f"{x!r}D" for x in centroid) + ")"
    return (
        f"round(aggregate(zip_with(`{vec_name}`, {arr}, "
        "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6)"
    )


def _sq_dist_array(vec_name: str, cents: list[list[float]]):
    """The full K-distance array as ONE parsed SQL expression."""
    return F.expr(
        "array(" + ",".join(_sq_dist_sql(vec_name, c) for c in cents) + ")"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    lloyd_rounds: int = 0,
) -> DataFrame:
    """IVF-flat ANN top-k: corpus vectors are assigned to their nearest
    codebook cell (one pure projection — the cell id would be a partition
    column at 100 TB, giving cell-pruned scans); each query probes its
    ``nprobe`` nearest cells and exact cosine re-ranks only those cells'
    vectors. Probe cost ~ nprobe/n_centroids of the corpus per query.
    Candidate generation moves ids only; vectors join back per candidate.
    ``lloyd_rounds`` refines the codebook (see ``ivf_centroids``)."""
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col, lloyd_rounds)

    # materialize the K-distance array once per row (a second reference
    # would recompute the whole K x dim expression — no CSE across
    # projections), then argmin with first-min tiebreak. r6: the array
    # is one parsed SQL expression (_sq_dist_array) — same values, no
    # per-literal py4j build cost.
    cells = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _sq_dist_array(vec_col, cents).alias("_d"),
        )
        .select(
            "neighbor_id",
            (F.array_position(F.col("_d"), F.array_min("_d")) - 1).alias("cell"),
        )
    )
    # same materialize-first discipline on the query side: element_at of
    # the K-distance array inside the transform lambda would rebuild the
    # whole K x dim expression per centroid index
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        _sq_dist_array(vec_col, cents).alias("_qd"),
    ).select(
        "query_id",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                            lambda i: F.struct(
                                F.element_at(F.col("_qd"), i + 1).alias("d"),
                                i.alias("i"),
                            ),
                        )
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["i"],
            )
        ).alias("cell"),
    )
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the embedding-compression
    step of a training-data pipeline (4x smaller vectors, ~1% cosine
    error at dim 64): scale = max|x|/127, q_d = clamp(round(x_d/scale)).
    Pure JVM projection, no shuffle; engine-portable arithmetic (double
    division + HALF_UP rounding match any SQL engine's round())."""
    # materialize absmax into a column FIRST: referencing the aggregate
    # expression inside the transform lambda would re-run the O(dim)
    # fold once per element (O(dim^2) per row — no CSE across lambda
    # scopes, the same trap as text.fingerprint)
    pre = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        F.aggregate(
            F.col(vec_col), F.lit(0.0),
            lambda a, v: F.greatest(a, F.abs(v.cast("double"))),
        ).alias("_absmax"),
    )
    scale = F.col("_absmax") / F.lit(127.0)
    q = F.when(F.col("_absmax") == 0, F.transform(F.col("_v"), lambda v: F.lit(0))).otherwise(
        F.transform(
            F.col("_v"),
            lambda v: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(v.cast("double") / scale, 0).cast("int")),
            ),
        )
    )
    return pre.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        q.alias("q"),
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    round_digits: int = 4,
    dim: int | None = None,
    max_bucket_freq: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact re-check.
    ``max_bucket_freq`` caps the f^2/2 self-join fan-out of a degenerate
    bucket (see ``textdedup.band_frequency_cut``)."""
    from .textdedup import band_frequency_cut

    buckets = F.array(
        *[
            F.concat_ws(
                ":", F.lit(str(t)),
                hyperplane_sketch(vec_col, bits, t, dim=dim).cast("string"),
            )
            for t in range(tables)
        ]
    )
    # ids + buckets only through the self-join and distinct (see
    # lsh_bucket_topk); vectors join back per distinct candidate pair.
    # r6 note: this parquet-rooted shape keeps every join a broadcast and
    # the pipeline codegen'd. An A/B against a localCheckpoint'd
    # banded_self_pairs variant (the minhash/simhash winner) measured the
    # checkpoint form 5x WORSE here (ExistingRDD has no stats => the
    # ~9.5M-pair stream sort-merge-joins its vector attaches), so this
    # operator deliberately keeps the explode+distinct form — the sketch
    # projection it recomputes per branch is cheap, unlike a signature
    # aggregation.
    banded = df.select(F.col(id_col).alias("id"), F.explode(buckets).alias("bucket"))
    banded = band_frequency_cut(banded, "bucket", max_bucket_freq)
    a = banded.select("bucket", F.col("id").alias("id_a"))
    b = banded.select("bucket", F.col("id").alias("id_b"))
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # r6: norms once per VECTOR (not twice per pair): _norm(v) is the
    # identical deterministic fold either way, so cos is bit-for-bit
    # unchanged while 2/3 of the per-pair fold work disappears (the
    # exact re-check dominates this operator: 9.7s -> 5.6s at sf1.0).
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")),
                round_digits,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
