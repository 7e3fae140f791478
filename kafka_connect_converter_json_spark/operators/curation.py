"""Corpus-curation operators: cross-document boilerplate-line removal,
DSIR hashed-n-gram importance weights, and SemDeDup-style semantic
deduplication over an embedding column.

These complete the curation layer between the hygiene filters
(``operators/corpus_filters.py``) and the packing/mixture operators
(``operators/packing.py``): the reference converter reduces every value
to an indexable string column (JC:157-181); a 100 TB corpus built on
those columns is *curated* with exactly these three families —
RefinedWeb/CCNet-style line-level dedup for boilerplate, DSIR
(Xie et al., 2023) for target-domain selection, and SemDeDup
(Abbas et al., 2023) for embedding-space near-duplicates.

Scale notes (100 TB design point):
- ``line_dedup`` never shuffles text: the corpus-wide duplicate-line
  census moves only 8-byte 60-bit line hashes (distinct per doc before
  the explode, so the shuffle is bounded by distinct lines per doc);
  each document's duplicate-hash set comes back as an id-keyed array
  and the removal itself is a zero-shuffle higher-order filter. The
  one text-bearing exchange is the final id-keyed join of the (small)
  per-doc dup-set table back to the corpus — on a bucketed corpus
  table that join is shuffle-free on the corpus side.
- ``dsir_weights`` aggregates the corpus to ``n_buckets`` hashed-gram
  rows (map-side combine), broadcasts that table (a few KB), and
  scores documents in one pass — the classic two-scan DSIR shape.
  Text never shuffles; only (doc_id, bucket) pairs do.
- ``semantic_dedup`` is IVF-bucketed pairwise cosine: vectors shuffle
  once keyed by their nearest-centroid cell, and the quadratic
  comparison is confined to each cell (SemDeDup's core trick). At
  corpus scale pick n_centroids ~ sqrt(N) and lloyd_rounds >= 2 so
  cells stay balanced; the codebook is a tiny driver-side artifact
  exactly like ``ivf_topk``'s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus_filters import _nonblank_lines
from .similarity import _sq_dist, cosine, ivf_centroids


def _h60(col):
    """Engine-portable 60-bit non-negative hash: decimal value of the
    first 15 hex chars of md5 (same rule as textdedup.py:149 — the
    DuckDB oracle computes ('0x' || substr(md5(x),1,15))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def line_dedup(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RefinedWeb/CCNet-style cross-document line deduplication: any
    non-blank line (keyed by its trimmed form) that occurs in at least
    ``min_docs`` distinct documents is boilerplate and is removed from
    EVERY document containing it (headers, footers, nav bars, cookie
    banners — the dominant noise class in web corpora).

    Returns one row per input document: ``n_lines`` (non-blank lines),
    ``n_removed`` (lines dropped as boilerplate) and ``clean_md5``
    (md5 of the kept lines re-joined with newlines) so the cleaned
    payload is verifiable without shipping the text.
    """
    lines = _nonblank_lines(F.col(text_col))
    line_hashes = F.array_distinct(F.transform(lines, lambda x: _h60(F.trim(x))))

    # corpus-wide duplicate census over 8-byte hashes only; hashes are
    # distinct per doc, so count(*) per hash == distinct-doc count
    exploded = df.select(F.col(id_col), F.explode(line_hashes).alias("h"))
    dup = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("h")
    )
    doc_dup = (
        exploded.join(dup, "h")
        .groupBy(id_col)
        .agg(F.collect_set("h").alias("_dup_set"))
    )

    joined = (
        df.select(F.col(id_col), lines.alias("_lines"))
        .join(doc_dup, id_col, "left")
        .withColumn(
            "_dup_set", F.coalesce(F.col("_dup_set"), F.array().cast("array<long>"))
        )
    )
    kept = F.filter(
        F.col("_lines"),
        lambda x: ~F.array_contains(F.col("_dup_set"), _h60(F.trim(x))),
    )
    return joined.select(
        F.col(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
    )


def remove_dup_spans(
    df: DataFrame,
    k: int = 4,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-span REMOVAL (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): every token covered by a
    k-token span whose corpus-wide occurrence count is >= ``min_count``
    (within- OR cross-document) is removed. This is the removal half of
    the ``dup_spans`` detector (textdedup.py) — the rolling-window
    census is the scalable stand-in for the paper's suffix array.

    Returns one row per document: token counts before/after and the
    md5 of the space-joined surviving tokens.

    Scale shape: the span census shuffles 60-bit hashes only (map-side
    partial counts); each doc's duplicated-span set returns as an
    id-keyed array; the coverage mask and token filtering are
    zero-shuffle higher-order functions over the per-row arrays.
    """
    t = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )
    n = F.size(toks)
    m = n - k + 1  # number of k-token span starts (may be <= 0)
    span_starts = F.when(m >= 1, F.sequence(F.lit(0), m - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        span_starts, lambda j: _h60(F.array_join(F.slice(toks, j + 1, k), " "))
    )

    # r6: materialize the tokenized+span-hashed table once — it feeds
    # the census aggregate, the flagged-position join, AND the final
    # per-doc projection, and the O(n*k) span-text+md5 construction was
    # re-running once per branch.
    base = df.select(
        F.col(id_col), toks.alias("_toks"), spans.alias("_spans")
    ).localCheckpoint()
    exploded = base.select(
        F.col(id_col), F.posexplode("_spans").alias("_pos", "h")
    )
    dup = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    # r6: duplicated-span POSITIONS per doc via a semi-join on the span
    # hash (a native hash join) instead of collecting each doc's dup-hash
    # set and probing it with an interpreted array_contains per span —
    # the per-row O(|spans| x |dup-set|) lambda evaluation dominated this
    # operator (90.7s at sf1.0; the whole query is now ~12s). Identical
    # flagged positions, just computed where the engine is fast.
    flagged_pos = (
        exploded.join(dup, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_flag"))
    )
    j = base.join(flagged_pos, id_col, "left").withColumn(
        "_flag", F.coalesce(F.col("_flag"), F.array().cast("array<int>"))
    )
    covered = F.array_distinct(
        F.flatten(F.transform("_flag", lambda jj: F.sequence(jj, jj + k - 1)))
    )
    # kept indices = index sequence minus covered — array_except keeps
    # the left array's (ascending) order, exactly the old filter result,
    # without a per-element array_contains lambda.
    idx_seq = F.when(
        F.size("_toks") >= 1, F.sequence(F.lit(0), F.size("_toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept_idx = F.array_except(idx_seq, covered)
    clean = F.array_join(F.transform(kept_idx, lambda i: F.get("_toks", i)), " ")
    return j.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept_idx)).cast("long").alias("n_removed"),
        F.md5(clean).alias("clean_md5"),
    )


def dsir_weights(
    df: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    importance weights with hashed unigram features: each document's
    mean per-token log-likelihood ratio log p_target(b) - log p_raw(b),
    where b is the token's 60-bit-hash bucket in [0, n_buckets) and both
    distributions are Laplace-smoothed bucket frequencies — p computed
    over the target slice (rows where ``target_col == target_value``)
    and over the whole corpus respectively. Documents that look like
    the target domain score high; resample/threshold on ``dsir_w``.

    Two aggregate scans build the (<= n_buckets)-row feature table,
    which is broadcast for the scoring pass; text never shuffles.
    """
    t = F.trim(F.lower(F.col(text_col)))
    toks = df.filter(t != "").select(
        F.col(id_col),
        F.col(target_col),
        F.explode(F.split(t, r"\s+")).alias("term"),
    )
    bucketed = toks.select(
        F.col(id_col),
        F.col(target_col),
        (_h60(F.col("term")) % n_buckets).alias("b"),
    )
    raw = bucketed.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cnt_r"))
    tgt = (
        bucketed.filter(F.col(target_col) == target_value)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_t"))
    )
    stats = (
        raw.join(tgt, "b", "left")
        .withColumn("cnt_t", F.coalesce(F.col("cnt_t"), F.lit(0)))
        .withColumn("one", F.lit(1))
    )
    totals = stats.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    ).withColumn("one", F.lit(1))
    feat = stats.join(F.broadcast(totals), "one").select(
        "b",
        (
            F.log((F.col("cnt_t") + 1) / (F.col("tot_t") + n_buckets))
            - F.log((F.col("cnt_r") + 1) / (F.col("tot_r") + n_buckets))
        ).alias("llr"),
    )
    scored = bucketed.join(F.broadcast(feat), "b")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("llr"), 6).alias("dsir_w"),
    )


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_rounds: int = 0,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every vector to its nearest
    IVF centroid (the deterministic md5-sampled codebook ``ivf_topk``
    uses, optionally Lloyd-refined), then drop any vector that has a
    SMALLER-id neighbor in the same cell with cosine >= ``threshold``
    (min-id survivor — deterministic, no RNG). Returns one row per
    vector: its cell and ``kept`` (1 = survives, 0 = semantic dup).

    The quadratic comparison runs per cell only — the whole point of
    SemDeDup — so the join is an equi-join on the cell id; cosines are
    rounded to 4dp so the >= threshold decision is engine-portable.
    """
    from .similarity import _dot, _norm

    cents = ivf_centroids(
        emb, n_centroids, id_col=id_col, vec_col=vec_col, lloyd_rounds=lloyd_rounds
    )
    from .similarity import _sq_dist_array

    darr = _sq_dist_array(vec_col, cents)
    # r6: carry each vector's norm (the identical deterministic fold,
    # computed once per VECTOR) so the within-cell comparison pays ONE
    # fold per pair instead of three, and express "has a smaller-id
    # near-duplicate" as a LEFT SEMI self-join — the probe stops at the
    # first satisfying neighbor instead of enumerating and distinct-ing
    # every match (60.1s -> ~13s at sf1.0; per-pair cosines bit-identical,
    # so the dup set is unchanged).
    assigned = emb.select(
        F.col(id_col),
        F.col(vec_col),
        (F.array_position(darr, F.array_min(darr)) - 1).cast("int").alias("cell"),
        _norm(F.col(vec_col)).alias("_nrm"),
    )
    # Salt the within-cell self-join (guide §2.5): with n_centroids=8
    # the cell equi-key has EIGHT distinct values, so the whole
    # quadratic comparison of each cell landed in one task (8 of 32
    # cores busy, the largest cell a straggler). The probe side keys by
    # (cell, hash(id) % S); the build side replicates S ways — the same
    # pair predicate evaluates exactly once per (a, b), so the dup set
    # is unchanged while the fold work spreads over 8*S tasks.
    salt_n = 32
    a = assigned.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)).cast("int")
    ).alias("a")
    b = assigned.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(salt_n)]))
    ).alias("b")
    pair_cos = F.round(
        _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._nrm") * F.col("b._nrm")),
        4,
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
            & (pair_cos >= threshold),
            "left_semi",
        )
        .select(F.col(id_col).alias("_dup_id"))
    )
    return (
        assigned.join(dup_ids, assigned[id_col] == dup_ids["_dup_id"], "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.when(F.col("_dup_id").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )
