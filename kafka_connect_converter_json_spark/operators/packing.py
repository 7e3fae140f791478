"""Sequence packing and training-mix operators for LLM data pipelines:
GPT-style concat-and-chunk sequence packing, weighted per-stratum
mixture sampling, and temperature-scaled mixture weights.

These sit downstream of the corpus-hygiene filters
(``operators/corpus_filters.py``): once a corpus is deduped and
filtered, a training run needs (a) a deterministic assignment of every
document to fixed-length token sequences and (b) a reproducible
language/source mixture. The reference converter's job ends at the
string column (JC:157-181); these are the last-mile operators a
training corpus built on those columns is consumed WITH.

Scale notes (100 TB design point):
- ``pack_sequences`` needs a GLOBAL running token offset — the naive
  form is a no-partition window, which Spark executes on ONE task.
  Instead it runs a textbook distributed prefix sum: 256 md5-prefix
  buckets (the bucket is a prefix of the total order, so per-bucket
  order + bucket offsets == global order), per-bucket subtotals
  (bounded 256-row collect, like the IVF codebook), exclusive prefix
  offsets broadcast back, then one per-bucket window. No task ever
  sees more than ~1/256 of the corpus, yet offsets are exact.
- ``mixture_sample`` is one window per stratum over a narrow
  (id, stratum, tokens) projection — the text column never shuffles.
- ``temperature_weights`` aggregates to |strata| rows before the one
  single-partition window (bounded: #languages, not #docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Number of prefix-sum buckets: 2 hex chars of the md5 priority.
_N_BUCKETS = 256


def _whitespace_tokens(text_col: str):
    t = F.trim(F.col(text_col))
    return (
        F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk packing: documents are concatenated in
    a deterministic md5-priority order and the token stream is cut into
    fixed ``seq_len`` windows; each document reports its global token
    span and the range of sequence indices it lands in.

    The global running offset is computed with a two-level distributed
    prefix sum (see module docstring) — bucket = the first 2 hex chars
    of the md5 priority, which is a PREFIX of the (priority, id) total
    order, so per-bucket cumulative sums plus exclusive bucket offsets
    reproduce the single-window result exactly (equivalence-tested).

    Zero-token documents carry no stream positions and are excluded.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(id_col).cast("string")).alias("priority"),
        _whitespace_tokens(text_col).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    base = base.withColumn("bucket", F.substring("priority", 1, 2))

    # Level 1: per-bucket subtotals — a bounded (<= 256 rows) driver-side
    # metadata step, the same pattern as the IVF codebook collect.
    totals = {
        r["bucket"]: r["subtotal"]
        for r in base.groupBy("bucket").agg(F.sum("n_tokens").alias("subtotal")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += int(totals[b])
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [("", 0)], "bucket string, bucket_off long")

    # Level 2: per-bucket running sum + broadcast exclusive offsets.
    w = (
        Window.partitionBy("bucket")
        .orderBy("priority", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end_off = (F.col("bucket_off") + F.sum("n_tokens").over(w)).cast("long")
    packed = (
        base.join(F.broadcast(off_df), "bucket")
        .withColumn("end_off", end_off)
        .withColumn("start_off", (F.col("end_off") - F.col("n_tokens")).cast("long"))
    )
    first_seq = F.expr(f"start_off div {int(seq_len)}").cast("long")
    last_seq = F.expr(f"(end_off - 1) div {int(seq_len)}").cast("long")
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_off",
        "end_off",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + F.lit(1)).cast("long").alias("n_seqs"),
    )


def sequence_manifest(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The inverse view of :func:`pack_sequences`: for every training
    sequence, the document token slices that fill it — the shard
    manifest a training data-loader actually consumes.

    One row per (sequence, contributing document): the sequence index,
    the half-open token slice of the document (``doc_tok_start`` /
    ``doc_tok_end``), where the slice lands inside the sequence
    (``seq_off``), and its length. Fan-out per document is
    ``n_seqs <= n_tokens/seq_len + 1`` — proportional to data volume,
    never quadratic.
    """
    packed = pack_sequences(df, seq_len=seq_len, id_col=id_col, text_col=text_col)
    c = int(seq_len)
    seq_id = F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq_id")
    rows = packed.select("doc_id", "start_off", "end_off", seq_id)
    slice_start = F.greatest(F.col("start_off"), F.col("seq_id") * c)
    slice_end = F.least(F.col("end_off"), (F.col("seq_id") + 1) * c)
    return rows.select(
        F.col("seq_id").cast("long"),
        F.col("doc_id"),
        (slice_start - F.col("start_off")).cast("long").alias("doc_tok_start"),
        (slice_end - F.col("start_off")).cast("long").alias("doc_tok_end"),
        (slice_start - F.col("seq_id") * c).cast("long").alias("seq_off"),
        (slice_end - slice_start).cast("long").alias("n_toks"),
    )


def pack_sequences_single_window(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reference implementation of :func:`pack_sequences` as ONE global
    no-partition window (single-task — test/oracle use only)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(id_col).cast("string")).alias("priority"),
        _whitespace_tokens(text_col).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.orderBy("priority", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = base.withColumn("end_off", F.sum("n_tokens").over(w).cast("long")).withColumn(
        "start_off", (F.col("end_off") - F.col("n_tokens")).cast("long")
    )
    first_seq = F.expr(f"start_off div {int(seq_len)}").cast("long")
    last_seq = F.expr(f"(end_off - 1) div {int(seq_len)}").cast("long")
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_off",
        "end_off",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + F.lit(1)).cast("long").alias("n_seqs"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weighted training-mix sampling: each stratum gets a token budget
    of ``floor(weight * total_budget)`` and admits documents in
    md5-priority order until its budget is met (inclusive). Strata
    absent from ``weights`` are excluded. Deterministic across cluster
    sizes — the admission set is a pure function of the data.

    One window per stratum over a narrow projection; text never
    shuffles.
    """
    budget = F.lit(None).cast("long")
    for k in sorted(weights):
        budget = F.when(
            F.col(stratum_col) == k, F.lit(int(weights[k] * total_budget))
        ).otherwise(budget)
    n_tokens = _whitespace_tokens(text_col)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(stratum_col),
            n_tokens.alias("n_tokens"),
            F.sum(n_tokens).over(w).alias("cum_tokens"),
            budget.alias("budget"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
    )


def temperature_weights(
    df: DataFrame,
    tau: float = 0.7,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled sampling weights per stratum: with p_s the
    stratum's share of corpus tokens, the sampling weight is
    ``p_s**tau / sum(p**tau)`` — the standard multilingual up-sampling
    rule (tau=1 is natural proportions, tau->0 is uniform).

    Aggregates to |strata| rows first; the normalizing window runs over
    that bounded aggregate only.
    """
    n_tokens = _whitespace_tokens(text_col)
    agg = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(n_tokens).alias("n_tokens")
    )
    total = Window.partitionBy()
    # Two steps: a window over an expression that itself contains a
    # window is not allowed, so materialize p first.
    with_p = agg.select(
        F.col(stratum_col),
        F.col("n_docs"),
        F.col("n_tokens"),
        (F.col("n_tokens") / F.sum("n_tokens").over(total)).alias("p"),
    )
    pt = F.pow(F.col("p"), F.lit(float(tau)))
    return with_p.select(
        F.col(stratum_col),
        F.col("n_docs"),
        F.col("n_tokens"),
        F.round(F.col("p"), 6).alias("p_natural"),
        F.round(pt / F.sum(pt).over(total), 6).alias("w_tau"),
    )
