"""Corpus-hygiene operators for large-scale training-data pipelines:
Gopher-style repetition statistics, benchmark decontamination, PII
redaction, deterministic token-budget sampling, and BM25 ranking.

These extend the text-analysis layer (``operators/text.py``) with the
filters an LLM-data pipeline applies between raw ingest and training:
the reference converter reduces every value to an indexable string
column (JC:157-181); these operators are what a 100 TB corpus built on
those string columns is filtered WITH.

Scale notes (100 TB design point):
- ``repetition_stats`` and ``pii_stats`` are pure projections over
  higher-order array functions — zero shuffle, whole-stage codegen.
- ``decontaminate`` explodes word n-grams only on the corpus side and
  broadcast-joins the (small) benchmark gram set; the corpus text
  column itself never shuffles, only (doc_id, 8-gram hash) pairs.
- ``token_budget_sample`` is one window per stratum over a narrow
  (id, priority, tokens) projection — the text column is joined back
  by id only if the caller asks.
- ``bm25_topk`` keeps per-term stats in a 1-row broadcast and ranks
  with a per-term window; nothing driver-side, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# PII patterns — intersection of Java-regex and RE2 syntax so the same
# pattern string runs verbatim in Spark and in the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def _nonblank_lines(text):
    """Non-blank lines of ``text`` as an array column (empty array for
    blank/empty documents)."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != "")
    )


def _chars_of(arr):
    """Total character count across an array of strings (BIGINT)."""
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    non-blank lines that are duplicates of another line, and the
    fraction of characters living in those duplicated lines.

    Zero-shuffle: every statistic is a higher-order function over the
    per-row line array, so at 100 TB this is an embarrassingly parallel
    projection that never materializes exploded lines.
    """
    lines = _nonblank_lines(F.col(text_col))
    distinct = F.array_distinct(lines)
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(distinct).cast("long")
    chars = _chars_of(lines)
    distinct_chars = _chars_of(distinct)
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.round(
            (n_lines - n_distinct) / F.greatest(n_lines, F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            (chars - distinct_chars) / F.greatest(chars, F.lit(1)), 6
        ).alias("dup_char_frac"),
    )


def word_ngrams(text, n: int):
    """Whitespace-tokenized lowercase word ``n``-grams as an array of
    space-joined strings; empty array when the document has fewer than
    ``n`` tokens."""
    toks = F.when(
        F.trim(text) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(text)), r"\s+"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    docs: DataFrame,
    n: int = 8,
    bench_mod: int = 97,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``n``-gram with the held-out benchmark set (here the
    deterministic ``doc_id % bench_mod == 0`` slice, standing in for an
    eval suite like the reference's round-trip fixtures).

    Returns (doc_id, matched_grams) for contaminated documents only.
    Scale shape: benchmark grams are a distinct, broadcast set; the
    corpus side explodes to (id, 60-bit md5-prefix gram key) pairs —
    neither the text nor the gram string ever shuffles (the textdedup
    convention, ``operators/textdedup.py``) — and aggregates matched
    distinct keys per document.
    """
    gram_keys = F.transform(
        word_ngrams(F.col(text_col), n), lambda g: F.substring(F.md5(g), 1, 15)
    )
    grams = docs.select(F.col(id_col), F.explode(gram_keys).alias("gram"))
    bench = (
        grams.filter(F.col(id_col) % bench_mod == 0).select("gram").distinct()
    )
    corpus = grams.filter(F.col(id_col) % bench_mod != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("matched_grams"))
    )


def pii_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + redaction: per-document email/phone match counts
    and the md5 of the redacted text (emails -> ``<EMAIL>``, phones ->
    ``<PHONE>``). The md5 makes the full redacted payload verifiable
    without shipping it; a pipeline writing redacted text keeps the
    same plan minus the hash. Pure projection — zero shuffle."""
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("email_count"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("phone_count"),
        F.md5(redacted).alias("redacted_md5"),
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-budget sampling: within each stratum, admit
    documents in md5-priority order until the cumulative whitespace
    token count reaches ``budget`` (inclusive). Partitioning-independent
    and reproducible — the md5 priority is a pure function of the id,
    so re-running on different cluster sizes admits the same set.

    One shuffle per stratum (the window sort) over a narrow projection.
    """
    t = F.trim(F.col(text_col))
    n_tokens = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
    priority = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(priority, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(stratum_col),
            n_tokens.alias("n_tokens"),
            F.sum(n_tokens).over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-``k`` documents per query term (Robertson/Sparck Jones
    idf with the +1 floor, the Lucene formulation).

    Fully distributed: term frequencies are regexp counts (codegen),
    corpus stats (N, total doc length) travel as a 1-row broadcast,
    per-term document frequencies as a |terms|-row broadcast, and the
    final ranking is one per-term window over score-bearing rows only.
    """
    text = F.lower(F.col(text_col))
    t = F.trim(F.col(text_col))
    dl = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
    long = df.select(
        F.col(id_col),
        dl.alias("dl"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(term).alias("term"),
                        F.regexp_count(text, F.lit(r"\b" + term + r"\b")).alias("tf"),
                    )
                    for term in terms
                ]
            )
        ).alias("ttf"),
    ).select(id_col, "dl", "ttf.term", "ttf.tf")

    corpus = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(dl).alias("sum_dl"),
    )
    dfreq = (
        long.filter(F.col("tf") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    )
    scored = (
        long.filter(F.col("tf") > 0)
        .withColumn("one", F.lit(1))
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(corpus.withColumn("one", F.lit(1))), "one")
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "score",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
                    )
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("term", id_col, "score", "rnk")
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality score: the mean negative log
    probability of a document's tokens under the corpus's own unigram
    distribution (lower = more typical of the corpus, the proxy CCNet
    uses a KenLM for). Tokens are lowercased whitespace tokens.

    Scale shape: one explode to (doc_id, term), a term-count aggregate
    with map-side combine (vocab-sized output), the 1-row total as a
    broadcast, and a vocab join that Catalyst sizes (broadcast at small
    vocab, sort-merge on the term key at corpus scale — same stance as
    TF-IDF). Text never shuffles; scores are rounded to 6dp for
    cross-engine parity.
    """
    t = F.trim(F.lower(F.col(text_col)))
    toks = df.filter(t != "").select(
        F.col(id_col), F.explode(F.split(t, r"\s+")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total")).withColumn("one", F.lit(1))
    scored = (
        toks.join(counts, "term")
        .withColumn("one", F.lit(1))
        .join(F.broadcast(total), "one")
        .withColumn("nlp", -F.log(F.col("cnt") / F.col("total")))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("nlp"), 6).alias("nll"),
    )


def lm_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet head/middle/tail bucketing by unigram LM score: documents
    are split at the exact 1/3 and 2/3 score quantiles (continuous
    interpolation — Spark ``percentile`` == DuckDB ``quantile_cont``).

    The thresholds come from an exact percentile AGGREGATE (partial +
    final reduce, two scalar results broadcast back) — NOT a global
    ntile window, which would funnel the corpus through one task. Ties
    across a threshold all land on the <= side, keeping the assignment
    a pure function of the score.
    """
    scores = unigram_logprob(df, id_col=id_col, text_col=text_col)
    cuts = scores.agg(
        F.expr("percentile(nll, array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3))").alias("q")
    ).select(
        F.col("q")[0].alias("q1"), F.col("q")[1].alias("q2"), F.lit(1).alias("one")
    )
    bucket = (
        F.when(F.col("nll") <= F.col("q1"), F.lit("head"))
        .when(F.col("nll") <= F.col("q2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scores.withColumn("one", F.lit(1))
        .join(F.broadcast(cuts), "one")
        .select(id_col, "n_tokens", "nll", bucket.alias("bucket"))
    )


# The Gopher rule-set stop words (Rae et al. 2021, A1.1): a doc must
# contain at least GOPHER_MIN_STOP_HITS distinct members to pass.
GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher quality rule bundle (Rae et al. 2021, Appendix A1.1)
    as per-rule signals plus the conjunction: word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio (# / ellipsis) <= 0.1,
    bullet-line fraction <= 0.9, ellipsis-line-ending fraction <= 0.3,
    alphabetic-word fraction >= 0.8, and >= 2 distinct English stop
    words present. Unlike ``quality_score`` (a blended scalar), this is
    the published *filter* — per-rule booleans let a pipeline report
    WHY a document was dropped.

    Pure projection: every signal is a higher-order function over the
    per-row token/line arrays — zero shuffle, embarrassingly parallel
    at any corpus size. Ratios are rounded to 6dp for engine parity.
    """
    t = F.trim(F.col(text_col))
    words = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n_words = F.size(words).cast("long")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(word_chars / safe_words, 6)
    symbols = (
        F.regexp_count(F.col(text_col), F.lit(r"#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\.|…"))
    ).cast("long")
    symbol_ratio = F.round(symbols / safe_words, 6)
    lines = _nonblank_lines(F.col(text_col))
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(
            F.filter(lines, lambda x: F.trim(x).rlike(r"^([•\-\*])"))
        )
        / safe_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
        / safe_lines,
        6,
    )
    alpha_word_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / safe_words, 6
    )
    lowered = F.transform(words, F.lower)
    n_stop_hits = (
        F.aggregate(
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
            F.lit(0),
            lambda acc, s: acc
            + F.when(F.array_contains(lowered, s), 1).otherwise(0),
        )
    ).cast("int")
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_word_frac >= 0.8)
        & (n_stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        n_stop_hits.alias("n_stop_hits"),
        F.when(passes, F.lit(1)).otherwise(F.lit(0)).alias("passes"),
    )
