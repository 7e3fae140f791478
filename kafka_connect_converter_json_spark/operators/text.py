"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is JVM-side ``pyspark.sql.functions`` (whole-stage
codegen, no Python per row): language-ID (marker-word n-gram heuristic),
quality scoring (length/punct/alpha/stopword ratios), token counting
(whitespace + a BPE-ish regex), and document fingerprinting (normalized
md5 + winnowing-style rolling window minimum).

These generalize the reference's stringify/extract layer (the converter
reduces every value to an indexable string column, JC:157-181) to the
text columns a 100 TB corpus pipeline indexes on. Each operator is a
DataFrame -> DataFrame function; at scale they are embarrassingly
parallel projections — no shuffle at all except the explicit aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# marker stopwords per language — the n-gram heuristic's anchor sets.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}

# BPE-ish token regex: words, numbers, or single non-space symbols —
# a cheap standin for a byte-pair pretokenizer's word-boundary pass.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (regexp_count, JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (word-boundary regexp, one pass
    per language)."""
    lowered = F.lower(text)
    return {
        lang: F.regexp_count(lowered, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by marker count; deterministic tiebreak by
    language code order; 'und' when no marker hits at all."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.lit("und")
    # reverse order so earlier languages win ties via later when() override
    for lg in reversed(langs):
        out = F.when(scores[lg] == best, F.lit(lg)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Quality-scoring feature projection: one pass, no shuffle. ``keep``
    passes extra columns through (lets a composed pipeline compute e.g.
    lang-ID and quality in ONE scan instead of joining two branches)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    # r6: count class members with regexp_count instead of stripping the
    # complement and measuring the leftover string — the same count
    # (single-char class, non-overlapping matches) measured ~20x faster
    # (regexp_replace materializes the replaced string per row).
    alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    digits = F.regexp_count(t, F.lit(r"[0-9]"))
    punct = F.regexp_count(t, F.lit(r"[.,;:!?'\"()\[\]{}]"))
    toks = token_count(t)
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        toks.alias("n_tokens"),
        F.round(alpha / safe, 6).alias("alpha_ratio"),
        F.round(digits / safe, 6).alias("digit_ratio"),
        F.round(punct / safe, 6).alias("punct_ratio"),
        F.round(n_chars.cast("double") / F.greatest(toks, F.lit(1)), 6).alias("avg_token_len"),
        *[F.col(k) for k in keep],
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Scalar quality score in [0,1]: weighted blend of the features —
    the length/punct/stopword heuristic family (Gopher-style rules)."""
    f = quality_features(df, text_col, id_col, keep=keep)
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000), 1.0).otherwise(0.0)
    score = F.round(
        0.4 * F.col("alpha_ratio")
        + 0.3 * length_ok
        + 0.3 * (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))),
        6,
    )
    return f.select(id_col, "n_chars", "n_tokens", score.alias("quality"), *keep)


def normalize_text(text: Column) -> Column:
    """Fingerprint normalization: lowercase + collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact-dup key) plus
    a winnowing-style rolling fingerprint — the lexicographic minimum of
    hashed 8-gram character windows sampled every 4 chars — which is
    stable under small edits (rolling-hash fingerprinting)."""
    # materialize the normalized text FIRST: referencing the expression
    # inside the transform lambda would re-run the regexp once per
    # window (no CSE across lambda scopes) — measured ~4x slower
    norm = F.col("_norm")
    # windows: substr positions 1, 5, 9, ... (stride 4), width 8
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - 7, F.lit(1)), F.lit(4))
    windows = F.transform(starts, lambda i: F.md5(norm.substr(i, F.lit(8))))
    return df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
    ).select(
        F.col(id_col),
        F.md5(norm).alias("exact_fp"),
        F.array_min(windows).alias("winnow_fp"),
        F.length(norm).alias("norm_len"),
    )


def tfidf_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: ``(doc_id, term, tf, tfidf, rank)``.

    tfidf = tf * ln(N / df) rounded to 6dp (plain raw-count tf, unsmoothed
    idf — the textbook formula, reproducible in any SQL engine). Rank
    orders by score desc then term asc (deterministic under ties).

    Plan shape: explode -> (doc, term) count [one shuffle, map-side
    partial] -> document-frequency count keyed by term [second shuffle,
    vocabulary-sized — Zipf-concentrated, so partial aggregation absorbs
    almost everything map-side] -> join tf with df on term (sort-merge;
    the vocabulary is NOT broadcast — at corpus scale it can exceed any
    broadcast threshold) -> per-doc top-k window. N arrives as a
    broadcast 1-row aggregate, never a driver collect."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select(
            "doc_id", "term", "tf", "tfidf", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= k)
    )
