"""Tests for the corpus-hygiene operators (repetition statistics,
decontamination, PII redaction, token-budget sampling, BM25)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.operators.corpus_filters import (
    bm25_topk,
    decontaminate,
    pii_stats,
    repetition_stats,
    token_budget_sample,
    word_ngrams,
)


def test_repetition_stats_duplicate_lines(spark):
    # 4 non-blank lines, "dup" appears 3x -> 2 duplicate lines beyond the
    # first occurrence; 6 chars of 12 live in duplicated copies.
    text = "dup\ndup\n\nabc\ndup"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_stats(df).collect()[0]
    assert row.n_lines == 4
    assert row.dup_line_frac == pytest.approx(2 / 4)
    assert row.dup_char_frac == pytest.approx(6 / 12)


def test_repetition_stats_blank_and_unique(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a\nb\nc")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_lines == 0 and rows[1].dup_line_frac == 0.0
    assert rows[2].n_lines == 0 and rows[2].dup_char_frac == 0.0
    assert rows[3].dup_line_frac == 0.0 and rows[3].dup_char_frac == 0.0


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only three words"),], "doc_id long, text string")
    out = df.select(word_ngrams(F.col("text"), 8).alias("g")).collect()[0].g
    assert out == []
    out2 = df.select(word_ngrams(F.col("text"), 2).alias("g")).collect()[0].g
    assert out2 == ["only three", "three words"]


def test_decontaminate_flags_shared_8gram(spark):
    bench_text = "one two three four five six seven eight nine"
    contaminated = "zzz one two three four five six seven eight yyy"
    clean = "totally different words with no overlap at all here"
    df = spark.createDataFrame(
        [(0, bench_text), (1, contaminated), (2, clean)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.matched_grams for r in decontaminate(df, n=8, bench_mod=97).collect()}
    # doc 0 is the benchmark slice (0 % 97 == 0) and must not self-report.
    assert 0 not in out
    assert out.get(1) == 1  # shares exactly one 8-gram
    assert 2 not in out


def test_pii_stats_redacts_and_counts(spark):
    text = "mail me at a.b+c@example.org or call 555-123-4567 now"
    clean = "no pii in this sentence"
    df = spark.createDataFrame([(1, text), (2, clean)], "doc_id long, text string")
    rows = {r.doc_id: r for r in pii_stats(df).collect()}
    assert rows[1].email_count == 1 and rows[1].phone_count == 1
    expected = "mail me at <EMAIL> or call <PHONE> now"
    assert rows[1].redacted_md5 == hashlib.md5(expected.encode()).hexdigest()
    assert rows[2].email_count == 0 and rows[2].phone_count == 0
    assert rows[2].redacted_md5 == hashlib.md5(clean.encode()).hexdigest()


def test_token_budget_sample_partitioning_independent(spark):
    docs = [(i, "en" if i % 2 == 0 else "de", "tok " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    a = token_budget_sample(df.repartition(1), budget=50, id_col="doc_id")
    b = token_budget_sample(df.repartition(8), budget=50, id_col="doc_id")
    rows_a = sorted((r.doc_id, r.lang, r.n_tokens, r.cum_tokens) for r in a.collect())
    rows_b = sorted((r.doc_id, r.lang, r.n_tokens, r.cum_tokens) for r in b.collect())
    assert rows_a == rows_b
    assert rows_a  # the budget admits someone
    # the budget binds per stratum
    for lang in ("en", "de"):
        cums = [c for (_, lg, _, c) in rows_a if lg == lang]
        assert max(cums) <= 50
        assert len(cums) < 100


def test_bm25_tf_monotone_and_k(spark):
    docs = [
        (1, "spark " + "data " * 5),
        (2, "spark data"),
        (3, "no match here"),
        (4, "data data"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, terms=["data"], k=2).collect()
    assert len(out) == 2  # k binds even with 3 matching docs
    assert [r.rnk for r in out] == [1, 2] or sorted(r.rnk for r in out) == [1, 2]
    by_rank = {r.rnk: r for r in out}
    # doc 1 has tf=5 over a slightly longer doc; it must outrank tf=1/tf=2 docs
    assert by_rank[1].doc_id == 1
    assert by_rank[1].score > by_rank[2].score


def test_bm25_rare_term_higher_idf(spark):
    docs = [(i, "common " + ("rare" if i == 0 else "")) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, terms=["common", "rare"], k=1).collect()
    scores = {r.term: r.score for r in out}
    assert scores["rare"] > scores["common"]


def test_unigram_logprob_rare_tokens_score_higher(spark):
    # doc 2 is made of rarer tokens than doc 1 -> higher mean NLL
    rows = [(1, "a a a a"), (2, "b c"), (3, "a a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from kafka_connect_converter_json_spark.operators.corpus_filters import unigram_logprob
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    # corpus: a x6, b x2, c x1 (total 9)
    import math
    assert got[1].nll == pytest.approx(round(-math.log(6 / 9), 6), abs=1e-6)
    assert got[2].nll == pytest.approx(
        round((-math.log(2 / 9) - math.log(1 / 9)) / 2, 6), abs=1e-6)
    assert got[2].nll > got[3].nll > got[1].nll
    assert got[1].n_tokens == 4


def test_lm_buckets_tercile_sizes(spark):
    rows = [(i, " ".join(["common"] * 5 + [f"rare{i}"] * (i % 4))) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from kafka_connect_converter_json_spark.operators.corpus_filters import lm_buckets
    out = lm_buckets(df).collect()
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert set(counts) == {"head", "middle", "tail"}
    # head docs have lower nll than tail docs, pointwise by construction
    max_head = max(r.nll for r in out if r.bucket == "head")
    min_tail = min(r.nll for r in out if r.bucket == "tail")
    assert max_head <= min_tail


def test_gopher_rules_well_formed_doc_passes(spark):
    from kafka_connect_converter_json_spark.operators.corpus_filters import gopher_rules

    words = ("the quick brown fox jumps over lazy dogs with great energy and " * 6).split()
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = gopher_rules(df).collect()[0]
    assert row.passes == 1
    assert row.n_words == len(words) >= 50
    assert 3.0 <= row.mean_word_len <= 10.0
    assert row.n_stop_hits >= 2  # the, with, and


def test_gopher_rules_each_rule_fires(spark):
    from kafka_connect_converter_json_spark.operators.corpus_filters import gopher_rules

    base = ("the quick brown fox jumps over lazy dogs with some energy and " * 6).strip()
    docs = [
        (1, "too short of the and"),                        # word-count floor
        (2, " ".join(["pneumonoultramicroscopics"] * 60) + " the and"),  # mean word len > 10
        (3, base + " " + " ".join(["#"] * 20)),             # symbol ratio > 0.1
        (4, "\n".join(["- bullet point the and of item"] * 10)),  # bullet frac (10 words/line < 50 total? 7*10=70 ok)
        (5, " ".join(["12345"] * 70) + " the and"),          # alpha-word frac < 0.8
        (6, " ".join(["lorem", "ipsum", "dolor", "sitam"] * 20)),  # zero stop words
        (7, base),                                           # control: passes
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].passes == 0 and out[1].n_words < 50
    assert out[2].passes == 0 and out[2].mean_word_len > 10
    assert out[3].passes == 0 and out[3].symbol_ratio > 0.1
    assert out[4].passes == 0 and out[4].bullet_frac > 0.9
    assert out[5].passes == 0 and out[5].alpha_word_frac < 0.8
    assert out[6].passes == 0 and out[6].n_stop_hits == 0
    assert out[7].passes == 1


def test_gopher_rules_ellipsis_and_blank(spark):
    from kafka_connect_converter_json_spark.operators.corpus_filters import gopher_rules

    ell = "\n".join(["the fox ran with more speed and energy today..."] * 8)
    df = spark.createDataFrame([(1, ell), (2, "   ")], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df, min_words=10).collect()}
    assert out[1].ellipsis_frac == 1.0 and out[1].passes == 0
    assert out[2].n_words == 0 and out[2].passes == 0
