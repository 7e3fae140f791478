"""Tests for the sequence-packing and training-mix operators."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
    pack_sequences_single_window,
    sequence_manifest,
    temperature_weights,
)


def _docs(spark, n=60, partitions=None):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range((i % 7) + 1))) for i in range(n)]
    rows.append((n, ""))  # zero-token doc must be excluded from packing
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(partitions) if partitions else df


def test_pack_sequences_matches_single_window(spark):
    df = _docs(spark, 60)
    got = sorted(pack_sequences(df, seq_len=8).collect())
    want = sorted(pack_sequences_single_window(df, seq_len=8).collect())
    assert got == want and len(got) == 60


def test_pack_sequences_partitioning_independent(spark):
    a = sorted(pack_sequences(_docs(spark, 40, partitions=1), seq_len=8).collect())
    b = sorted(pack_sequences(_docs(spark, 40, partitions=8), seq_len=8).collect())
    assert a == b


def test_pack_sequences_spans_are_contiguous(spark):
    rows = sorted(pack_sequences(_docs(spark, 60), seq_len=8).collect(),
                  key=lambda r: r.start_off)
    pos = 0
    for r in rows:
        assert r.start_off == pos
        assert r.end_off == pos + r.n_tokens
        pos = r.end_off
    total = sum(r.n_tokens for r in rows)
    assert pos == total


def test_pack_sequences_seq_indices(spark):
    # doc of 5 tokens at offsets [6, 11) with seq_len=4 spans seqs 1..2.
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    row = pack_sequences(df, seq_len=4).collect()[0]
    assert (row.start_off, row.end_off) == (0, 5)
    assert (row.first_seq, row.last_seq, row.n_seqs) == (0, 1, 2)


def test_sequence_manifest_tiles_every_sequence(spark):
    df = _docs(spark, 60)
    man = sequence_manifest(df, seq_len=8).collect()
    total = sum(r.n_toks for r in man)
    packed = pack_sequences(df, seq_len=8).collect()
    assert total == sum(r.n_tokens for r in packed)
    # within each sequence, slices tile [0, seq_len) with no gaps/overlap
    by_seq = {}
    for r in man:
        by_seq.setdefault(r.seq_id, []).append(r)
    n_seqs = max(by_seq) + 1
    for seq_id, rows in by_seq.items():
        rows.sort(key=lambda r: r.seq_off)
        pos = 0
        for r in rows:
            assert r.seq_off == pos
            assert r.n_toks == r.doc_tok_end - r.doc_tok_start
            pos += r.n_toks
        if seq_id < n_seqs - 1:
            assert pos == 8  # every non-final sequence is full


def test_sequence_manifest_doc_slices_cover_doc(spark):
    # a doc spanning 3 sequences is sliced into contiguous doc-token ranges
    df = spark.createDataFrame([(1, " ".join(["t"] * 10))], "doc_id long, text string")
    rows = sorted(sequence_manifest(df, seq_len=4).collect(), key=lambda r: r.seq_id)
    assert [(r.doc_tok_start, r.doc_tok_end) for r in rows] == [(0, 4), (4, 8), (8, 10)]
    assert [r.seq_off for r in rows] == [0, 0, 0]


def test_mixture_sample_budgets_bind(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", "x " * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = mixture_sample(df, weights={"en": 0.8, "de": 0.2}, total_budget=100)
    got = out.groupBy("lang").agg(
        F.sum("n_tokens").alias("toks"), F.count("*").alias("n")
    ).collect()
    by = {r.lang: r for r in got}
    assert by["en"].toks <= 80 and by["en"].toks > 80 - 10
    assert by["de"].toks <= 20 and by["de"].toks > 20 - 10


def test_mixture_sample_excludes_unweighted_strata(spark):
    rows = [(1, "en", "a b"), (2, "xx", "a b")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    langs = {r.lang for r in mixture_sample(df, {"en": 1.0}, 100).collect()}
    assert langs == {"en"}


def test_mixture_sample_partitioning_independent(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], "t " * ((i % 5) + 1)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {"en": 0.5, "de": 0.3, "fr": 0.2}
    a = sorted(mixture_sample(df.repartition(1), w, 60).collect())
    b = sorted(mixture_sample(df.repartition(8), w, 60).collect())
    assert a == b


def test_temperature_weights_normalize_and_flatten(spark):
    rows = [(i, "en", "w " * 90) for i in range(9)] + [(100, "de", "w " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    nat = {r.lang: r for r in temperature_weights(df, tau=1.0).collect()}
    # tau=1 reproduces natural proportions
    assert nat["en"].w_tau == pytest.approx(nat["en"].p_natural, abs=1e-6)
    cool = {r.lang: r for r in temperature_weights(df, tau=0.5).collect()}
    assert abs(sum(r.w_tau for r in cool.values()) - 1.0) < 1e-5
    # tau<1 moves weight from the dominant stratum to the rare one
    assert cool["en"].w_tau < nat["en"].w_tau
    assert cool["de"].w_tau > nat["de"].w_tau
