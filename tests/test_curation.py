"""Tests for the corpus-curation operators (cross-document line dedup,
DSIR importance weights, SemDeDup semantic dedup)."""

import hashlib
import math

import pytest

from kafka_connect_converter_json_spark.operators.curation import (
    dsir_weights,
    line_dedup,
    remove_dup_spans,
    semantic_dedup,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "totally unique document"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup(df, min_docs=2).collect()}
    assert rows[1].n_lines == 3 and rows[1].n_removed == 2
    assert rows[1].clean_md5 == _md5("real content one")
    assert rows[2].clean_md5 == _md5("real content two")
    assert rows[3].n_removed == 0
    assert rows[3].clean_md5 == _md5("totally unique document")


def test_line_dedup_keys_on_trimmed_line(spark):
    # "  header" and "header" are the same boilerplate line; removal
    # keys on the trimmed form but the kept payload preserves raw lines.
    df = spark.createDataFrame(
        [(1, "  header\nbody a"), (2, "header\nbody b")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup(df, min_docs=2).collect()}
    assert rows[1].n_removed == 1 and rows[2].n_removed == 1
    assert rows[1].clean_md5 == _md5("body a")


def test_line_dedup_repeated_line_within_one_doc_not_boilerplate(spark):
    # the same line twice in ONE doc is intra-doc repetition (the
    # repetition_stats operator's job), not cross-doc boilerplate
    df = spark.createDataFrame(
        [(1, "dup\ndup\nbody"), (2, "other")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in line_dedup(df, min_docs=2).collect()}
    assert rows[1].n_removed == 0


def test_line_dedup_blank_doc_and_full_removal(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in line_dedup(df, min_docs=2).collect()}
    assert rows[1].n_lines == 1 and rows[1].n_removed == 1
    assert rows[1].clean_md5 == _md5("")
    assert rows[3].n_lines == 0 and rows[3].clean_md5 == _md5("")


def test_line_dedup_partitioning_independent(spark):
    data = [(i, f"shared header\nbody {i % 7}\nshared footer") for i in range(40)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    a = sorted(map(tuple, line_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, line_dedup(df.repartition(8)).collect()))
    assert a == b


def test_remove_dup_spans_cross_and_within_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # shares span "a b c d" with doc 2
            (2, "x y a b c d z"),
            (3, "u v w p q r s"),   # unique -> untouched
            (4, "m m m m m m"),     # within-doc repeated span -> fully covered
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(df, k=4).collect()}
    assert (out[1].n_tokens, out[1].n_removed) == (7, 4)
    assert out[1].clean_md5 == _md5("e f g")
    assert out[2].clean_md5 == _md5("x y z")
    assert out[3].n_removed == 0
    assert out[3].clean_md5 == _md5("u v w p q r s")
    assert (out[4].n_tokens, out[4].n_removed) == (6, 6)
    assert out[4].clean_md5 == _md5("")


def test_remove_dup_spans_overlapping_coverage_union(spark):
    # docs share two OVERLAPPING 3-spans; covered tokens are the union
    # of span extents, not double-removed
    df = spark.createDataFrame(
        [(1, "p q r s t"), (2, "p q r s u"), (3, "zz yy xx ww vv")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(df, k=3).collect()}
    # shared spans: "p q r" and "q r s" -> covers tokens 0..3 in both
    assert out[1].n_removed == 4 and out[1].clean_md5 == _md5("t")
    assert out[2].n_removed == 4 and out[2].clean_md5 == _md5("u")
    assert out[3].n_removed == 0


def test_remove_dup_spans_short_and_blank_docs(spark):
    # docs shorter than k have no spans and are never removed
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(df, k=4).collect()}
    assert out[1].n_removed == 0 and out[1].clean_md5 == _md5("one two")
    assert out[3].n_tokens == 0 and out[3].clean_md5 == _md5("")


def test_remove_dup_spans_partitioning_independent(spark):
    data = [(i, f"common lead in phrase body {i % 9} tail") for i in range(40)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    a = sorted(map(tuple, remove_dup_spans(df.repartition(1), k=4).collect()))
    b = sorted(map(tuple, remove_dup_spans(df.repartition(8), k=4).collect()))
    assert a == b
    assert any(r[2] > 0 for r in a)  # the shared lead-in actually fires


def test_dsir_weights_prefers_target_like_docs(spark):
    # target slice speaks "alpha"; raw corpus is split. A doc made of
    # target-typical tokens must outscore one of raw-only tokens.
    rows = [(i, "en", "alpha beta alpha beta alpha") for i in range(5)]
    rows += [(10 + i, "de", "gamma delta gamma delta gamma") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r.dsir_w for r in dsir_weights(df, "lang", "en").collect()}
    assert out[0] > out[10]
    # weights are the mean per-token log ratio; target tokens appear in
    # both distributions so the magnitude is bounded by ln(ratio of totals)
    assert all(math.isfinite(v) for v in out.values())


def test_dsir_weights_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "en", "aa aa"), (2, "de", "bb bb")],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r for r in dsir_weights(df, "lang", "en", n_buckets=16).collect()}
    # bucket(aa) != bucket(bb) with overwhelming probability at 16 buckets
    # over md5; compute expected llr for doc 1: cnt_t=2,tot_t=2,cnt_r=2,tot_r=4
    exp1 = math.log(3 / 18) - math.log(3 / 20)
    assert out[1].n_tokens == 2
    assert out[1].dsir_w == pytest.approx(round(exp1, 6), abs=1e-6)
    exp2 = math.log(1 / 18) - math.log(3 / 20)
    assert out[2].dsir_w == pytest.approx(round(exp2, 6), abs=1e-6)


def test_dsir_weights_partitioning_independent(spark):
    rows = [
        (i, "en" if i % 3 == 0 else "de", f"tok{i % 11} tok{i % 5} tok{i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, dsir_weights(df.repartition(1), "lang", "en").collect()))
    b = sorted(map(tuple, dsir_weights(df.repartition(8), "lang", "en").collect()))
    assert a == b


def _blob(base, eps):
    return [float(b + eps) for b in base]


def test_semantic_dedup_drops_near_identical_keeps_min_id(spark):
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, base_a),
        (2, _blob(base_a, 1e-4)),  # near-identical to 1 -> dropped
        (3, base_b),               # different direction -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(df, n_centroids=2, threshold=0.99).collect()}
    assert out[1].kept == 1
    assert out[2].kept == 0
    assert out[3].kept == 1
    # the dup pair must have landed in the same cell for the drop to fire
    assert out[1].cell == out[2].cell


def test_semantic_dedup_cross_cell_pairs_never_compared(spark):
    # two identical vectors forced into different cells (2 centroids,
    # each vector IS a centroid direction) are both kept: SemDeDup only
    # compares within a cell. Construct orthogonal pairs so cells split.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.01]),
        (4, [0.01, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(df, n_centroids=2, threshold=0.999).collect()}
    cells = {k: v.cell for k, v in out.items()}
    # whatever the md5-sampled codebook picked, near-parallel vectors
    # share a cell and the larger id of each parallel pair is dropped
    assert cells[1] == cells[3] and cells[2] == cells[4]
    assert out[1].kept + out[3].kept == 1
    assert out[min(1, 3)].kept == 1
    assert out[2].kept + out[4].kept == 1


def test_semantic_dedup_partitioning_independent(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, semantic_dedup(df.repartition(1), 4, 0.95).collect()))
    b = sorted(map(tuple, semantic_dedup(df.repartition(8), 4, 0.95).collect()))
    assert a == b
    dropped = [r for r in a if r[2] == 0]
    assert len(dropped) >= 1  # the injected dups actually fire
