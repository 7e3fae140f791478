"""Connected components, corpus stats, span dedup, and deterministic
sampling (the round-3 additions to the training-data operator family)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)
from kafka_connect_converter_json_spark.operators.sampling import (
    hash_sample,
    train_test_split,
)
from kafka_connect_converter_json_spark.operators import textdedup as td
from kafka_connect_converter_json_spark.operators.text import tfidf_topk

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.comp for r in rows}


def test_cc_two_components(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_converges(spark):
    # a 12-node chain: worst case for plain propagation; pointer jumping
    # must still converge well inside max_iters
    comp = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_cc_self_loop_and_dup_edges(spark):
    comp = _cc(spark, [(5, 5), (7, 8), (8, 7), (7, 8)])
    assert comp == {5: 5, 7: 7, 8: 7}


def test_duplicate_clusters_representative(spark):
    pairs = spark.createDataFrame([(3, 9), (9, 4), (20, 21)], "id_a long, id_b long")
    out = {r.doc_id: r for r in duplicate_clusters(pairs).collect()}
    assert out[3].cluster == 3 and out[3].cluster_size == 3
    assert out[9].cluster == 3 and not out[9].is_representative
    assert out[4].cluster == 3
    assert out[20].cluster == 20 and out[20].is_representative
    assert out[21].cluster_size == 2


def test_cc_clusters_lsh_duplicates(spark):
    # the dup-injected corpus: every injected exact copy must cluster with
    # its source through the MinHash-LSH pair generator
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    injected = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    pairs = td.minhash_lsh_candidates(d.unionByName(injected), n=3, num_hashes=6, bands=2)
    clusters = {r.doc_id: r.cluster for r in duplicate_clusters(pairs).collect()}
    for doc_id, cluster in clusters.items():
        if doc_id >= 1_000_000:
            assert clusters.get(doc_id - 1_000_000) == cluster


# ---------------------------------------------------------------------------
# corpus stats
# ---------------------------------------------------------------------------

def test_top_ngrams_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    rows = td.top_ngrams(df, n=2, k=3).collect()
    assert [(r.ngram, r.freq) for r in rows] == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_tfidf_topk_basic(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    rows = tfidf_topk(df, k=1).collect()
    best = {r.doc_id: r.term for r in rows}
    # 'apple' appears twice in doc 1 and nowhere else -> top by a mile
    assert best[1] == "apple"
    # every term in docs 2/3 has df=2 except cherry... cherry df=2, date df=1
    assert best[3] == "date"


def test_duplicate_spans_detects_shared_window(spark):
    shared = " ".join(f"w{i}" for i in range(15))
    df = spark.createDataFrame(
        [(1, shared + " tail1"), (2, "head2 " + shared), (3, "unrelated " * 20)],
        "doc_id long, text string",
    )
    rows = td.duplicate_spans(df, n=15, min_docs=2).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 2 and rows[0].representative == 1


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_independent(spark):
    d = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = sorted(r.doc_id for r in hash_sample(d, default=0.3).collect())
    b = sorted(r.doc_id for r in hash_sample(d.repartition(7), default=0.3).collect())
    assert a == b
    # uniform md5: expected 600, generous tolerance
    assert 480 <= len(a) <= 720


def test_hash_sample_stratified_rates(spark):
    d = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = hash_sample(
        d, strata_col="lang", fractions={"en": 0.9, "de": 0.1}, default=0.5
    ).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in kept}
    assert 1200 <= counts["en"] <= 1500   # of 1500, expect ~1350
    assert 75 <= counts["de"] <= 250      # of 1500, expect ~150


def test_hash_sample_salt_draws_independent_sample(spark):
    d = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = set(r.doc_id for r in hash_sample(d, default=0.5, salt="s0").collect())
    b = set(r.doc_id for r in hash_sample(d, default=0.5, salt="other").collect())
    assert a != b


def test_train_test_split_stable(spark):
    d = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id: r.split for r in train_test_split(d, test_fraction=0.2).collect()}
    s2 = {r.doc_id: r.split for r in train_test_split(d.repartition(5), test_fraction=0.2).collect()}
    assert s1 == s2
    n_test = sum(1 for v in s1.values() if v == "test")
    assert 140 <= n_test <= 260


def test_hash_sample_fractions_requires_strata(spark):
    d = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_sample(d, fractions={"en": 0.5})


def test_cc_matches_union_find_on_random_graphs(spark):
    # independent oracle: path-compressed union-find over the same edges
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 45))
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        nodes = {u for e in edges for u in e}
        expected = {}
        for u in nodes:
            root = find(u)
            expected[u] = min(v for v in nodes if find(v) == root)
        got = _cc(spark, [(int(a), int(b)) for a, b in edges])
        assert got == expected, f"seed {seed}"


def test_take_per_stratum_exact_k_and_stable(spark):
    from kafka_connect_converter_json_spark.operators.sampling import take_per_stratum

    d = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") * 2).alias("payload"),
    )
    out = take_per_stratum(d, k=7)
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 7, "de": 7}
    # stable across physical layout; payload columns survive untouched
    again = take_per_stratum(d.repartition(9), k=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # small stratum: returns all of it
    tiny = d.filter(F.col("doc_id") < 4)  # en: {0,3}, de: {1,2}
    c2 = {r.lang: r["count"] for r in take_per_stratum(tiny, k=7).groupBy("lang").count().collect()}
    assert c2 == {"en": 2, "de": 2}


def test_duplicate_span_fold_matches_python_oracle(spark):
    """The dual 31-bit polynomial fold must equal an independent
    pure-Python evaluation of the same formula on random token streams
    (guards the no-overflow arithmetic and the window indexing)."""
    import hashlib
    import random

    from kafka_connect_converter_json_spark.operators.textdedup import (
        _SPAN_B1, _SPAN_B2, _SPAN_M1, _SPAN_M2, duplicate_spans,
    )

    rng = random.Random(99)
    vocab = [f"tok{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(15, 60))))
        for i in range(30)
    ]
    # force one shared 15-token window between docs 100 and 101
    shared = " ".join(rng.choice(vocab) for _ in range(15))
    docs += [(100, "a b " + shared), (101, shared + " x y z")]

    def tok_hash(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    def span_fp(tokens):
        f1 = f2 = 0
        for t in tokens:
            h = tok_hash(t)
            f1 = (f1 * _SPAN_B1 + h % _SPAN_M1) % _SPAN_M1
            f2 = (f2 * _SPAN_B2 + h % _SPAN_M2) % _SPAN_M2
        return f1 * 2147483648 + f2

    expected = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        for fp in {span_fp(toks[i:i + 15]) for i in range(len(toks) - 14)}:
            expected.setdefault(fp, []).append(doc_id)
    exp_rows = sorted(
        (fp, len(ids), min(ids)) for fp, ids in expected.items() if len(ids) >= 2
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.span_fp, r.n_docs, r.representative)
        for r in duplicate_spans(df, n=15, min_docs=2).collect()
    )
    assert got == exp_rows
    assert len(got) >= 1  # the injected shared window is detected
