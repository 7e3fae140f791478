"""ANN similarity search over the embeddings testdata."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_converter_json_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _py_cosine(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) ** 2 for x in a))
    nb = math.sqrt(sum(float(x) ** 2 for x in b))
    return dot / (na * nb)


def test_brute_force_topk_matches_python_oracle(spark, emb):
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 3)
    got = sim.cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos))
    for qid in (0, 1, 2):
        scores = sorted(
            ((round(_py_cosine(vecs[qid], v), 4), -i) for i, v in vecs.items() if i != qid),
            reverse=True,
        )[:5]
        expected = [(-negid, c) for c, negid in scores]
        actual = [(r[1], r[2]) for r in sorted(by_q[qid])]
        assert [e[0] for e in expected] == [a[0] for a in actual]
        for e, a in zip(expected, actual):
            assert abs(e[1] - a[1]) < 1e-3


def test_topk_excludes_self_and_respects_k(emb):
    out = sim.cosine_topk(emb, emb.limit(2), k=3).collect()
    assert all(r.neighbor_id != r.query_id for r in out)
    assert len(out) == 6


def test_lsh_topk_recall_vs_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(emb, queries, k=10).collect()
    approx = sim.lsh_bucket_topk(emb, queries, k=10, bits=3, tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) > 0.3  # lsh is approximate; sanity floor


def test_sketch_deterministic(spark, emb):
    a = {r.vec_id: r.s for r in emb.limit(20).select("vec_id", sim.hyperplane_sketch(F.col("embedding"), 8).alias("s")).collect()}
    b = {r.vec_id: r.s for r in emb.limit(20).select("vec_id", sim.hyperplane_sketch(F.col("embedding"), 8).alias("s")).collect()}
    assert a == b


def test_cosine_near_pairs_symmetric_ordering(spark):
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.05, 0.0]), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = sim.cosine_near_pairs(df, threshold=0.9, bits=2, tables=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_hyperplane_weights_deterministic_and_balanced():
    a = sim.hyperplane_weights(4, 0, 64)
    b = sim.hyperplane_weights(4, 0, 64)
    assert a == b
    assert sim.hyperplane_weights(4, 1, 64) != a  # tables differ
    flat = [x for row in a for x in row]
    assert set(flat) == {1.0, -1.0}
    assert 0.3 < flat.count(1.0) / len(flat) < 0.7  # roughly balanced


def test_portable_sketch_matches_python_reference(spark, emb):
    """dim-literal sketch must equal a pure-Python recomputation with the
    same md5-derived weights and decimal-9 quantization."""
    from decimal import Decimal, ROUND_HALF_UP

    rows = emb.limit(20).collect()
    got = {
        r.vec_id: r.s
        for r in emb.limit(20)
        .select("vec_id", sim.hyperplane_sketch(F.col("embedding"), 4, 1, dim=64).alias("s"))
        .collect()
    }
    ws = sim.hyperplane_weights(4, 1, 64)
    for r in rows:
        sk = 0
        for h in range(4):
            proj = sum(
                Decimal(repr(float(x) * w)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
                for x, w in zip(r.embedding, ws[h])
            )
            if proj >= 0:
                sk |= 1 << h
        assert got[r.vec_id] == sk


def test_lsh_topk_portable_recall(spark, emb):
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in sim.lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 3), k=5,
                                           bits=2, tables=6, dim=64).collect()}
    assert len(approx & exact) / len(exact) >= 0.5


def test_ivf_topk_recall_and_determinism(spark, emb):
    qs = emb.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, qs, k=5).collect()}
    a = sim.ivf_topk(emb, qs, k=5, n_centroids=4, nprobe=2).collect()
    b = sim.ivf_topk(emb, qs, k=5, n_centroids=4, nprobe=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    approx = {(r.query_id, r.neighbor_id) for r in a}
    assert len(approx & exact) / len(exact) >= 0.3  # nprobe=2 of 4 cells
    # probing ALL cells must recover the exact result
    full = {(r.query_id, r.neighbor_id)
            for r in sim.ivf_topk(emb, qs, k=5, n_centroids=4, nprobe=4).collect()}
    assert full == exact


def test_quantize_int8_roundtrip_error(spark, emb):
    rows = sim.quantize_int8(emb.limit(30)).collect()
    vecs = {r.vec_id: r.embedding for r in emb.limit(30).collect()}
    for r in rows:
        v = vecs[r.vec_id]
        assert len(r.q) == len(v)
        assert max(abs(x) for x in r.q) == 127  # scale hits the max component
        # dequantized error bounded by scale/2 per component
        for x, qx in zip(v, r.q):
            assert abs(float(x) - qx * r.scale) <= r.scale / 2 + 1e-9


def test_ivf_lloyd_refinement_improves_clustered_recall(spark):
    """Clustered fixture: 4 well-separated gaussian-ish blobs in 8-d.
    The hash-sampled codebook can land several seeds in one blob (cell
    imbalance); 3 deterministic Lloyd rounds must (a) stay deterministic,
    (b) balance the cells, (c) not lose recall — and on this fixture
    strictly improve nprobe=1 recall vs the unrefined codebook."""
    import hashlib

    def blob(center, n, base):
        rows = []
        for i in range(n):
            h = hashlib.md5(f"{base + i}".encode()).digest()
            rows.append((
                base + i,
                [float(c) + (h[j] / 255.0 - 0.5) for j, c in enumerate(center)],
            ))
        return rows

    centers = [
        [10, 0, 0, 0, 0, 0, 0, 0], [0, 10, 0, 0, 0, 0, 0, 0],
        [0, 0, 10, 0, 0, 0, 0, 0], [0, 0, 0, 10, 0, 0, 0, 0],
    ]
    data = [r for bi, c in enumerate(centers) for r in blob(c, 25, 100 * bi)]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")

    c0 = sim.ivf_centroids(emb, 4, lloyd_rounds=0)
    c3 = sim.ivf_centroids(emb, 4, lloyd_rounds=3)
    c3b = sim.ivf_centroids(emb, 4, lloyd_rounds=3)
    assert c3 == c3b  # deterministic across runs

    def cell_sizes(cents):
        import math
        sizes = [0] * len(cents)
        for _, v in data:
            d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
            sizes[d.index(min(d))] += 1
        return sorted(sizes)

    # refined cells are at least as balanced (smaller max cell)
    assert max(cell_sizes(c3)) <= max(cell_sizes(c0))

    qs = emb.filter(F.col("vec_id").isin([0, 100, 200, 300]))
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, qs, k=5).collect()}

    def recall(rounds):
        got = {(r.query_id, r.neighbor_id)
               for r in sim.ivf_topk(emb, qs, k=5, n_centroids=4, nprobe=1,
                                     lloyd_rounds=rounds).collect()}
        return len(got & exact) / len(exact)

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    assert r3 == 1.0  # converged codebook = one centroid per blob
