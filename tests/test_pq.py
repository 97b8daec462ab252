"""Product quantization (similarity.pq_train/pq_encode/pq_topk)."""

import math

import numpy as np
import pytest

from knime_core_columnar_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors64(spark):
    """200 vectors in 16 dims, 4 well-separated cluster directions —
    realistic enough that PQ must actually work to score recall."""
    rows = []
    for i in range(200):
        c = i % 4
        base = [
            math.sin(c * 1.7 + d * 0.61) + 0.2 * math.sin(i * 0.37 + d * 1.3)
            for d in range(16)
        ]
        n = math.sqrt(sum(x * x for x in base))
        rows.append((i, [float(x / n) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_train_shape_and_determinism(spark, vectors64):
    cb1 = S.pq_train(vectors64, m=4, ks=8)
    cb2 = S.pq_train(vectors64.repartition(13), m=4, ks=8, corpus_count=200)
    assert cb1.shape == (4, 8, 4)
    assert np.array_equal(cb1, cb2)  # hash-sampled: partitioning-independent


def test_pq_train_guards(spark, vectors64):
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_train(vectors64, m=5, ks=4)
    with pytest.raises(ValueError, match="too small"):
        S.pq_train(vectors64.filter("vec_id < 3"), m=4, ks=64)


def test_pq_encode_codes_and_invariance(spark, vectors64):
    cb = S.pq_train(vectors64, m=4, ks=8)
    codes = S.pq_encode(vectors64, cb).collect()
    assert len(codes) == 200
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
    again = {
        r["vec_id"]: r["codes"]
        for r in S.pq_encode(vectors64.repartition(7), cb).collect()
    }
    assert {r["vec_id"]: r["codes"] for r in codes} == again


def test_pq_topk_recall_vs_brute_force(spark, vectors64):
    """Standard PQ evaluation is recall@R (R > k): quantization
    deliberately collapses fine within-cell ranks, so the exact top-5
    must appear in the ADC top-20 — on unit vectors L2 and cosine rank
    identically, so brute_force_topk is the ground truth."""
    queries = vectors64.filter("vec_id < 8")
    exact = S.brute_force_topk(vectors64, queries, k=5)
    cb = S.pq_train(vectors64, m=8, ks=16)
    codes = S.pq_encode(vectors64, cb)
    approx = S.pq_topk(codes, queries, cb, k=20)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a) == 8 * 20
    assert len(e & a) / len(e) >= 0.6  # recall@20 of the exact top-5


def test_pq_compression_factor(spark, vectors64):
    """The point of PQ: the code column is an order of magnitude smaller
    than the float vectors it replaces."""
    cb = S.pq_train(vectors64, m=4, ks=8)
    codes = S.pq_encode(vectors64, cb)
    # 16 float32 dims = 64 B payload vs 4 int8-sized codes; Spark's
    # array<int> costs 4 B/code — still 4x; the (m, ks, d) codebook
    # itself is constant metadata
    assert cb.nbytes == 4 * 8 * 4 * 8  # kilobyte-scale, broadcastable
    assert codes.schema["codes"].dataType.simpleString() == "array<int>"


def test_pq_topk_partition_invariance(spark, vectors64):
    queries = vectors64.filter("vec_id IN (0, 1)")
    cb = S.pq_train(vectors64, m=4, ks=8)
    a = S.pq_topk(S.pq_encode(vectors64, cb), queries, cb, k=3)
    b = S.pq_topk(S.pq_encode(vectors64.repartition(11), cb), queries, cb, k=3)
    ka = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in a.collect()}
    kb = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in b.collect()}
    assert ka == kb
