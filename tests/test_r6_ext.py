"""Round-6 in-round extension operators: BM25 retrieval, embedding
covariance / PCA projection, PMI collocations, cross-source duplication."""

import math

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.similarity import bm25_topk


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _bm25_ref(docs, query_terms, k1=1.2, b=0.75):
    """Plain-python BM25 replica (same tokenization, rounding, scaling)."""
    toks = {i: [t for t in __import__("re").split(r"\W+", txt.lower().strip()) if t]
            for i, txt in docs}
    n = len(toks)
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    tf = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df = {}
    for (i, t) in tf:
        df[t] = df.get(t, 0) + 1
    out = {}
    for i in toks:
        s = 0
        hit = 0
        for t in query_terms:
            if (i, t) not in tf:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = tf[(i, t)] * (k1 + 1.0) / (
                tf[(i, t)] + k1 * (1.0 - b + b * dl[i] / avgdl))
            s += int(round(round(idf * tfn, 6) * 1_000_000, 0))
        if hit:
            out[i] = (hit, s)
    return out


def test_bm25_hand_case(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "quantum flux capacitor"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(
        [(100, "cat mat")], "query_id long, query_text string")
    got = {r["doc_id"]: (r["n_terms_hit"], r["bm25_scaled"], r["rank"])
           for r in bm25_topk(d, q, k=10).collect()}
    want = _bm25_ref(docs, ["cat", "mat"])
    assert set(got) == set(want)
    for i, (hit, s) in want.items():
        assert got[i][0] == hit and got[i][1] == s
    # doc 1 has both query terms -> rank 1
    assert got[1][2] == 1


def test_bm25_distinct_query_terms_and_rank_ties(spark):
    # repeated query term must count once; tie on score breaks by doc_id
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta")], "doc_id long, text string")
    q = spark.createDataFrame(
        [(9, "alpha alpha")], "query_id long, query_text string")
    rows = sorted(bm25_topk(d, q, k=5).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["bm25_scaled"] == rows[1]["bm25_scaled"]
    assert all(r["n_terms_hit"] == 1 for r in rows)


def test_bm25_partition_invariance(spark):
    docs = [(i, f"tok{i % 7} tok{i % 3} shared word{i}") for i in range(60)]
    q_rows = [(0, "tok1 shared word5")]
    a = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(q_rows, "query_id long, query_text string")
    r1 = {(r["query_id"], r["doc_id"]): (r["bm25_scaled"], r["rank"])
          for r in bm25_topk(a, q, k=15).collect()}
    r2 = {(r["query_id"], r["doc_id"]): (r["bm25_scaled"], r["rank"])
          for r in bm25_topk(a.repartition(13), q, k=15).collect()}
    assert r1 == r2


def test_bm25_topk_plan_uses_window_group_limit(spark):
    d = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "b")], "query_id long, query_text string")
    plan = bm25_topk(d, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# embedding covariance / PCA
# ---------------------------------------------------------------------------

def _aniso_rows(n=80, seed=7):
    """Deterministic anisotropic 4-d blobs: pc0 dominated by dim0."""
    import hashlib

    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}|{i}".encode()).digest()
        u = [(b - 127.5) / 127.5 for b in h[:4]]
        rows.append((i, [u[0] * 4.0, u[1] * 1.0, u[2] * 0.25, u[3] * 0.05]))
    return rows


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from knime_core_columnar_spark.operators.similarity import (
        embedding_covariance,
    )

    rows = _aniso_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["cov"]
           for r in embedding_covariance(df).collect()}
    X = np.array([np.array(v, dtype=np.float32) for _, v in rows],
                 dtype=np.float64)
    # replicate the micro-unit quantization, then exact covariance
    Xq = np.round(X * 1e6)
    n = len(Xq)
    for (i, j), cov in got.items():
        sxy = float(np.sum(Xq[:, i] * Xq[:, j]))
        sxi, sxj = float(Xq[:, i].sum()), float(Xq[:, j].sum())
        want = round((sxy - sxi * sxj / n) / n / 1e12, 9)
        assert cov == pytest.approx(want, abs=1e-12)
    assert len(got) == 4 * 5 // 2
    assert all(r[0] <= r[1] for r in got)


def test_embedding_covariance_partition_invariance(spark):
    from knime_core_columnar_spark.operators.similarity import (
        embedding_covariance,
    )

    rows = _aniso_rows(60)
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r1 = sorted(tuple(r) for r in embedding_covariance(a).collect())
    r2 = sorted(
        tuple(r)
        for r in embedding_covariance(a.repartition(11)).collect()
    )
    assert r1 == r2


def test_pca_project_recovers_dominant_axis(spark):
    import numpy as np

    from knime_core_columnar_spark.operators.similarity import pca_project

    rows = _aniso_rows(120)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["pc0"], r["pc1"])
           for r in pca_project(df, n_components=2).collect()}
    X = np.array([v for _, v in rows], dtype=np.float64)
    x0 = X[:, 0] - X[:, 0].mean()
    p0 = np.array([out[i][0] for i, _ in rows])
    # pc0 must align with the dominant (dim-0) axis almost perfectly
    corr = np.corrcoef(x0, p0)[0, 1]
    assert abs(corr) > 0.99
    # variance ordering: pc0 >= pc1
    p1 = np.array([out[i][1] for i, _ in rows])
    assert p0.var() >= p1.var()


def test_pca_project_partition_invariant_and_sign_fixed(spark):
    from knime_core_columnar_spark.operators.similarity import pca_project

    rows = _aniso_rows(60)
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r1 = sorted(tuple(r) for r in pca_project(a, n_components=2).collect())
    r2 = sorted(
        tuple(r) for r in pca_project(a.repartition(7), n_components=2).collect()
    )
    assert r1 == r2


# ---------------------------------------------------------------------------
# collocations (PMI)
# ---------------------------------------------------------------------------

def test_collocations_pmi_hand_case(spark):
    from knime_core_columnar_spark.operators.text import collocations_pmi

    # "new york" always adjacent; "the cat" also frequent but "the" is
    # promiscuous (high marginal) -> lower PMI
    docs = [("new york is big. the cat sat. the dog ran. the cat slept.",)] * 3
    docs += [("visit new york. the cat is here.",)] * 3
    df = spark.createDataFrame(docs, "text string")
    out = {(r["w1"], r["w2"]): r for r in
           collocations_pmi(df, min_count=3, k=50).collect()}
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny["c12"] == 6 and ny["c_left"] == 6 and ny["c_right"] == 6
    the_cat = out.get(("the", "cat"))
    assert the_cat is not None
    assert ny["pmi"] > the_cat["pmi"]


def test_collocations_pmi_min_count_and_math(spark):
    import math

    from knime_core_columnar_spark.operators.text import collocations_pmi

    df = spark.createDataFrame(
        [("a b a b a b",), ("c d",)], "text string")
    out = {(r["w1"], r["w2"]): r for r in
           collocations_pmi(df, min_count=2, k=10).collect()}
    # bigrams: (a,b)x3, (b,a)x2, (c,d)x1 -> min_count=2 keeps 2
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    n2 = 6.0
    want = round(math.log(3 * n2 / (3.0 * 3.0)), 6)
    assert ab["pmi"] == pytest.approx(want, abs=1e-9)


def test_collocations_pmi_partition_invariance(spark):
    from knime_core_columnar_spark.operators.text import collocations_pmi

    rows = [(f"alpha beta gamma tok{i % 5} alpha beta",) for i in range(40)]
    a = spark.createDataFrame(rows, "text string")
    r1 = [tuple(r) for r in collocations_pmi(a, min_count=2, k=10).collect()]
    r2 = [tuple(r) for r in
          collocations_pmi(a.repartition(9), min_count=2, k=10).collect()]
    assert r1 == r2


# ---------------------------------------------------------------------------
# cross-source duplication matrix
# ---------------------------------------------------------------------------

def test_cross_source_duplication_exact(spark):
    from knime_core_columnar_spark.operators.dedup import (
        cross_source_duplication,
    )

    rows = [
        (1, "shared text one", "A"),
        (2, "shared text one", "B"),
        (3, "shared text one", "C"),
        (4, "shared text two", "A"),
        (5, "shared text two", "B"),
        (6, "only in a", "A"),
        (7, "dup inside a", "A"),
        (8, "dup inside a", "A"),  # same-source dup: no cross pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in cross_source_duplication(df).collect()}
    assert out == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_cross_source_duplication_lede_fingerprint(spark):
    from knime_core_columnar_spark.operators.dedup import (
        cross_source_duplication,
    )

    rows = [
        (1, "one two three four five six SEVEN tail-a", "A"),
        (2, "one two three four five six DIFFERENT tail-b", "B"),
        (3, None, "A"),
        (4, "", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # exact: only the NULL/'' pair shares (both key as md5(''))
    exact = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
             for r in cross_source_duplication(df).collect()}
    assert exact == {("A", "B"): 1}
    # 6-word lede: docs 1+2 now ALSO share (identical first 6 words)
    out = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in cross_source_duplication(df, fingerprint_words=6).collect()}
    assert out == {("A", "B"): 2}


def test_cross_source_duplication_partition_invariance(spark):
    from knime_core_columnar_spark.operators.dedup import (
        cross_source_duplication,
    )

    rows = [(i, f"text {i % 10}", f"src{i % 4}") for i in range(80)]
    a = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r1 = sorted(tuple(r) for r in cross_source_duplication(a).collect())
    r2 = sorted(
        tuple(r) for r in cross_source_duplication(a.repartition(13)).collect()
    )
    assert r1 == r2 and r1


# ---------------------------------------------------------------------------
# vocabulary growth stats
# ---------------------------------------------------------------------------

def test_vocab_growth_stats_hand_case(spark):
    from knime_core_columnar_spark.operators.text import vocab_growth_stats

    rows = [
        ("A", "cat cat cat dog"),     # tokens 4, types {cat,dog}, hapax {dog}
        ("A", "cat bird"),            # A: tokens 6, types 3, hapax {dog,bird}
        ("B", "x y z"),               # B: tokens 3, types 3, hapax all
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in vocab_growth_stats(df).collect()}
    a = out["A"]
    assert (a["n_tokens"], a["n_types"], a["n_hapax"]) == (6, 3, 2)
    assert a["type_token_ratio"] == pytest.approx(round(3 / 6, 6))
    assert a["hapax_share"] == pytest.approx(round(2 / 3, 6))
    b = out["B"]
    assert (b["n_tokens"], b["n_types"], b["n_hapax"]) == (3, 3, 3)


def test_vocab_growth_templated_source_scores_low_ttr(spark):
    from knime_core_columnar_spark.operators.text import vocab_growth_stats

    rows = [("templated", "buy now best price deal")] * 30 + [
        ("organic", f"unique words number {i} appear here once {i*7}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in vocab_growth_stats(df).collect()}
    assert out["templated"]["type_token_ratio"] < out["organic"]["type_token_ratio"]


# ---------------------------------------------------------------------------
# temporal embargo split
# ---------------------------------------------------------------------------

def test_temporal_split_embargo_fences_and_counts(spark):
    import datetime as dt

    from knime_core_columnar_spark.operators.sampling import (
        temporal_split_embargo,
    )

    base = dt.datetime(2024, 1, 1)
    # 100 events, one per hour: span = 99h; f1 = 69.3h -> train < 69.3h
    rows = [(i, base + dt.timedelta(hours=i), i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["split"]: r for r in temporal_split_embargo(df).collect()}
    span_us = 99 * 3600 * 1_000_000
    f1 = int(0.7 * span_us // 1)  # hours < 69.3 -> 0..69 = 70 events
    assert out["train"]["n_events"] == 70
    assert out["embargo"]["n_events"] == 10   # hours 70..79 (< 79.2)
    assert out["test"]["n_events"] == 20      # hours 80..99
    # bands are disjoint and ordered
    assert out["train"]["last_us"] < out["embargo"]["first_us"]
    assert out["embargo"]["last_us"] < out["test"]["first_us"]
    # user counts are exact distinct
    assert out["test"]["n_users"] == len({i % 7 for i in range(80, 100)})


def test_temporal_split_partition_invariance(spark):
    import datetime as dt

    from knime_core_columnar_spark.operators.sampling import (
        temporal_split_embargo,
    )

    base = dt.datetime(2023, 6, 1)
    rows = [(i, base + dt.timedelta(minutes=i * 13), i % 11)
            for i in range(200)]
    a = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    r1 = sorted(tuple(r) for r in temporal_split_embargo(a).collect())
    r2 = sorted(
        tuple(r) for r in temporal_split_embargo(a.repartition(17)).collect()
    )
    assert r1 == r2


# ---------------------------------------------------------------------------
# perceptual-hash near-dup (multimodal)
# ---------------------------------------------------------------------------

def _payload_df(spark, rows):
    from knime_core_columnar_spark.operators.multimodal import (
        attach_binary_payload,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_binary_payload(df)


def _ahash_ref(b, n=64):
    L = len(b)
    if L < n:
        return None
    total = sum(b)
    bits = []
    for j in range(n):
        s, e = (j * L) // n, ((j + 1) * L) // n
        bits.append(1 if sum(b[s:e]) * L >= total * (e - s) else 0)
    return bits


def test_ahash_signatures_match_python_replica(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        ahash_signatures,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "short"),  # < 64 bytes: dropped
        (3, "Z" * 64),
        (4, "abcdefgh" * 20),
    ]
    out = {r["doc_id"]: (list(r["bits"]), list(r["bands"]))
           for r in ahash_signatures(_payload_df(spark, rows)).collect()}
    assert 2 not in out
    for i, txt in [(1, rows[0][1]), (3, rows[2][1]), (4, rows[3][1])]:
        want = _ahash_ref(list(txt.encode("utf-8")))
        assert out[i][0] == want
        bands = [sum(want[b * 8 + t] << t for t in range(8)) for b in range(8)]
        assert out[i][1] == bands


def test_phash_near_dup_identical_and_edited(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base),                       # identical -> hamming 0
        (3, base[:-10] + "EDITED TAIL"),  # light edit -> small hamming
        (4, "completely different content about databases " * 4),
    ]
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dup_pairs(
               _payload_df(spark, rows), max_hamming=6).collect()}
    assert out[(1, 2)] == 0
    assert out.get((1, 3), 99) <= 6 and out[(1, 3)] == out[(2, 3)]
    assert not any(4 in p for p in out)


def test_phash_pigeonhole_guard_and_partition_invariance(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    rows = [(i, f"document number {i} with repeated filler text " * 3)
            for i in range(30)]
    df = _payload_df(spark, rows)
    with pytest.raises(ValueError):
        phash_near_dup_pairs(df, max_hamming=8, band_bits=8)  # 8 bands
    r1 = sorted(tuple(r) for r in
                phash_near_dup_pairs(df, max_hamming=9, band_bits=4).collect())
    df2 = _payload_df(spark, rows)
    r2 = sorted(tuple(r) for r in
                phash_near_dup_pairs(df2.repartition(7), max_hamming=9,
                                     band_bits=4).collect())
    assert r1 == r2


# ---------------------------------------------------------------------------
# rank-biased overlap
# ---------------------------------------------------------------------------

def test_rbo_identical_and_disjoint_lists(spark):
    from knime_core_columnar_spark.operators.similarity import (
        ranking_rbo,
        rbo_coefficients_scaled,
    )

    depth = 5
    coeff = rbo_coefficients_scaled(depth)
    a_rows = [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
    b_same = a_rows
    b_disj = [(1, d, r) for r, d in enumerate([20, 21, 22, 23, 24], 1)]
    A = spark.createDataFrame(a_rows, "query_id long, doc_id long, rank int")
    # identical lists: every doc contributes coeff[rank]; RBO@5 sum
    out = ranking_rbo(
        A, spark.createDataFrame(b_same, A.schema), depth=depth
    ).collect()[0]
    assert out["n_common"] == 5
    assert out["rbo_scaled"] == sum(coeff[1:6])
    # truncated RBO@D of identical lists is exactly 1 - p^D
    assert out["rbo_scaled"] / 1e9 == pytest.approx(1 - 0.9 ** 5, abs=1e-6)
    # disjoint lists: row kept, zero score
    out2 = ranking_rbo(
        A, spark.createDataFrame(b_disj, A.schema), depth=depth
    ).collect()[0]
    assert (out2["n_common"], out2["rbo_scaled"]) == (0, 0)


def test_rbo_hand_case_and_top_weighting(spark):
    from knime_core_columnar_spark.operators.similarity import (
        ranking_rbo,
        rbo_coefficients_scaled,
    )

    depth = 3
    coeff = rbo_coefficients_scaled(depth)
    A = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)],
        "query_id long, doc_id long, rank int")
    # agreement at the TOP (same #1) beats agreement at the bottom
    b_top = spark.createDataFrame(
        [(1, 100, 1), (1, 200, 2), (1, 201, 3)], A.schema)
    b_bot = spark.createDataFrame(
        [(1, 202, 1), (1, 203, 2), (1, 102, 3)], A.schema)
    top = ranking_rbo(A, b_top, depth=depth).collect()[0]["rbo_scaled"]
    bot = ranking_rbo(A, b_bot, depth=depth).collect()[0]["rbo_scaled"]
    assert top == coeff[1] and bot == coeff[3]
    assert top > bot


# ---------------------------------------------------------------------------
# persisted IVF index
# ---------------------------------------------------------------------------

def test_ivf_index_parity(spark, tmp_path):
    """Probe-after-build must equal the one-shot ivf_topk — the pin
    that lets build/probe duplicate ivf_topk's expressions instead of
    refactoring the driver-green plan."""
    from knime_core_columnar_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
        ivf_topk,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id").isin([3, 47, 205]))
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, ncells=16)
    got = sorted(
        tuple(r)
        for r in ivf_probe_index(spark, path, queries, k=5, nprobe=4).collect()
    )
    want = sorted(
        tuple(r) for r in ivf_topk(corpus, queries, k=5, ncells=16, nprobe=4).collect()
    )
    assert got == want and got


def test_ivf_probe_partition_pruning(spark, tmp_path):
    """The probed-cells literal must reach the postings scan as a
    partition filter: the scan reads nprobe/ncells of the index, which
    is the whole point of the on-disk layout."""
    from knime_core_columnar_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") == 3)
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, ncells=16)
    plan = (
        ivf_probe_index(spark, path, queries, k=5, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [cell_id" in plan.replace("#", " #").replace(
        "cell_id #", "cell_id#"
    ) or "PartitionFilters" in plan and "cell_id" in plan
    # and the filter is selective (IN over <= nprobe literals), not a
    # full-index read
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "IN" in m.group(1).upper() or (m and "in(" in m.group(1))


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------

def _mmr_candidates(spark):
    # two near-identical high-relevance docs + one distinct mid-relevance
    rows = [
        (1, 10, 1_000_000, [1.0, 0.0, 0.0, 0.0]),
        (1, 11,   990_000, [0.999, 0.04, 0.0, 0.0]),   # ~dup of 10
        (1, 12,   700_000, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (1, 13,   100_000, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows,
        "query_id long, doc_id long, rel_scaled long, embedding array<double>",
    )


def test_mmr_prefers_diversity_over_redundancy(spark):
    from knime_core_columnar_spark.operators.similarity import mmr_rerank

    out = {r["mmr_rank"]: r["doc_id"]
           for r in mmr_rerank(_mmr_candidates(spark), k=3,
                               lambda_milli=700).collect()}
    # pick 1: highest relevance (10). pick 2: doc 11 is a near-dup of 10
    # (sim ~1) so its mmr collapses; the orthogonal doc 12 wins.
    assert out[1] == 10
    assert out[2] == 12
    # pick 3: now 11's redundancy with 10 still dominates vs 13?
    # 11: 700*990000 - 300*999200(sim to 10) ~ 693M - 299.8M = 393.2M
    # 13: 700*100000 - 300*0 = 70M -> 11 wins
    assert out[3] == 11


def test_mmr_lambda_one_is_pure_relevance(spark):
    from knime_core_columnar_spark.operators.similarity import mmr_rerank

    out = [r["doc_id"] for r in
           mmr_rerank(_mmr_candidates(spark), k=4, lambda_milli=1000)
           .orderBy("mmr_rank").collect()]
    assert out == [10, 11, 12, 13]  # relevance order, redundancy ignored


def test_mmr_partition_invariance_and_multi_query(spark):
    import hashlib

    from knime_core_columnar_spark.operators.similarity import mmr_rerank

    rows = []
    for q in range(3):
        for d in range(20):
            h = hashlib.md5(f"{q}|{d}".encode()).digest()
            vec = [(b - 127.5) / 127.5 for b in h[:8]]
            rows.append((q, d, int(h[8]) * 10_000, vec))
    df = spark.createDataFrame(
        rows,
        "query_id long, doc_id long, rel_scaled long, embedding array<double>",
    )
    r1 = sorted(tuple(r) for r in mmr_rerank(df, k=5).collect())
    r2 = sorted(tuple(r) for r in mmr_rerank(df.repartition(13), k=5).collect())
    assert r1 == r2
    assert len(r1) == 15  # 3 queries x k=5


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------

def test_rm3_expansion_recovers_vocabulary_mismatch(spark):
    from knime_core_columnar_spark.operators.similarity import (
        bm25_topk,
        rm3_expand_topk,
    )

    # query says "car"; docs 1-3 say car AND automobile; doc 4 says only
    # automobile -> invisible to plain BM25, reachable after expansion
    docs = [
        (1, "car automobile engine road"),
        (2, "car automobile wheels"),
        (3, "car automobile driver"),
        (4, "automobile factory assembly"),
        (5, "kitchen recipes cooking"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame([(0, "car")], "query_id long, query_text string")
    base_ids = {r["doc_id"] for r in bm25_topk(d, q, k=10).collect()}
    assert base_ids == {1, 2, 3}
    rm3_ids = {r["doc_id"]
               for r in rm3_expand_topk(d, q, k=10, n_feedback=3,
                                        n_expansion=2).collect()}
    assert 4 in rm3_ids            # reached via the "automobile" expansion
    assert 5 not in rm3_ids        # unrelated doc still unreachable


def test_rm3_excludes_original_terms_from_expansion_budget(spark):
    from knime_core_columnar_spark.operators.similarity import rm3_expand_topk

    # with n_expansion=1, the one expansion slot must go to a NEW term
    # (shared), not be wasted re-adding the original query term
    docs = [
        (1, "alpha shared"),
        (2, "alpha shared"),
        (3, "shared bonus"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame([(0, "alpha")], "query_id long, query_text string")
    out = {r["doc_id"]: r["n_terms_hit"]
           for r in rm3_expand_topk(d, q, k=10, n_feedback=2,
                                    n_expansion=1).collect()}
    assert 3 in out                # reachable only via expansion term
    assert out[1] == 2             # alpha + shared both hit


def test_rm3_partition_invariance(spark):
    from knime_core_columnar_spark.operators.similarity import rm3_expand_topk

    docs = [(i, f"tok{i % 7} tok{i % 3} shared word{i % 11}")
            for i in range(80)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame([(0, "tok1 shared")],
                              "query_id long, query_text string")
    r1 = sorted(tuple(r) for r in
                rm3_expand_topk(d, q, k=15, n_feedback=4,
                                n_expansion=3).collect())
    r2 = sorted(tuple(r) for r in
                rm3_expand_topk(d.repartition(13), q, k=15, n_feedback=4,
                                n_expansion=3).collect())
    assert r1 == r2


# ---------------------------------------------------------------------------
# contrastive pair mining
# ---------------------------------------------------------------------------

def test_contrastive_pairs_labels_and_bands(spark):
    from knime_core_columnar_spark.operators.similarity import (
        contrastive_pairs,
    )

    # dim 4, planes=1: hyperplane splits space into 2 buckets; construct
    # same-bucket triples with known cosines
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.045, 0.0, 0.0]),   # cos(1,2) ~ 0.999 -> positive
        (3, [0.3, 0.954, 0.0, 0.0]),     # cos(1,3) ~ 0.3 -> hard negative
        (4, [0.8, 0.6, 0.0, 0.0]),       # cos(1,4) ~ 0.8 -> dropped band
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]): (r["label"], r["cos"])
           for r in contrastive_pairs(df, dim=4, pos_threshold=0.95,
                                      neg_low=0.0, neg_high=0.5,
                                      planes=1).collect()}
    same_bucket_pairs = set(out)
    for (a, b), (lbl, cos) in out.items():
        assert a < b
        if lbl == "positive":
            assert cos >= 0.95
        else:
            assert 0.0 <= cos <= 0.5
    if (1, 2) in same_bucket_pairs:
        assert out[(1, 2)][0] == "positive"
    if (1, 3) in same_bucket_pairs:
        assert out[(1, 3)][0] == "hard_negative"
    assert (1, 4) not in same_bucket_pairs  # mid-band dropped


def test_contrastive_pairs_partition_invariance(spark):
    import hashlib

    from knime_core_columnar_spark.operators.similarity import (
        contrastive_pairs,
    )

    rows = []
    for i in range(80):
        h = hashlib.md5(f"cp|{i}".encode()).digest()
        rows.append((i, [(b - 127.5) / 127.5 for b in h[:8]]))
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, pos_threshold=0.8, neg_low=0.0, neg_high=0.3, planes=2)
    r1 = sorted(tuple(r) for r in contrastive_pairs(a, **kw).collect())
    r2 = sorted(
        tuple(r) for r in contrastive_pairs(a.repartition(11), **kw).collect()
    )
    assert r1 == r2 and r1


# ---------------------------------------------------------------------------
# plan-shape pins for the round-6 additions
# ---------------------------------------------------------------------------

def test_collocations_plan_uses_take_ordered(spark):
    from knime_core_columnar_spark.operators.text import collocations_pmi

    df = spark.createDataFrame([("a b c a b",)], "text string")
    plan = (collocations_pmi(df, min_count=1, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    # global top-k must be per-partition heaps, never a full sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_embedding_covariance_plan_partial_aggregates(spark):
    from knime_core_columnar_spark.operators.similarity import (
        embedding_covariance,
    )

    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "vec_id long, embedding array<float>")
    plan = (embedding_covariance(df)
            ._jdf.queryExecution().executedPlan().toString())
    # the pair-sum must map-side combine (partial_ before the exchange):
    # shuffle volume is executors x d^2, not rows x d^2
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_cross_source_duplication_plan_no_cartesian(spark):
    from knime_core_columnar_spark.operators.dedup import (
        cross_source_duplication,
    )

    df = spark.createDataFrame(
        [(1, "t", "A"), (2, "t", "B")], "doc_id long, text string, source string")
    plan = (cross_source_duplication(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# image header metadata (real format parsing, no imaging lib)
# ---------------------------------------------------------------------------

def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00")


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 5


def _jpeg(w, h):
    # SOI + APP0 (16 bytes) + SOF0 + EOI
    # length 16 counts itself: 2 (len) + 5 ('JFIF\0') + 9 padding
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_extract_image_meta_png_gif_and_unknown(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_gif(320, 200))),
        (3, bytearray(b"plain text bytes")),
        (4, bytearray(_jpeg(800, 600))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df).collect()}
    assert out[1] == ("png", 640, 480)
    assert out[2] == ("gif", 320, 200)
    assert out[3] == (None, None, None)
    assert out[4] == ("jpeg", None, None)  # detected; dims need the walk


def test_extract_image_meta_jpeg_marker_walk(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    rows = [
        (1, bytearray(_jpeg(800, 600))),
        (2, bytearray(_jpeg(31, 7))),
        (3, bytearray(_png(1, 2))),
        (4, bytearray(b"\xff\xd8\xff\xe0junk")),  # truncated jpeg
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df, parse_jpeg=True).collect()}
    assert out[1] == ("jpeg", 800, 600)
    assert out[2] == ("jpeg", 31, 7)
    assert out[3] == ("png", 1, 2)
    assert out[4] == ("jpeg", None, None)


def test_extract_image_meta_partition_invariance(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    rows = [(i, bytearray(_png(i + 1, 2 * i + 1)) if i % 2 == 0
             else bytearray(_gif(i + 1, i + 2))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    r1 = sorted(tuple(r) for r in extract_image_meta(df).collect())
    r2 = sorted(
        tuple(r) for r in extract_image_meta(df.repartition(9)).collect()
    )
    assert r1 == r2


# ---------------------------------------------------------------------------
# bitext mining
# ---------------------------------------------------------------------------

def test_cross_lingual_pairs_filters_same_language(spark):
    from knime_core_columnar_spark.operators.similarity import (
        cross_lingual_pairs,
    )

    # two near-parallel vectors across languages + one same-language dup
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),   # ~1.0 cos with vec 1
        (3, [0.998, 0.06, 0.0, 0.0]),   # ~1.0 cos with both
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    docs = [(1, "en"), (2, "de"), (3, "en"), (4, "fr")]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    d = spark.createDataFrame(docs, "doc_id long, lang string")
    out = {(r["id_a"], r["id_b"]): (r["lang_a"], r["lang_b"], r["cos"])
           for r in cross_lingual_pairs(e, d, dim=4, threshold=0.95,
                                        planes=1).collect()}
    # (1,2) en-de and (2,3) de-en survive; (1,3) en-en is filtered
    assert (1, 3) not in out
    if (1, 2) in out:
        assert out[(1, 2)][:2] == ("en", "de")
    if (2, 3) in out:
        assert out[(2, 3)][:2] == ("de", "en")
    assert any(p in out for p in [(1, 2), (2, 3)])
    assert all(c >= 0.95 for *_, c in out.values())


def test_cross_lingual_pairs_partition_invariance(spark):
    import hashlib

    from knime_core_columnar_spark.operators.similarity import (
        cross_lingual_pairs,
    )

    vecs, docs = [], []
    for i in range(60):
        h = hashlib.md5(f"bt|{i}".encode()).digest()
        vecs.append((i, [(b - 127.5) / 127.5 for b in h[:8]]))
        docs.append((i, ["en", "de", "fr"][i % 3]))
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    d = spark.createDataFrame(docs, "doc_id long, lang string")
    kw = dict(dim=8, threshold=0.3, planes=2)
    r1 = sorted(tuple(r) for r in cross_lingual_pairs(e, d, **kw).collect())
    r2 = sorted(tuple(r) for r in
                cross_lingual_pairs(e.repartition(7), d.repartition(5),
                                    **kw).collect())
    assert r1 == r2 and r1
