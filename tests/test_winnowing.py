"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken) — a python
replay of the exact algorithm as the differential oracle, plus a
hypothesis property test of the paper's DETECTION GUARANTEE: any
shared token run of length >= w+k-1 must produce a shared
fingerprint."""

from __future__ import annotations

import hashlib

from hypothesis import given
from hypothesis import strategies as st

from knime_core_columnar_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from tests.test_r8_differential import _SETTINGS


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    toks = text.split()
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    h = [_h60(g) for g in grams]
    if not h:
        return set()
    n_win = max(len(h) - w, 0) + 1
    return {min(h[i:i + w]) for i in range(n_win)}


def _spark_fps(spark, texts, k=5, w=4):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_winnow_matches_python_replay(spark):
    texts = [
        "a b c d e f g h i j k l m",
        "a a a a a a a a",          # all-equal hashes
        "x y z",                    # fewer than k tokens → no grams
        "p q r s t",                # exactly k tokens → one gram
        "  spaced   out\ttokens b c d e f g  ",
        "",
    ]
    got = _spark_fps(spark, texts, k=5, w=4)
    for i, t in enumerate(texts):
        want = _py_winnow(t, 5, 4)
        assert got.get(i, set()) == want, (i, t)


@_SETTINGS
@given(
    data=st.data(),
    k=st.integers(2, 4),
    w=st.integers(2, 5),
)
def test_winnow_detection_guarantee(spark_session, data, k, w):
    """Splice one common run of w+k-1 tokens into two otherwise random
    documents at random positions: the pair MUST share a fingerprint
    (and therefore appear in winnow_overlap_pairs at min_shared=1)."""
    vocab = "abcdefghij"
    tok = st.sampled_from(list(vocab))
    run_len = w + k - 1
    # the shared run draws from a disjoint vocabulary so the random
    # padding cannot shorten the GUARANTEED match by accident
    run = data.draw(st.lists(st.sampled_from(list("RSTUV")),
                             min_size=run_len, max_size=run_len))
    pad_a = data.draw(st.lists(tok, max_size=8))
    pad_b = data.draw(st.lists(tok, max_size=8))
    cut_a = data.draw(st.integers(0, len(pad_a)))
    cut_b = data.draw(st.integers(0, len(pad_b)))
    doc_a = " ".join(pad_a[:cut_a] + run + pad_a[cut_a:])
    doc_b = " ".join(pad_b[:cut_b] + run + pad_b[cut_b:])

    fps = _spark_fps(spark_session, [doc_a, doc_b], k=k, w=w)
    assert fps[0] & fps[1], (doc_a, doc_b, k, w)


def test_winnow_overlap_pairs_counts_and_containment(spark):
    base = "m n o p q r s t u v w x"       # 12 tokens
    texts = [
        base,                               # 0
        "a b c " + base + " d e",           # 1: contains all of 0
        "z z z z z z z z z z",              # 2: unrelated
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {(r["id_a"], r["id_b"]): r
            for r in winnow_overlap_pairs(df, k=5, w=4,
                                          min_shared=1).collect()}
    assert (0, 1) in rows
    r = rows[(0, 1)]
    fps = _spark_fps(spark, texts, k=5, w=4)
    # doc 0's fingerprint set comes from a substring of doc 1, but
    # window minima near the splice boundaries may differ — the shared
    # count is bounded by both sets and containment uses the smaller
    assert r["shared"] == len(fps[0] & fps[1])
    assert abs(r["containment"]
               - r["shared"] / min(len(fps[0]), len(fps[1]))) < 1e-12
    assert not any(2 in p for p in rows)


def test_winnow_overlap_max_df_culls_common_fingerprints(spark):
    # the same boilerplate sentence in every doc -> every fingerprint of
    # that sentence has df = n_docs; max_df below that culls them all,
    # so only the pair that ALSO shares a rarer run survives
    boiler = "the quick brown fox jumps over the lazy dog again"
    rare = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        boiler,                      # 0
        boiler + " one",             # 1
        boiler + " two",             # 2
        boiler + " " + rare,         # 3
        rare + " " + boiler,         # 4
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    uncapped = {(r["id_a"], r["id_b"])
                for r in winnow_overlap_pairs(df, k=5, w=4,
                                              min_shared=1).collect()}
    # boilerplate alone links every pair when uncapped
    assert (0, 1) in uncapped and (1, 2) in uncapped
    capped = winnow_overlap_pairs(df, k=5, w=4, min_shared=1,
                                  max_df=3).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    # fingerprints of `boiler` occur in all 5 docs (> max_df) and are
    # culled; `rare`-run fingerprints occur in exactly 2 docs and stay
    assert (3, 4) in pairs
    assert (0, 1) not in pairs and (1, 2) not in pairs
    # containment denominators stay the PRE-cull totals: shared (rare
    # fps only) is a strict subset of doc 3's full fingerprint set
    r34 = next(r for r in capped if (r["id_a"], r["id_b"]) == (3, 4))
    fps = _spark_fps(spark, texts, k=5, w=4)
    assert r34["containment"] == r34["shared"] / min(len(fps[3]),
                                                     len(fps[4]))
    assert r34["containment"] < 1.0


def test_winnow_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(df, k=0)
