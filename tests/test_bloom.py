"""Bloom prefilter: exactness vs plain semi/anti joins, including under
deliberately undersized filters (high FP rate) — the Bloom tier must
only prune, never change the result."""

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.bloom import (
    bloom_anti_join,
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"key{i % 97}") for i in range(1000)], "id long, k string"
    )


@pytest.fixture(scope="module")
def members(spark):
    # 30 member keys, some absent from the corpus
    return spark.createDataFrame(
        [(f"key{i * 3}",) for i in range(40)], "k string"
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_bloom_semi_join_exact(spark, corpus, members):
    exact = _ids(corpus.join(members, "k", "semi"))
    got = _ids(bloom_semi_join(corpus, members, "k"))
    assert got == exact and len(exact) > 0


def test_bloom_anti_join_exact(spark, corpus, members):
    exact = _ids(corpus.join(members, "k", "anti"))
    got = _ids(bloom_anti_join(corpus, members, "k"))
    assert got == exact and len(exact) > 0
    assert len(exact) + len(_ids(corpus.join(members, "k", "semi"))) == 1000


def test_exact_under_saturated_filter(spark, corpus, members):
    """A 64-bit filter is hopelessly saturated (near-100% FP): every row
    survives the prefilter, and the exact phase must still produce the
    precise answer."""
    exact_semi = _ids(corpus.join(members, "k", "semi"))
    exact_anti = _ids(corpus.join(members, "k", "anti"))
    assert _ids(bloom_semi_join(corpus, members, "k", num_bits=64)) == exact_semi
    assert _ids(bloom_anti_join(corpus, members, "k", num_bits=64)) == exact_anti


def test_prefilter_no_false_negatives(spark, corpus, members):
    """Every true member row must survive the positive prefilter."""
    bloom = build_bloom(members, "k", num_bits=1 << 14)
    kept = set(_ids(bloom_prefilter(corpus, "k", bloom)))
    true_hits = set(_ids(corpus.join(members, "k", "semi")))
    assert true_hits <= kept


def test_negate_partitions_corpus(spark, corpus, members):
    bloom = build_bloom(members, "k", num_bits=1 << 14)
    pos = set(_ids(bloom_prefilter(corpus, "k", bloom)))
    neg = set(_ids(bloom_prefilter(corpus, "k", bloom, negate=True)))
    assert pos | neg == set(range(1000)) and not (pos & neg)


def test_fill_ratio_and_validation(spark, members):
    bloom = build_bloom(members, "k", num_bits=1 << 12, num_hashes=5)
    assert 0.0 < bloom.fill_ratio < 0.5
    with pytest.raises(ValueError):
        build_bloom(members, "k", num_bits=100)  # not a multiple of 64
