"""Deterministic sampling/splitting: stability under repartitioning is
the whole point — assert it explicitly."""

import pytest

from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(0, 2000).withColumn("k", F.col("id").cast("string"))


def test_split_disjoint_exhaustive_and_sized(rows):
    out = hash_split(rows, ["k"])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.07 < counts["val"] / 2000 < 0.13
    assert 0.07 < counts["test"] / 2000 < 0.13


def test_split_stable_under_repartition(rows):
    a = {r["k"]: r["split"] for r in hash_split(rows, ["k"]).collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(rows.repartition(13, "k"), ["k"]).collect()
    }
    assert a == b


def test_sample_is_subset_and_stable(rows):
    s1 = {r["k"] for r in deterministic_sample(rows, ["k"], 0.25).collect()}
    s2 = {r["k"] for r in deterministic_sample(rows.repartition(7), ["k"], 0.25).collect()}
    assert s1 == s2
    assert 0.2 < len(s1) / 2000 < 0.3
    # growing the fraction only ADDS rows (nested samples)
    s3 = {r["k"] for r in deterministic_sample(rows, ["k"], 0.5).collect()}
    assert s1 <= s3


def test_split_fractions_validated(rows):
    with pytest.raises(ValueError):
        hash_split(rows, ["k"], {"a": 0.5, "b": 0.1})
