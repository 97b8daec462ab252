"""operators/sketch.py — Misra-Gries heavy hitters with exact recount."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.sketch import (
    _mg_partition,
    heavy_hitters,
    top_tokens_exact,
)


def _exact(df, key, min_count):
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .collect()
    )
    return {(r[key], r["n"]) for r in rows}


def test_mg_summary_bounded_and_keeps_heavy_keys():
    # 'a' x60, 'b' x30, 60 singletons; capacity 8 << 62 distinct keys
    stream = ["a"] * 60 + ["b"] * 30 + [f"s{i}" for i in range(60)]
    out = list(_mg_partition(iter([pd.DataFrame({"__key": stream})]), 8))[0]
    assert len(out) <= 8
    # any key with freq > n/(cap+1) = 150/9 ≈ 16.7 must survive
    assert {"a", "b"} <= set(out["__key"])


def test_heavy_hitters_matches_exact_groupby(spark):
    rows = [(f"k{i % 7}",) for i in range(700)] + [(f"u{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    got = {
        (r["k"], r["n_occurrences"])
        for r in heavy_hitters(df, "k", min_count=50, capacity=64).collect()
    }
    assert got == _exact(df, "k", 50)
    assert len(got) == 7


def test_heavy_hitters_partition_invariant(spark):
    rows = [(f"k{i % 13}",) for i in range(1300)]
    df = spark.createDataFrame(rows, "k string")
    a = heavy_hitters(df, "k", min_count=100, capacity=32).collect()
    b = heavy_hitters(df.repartition(11), "k", min_count=100, capacity=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_heavy_hitters_rejects_unsound_threshold(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    with pytest.raises(ValueError, match="exactness floor"):
        heavy_hitters(df, "k", min_count=2, capacity=10)


def test_heavy_hitters_total_count_skips_scan(spark):
    df = spark.createDataFrame([("x",)] * 40 + [("y",)] * 10, "k string")
    got = {
        tuple(r)
        for r in heavy_hitters(
            df, "k", min_count=10, capacity=64, total_count=50
        ).collect()
    }
    assert got == {("x", 40), ("y", 10)}


def test_top_tokens_exact_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["token"], r["n_occurrences"])
        for r in top_tokens_exact(docs, min_count=40, capacity=2048).collect()
    }
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    assert got == _exact(toks, "token", 40)
    assert got  # corpus has common tokens at this threshold
