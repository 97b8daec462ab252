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


def test_histogram_sketch_merge_equals_exact_counts(spark):
    from knime_core_columnar_spark.operators.sketch import (
        histogram_sketch,
        quantiles_from_histogram,
    )

    rows = [(i % 3, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "shard int, v double")
    # sharded sketch with pinned domain == unsharded sketch after merge
    sharded = histogram_sketch(df, "v", shard_col="shard", bins=50, lo=0.0, hi=999.0)
    flat = histogram_sketch(df, "v", bins=50, lo=0.0, hi=999.0)
    merged = {
        (r["bin"], r["n"])
        for r in sharded.groupBy("bin").agg(F.sum("n").alias("n")).collect()
    }
    assert merged == {(r["bin"], r["n"]) for r in flat.collect()}
    # total mass preserved
    assert sum(n for _, n in merged) == 1000
    # quantiles within one bin width of exact (uniform data)
    q = {r["prob"]: r["estimate"] for r in
         quantiles_from_histogram(sharded, [0.25, 0.5, 0.9]).collect()}
    width = 999.0 / 50
    for p, exact in [(0.25, 249.75), (0.5, 499.5), (0.9, 899.1)]:
        assert abs(q[p] - exact) <= width


def test_histogram_sketch_edges_and_nulls(spark):
    from knime_core_columnar_spark.operators.sketch import histogram_sketch

    df = spark.createDataFrame(
        [(0.0,), (10.0,), (None,), (5.0,)], "v double"
    )
    rows = {r["bin"]: r for r in histogram_sketch(df, "v", bins=10).collect()}
    assert sum(r["n"] for r in rows.values()) == 3  # NULL dropped
    assert rows[9]["n"] == 1  # hi lands in last bin (closed top edge)
    assert rows[0]["n"] == 1


def test_skew_profile_flags_hub_key(spark):
    from knime_core_columnar_spark.operators.sketch import skew_profile

    rows = [("hub",)] * 500 + [(f"k{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, ["k"], capacity=64, target_rows_per_task=100).collect()
    keys = {r["key"]: r for r in out}
    assert "hub" in keys
    assert keys["hub"]["n_rows"] == 500
    assert abs(keys["hub"]["row_share"] - 0.5) < 1e-9
    assert keys["hub"]["salt_factor"] == 5  # ceil(500/100)
    # balanced table -> empty profile (certifies shuffle-safe)
    flat = spark.createDataFrame([(f"k{i % 100}",) for i in range(1000)], "k string")
    assert skew_profile(flat, ["k"], capacity=64).count() == 0


def test_r5_r6_sections_registered():
    """The r5/r6 sections register at import (flat registry)."""
    from knime_core_columnar_spark import catalog

    for name in ["semantic_dedup", "bigram_lm_quality",
                 "decontaminate_bloom", "stream_stream_join_batch",
                 "bpe_merges", "heavy_hitter_tokens", "table_checksums",
                 "copurchase_triangles", "duplicate_span_profile",
                 "hybrid_search_rrf"]:
        assert callable(catalog.QUERIES[name])
    assert set(catalog.ORACLES) <= set(catalog.QUERIES)
