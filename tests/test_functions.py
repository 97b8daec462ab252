"""Tests for the scalar function registry and approximate aggregates."""

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.functions import (
    FUNCTION_REGISTRY,
    apply_function,
    list_functions,
)


def test_registry_coverage():
    cats = {spec.category for spec in FUNCTION_REGISTRY.values()}
    assert {"string", "math", "date", "null", "array", "map", "json"} <= cats
    assert len(FUNCTION_REGISTRY) >= 60
    assert "upper" in list_functions("string")
    assert "clamp" in list_functions("math")


def test_apply_function_validation():
    with pytest.raises(KeyError):
        apply_function("no_such_fn", "x")
    with pytest.raises(TypeError):
        apply_function("upper", "a", "b")


def test_apply_function_exec(spark):
    df = spark.createDataFrame([(" aB ", -3, None)], "s string, n int, m string")
    out = df.select(
        apply_function("strip", "s").alias("t"),
        apply_function("upper", "s").alias("u"),
        apply_function("clamp", "n", 0, 10).alias("c"),
        apply_function("if_missing", "m", "dflt").alias("d"),
        apply_function("sha256", "s").alias("h"),
    ).head()
    assert out["t"] == "aB" and out["u"] == " AB "
    assert out["c"] == 0 and out["d"] == "dflt"
    assert len(out["h"]) == 64


def test_approx_aggregates_bounds(spark, lineitem):
    """approx_count_distinct is within its documented ~5% rsd of exact;
    percentile_approx within the accuracy-bounded rank error."""
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("p"),
             F.count_distinct("l_suppkey").alias("s")).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("p"),
             F.approx_count_distinct("l_suppkey").alias("s")).collect()
    }
    for k, (pe, se) in exact.items():
        pa, sa = approx[k]
        assert abs(pa - pe) / pe < 0.15
        assert abs(sa - se) / se < 0.15
