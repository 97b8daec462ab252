"""Tests for the relational operator wrappers and domain statistics."""

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators import relational as R
from knime_core_columnar_spark.operators.domain import (
    ColumnDomain,
    attach_domains,
    compute_domains,
)
from knime_core_columnar_spark.schema import (
    DOMAIN_MAX_KEY,
    DOMAIN_MIN_KEY,
    DOMAIN_VALUES_KEY,
    ROW_KEY,
)
from knime_core_columnar_spark.table import ColumnarTable


@pytest.fixture()
def left(spark):
    return ColumnarTable(
        spark.createDataFrame(
            [("L1", 1, "a"), ("L2", 2, "b"), ("L3", 3, "c")],
            f"{ROW_KEY} string, id int, v string",
        )
    )


@pytest.fixture()
def right(spark):
    return ColumnarTable(
        spark.createDataFrame(
            [("R1", 1, 10.0), ("R2", 1, 20.0), ("R3", 9, 90.0)],
            f"{ROW_KEY} string, id int, w double",
        )
    )


def test_join_inner_concat_key(left, right):
    res = R.join(left, right, on=["id"], how="inner")
    rows = res.df.collect()
    assert len(rows) == 2
    keys = {r[ROW_KEY] for r in rows}
    assert keys == {"L1_R1", "L1_R2"}
    assert res.columns == ["id", "v", "id_r", "w"]


def test_join_outer_keeps_unmatched_keys(left, right):
    res = R.join(left, right, on=["id"], how="full")
    keys = {r[ROW_KEY] for r in res.df.collect()}
    assert "L2" in keys and "L3" in keys and "R3" in keys


def test_join_semi_anti(left, right):
    semi = R.join(left, right, on=["id"], how="left_semi")
    assert {r["id"] for r in semi.df.collect()} == {1}
    assert semi.columns == ["id", "v"]
    anti = R.join(left, right, on=["id"], how="left_anti")
    assert {r["id"] for r in anti.df.collect()} == {2, 3}


def test_aggregate_row_key(spark, right):
    res = R.aggregate(right, ["id"], {"n": F.count(F.lit(1))})
    rows = {r[ROW_KEY]: r["n"] for r in res.df.collect()}
    assert rows == {"1": 2, "9": 1}


def test_aggregate_rollup_null_marker(spark, right):
    res = R.aggregate(right, ["id"], {"n": F.count(F.lit(1))}, grouping="rollup")
    keys = {r[ROW_KEY] for r in res.df.collect()}
    assert "?" in keys  # grand-total row


def test_intersect_except(spark, left):
    other = ColumnarTable(
        spark.createDataFrame([("X1", 1, "a"), ("X2", 5, "e")], f"{ROW_KEY} string, id int, v string")
    )
    both = R.intersect(left, other)
    assert [(r["id"], r["v"]) for r in both.df.collect()] == [(1, "a")]
    diff = R.except_(left, other)
    assert {r["id"] for r in diff.df.collect()} == {2, 3}


def test_sort_topk(left):
    res = R.sort(left, [F.col("id").desc()], limit=2)
    assert [r["id"] for r in res.df.collect()] == [3, 2]


def test_distinct_min_key(spark):
    t = ColumnarTable(
        spark.createDataFrame(
            [("K2", 1), ("K1", 1), ("K3", 2)], f"{ROW_KEY} string, g int"
        )
    )
    res = R.distinct(t, subset=["g"])
    rows = {r["g"]: r[ROW_KEY] for r in res.df.collect()}
    assert rows == {1: "K1", 2: "K3"}  # min RowID wins, deterministic


def test_window_apply(spark, right):
    res = R.window_apply(
        right,
        partition_by=["id"],
        order_by=[F.col("w")],
        exprs={"rn": lambda w: F.row_number().over(w)},
    )
    rows = {r[ROW_KEY]: r["rn"] for r in res.df.collect()}
    assert rows == {"R1": 1, "R2": 2, "R3": 1}


def test_compute_domains(spark):
    t = ColumnarTable(
        spark.createDataFrame(
            [("A", 1, "x"), ("B", 5, "y"), ("C", 3, None)],
            f"{ROW_KEY} string, n int, s string",
        )
    )
    d = compute_domains(t)
    assert d["n"].min == 1 and d["n"].max == 5
    assert d["s"].values == ["x", "y"]  # nulls excluded, sorted


def test_domain_nominal_cap(spark):
    t = ColumnarTable(
        spark.createDataFrame(
            [(f"R{i}", f"v{i}") for i in range(100)], f"{ROW_KEY} string, s string"
        )
    )
    d = compute_domains(t, max_nominal_values=60)
    assert d["s"].values is None  # over cap → invalid, like the reference


def test_attach_domains(spark):
    t = ColumnarTable(
        spark.createDataFrame([("A", 1, "x")], f"{ROW_KEY} string, n int, s string")
    )
    t2 = attach_domains(t, compute_domains(t))
    md_n = t2.df.schema["n"].metadata
    assert md_n[DOMAIN_MIN_KEY] == "1" and md_n[DOMAIN_MAX_KEY] == "1"
    assert t2.df.schema["s"].metadata[DOMAIN_VALUES_KEY] == ["x"]
