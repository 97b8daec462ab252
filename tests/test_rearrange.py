"""Tests for rearrange (ColumnRearranger semantics) and
map_with_row_index (mapper-with-row-index factory variant)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable


@pytest.fixture()
def base(spark):
    return ColumnarTable(
        spark.createDataFrame(
            [(f"R{i}", i, f"name{i}", float(i)) for i in range(20)],
            f"{ROW_KEY} string, n int, s string, x double",
        )
    )


def test_rearrange_keep_and_order(base):
    t = base.rearrange(keep=["x", "n"])
    assert t.columns == ["x", "n"]
    t2 = base.rearrange(order=["s", "n", "x"])
    assert t2.columns == ["s", "n", "x"]


def test_rearrange_convert(base):
    t = base.rearrange(convert={"x": F.col("x") * 10})
    assert {r[ROW_KEY]: r["x"] for r in t.df.collect()}["R3"] == 30.0


def test_rearrange_factory_appends_columns(base):
    def factory(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_sq": (pdf["n"] * pdf["n"]).astype("int64"),
            "tag": "v" + pdf["s"].str[-1],
        })

    t = base.rearrange(
        append_factory=factory, factory_output="n_sq long, tag string"
    )
    rows = {r[ROW_KEY]: r for r in t.df.collect()}
    assert rows["R4"]["n_sq"] == 16 and rows["R4"]["tag"] == "v4"
    assert len(rows) == 20 and set(t.columns) == {"n", "s", "x", "n_sq", "tag"}


def test_rearrange_factory_requires_schema(base):
    with pytest.raises(ValueError, match="factory_output"):
        base.rearrange(append_factory=lambda pdf: pdf)


def test_map_with_row_index(base):
    t = base.map_with_row_index(
        lambda idx: {"labeled": F.concat(F.lit("row-"), idx.cast("string"), F.lit(":"), F.col("s"))},
        order_by=[F.col("n")],
    )
    rows = sorted(r["labeled"] for r in t.df.collect())
    assert "row-0:name0" in rows and "row-19:name19" in rows
    assert "_row_index" not in t.columns
