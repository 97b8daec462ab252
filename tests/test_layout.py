"""operators/layout.py — Z-order (Morton) clustering."""

import random

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.layout import (
    zorder_repartition,
    zvalue,
    zvalue_sql,
)


def _morton_ref(vals, bits):
    """Independent pure-Python Morton reference."""
    k = len(vals)
    z = 0
    for i in range(bits):
        for d, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + d)
    return z


def test_zvalue_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zvalue(["x", "y"], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref((r["x"], r["y"]), 16)


def test_zvalue_sql_equivalent(spark):
    """The SQL string form (used by the oracle) computes the same key."""
    rng = random.Random(11)
    rows = [
        (rng.randrange(1 << 12), rng.randrange(1 << 12), rng.randrange(1 << 12))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    expr = zvalue_sql(["a", "b", "c"], bits=12)
    both = df.select(
        zvalue(["a", "b", "c"], bits=12).alias("z1"),
        F.expr(expr).alias("z2"),
    )
    assert both.filter(F.col("z1") != F.col("z2")).count() == 0


def test_zvalue_width_guard():
    import pytest

    with pytest.raises(ValueError, match="> 63 bits"):
        zvalue(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zvalue(["a"])


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """After z-order layout, each parquet file's min/max bounding box
    covers a small fraction of the key space in BOTH dimensions — the
    property row-group skipping depends on. A row-number-striped layout
    of the same data has full-width files in at least one dimension."""
    n = 1 << 12
    rows = [((i * 2654435761) % (1 << 16), (i * 40503) % (1 << 16)) for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    out = str(tmp_path / "zordered")
    zorder_repartition(df, ["x", "y"], bits=16, num_partitions=16).write.parquet(out)

    import glob

    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        if xs:
            spans.append(
                ((max(xs) - min(xs)) / (1 << 16), (max(ys) - min(ys)) / (1 << 16))
            )
    assert len(spans) >= 8
    # z-curve locality: 16 partitions ≈ 4 bits of z prefix ≈ 2 bits per
    # dim ≈ 1/4 width typical. Individual files straddling a high-order
    # bit flip can span wider, so assert the TYPICAL (median) geometry —
    # that is what aggregate row-group skipping depends on. A
    # row-striped layout has every file at span ~1.0 in both dims.
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med([sx for sx, _ in spans]) <= 0.35, spans
    assert med([sy for _, sy in spans]) <= 0.35, spans
    assert med([sx * sy for sx, sy in spans]) <= 0.1
