"""partsupp TPC-H patterns (q2/q9/q11/q16/q20) - register when the table ships.

Split from the monolithic catalog.py (round 6); registration
order is preserved by the package __init__ import sequence.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

from knime_core_columnar_spark.catalog._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _dec,
    _t,
)

# ---------------------------------------------------------------------------
# partsupp TPC-H patterns (q2/q9/q11/q16/q20) — pre-staged.
#
# /root/testdata currently ships NO partsupp table (COVERAGE.md), so these
# five patterns register only when a partsupp.parquet appears next to the
# other tables (or when a test forces registration against a synthetic
# fixture). Once the driver's testdata grows partsupp they join the
# catalog automatically, after the driver window (never-checked slots).
# All oracles follow the determinism rules used everywhere else: decimal
# staging for sums, CAST(... AS DOUBLE/BIGINT/INTEGER) on aggregates.
# ---------------------------------------------------------------------------

PARTSUPP_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PARTSUPP_ORACLES: Dict[str, str] = {}


def _partsupp_query(name: str, oracle: str):
    def deco(fn):
        PARTSUPP_QUERIES[name] = fn
        PARTSUPP_ORACLES[name] = oracle
        return fn

    return deco


@_partsupp_query(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, p_name, s_name, n_name,
           CAST(ps_supplycost AS DOUBLE) AS min_cost
    FROM part, partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE' AND p_size <= 15
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: minimum-cost supplier per part within a region
    (correlated MIN decorrelated into a window). The region dimensions
    broadcast; the min is one partial-aggregable window over the
    already-joined candidate set — no second scan of partsupp."""
    ps = _t(spark, sf_dir, "partsupp")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    w = Window.partitionBy("ps_partkey")
    cand = cand.withColumn("__min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("__min_cost")
    )
    return cand.join(p, cand["ps_partkey"] == p["p_partkey"]).select(
        "p_partkey", "p_name", "s_name", "n_name",
        F.col("ps_supplycost").cast("double").alias("min_cost"),
    )


@_partsupp_query(
    "q9_profit_by_nation_year",
    """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                    - CAST(ps_supplycost * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern: product-line profit by nation and year. One
    shuffled fact-fact join (lineitem x partsupp on the composite key);
    part/supplier/nation broadcast; per-term decimal staging keeps the
    profit sum bit-stable."""
    li = _t(spark, sf_dir, "lineitem")
    ps = _t(spark, sf_dir, "partsupp")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    ) - (F.col("ps_supplycost") * F.col("l_quantity")).cast("decimal(18,4)")
    return (
        li.join(ps, (li["l_partkey"] == ps["ps_partkey"]) & (li["l_suppkey"] == ps["ps_suppkey"]))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@_partsupp_query(
    "q11_important_stock",
    """
    WITH nat AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_nationkey % 5 = 3
    ), val AS (
      SELECT ps_partkey,
             SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS sv
      FROM partsupp JOIN nat ON ps_suppkey = s_suppkey
      GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(sv AS DOUBLE) AS stock_value FROM val
    WHERE sv * 1000 > (SELECT SUM(sv) FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: parts whose national stock value exceeds a
    fraction of the total. The scalar threshold is a second aggregation
    over the SAME grouped result (reused plan), broadcast back — one
    partsupp scan feeding both sides. The threshold comparison stays in
    exact decimal on both engines (sv * 1000 > SUM(sv), no double SUM,
    no 0.001 rounding), so membership is bit-identical to the oracle."""
    ps = _t(spark, sf_dir, "partsupp")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 5 == 3)
    nat = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select("s_suppkey")
    val = (
        ps.join(F.broadcast(nat), ps["ps_suppkey"] == nat["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum((F.col("ps_supplycost") * F.col("ps_availqty")).cast("decimal(18,4)"))
            .alias("sv")
        )
    )
    thr = val.agg(F.sum("sv").alias("__thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("sv") * F.lit(1000) > F.col("__thr"))
        .select("ps_partkey", F.col("sv").cast("double").alias("stock_value"))
    )


@_partsupp_query(
    "q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 15, 19, 23, 36, 45, 9)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: distinct supplier count per part attribute
    bucket with brand/type/size exclusions (trimmed schema: no
    complaint-supplier anti-join — supplier has no comment column)."""
    ps = _t(spark, sf_dir, "partsupp")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 19, 23, 36, 45, 9)
    )
    return (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@_partsupp_query(
    "q20_excess_inventory",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN partsupp ON s_suppkey = ps_suppkey
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'blue%'
    JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE CAST(ps_availqty AS DOUBLE) > 0.5 * qty
    """,
)
def q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern: suppliers holding more than half a year's
    shipped quantity of a part family. The shipped CTE is a partial
    aggregation of lineitem keyed like partsupp — the one shuffle; part
    prefix filter broadcasts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("qty")
    )
    ps = _t(spark, sf_dir, "partsupp")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(ps, s["s_suppkey"] == ps["ps_suppkey"])
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(
            shipped,
            (shipped["l_partkey"] == ps["ps_partkey"])
            & (shipped["l_suppkey"] == ps["ps_suppkey"]),
        )
        .filter(F.col("ps_availqty").cast("double") > F.lit(0.5) * F.col("qty"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


def register_partsupp_queries(force: bool = False) -> bool:
    """Add the partsupp patterns to the live catalog when a partsupp
    table exists in any default testdata tier (or unconditionally with
    ``force=True``, for fixture-backed tests). Returns True if
    registered. Idempotent; entries append AFTER the driver window."""
    import os

    if not force and not any(
        os.path.exists(f"/root/testdata/sf{s}/partsupp.parquet")
        for s in ("0.001", "0.01", "0.1")
    ):
        return False
    QUERIES.update(PARTSUPP_QUERIES)
    ORACLES.update(PARTSUPP_ORACLES)
    return True


register_partsupp_queries()


