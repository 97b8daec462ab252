"""Core algebra + relational surface + scalar function library (SURVEY 2.1/2.2/2.7).

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
    _dec,
    _t,
    _tw,
    query,
)

# ---------------------------------------------------------------------------
# Group-by aggregation (SURVEY §2.7 relational surface; benchmark headline)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → groupBy → 8 aggregates.

    Scale notes: predicate pushed to the Parquet scan; partial (map-side)
    aggregation on (returnflag, linestatus) — 6 groups — means the shuffle
    moves only nGroups×nPartitions rows regardless of input size.
    """
    li = _t(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (_dec("l_quantity"), _dec("l_extendedprice"),
                             _dec("l_discount"), _dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Structural algebra (SURVEY §2.1) — exercised through ColumnarTable
# ---------------------------------------------------------------------------

@query(
    "select_project_map",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 2 AS double_qty
    FROM lineitem
    """,
)
def select_project_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """selectColumns + appendMap (ColumnarVirtualTable.java:178,478):
    project a column subset and append derived per-row expressions.
    Narrow (no shuffle); ReadSchema prunes to 5 of 11 columns."""
    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    t = (
        t.keep_only_columns("l_orderkey", "l_linenumber", "l_extendedprice",
                            "l_discount", "l_quantity")
        .append_map({
            "net_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "double_qty": F.col("l_quantity") * 2,
        })
        .drop_columns("l_extendedprice", "l_discount", "l_quantity")
    )
    return t.df


@query(
    "filter_rows",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag <> 'A'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filterRows (ColumnarVirtualTable.java:240-257) with a compound
    predicate expressed as native Catalyst expressions → pushed to the
    Parquet scan (PushedFilters), no Python in the loop."""
    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    t = t.filter_rows(
        (F.col("l_quantity") > 30)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    ).keep_only_columns("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    return t.df.drop(ROW_KEY)


@query(
    "slice_rows",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def slice_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slice [100,150) (ColumnarVirtualTable.java:211-214) over an explicit
    total order (unique key) — the reference's row-range pushdown keys on
    recorded batch boundaries; here limit/offset push into the sort."""
    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "orders"), key_columns=["o_orderkey"])
    t = t.keep_only_columns("o_orderkey", "o_custkey", "o_totalprice").slice(
        100, 150, order_by=[F.col("o_orderkey")]
    )
    return t.df.drop(ROW_KEY)


@query(
    "multi_slice",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
      FROM orders
    )
    SELECT 0 AS slice_id, o_orderkey, CAST(o_custkey AS VARCHAR) AS val
    FROM o WHERE rn >= 0 AND rn < 40
    UNION ALL
    SELECT 1 AS slice_id, o_orderkey, o_orderpriority AS val
    FROM o WHERE rn >= 40 AND rn < 90
    """,
)
def multi_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableBackend multi-slice (ColumnarTableBackend.java:285-335): N
    (column-subset, row-range) slices from one call over one shared
    scan; here two disjoint slices re-assembled with a slice id."""
    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "orders"), key_columns=["o_orderkey"])
    s0, s1 = t.multi_slice(
        [
            (["o_orderkey", "o_custkey"], (0, 40)),
            (["o_orderkey", "o_orderpriority"], (40, 90)),
        ],
        order_by=[F.col("o_orderkey")],
    )
    a = s0.df.select(
        F.lit(0).alias("slice_id"), "o_orderkey",
        F.col("o_custkey").cast("string").alias("val"),
    )
    b = s1.df.select(
        F.lit(1).alias("slice_id"), "o_orderkey",
        F.col("o_orderpriority").alias("val"),
    )
    return a.unionByName(b)


@query(
    "concatenate_union",
    """
    SELECT CAST(p_partkey AS VARCHAR) AS _row_key,
           CAST(p_size AS DOUBLE) AS x, p_brand, CAST(NULL AS VARCHAR) AS ptype
    FROM part WHERE p_size < 25
    UNION ALL
    SELECT CAST(p_partkey AS VARCHAR) AS _row_key,
           p_retailprice AS x, CAST(NULL AS VARCHAR) AS p_brand, p_type AS ptype
    FROM part WHERE p_size >= 25
    """,
)
def concatenate_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concatenate: union-by-name + int→double upcast + missing-column
    null-fill + duplicate-RowID check (ColumnarConcatenater.java:157-470).
    The check is plan-embedded (window count + assert_true) so the union
    executes once; the one shuffle it adds leaves the output key-
    partitioned."""
    part = _t(spark, sf_dir, "part")
    a = ColumnarTable.from_dataframe(
        part.filter("p_size < 25").select("p_partkey", F.col("p_size").alias("x"), "p_brand"),
        key_columns=["p_partkey"],
    ).drop_columns("p_partkey")
    b = ColumnarTable.from_dataframe(
        part.filter("p_size >= 25").select(
            "p_partkey", F.col("p_retailprice").alias("x"), F.col("p_type").alias("ptype")
        ),
        key_columns=["p_partkey"],
    ).drop_columns("p_partkey")
    return a.concatenate([b], row_id_policy=RowIdPolicy.FAIL_ON_DUPLICATES).df


@query(
    "append_hstack",
    """
    SELECT CAST(l.o_orderkey AS VARCHAR) AS _row_key,
           l.o_custkey, l.o_orderstatus, r.o_totalprice, r.o_orderpriority
    FROM orders l JOIN orders r ON l.o_orderkey = r.o_orderkey
    """,
)
def append_hstack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """append (hstack) of two equal-length tables, RowID-aligned via
    equi-join with key-match validation (TableTransformUtils.java:83-163).
    Both sides pre-partitioned on the key ⇒ AQE plans a single shuffle;
    bucketed storage would make it shuffle-free."""
    orders = _t(spark, sf_dir, "orders")
    left = ColumnarTable.from_dataframe(
        orders.select("o_orderkey", "o_custkey", "o_orderstatus"), key_columns=["o_orderkey"]
    ).drop_columns("o_orderkey")
    right = ColumnarTable.from_dataframe(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"), key_columns=["o_orderkey"]
    ).drop_columns("o_orderkey")
    return left.append([right], validate=True).df


@query(
    "row_index",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS _row_key, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 + 10 AS _row_index
    FROM orders
    """,
)
def row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """appendRowIndex with offset (ColumnarVirtualTable.java:432-436;
    offset persisted per TableTransformNodeSettingsPersistor.java:408-411).
    Contiguity requires a total order ⇒ single-partition window; documented
    as the opt-in path, zip_with_index() is the O(scan) alternative."""
    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "orders"), key_columns=["o_orderkey"])
    t = t.keep_only_columns("o_orderkey", "o_totalprice").append_row_index(
        "_row_index", offset=10, order_by=[F.col("o_orderkey")]
    )
    return t.df


@query(
    "cast_spec",
    """
    SELECT CAST(l_linenumber AS BIGINT) AS ln_long,
           CAST(l_orderkey AS VARCHAR) AS ok_str,
           CAST(l_partkey AS DOUBLE) AS pk_double,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def cast_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replaceSpec cast matrix (TableCasterFactory.java:97-118): value-level
    upcasts int→long, int→double, long→string, timestamp→date — all inside
    whole-stage codegen."""
    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    t = (
        t.keep_only_columns("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate")
        .map({
            "ln_long": F.col("l_linenumber").cast("long"),
            "ok_str": F.col("l_orderkey").cast("string"),
            "pk_double": F.col("l_partkey").cast("double"),
            "ship_date": F.col("l_shipdate").cast("date"),
        })
    )
    return t.df.drop(ROW_KEY)


@query(
    "missing_value_columns",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS _row_key, n_name,
           CAST(NULL AS BIGINT) AS pending_count,
           CAST(NULL AS VARCHAR) AS note
    FROM nation
    """,
)
def missing_value_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """appendMissingValueColumns (ColumnarVirtualTable.java:266-270)."""
    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "nation"), key_columns=["n_nationkey"])
    t = t.keep_only_columns("n_name").append_missing_value_columns(
        {"pending_count": "bigint", "note": "string"}
    )
    return t.df


# ---------------------------------------------------------------------------
# Relational surface (SURVEY §2.7)
# ---------------------------------------------------------------------------

@query(
    "join_customer_orders",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation. customer is the small side →
    broadcast hint keeps the big fact table un-shuffled; at 100 TB the
    dimension still fits the 64 MiB broadcast budget."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@query(
    "sort_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort, O(k) driver memory."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates → partial-aggregate + exchange on the distinct key
    (map-side combine shrinks the shuffle to the distinct-value count)."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_linenumber"
    ).dropDuplicates()


@query(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window; Spark pushes the
    rn<=3 filter into the window sort (WindowGroupLimit) so each group
    keeps a 3-row heap instead of sorting everything."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.7) — via operators.relational wrappers
# ---------------------------------------------------------------------------

@query(
    "join_semi",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS _row_key, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with a finished order. Spark
    plans a broadcast/shuffled semi-join — right side reduced to keys."""
    from knime_core_columnar_spark.operators.relational import join

    c = ColumnarTable.from_dataframe(_t(spark, sf_dir, "customer"), key_columns=["c_custkey"])
    o = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "orders").filter("o_orderstatus = 'F'"),
        key_columns=["o_orderkey"],
    )
    res = join(c, o, on=F.col("l.c_custkey") == F.col("r.o_custkey"), how="left_semi")
    return res.df.select(ROW_KEY, "c_custkey", "c_name", "c_mktsegment")


@query(
    "join_anti",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS _row_key, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    from knime_core_columnar_spark.operators.relational import join

    c = ColumnarTable.from_dataframe(_t(spark, sf_dir, "customer"), key_columns=["c_custkey"])
    o = ColumnarTable.from_dataframe(_t(spark, sf_dir, "orders"), key_columns=["o_orderkey"])
    res = join(c, o, on=F.col("l.c_custkey") == F.col("r.o_custkey"), how="left_anti")
    return res.df.select(ROW_KEY, "c_custkey", "c_name")


@query(
    "join_left_outer",
    """
    SELECT n.n_name, COUNT(c.c_custkey) AS n_customers,
           CAST(SUM(CAST(COALESCE(c.c_acctbal, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving unmatched dimension rows (COUNT over a
    nullable column counts only matches)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(F.coalesce(F.col("c_acctbal"), F.lit(0)).cast("decimal(18,2)"))
            .cast("double").alias("total_bal"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c, orders o, lineitem l
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join, filtered both sides, agg, top-10.
    customer (small) broadcasts; lineitem⋈orders shuffles on orderkey;
    final top-k is TakeOrderedAndProject (no global sort)."""
    c = _t(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. region/nation/supplier/customer all broadcast
    (dimension-sized at any SF); only lineitem⋈orders shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube, set ops, windows
# ---------------------------------------------------------------------------

@query(
    "rollup_returns",
    """
    SELECT COALESCE(l_returnflag,'?') || '_' || COALESCE(l_linestatus,'?') AS _row_key,
           l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal + grand-total rows, via the aggregate wrapper
    (RowID derived from group keys, '?' for rolled-up levels)."""
    from knime_core_columnar_spark.operators.relational import aggregate

    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    res = aggregate(
        t,
        ["l_returnflag", "l_linestatus"],
        {
            "n": F.count(F.lit(1)),
            "sum_qty": F.sum(_dec("l_quantity")).cast("double"),
        },
        grouping="rollup",
    )
    return res.df


@query(
    "cube_orders",
    """
    SELECT COALESCE(o_orderstatus,'?') || '_' || COALESCE(o_orderpriority,'?') AS _row_key,
           o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions via the aggregate wrapper."""
    from knime_core_columnar_spark.operators.relational import aggregate

    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "orders"), key_columns=["o_orderkey"])
    res = aggregate(
        t, ["o_orderstatus", "o_orderpriority"], {"n": F.count(F.lit(1))}, grouping="cube"
    )
    return res.df


@query(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through Spark SQL."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM __li_gs "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@query(
    "set_intersect",
    """
    SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS _row_key, o_custkey
    FROM orders WHERE year(o_orderdate) = 1996
      AND o_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT via the set-op wrapper (RowID re-derived from left)."""
    from knime_core_columnar_spark.operators.relational import intersect

    o = _t(spark, sf_dir, "orders")
    a = ColumnarTable.from_dataframe(
        o.filter(F.year("o_orderdate") == 1996).select("o_custkey"), key_columns=["o_custkey"]
    )
    b = ColumnarTable.from_dataframe(
        o.filter(F.year("o_orderdate") == 1997).select("o_custkey"), key_columns=["o_custkey"]
    )
    return intersect(a, b).df


@query(
    "set_except",
    """
    SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS _row_key, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT via the set-op wrapper: customers who ordered but never had
    a finished order."""
    from knime_core_columnar_spark.operators.relational import except_

    o = _t(spark, sf_dir, "orders")
    a = ColumnarTable.from_dataframe(o.select("o_custkey"), key_columns=["o_custkey"])
    b = ColumnarTable.from_dataframe(
        o.filter("o_orderstatus = 'F'").select("o_custkey"), key_columns=["o_custkey"]
    )
    return except_(a, b).df


@query(
    "union_distinct",
    """
    SELECT l_orderkey AS okey FROM lineitem WHERE l_linenumber = 1
    UNION
    SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct (union + dropDuplicates — one shuffle on the
    full row, partial-agg combined)."""
    a = _t(spark, sf_dir, "lineitem").filter("l_linenumber = 1").select(
        F.col("l_orderkey").alias("okey")
    )
    b = _t(spark, sf_dir, "orders").filter("o_orderstatus = 'F'").select(
        F.col("o_orderkey").alias("okey")
    )
    return a.union(b).distinct()


@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_rev
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per key (decimal-exact then double). One shuffle on
    the partition key; rows stream through the frame in sorted order."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_rev"),
    )


@query(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbors within each customer's order history."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "window_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (exact decimal sum / window count)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(_dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("avg3"),
    )


@query(
    "count_distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expand + two-phase agg in Spark;
    approx_count_distinct is the one-pass alternative when ±2% is fine)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "percentile_stats",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) + min/max — the
    reference's bounded-domain stats generalized."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "collect_sorted",
    """
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set sorted into a deterministic array, serialized to a CSV
    string (the harness canonicalizer sorts result rows with pandas, which
    cannot hash list cells — string form keeps the value check exact)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function library (SURVEY §2.7 "String Manipulation"-node surface)
# ---------------------------------------------------------------------------

@query(
    "string_funcs",
    """
    SELECT CAST(p_partkey AS VARCHAR) AS _row_key,
           upper(p_name) AS up, lower(p_brand) AS lo,
           substring(p_type, 1, 5) AS sub,
           CAST(strpos(p_type, ' ') AS INTEGER) AS pos,
           replace(p_name, 'a', '_') AS rep,
           lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
           reverse(p_name) AS rev,
           concat_ws('|', p_brand, p_type) AS cw,
           regexp_extract(p_type, '[a-z]+') AS re1,
           array_to_string(string_split(p_type, ' '), ',') AS parts,
           CAST(length(p_name) AS INTEGER) AS len,
           trim(p_name) AS tr
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-manipulation surface (the benchmark workflow's String
    Manipulation node) — all JVM-side Catalyst expressions."""
    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "part"), key_columns=["p_partkey"])
    return t.map({
        "up": F.upper("p_name"),
        "lo": F.lower("p_brand"),
        "sub": F.substring("p_type", 1, 5),
        "pos": F.instr("p_type", " "),
        "rep": F.replace(F.col("p_name"), F.lit("a"), F.lit("_")),
        "lp": F.lpad("p_brand", 12, "*"),
        "rp": F.rpad("p_brand", 12, "*"),
        "rev": F.reverse("p_name"),
        "cw": F.concat_ws("|", "p_brand", "p_type"),
        "re1": F.regexp_extract("p_type", "[a-z]+", 0),
        "parts": F.array_join(F.split("p_type", " "), ","),
        "len": F.length("p_name"),
        "tr": F.trim("p_name"),
    }).df


@query(
    "date_funcs",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           CAST(year(l_shipdate) AS INTEGER) AS y,
           CAST(month(l_shipdate) AS INTEGER) AS m,
           CAST(day(l_shipdate) AS INTEGER) AS d,
           CAST(quarter(l_shipdate) AS INTEGER) AS q,
           CAST(dayofyear(l_shipdate) AS INTEGER) AS doy,
           date_trunc('month', l_shipdate) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', l_shipdate) AS INTEGER) AS days_since,
           CAST(l_shipdate AS DATE) + 5 AS plus5,
           last_day(CAST(l_shipdate AS DATE)) AS eom
    FROM lineitem
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function surface — the reference stores temporals as
    logical types over physical structs (SURVEY §1.2); Spark natives
    replace that encoding entirely."""
    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    return t.map({
        "y": F.year("l_shipdate"),
        "m": F.month("l_shipdate"),
        "d": F.dayofmonth("l_shipdate"),
        "q": F.quarter("l_shipdate"),
        "doy": F.dayofyear("l_shipdate"),
        "month_start": F.date_trunc("month", F.col("l_shipdate")).cast("date"),
        "days_since": F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")),
        "plus5": F.date_add(F.col("l_shipdate").cast("date"), 5),
        "eom": F.last_day(F.col("l_shipdate").cast("date")),
    }).df


@query(
    "math_funcs",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           abs(l_discount - 0.05) AS a,
           CAST(ceil(l_extendedprice) AS BIGINT) AS c,
           CAST(floor(l_extendedprice) AS BIGINT) AS f,
           sqrt(l_quantity) AS sq,
           l_quantity * l_quantity AS sq2,
           l_orderkey % 7 AS md,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
           greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS l
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface (IEEE-deterministic subset: sqrt is correctly rounded;
    transcendentals like ln/exp are libm-dependent and stay out of the
    oracle set — see functions module for the full library)."""
    t = ColumnarTable.from_dataframe(
        _t(spark, sf_dir, "lineitem"), key_columns=["l_orderkey", "l_linenumber"]
    )
    return t.map({
        "a": F.abs(F.col("l_discount") - 0.05),
        "c": F.ceil("l_extendedprice").cast("long"),
        "f": F.floor("l_extendedprice").cast("long"),
        "sq": F.sqrt("l_quantity"),
        "sq2": F.col("l_quantity") * F.col("l_quantity"),
        "md": F.col("l_orderkey") % 7,
        "sg": F.signum(F.col("l_quantity") - 25).cast("double"),
        "g": F.greatest("l_tax", "l_discount"),
        "l": F.least("l_tax", "l_discount"),
    }).df


@query(
    "case_when_buckets",
    """
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem GROUP BY 1
    """,
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN conditional logic + aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total"),
    )


@query(
    "json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (events.props)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation — the batch twin of the Structured
    Streaming windowed aggregation in streaming/ (same logic, readStream
    + watermark at runtime)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hr"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@query(
    "domain_stats",
    """
    SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS vals_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS vals_linestatus
    FROM lineitem
    """,
)
def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-domain computation as ONE aggregation pass — the
    write-pipeline DomainWritable (ColumnarBoundedDomainCalculator.java:99,
    ColumnarNominalDomainCalculator.java:92; see operators.domain for the
    metadata-attaching API with the 60-value nominal cap)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("vals_returnflag"),
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("vals_linestatus"),
    )


@query(
    "concat_uniquify",
    """
    WITH u AS (
      SELECT CAST(p_partkey AS VARCHAR) AS k, 0 AS src, p_name FROM part WHERE p_partkey <= 100
      UNION ALL
      SELECT CAST(p_partkey AS VARCHAR) AS k, 1 AS src, p_name FROM part WHERE p_partkey <= 100
    ), n AS (
      SELECT k, p_name, ROW_NUMBER() OVER (PARTITION BY k ORDER BY src) - 1 AS occ FROM u
    )
    SELECT k || repeat('_dup', occ) AS _row_key,
           p_name
    FROM n
    """,
)
def concat_uniquify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concatenate with UNIQUIFY_WITH_SUFFIX RowID policy
    (ColumnarConcatenater.java:252-292): colliding keys from later tables
    get the '_dup' suffix appended repeatedly until unique
    (k, k_dup, k_dup_dup), exactly like the reference."""
    p = _t(spark, sf_dir, "part").filter("p_partkey <= 100").select("p_partkey", "p_name")
    a = ColumnarTable.from_dataframe(p, key_columns=["p_partkey"]).drop_columns("p_partkey")
    b = ColumnarTable.from_dataframe(p, key_columns=["p_partkey"]).drop_columns("p_partkey")
    return a.concatenate([b], row_id_policy=RowIdPolicy.UNIQUIFY_WITH_SUFFIX).df


@query(
    "concat_regenerate",
    """
    WITH u AS (
      SELECT CAST(p_partkey AS VARCHAR) AS k, 0 AS src, p_brand FROM part WHERE p_partkey <= 100
      UNION ALL
      SELECT CAST(p_partkey AS VARCHAR) AS k, 1 AS src, p_brand FROM part WHERE p_partkey <= 100
    )
    SELECT 'Row' || CAST(ROW_NUMBER() OVER (ORDER BY src, k) - 1 AS VARCHAR) AS _row_key,
           p_brand
    FROM u
    """,
)
def concat_regenerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concatenate with REGENERATE RowID policy — Row0..RowN-1 in
    (table, key) order (ColumnarConcatenater.java:186-215)."""
    p = _t(spark, sf_dir, "part").filter("p_partkey <= 100").select("p_partkey", "p_brand")
    a = ColumnarTable.from_dataframe(p, key_columns=["p_partkey"]).drop_columns("p_partkey")
    b = ColumnarTable.from_dataframe(p, key_columns=["p_partkey"]).drop_columns("p_partkey")
    return a.concatenate([b], row_id_policy=RowIdPolicy.REGENERATE).df


