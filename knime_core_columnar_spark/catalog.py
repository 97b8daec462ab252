"""Query catalog: every implemented operator exposed as a (spark, sf_dir) →
DataFrame callable plus a DuckDB-equivalent ANSI-SQL oracle.

This is the correctness surface for SURVEY.md §2 — the driver executes each
``QUERIES[name]`` and the matching ``ORACLES[name]`` side by side and
compares row count + schema + order-insensitive value hash.

Determinism rules (doubles are NOT bit-stable under reordered reduction):
- exact sums: cast to decimal before SUM, cast the exact result to double;
- averages: exact-decimal sum cast to double, then IEEE double division;
- per-row double arithmetic is deterministic and fine;
- no double→int casts (Spark truncates, DuckDB rounds), no double→string;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


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
    null-fill + duplicate-RowID pre-check (ColumnarConcatenater.java:157-470).
    Shuffle-free union; the dup pre-check is one distributed aggregate."""
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


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: the pricing-summary aggregation."""
    return q1_pricing_summary(spark, sf_dir)
