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

from pyspark.sql import DataFrame, SparkSession, Window
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


_PKG_SHIPPED: set[int] = set()


def _ensure_pkg_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor python workers via addPyFile.

    Queries that use pandas UDFs / mapInPandas reference module-level
    kernels; cloudpickle serializes those BY REFERENCE when the module is
    importable on the driver, so executors must be able to import the
    package too. When the harness runs from a foreign cwd (driver-style
    file-path import), workers would otherwise fail with
    ModuleNotFoundError. A zip of the package added per-SparkContext
    fixes this everywhere (local and cluster mode alike)."""
    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "knime_core_columnar_spark_pkg.zip")
    tmp = zpath + f".{os.getpid()}.part"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_pkg_on_executors(spark)
    # Runtime-settable confs forced here instead of relying on session
    # defaults — the harness builds its own SparkSession without our
    # session.py. UTC makes every ntz<->instant cast (unix_micros etc.)
    # timezone-independent, matching the timezone-free DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which vanilla Spark 4
        # refuses (PARQUET_TYPE_ILLEGAL).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as long via nanosAsLong — restore
        # timestamp_ntz at micro precision (what DuckDB reads natively).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def _parquet_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count from the Parquet footer — a driver-side metadata
    read (no Spark job, no data scan). Used to feed operators whose tier
    or seed selection needs the corpus size (kmeans_lite,
    embedding_near_dup_pairs) so they never spend a counting scan.
    Returns None for non-local paths so callers fall back to count()."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            import pyarrow.dataset as ds

            return sum(
                f.metadata.num_rows
                for f in ds.dataset(path, format="parquet").get_fragments()
            )
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _artifact_tag(sf_dir: str, *tables: str) -> str:
    """Cache tag for derived /tmp artifacts (bucketed tables, CSV
    exports, partitioned copies): hashes the source PATH and the source
    files' MTIMES, so regenerated testdata at the same path gets a fresh
    artifact instead of silently reusing a stale copy."""
    import hashlib
    import os

    parts = [sf_dir]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        try:
            parts.append(f"{t}:{os.path.getmtime(p)}")
        except OSError:
            parts.append(f"{t}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _publish_dir(tmp: str, final: str) -> None:
    """Atomically publish a staged artifact directory; if a concurrent
    session won the rename race, keep theirs (same content by tag)."""
    import os
    import shutil

    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.isdir(final):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise


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


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: text analysis, dedup, similarity, multimodal
# (north-star extensions; SURVEY.md Phase 6)
# ---------------------------------------------------------------------------

@query(
    "text_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_c,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation ratio + content fingerprint — all
    JVM-side expressions (operators.text), zero Python in the scan."""
    from knime_core_columnar_spark.operators import text as X

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_c"),
        X.token_count("text").cast("long").alias("n_tokens"),
        X.punct_ratio("text").alias("punct_ratio"),
        X.fingerprint("text").alias("fingerprint"),
    )


@query(
    "text_quality_lang",
    """
    WITH t0 AS (
      SELECT doc_id, lang, CAST(length(text) AS DOUBLE) AS n,
             string_split_regex(trim(text), '\\s+') AS t,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
               / length(text) AS pr
      FROM documents
    ), v AS (
      SELECT doc_id, lang, n, pr, len(t) AS ntok,
             len(list_filter(t, x -> list_contains(['the','and','of','to','is'], lower(x)))) AS v_en,
             len(list_filter(t, x -> list_contains(['der','die','und','nicht','ist'], lower(x)))) AS v_de,
             len(list_filter(t, x -> list_contains(['le','la','et','les','est'], lower(x)))) AS v_fr,
             len(list_filter(t, x -> list_contains(['el','los','que','y','es'], lower(x)))) AS v_es
      FROM t0
    )
    SELECT doc_id, lang,
           CAST(v_en AS DOUBLE) / ntok AS stopword_ratio,
           (CASE WHEN n < 20 THEN n / 20.0 WHEN n > 4000 THEN 0.5 ELSE 1.0 END) * 0.4
             + (1.0 - least(pr * 5.0, 1.0)) * 0.3
             + (CASE WHEN n / ntok >= 3.0 AND n / ntok <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality,
           CASE WHEN greatest(v_en, v_de, v_fr, v_es) = 0 THEN 'und'
                WHEN v_en = greatest(v_en, v_de, v_fr, v_es) THEN 'en'
                WHEN v_de = greatest(v_en, v_de, v_fr, v_es) THEN 'de'
                WHEN v_fr = greatest(v_en, v_de, v_fr, v_es) THEN 'fr'
                WHEN v_es = greatest(v_en, v_de, v_fr, v_es) THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM v
    """,
)
def text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + stopword ratio + stopword-voting language ID."""
    from knime_core_columnar_spark.operators import text as X

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang",
        X.stopword_ratio("text").alias("stopword_ratio"),
        X.quality_score("text").alias("quality"),
        X.lang_id("text").alias("lang_pred"),
    )


@query(
    "dedup_exact",
    """
    SELECT doc_id, fp FROM (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                                ORDER BY CAST(doc_id AS VARCHAR)) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: min-RowID survivor per normalized-text md5.
    Shuffles 16-byte hashes, not documents."""
    from knime_core_columnar_spark.operators.dedup import exact_dedup
    from knime_core_columnar_spark.operators.text import fingerprint

    d = ColumnarTable.from_dataframe(_t(spark, sf_dir, "documents"), key_columns=["doc_id"])
    survivors = exact_dedup(d, "text")
    return survivors.df.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "dedup_minhash_lsh",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
    FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(4 bands × 4 rows) candidate pairs.
    Signature pass is narrow (array exprs, no explode of shingles); only
    4 band keys per doc are exploded and shuffled."""
    from knime_core_columnar_spark.operators.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)


@query(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), hs AS (
      SELECT doc_id,
             list_transform(t, tok -> ('0x' || substring(md5(tok), 1, 15))::BIGINT) AS h
      FROM toks
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 32), j ->
             CASE WHEN list_sum(list_transform(h, x ->
                    CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                  THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash32
    FROM hs
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (near-dup docs differ in few bits;
    simhash_near_pairs banding joins on pigeonholed chunks)."""
    from knime_core_columnar_spark.operators.dedup import simhash_table

    d = _t(spark, sf_dir, "documents")
    return simhash_table(d, "doc_id", "text", 32).withColumnRenamed("simhash", "simhash32")


@query(
    "ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), ex AS (
      SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa + sb - i) AS jaccard
    FROM inter WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= 0.5
    """,
)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs ≥ 0.5 via inverted-index join (only
    docs sharing a shingle ever meet; at 100 TB feed LSH candidates in
    instead — ngram_jaccard_pairs(candidates=...))."""
    from knime_core_columnar_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5)


@query(
    "neardup_pipeline",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
    FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
              JOIN sh sb ON sb.doc_id = cand.id_b
    WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
            / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    """,
)
def neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline: MinHash-LSH candidate generation
    → exact Jaccard verification on candidates only. Cost scales with
    collision count, not n² — the 100 TB path (the exact-tier
    ngram_jaccard query is the ground-truth baseline; on low-diversity
    corpora its inverted-index join blows up quadratically)."""
    from knime_core_columnar_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    return ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5,
                               candidates=cand)


@query(
    "neardup_clusters",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
                JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    )
    SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: verified near-dup pairs grouped into
    clusters by connected components (iterative min-label propagation,
    operators.dedup.connected_components), every document mapped to its
    canonical representative (min doc_id of its component; singletons map
    to themselves). The oracle computes the same closure with a DuckDB
    recursive CTE — a genuinely different evaluation strategy validating
    the iterative Spark loop."""
    from knime_core_columnar_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    return d.select("doc_id").join(
        comp, d["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id", F.coalesce(F.col("label"), F.col("doc_id")).alias("component")
    )


@query(
    "embedding_neardup",
    """
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
      FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
    ) WHERE cos >= 0.4
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact tier pinned as the
    ground-truth baseline (use_lsh=False opt-in; the operator default
    auto-switches to the bucketed LSH tier past 100k corpus rows —
    see embedding_neardup_lsh for the oracle-checked scale path)."""
    from knime_core_columnar_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        e, threshold=0.4, use_lsh=False,
        corpus_count=_parquet_rows(sf_dir, "embeddings"),
    )


@query(
    "ann_topk",
    """
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
      )
    ) WHERE rank <= 5
    """,
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exact baseline
    the LSH/IVF tiers are recall-tested against."""
    from knime_core_columnar_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter("vec_id < 10"), k=5)


def _duck_rp_bucket(vec_expr: str, dim: int, planes: int) -> str:
    """DuckDB SQL for the random-hyperplane LSH bucket id, with the
    md5-seeded hyperplane weights embedded as literals — list_dot_product
    accumulates element-sequentially, the same floating-point order as
    the Spark kernel, so the sign bits (and hence buckets) are
    bit-identical."""
    from knime_core_columnar_spark.operators.similarity import _hyperplane

    parts = []
    for p in range(planes):
        arr = "[" + ", ".join(repr(x) for x in _hyperplane(p, dim)) + "]::DOUBLE[]"
        parts.append(
            f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {arr}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ")"


@query(
    "ann_topk_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_duck_rp_bucket('embedding', 64, 4)} AS bucket,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                   / (q.nrm * c.nrm), 6) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                              / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ) WHERE rank <= 5
    """,
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k. Approximate vs brute force, but
    fully deterministic (md5-seeded hyperplanes), so the oracle embeds
    the same hyperplane constants as SQL literals and the driver checks
    it value-exactly like any other query."""
    from knime_core_columnar_spark.operators.similarity import rp_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    return rp_lsh_topk(e, e.filter("vec_id < 10"), dim=64, k=5, planes=4)


@query(
    "ann_topk_ivf",
    """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    s AS (
      SELECT vec_id, embedding,
             ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|ivf-centroids'), 1, 15))::BIGINT
               % 10000 AS h
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cent
      FROM s, nn
      WHERE h <= least(10000, CAST(floor(640000.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT 16
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, cv, cell_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS cv, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], c.cent)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.cent, c.cent))) DESC, c.cell_id) AS rk
        FROM embeddings e, cents c
      ) WHERE rk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, qv, cell_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS qv, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], c.cent)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.cent, c.cent))) DESC, c.cell_id) AS rk
        FROM embeddings e, cents c
        WHERE e.vec_id < 10
      ) WHERE rk <= 4
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT p.query_id, a.neighbor_id,
             round(list_dot_product(p.qv, a.cv)
                   / (sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(a.cv, a.cv))), 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
               round(list_dot_product(p.qv, a.cv)
                     / (sqrt(list_dot_product(p.qv, p.qv))
                        * sqrt(list_dot_product(a.cv, a.cv))), 6) DESC,
               a.neighbor_id) AS rank
      FROM probes p JOIN assigned a USING (cell_id)
      WHERE a.neighbor_id <> p.query_id
    ) WHERE rank <= 5
    """,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-tier approximate top-k (operators.similarity.ivf_topk):
    deterministic hash-sampled centroids, nearest-cell assignment, and
    4-cell probing are all exact integer/sequential-double arithmetic,
    so the entire inverted-file pipeline — centroid pick, cell
    membership, probe set, final ranking — is value-checked against the
    SQL replay (previously this tier was pytest-only)."""
    from knime_core_columnar_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter("vec_id < 10"), k=5, ncells=16, nprobe=4)


@query(
    "embedding_neardup_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_duck_rp_bucket('embedding', 64, 6)} AS bucket,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT id_a, id_b, cos FROM (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             round(list_dot_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[])
                   / (a.nrm * c.nrm), 6) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ) WHERE cos >= 0.4
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-LSH near-dup tier — the 100 TB default path of
    embedding_near_dup_pairs, oracle-checked via embedded hyperplane
    constants (only same-bucket candidate pairs are scored; no corpus
    broadcast, no driver collect)."""
    from knime_core_columnar_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.4, dim=64, use_lsh=True, planes=6)


@query(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) // 64) % 64 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing end-to-end: attach a binary column, take
    JVM-side payload stats, run the (stubbed) image decode through
    mapInPandas over Arrow batches, and join stats with decode output.
    The decode kernel is the single marked swap-in point for a real
    imaging library."""
    from knime_core_columnar_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_features,
        payload_stats,
    )

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    stats = d.select("doc_id", *[c.alias(n) for n, c in payload_stats(F.col("payload")).items()])
    feats = decode_image_features(d, "doc_id", "payload").select("doc_id", "width", "height")
    return stats.join(feats, "doc_id").select(
        "doc_id", "n_bytes", "content_sha256", "width", "height"
    )


@query(
    "video_frame_sample",
    """
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(off // 256 AS INTEGER) AS frame_idx,
           CAST(off AS BIGINT) AS byte_offset,
           md5(substring(hx, off * 2 + 1, 512)) AS frame_md5
    FROM (SELECT doc_id, hx, unnest(range(0, greatest(n, 1), 256)) AS off FROM p)
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stub: 1→N row expansion through mapInPandas (kernel
    raises under strict=True until ffmpeg-like decode is plugged in). The
    frame-offset math and hex-chunk md5 are deterministic, so the whole
    expansion is oracle-checked value-exactly."""
    from knime_core_columnar_spark.operators.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return sample_frames(d, "doc_id", "payload", every_n_bytes=256)


@query(
    "session_windows_batch",
    """
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), y AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM x
    )
    SELECT user_id, MIN(ts) AS sess_start, MAX(ts) + INTERVAL 5 MINUTE AS sess_end,
           COUNT(*) AS n_events
    FROM y GROUP BY user_id, sess_id
    """,
)
def session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) in batch mode — the same
    streaming.session_windows code path runs on readStream with a
    watermark; the oracle is the gaps-and-islands SQL formulation."""
    from knime_core_columnar_spark.streaming import session_windows

    ev = _t(spark, sf_dir, "events")
    return session_windows(ev, gap="5 minutes", watermark=None).select(
        "user_id",
        F.col("sess_start").cast("timestamp_ntz").alias("sess_start"),
        F.col("sess_end").cast("timestamp_ntz").alias("sess_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-adapted queries + approximate aggregates + registry
# ---------------------------------------------------------------------------

@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate reaches the
    Parquet scan; the aggregate is a single partial/final pair."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (adapted to available columns): returned-item revenue by
    customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    n = _t(spark, sf_dir, "nation")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    """
    SELECT CAST(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional aggregation over a
    broadcast join; the ratio is a single IEEE division of two
    decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    net = price * (F.lit(1) - disc)
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            ((F.lit(100.00) * F.sum(promo).cast("double"))
             / F.sum(net).cast("double")).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
      )
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders via a semi-join against a HAVING
    aggregate (the aggregate output is tiny → broadcast semi-join)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey AND (
        (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 21)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
     OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    )
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted): disjunctive multi-branch predicate over a
    broadcast join — exercises OR-predicate planning."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "approx_aggregates",
    """
    SELECT l_returnflag,
           TRUE AS parts_ok, TRUE AS supps_ok, TRUE AS median_ok,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL count-distinct, quantile sketch) —
    one-pass, fixed-memory, the 100 TB substitutes for exact distinct
    counting / percentiles. The sketches are approximate, so the checked
    result is the ERROR BOUND, not the estimate: each flag is the Spark
    side's own |approx − exact| / exact ≤ ε test (HLL default rsd 5% →
    ε=0.15 ≈ 3σ; quantile sketch accuracy 10000 → ε=0.01), which the
    oracle asserts TRUE — a wrong sketch implementation goes red."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.countDistinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_suppkey").alias("as_"),
        F.countDistinct("l_suppkey").alias("es"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("em"),
        F.count(F.lit(1)).alias("n"),
    )

    def within(approx, exact, eps):
        return (F.abs(approx.cast("double") - exact.cast("double"))
                / exact.cast("double") <= eps)

    return agg.select(
        "l_returnflag",
        within(F.col("ap"), F.col("ep"), 0.15).alias("parts_ok"),
        within(F.col("as_"), F.col("es"), 0.15).alias("supps_ok"),
        within(F.col("am"), F.col("em"), 0.01).alias("median_ok"),
        "n",
    )


@query(
    "registry_functions",
    """
    SELECT CAST(p_partkey AS VARCHAR) AS _row_key,
           upper(p_name) AS up,
           CAST(strpos(p_type, 'O') AS INTEGER) AS pos_o,
           least(greatest(p_size, 5), 40) AS clamped,
           COALESCE(NULLIF(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other,
           levenshtein(p_type, 'STANDARD') AS lev_std
    FROM part
    """,
)
def registry_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function registry in action (functions.library): named
    expression builders compose into a normal projection — zero overhead
    vs hand-written Catalyst expressions."""
    from knime_core_columnar_spark.functions import apply_function as fn

    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "part"), key_columns=["p_partkey"])
    return t.map({
        "up": fn("upper", "p_name"),
        "pos_o": fn("index_of", "p_type", "O"),
        "clamped": fn("clamp", "p_size", 5, 40),
        "brand_or_other": fn("if_missing", fn("null_if", "p_brand", "Brand#11"), "OTHER"),
        "lev_std": fn("levenshtein", "p_type", F.lit("STANDARD")),
    }).df


@query(
    "rearrange_cellfactory",
    """
    SELECT CAST(p_partkey AS VARCHAR) AS _row_key,
           p_brand,
           CAST(length(p_name) AS INTEGER) AS name_len,
           upper(p_type) AS type_upper,
           CAST(p_size * 2 AS INTEGER) AS size2
    FROM part
    """,
)
def rearrange_cellfactory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rearrange with a CellFactory-style multi-output pandas factory
    (ColumnarRearranger semantics): keep a subset, append three
    factory-produced columns computed per Arrow batch, convert one in
    place. The factory kernel here is SQL-expressible on purpose so the
    oracle can check the mapInPandas plumbing end-to-end."""
    import pandas as pd

    t = ColumnarTable.from_dataframe(_t(spark, sf_dir, "part"), key_columns=["p_partkey"])

    def factory(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "name_len": pdf["p_name"].str.len().astype("int32"),
            "type_upper": pdf["p_type"].str.upper(),
        })

    out = t.rearrange(
        keep=["p_brand", "name_len", "type_upper", "size2"],
        append_factory=factory,
        factory_output="name_len int, type_upper string",
        convert={"size2": (F.col("p_size") * 2).cast("int")},
    )
    return out.df


# ---------------------------------------------------------------------------
# Nested types (SURVEY §1.2 List/Struct physical types → Spark natives)
# ---------------------------------------------------------------------------

@query(
    "struct_roundtrip",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS _row_key,
           struct_pack(status := o_orderstatus, total := o_totalprice).status AS s_status,
           struct_pack(status := o_orderstatus, total := o_totalprice).total AS s_total,
           struct_pack(outer_ := struct_pack(k := o_orderkey), d := o_orderdate).outer_.k AS nested_k
    FROM orders
    """,
)
def struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct columns (the reference's StructData physical type,
    StructData.java:70/93): build nested structs, read fields back —
    Catalyst collapses construction+access to plain column refs (free)."""
    o = _t(spark, sf_dir, "orders")
    info = F.struct(F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("total"))
    nested = F.struct(F.struct(F.col("o_orderkey").alias("k")).alias("outer_"),
                      F.col("o_orderdate").alias("d"))
    return o.select(
        F.col("o_orderkey").cast("string").alias(ROW_KEY),
        info.getField("status").alias("s_status"),
        info.getField("total").alias("s_total"),
        nested.getField("outer_").getField("k").alias("nested_k"),
    )


@query(
    "map_ops",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           (MAP(['qty','price'], [l_quantity, l_extendedprice])['qty'])[1] AS m_qty,
           (MAP(['qty','price'], [l_quantity, l_extendedprice])['price'])[1] AS m_price,
           CAST(cardinality(MAP(['qty','price'], [l_quantity, l_extendedprice])) AS INTEGER) AS m_size
    FROM lineitem
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map columns (beyond the reference, which has no physical Map type
    — SURVEY §1.2 maps it to Spark's native MapType): build, look up,
    measure."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.col("l_extendedprice"))
    return li.select(
        F.concat_ws("_", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string")).alias(ROW_KEY),
        F.element_at(m, "qty").alias("m_qty"),
        F.element_at(m, "price").alias("m_price"),
        F.size(m).alias("m_size"),
    )


@query(
    "explode_words",
    """
    SELECT word, COUNT(*) AS n FROM (
      SELECT unnest(string_split(p_type, ' ')) AS word FROM part
    ) GROUP BY word
    """,
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (UDTF-style 1→N expansion — the reference has no
    UDTF surface, SURVEY §2.6; Spark's explode supplies it)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sliding_windows_batch",
    """
    WITH e AS (
      SELECT event_type,
             date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS b
      FROM events
    )
    SELECT b - k * (INTERVAL 30 MINUTE) AS win_start, event_type, COUNT(*) AS n
    FROM e, (SELECT unnest([0, 1]) AS k)
    GROUP BY 1, 2
    """,
)
def sliding_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h window / 30min slide — each event lands in 2
    overlapping windows) in batch mode; the same streaming.sliding_window_agg
    runs on readStream. Oracle replicates Spark's epoch-aligned window
    assignment arithmetically."""
    from knime_core_columnar_spark.streaming import sliding_window_agg

    ev = _t(spark, sf_dir, "events")
    out = sliding_window_agg(ev, window="1 hour", slide="30 minutes", watermark=None)
    return out.select(
        F.col("win_start").cast("timestamp_ntz").alias("win_start"), "event_type", "n"
    )


@query(
    "pivot_returns",
    """
    SELECT l_linestatus,
           COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A,
           COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide reshaping. Explicit value list keeps it one pass
    (pivot without values costs an extra distinct scan)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["A", "N", "R"])
    )


@query(
    "window_rank_stats",
    """
    SELECT o_custkey, o_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family (ntile/percent_rank/cume_dist/rank/
    dense_rank) over a deterministic total order per partition."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "string_agg_sorted",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — canonical (sorted) element order so
    the result is deterministic at any parallelism."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.count_distinct("o_custkey").alias("n_cust"),
        )
    )


@query(
    "window_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over explicit frames (last_value needs the
    unbounded-following frame — the default frame ends at current row)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@query(
    "moment_stats",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq_q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_p,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sq_p,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_qp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((sq_q - s_q * s_q / n) / (n - 1), 6) AS var_qty,
           round(sqrt((sq_q - s_q * s_q / n) / (n - 1)), 6) AS stddev_qty,
           round((s_qp - s_q * s_p / n)
             / (sqrt(sq_q - s_q * s_q / n) * sqrt(sq_p - s_p * s_p / n)), 6) AS corr_qty_price
    FROM m
    """,
)
def moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation computed from
    decimal-EXACT moment sums (Σx, Σx², Σxy) with the final arithmetic in
    IEEE doubles — order-independent and bit-identical across engines,
    unlike the built-in streaming var/corr aggregates (which are the
    right choice at scale when differential exactness is not needed)."""
    li = _t(spark, sf_dir, "lineitem")
    q, p = _dec("l_quantity"), _dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s_q"),
        F.sum(q * q).cast("double").alias("sq_q"),
        F.sum(p).cast("double").alias("s_p"),
        F.sum(p * p).cast("double").alias("sq_p"),
        F.sum(q * p).cast("double").alias("s_qp"),
    )
    n = F.col("n")
    s_q, sq_q = F.col("s_q"), F.col("sq_q")
    s_p, sq_p, s_qp = F.col("s_p"), F.col("sq_p"), F.col("s_qp")
    # round(…, 6): the raw closed forms agree to ~1 ulp across engines
    # (expression-compiler FMA contraction), which the exact hash check
    # still flags at some SFs — rounding makes the gate sub-ulp-proof
    return m.select(
        "l_returnflag", "n",
        F.round((sq_q - s_q * s_q / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sq_q - s_q * s_q / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((s_qp - s_q * s_p / n)
                / (F.sqrt(sq_q - s_q * s_q / n) * F.sqrt(sq_p - s_p * s_p / n)), 6)
        .alias("corr_qty_price"),
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern (EXISTS decorrelated to a left-semi join; the
    trimmed testdata schema has no commit/receipt dates, so the inner
    predicate is l_quantity > 45). The semi join shuffles both sides on
    the order key with the lineitem filter pushed below the exchange."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    hits = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o_f.join(hits, o_f["o_orderkey"] == hits["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_class",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: join + conditional CASE counts (shipmode is not
    in the trimmed schema; classify by returnflag instead). Integer sums
    only — bit-stable without decimal staging."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem")
    li_f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li_f.join(o, li_f["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) co
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, with the
    extra predicate INSIDE the outer join (customers with only 'F'
    orders must count 0, not drop out). Two aggregations; the second
    input is one row per customer, so the re-shuffle is tiny."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderstatus")
    j = c.join(
        o, (c["c_custkey"] == o["o_custkey"]) & (o["o_orderstatus"] != "F"), "left_outer"
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue. The revenue 'view'
    is computed once and reused for both the ranking and the max via a
    broadcast of the 1-row max — revenues are decimal-exact sums cast to
    double, so the equality against MAX is bit-safe cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"]).drop("mx")
    return s.join(
        F.broadcast(top), s["s_suppkey"] == top["supplier_no"]
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS a_pk,
                 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_thresh
          FROM lineitem GROUP BY l_partkey) a ON a_pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 10 AND l_quantity < qty_thresh
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-average-quantity orders of selected
    parts. Spark plan: broadcast the filtered part dim into lineitem,
    then a WINDOW average per part key over the reduced set (identical
    per-part mean, since the part filter is independent of lineitem) —
    one shuffle on l_partkey replaces the oracle's self-join, and the
    threshold arithmetic (decimal sum -> double / count * 0.2) is
    replicated exactly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10)
    ).select("p_partkey")
    lp = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    w = Window.partitionBy("l_partkey")
    thresh = F.lit(0.2) * (
        F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    )
    return (
        lp.withColumn("__t", thresh)
        .filter(F.col("l_quantity") < F.col("__t"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


@query(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year. supplier/customer/nation
    are broadcast dims; the only shuffle joins lineitem to orders on the
    order key, then one partial-aggregated groupBy. The disjunctive
    nation-pair predicate lands post-join on broadcast columns."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of EUROPE-destined PROMO-part revenue
    per order year. Ratio of two decimal-exact sums, divided as doubles
    only at the end (conditional branch keeps decimal type so both
    engines sum exactly). Part filter is broadcast into the lineitem
    scan; the orders join is the single large shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("volume")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "inner")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return j.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q22_idle_balance",
    """
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern: above-average-balance customers with no RECENT
    orders (every sf0.01 customer has some order, so the anti-join side
    is date-filtered; no phone column, so the country grouping uses
    c_nationkey). Scalar subquery -> broadcast 1-row aggregate;
    NOT EXISTS -> left-anti join with the date filter pushed below it."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


@query(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\W+')) AS term
      FROM documents
    ), t AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
    ), d AS (
      SELECT term, COUNT(*) AS df FROM t GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), s AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
      FROM t JOIN d USING (term), n
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rk
      FROM s
    )
    SELECT doc_id, term, tf, df, tfidf FROM r WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document by TF-IDF
    (operators.text.tfidf_top_terms). Ranking happens on the ROUNDED
    score with a term tiebreak, so sub-ulp libm differences between
    engines cannot reorder the window — the same determinism discipline
    as the decimal aggregates."""
    from knime_core_columnar_spark.operators.text import tfidf_top_terms as tt

    return tt(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@query(
    "hash_split_stats",
    """
    WITH h AS (
      SELECT l_returnflag,
             ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '|'
                                    || CAST(l_linenumber AS VARCHAR) || '|split'),
                                1, 15))::BIGINT % 10000 AS b
      FROM lineitem
    )
    SELECT CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split,
           l_returnflag, COUNT(*) AS n
    FROM h GROUP BY 1, 2
    """,
)
def hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by row-key hash
    (operators.sampling.hash_split): the same row lands in the same
    split regardless of partitioning, parallelism, or data growth —
    unlike randomSplit(). The md5-derived bucket is bit-identical in
    DuckDB, so the exact per-split row assignment is oracle-gated (here
    aggregated per returnflag to keep the result compact)."""
    from knime_core_columnar_spark.operators.sampling import hash_split

    li = _t(spark, sf_dir, "lineitem")
    return (
        hash_split(li, ["l_orderkey", "l_linenumber"])
        .groupBy("split", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "salted_join_skew",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-orders join executed through the explicit skew-salting
    path (relational.salted_join, salts=8): hot order keys are spread
    over 8 shuffle buckets and orders rows are replicated per salt. The
    oracle is the PLAIN join — the salt must not change the result, which
    is exactly what this gate proves."""
    from knime_core_columnar_spark.operators.relational import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    j = salted_join(li, o, on="l_orderkey", how="inner", salts=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
    )


@query(
    "asof_join_events",
    """
    SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
           c.click_ts, c.click_id, c.click_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN LATERAL (
      SELECT c.ts AS click_ts, c.event_id AS click_id, c.value AS click_value
      FROM events c
      WHERE c.event_type = 'click' AND c.user_id = e.user_id AND c.ts <= e.ts
      ORDER BY c.ts DESC, c.event_id DESC
      LIMIT 1
    ) c ON TRUE
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every error event, the latest click by the same
    user at-or-before the error. Spark plan: union + single shuffle on
    user_id + running last(ignorenulls) window (operators.temporal) —
    no inequality join, no BroadcastNestedLoop; scales as one sort-merge
    pass per key group. The oracle expresses the same point-in-time
    semantics as a lateral top-1 subquery."""
    from knime_core_columnar_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    res = asof_join(left, right, on="ts", by="user_id", suffix="_click")
    return res.select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("ts_click").alias("click_ts"),
        F.col("event_id_click").alias("click_id"),
        F.col("value").alias("click_value"),
    )


@query(
    "asof_forward_events",
    """
    SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
           p.purchase_ts, p.purchase_id,
           epoch_us(p.purchase_ts) - epoch_us(e.ts) AS gap_us
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN LATERAL (
      SELECT c.ts AS purchase_ts, c.event_id AS purchase_id
      FROM events c
      WHERE c.event_type = 'purchase' AND c.user_id = e.user_id AND c.ts >= e.ts
      ORDER BY c.ts ASC, c.event_id ASC
      LIMIT 1
    ) p ON TRUE
    """,
)
def asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every error, the NEXT purchase by the same
    user at-or-after it, with the gap in microseconds — time-to-recovery
    analytics. Same single-shuffle carry-forward plan as the backward
    direction, traversed in descending time order."""
    from knime_core_columnar_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    res = asof_join(left, right, on="ts", by="user_id", suffix="_p",
                    direction="forward")
    return res.select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("ts_p").alias("purchase_ts"),
        F.col("event_id_p").alias("purchase_id"),
        (F.unix_micros(F.col("ts_p").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))).alias("gap_us"),
    )


@query(
    "range_join_events",
    """
    SELECT a.event_type, COUNT(*) AS pairs,
           COUNT(DISTINCT a.event_id) AS lhs_with_follower
    FROM events a
    JOIN events b
      ON a.event_type = b.event_type
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.event_type
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: same-type event pairs within a forward 5-minute
    window, counted per type. Spark plan (operators.temporal.range_join):
    right rows bucketed to floor(ts/band), left rows probe bucket and
    bucket+1 via posexplode, so the interval predicate runs as a shuffled
    equi-join on (type, bucket) + residual filter instead of the
    BroadcastNestedLoopJoin a raw inequality join produces. The oracle is
    the raw inequality join (fine for DuckDB's IEJoin at sf0.01)."""
    from knime_core_columnar_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    a = ev.select("event_type", F.col("ts").alias("ts_a"), F.col("event_id").alias("id_a"))
    b = ev.select("event_type", F.col("ts").alias("ts_b"))
    pairs = range_join(a, b, key="event_type", left_ts="ts_a", right_ts="ts_b",
                       band_seconds=300, bounds="(]")
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("pairs"),
        F.count_distinct(F.col("id_a")).alias("lhs_with_follower"),
    )


# ---------------------------------------------------------------------------
# Round-2 widening: analytic aggregates, ties, argmax, bucketed co-location
# ---------------------------------------------------------------------------

@query(
    "corr_stats",
    """
    WITH a AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((nd * sxy - sx * sy)
                 / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS corr_qty_price,
           n
    FROM a
    """,
)
def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group with EXACT decimal moment sums —
    F.corr is a double reduction (not bit-stable under reordering), so
    the five moments accumulate as decimals and the closed-form corr is
    computed on the exact sums in identical double arithmetic on both
    engines. One partial-aggregated pass, same shuffle as any groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    a = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return a.select(
        "l_returnflag",
        F.round(
            (nd * sxy - sx * sy)
            / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        "n",
    )


@query(
    "window_ntile",
    """
    SELECT o_orderpriority, CAST(tile AS INTEGER) AS tile, COUNT(*) AS n,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           MAX(pr) AS max_pr, MAX(cd) AS max_cd
    FROM (
      SELECT o_orderpriority, o_orderkey,
             NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS tile,
             PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS pr,
             CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS cd
      FROM orders
    )
    GROUP BY o_orderpriority, tile
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment + distribution ranks (ntile / percent_rank /
    cume_dist) over a unique total order, aggregated per (group, tile).
    One shuffle on the partition key; ranks are exact rational doubles —
    identical across engines given the unique ordering key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    ranked = o.select(
        "o_orderpriority", "o_orderkey",
        F.ntile(4).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.max("pr").alias("max_pr"),
        F.max("cd").alias("max_cd"),
    )


@query(
    "topk_ties",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties-preserving top-k per group (rank, not row_number): equal
    prices all surface. Spark still plans WindowGroupLimit for the
    rank<=k filter — per-partition bounded heaps, no global sort."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderpriority", "o_orderkey", "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "conditional_agg",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_hightax,
           COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00') AS n_recent,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (SQL FILTER clause / KNIME's conditional
    GroupBy patterns) — predicates evaluate inside the single partial
    aggregation, no extra scan per condition."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.sum(
            F.when(F.col("l_tax") > 0.04, F.col("l_quantity").cast("decimal(18,2)"))
        ).cast("double").alias("qty_hightax"),
        F.count_if(
            F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("n_recent"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "argmax_per_group",
    """
    SELECT o_orderpriority, o_orderkey AS top_order, o_totalprice AS top_price
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax as ONE hash aggregation (max of a (price, key) struct —
    lexicographic, deterministic tiebreak) instead of a window sort: at
    scale this partial-aggregates map-side, so the shuffle carries one
    row per group instead of every row, the same reason the reference
    streams its domain maxima instead of sorting (SURVEY §2.3)."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey"))).alias("m")
    )
    return m.select(
        "o_orderpriority",
        F.col("m.o_orderkey").alias("top_order"),
        F.col("m.o_totalprice").alias("top_price"),
    )


@query(
    "events_dedup_latest",
    """
    SELECT user_id, event_type, event_id AS last_event_id,
           ts AS last_ts, value AS last_value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest dedup policy (training pipelines: retain the latest
    crawl/snapshot per key) as a single hash aggregation: max of a
    (ts, event_id, value) struct — the unique (ts, event_id) prefix
    makes the lexicographic max deterministic and the trailing fields
    ride along. Partial-aggregates map-side; the shuffle moves one row
    per key, where the window formulation moves every row."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id", "event_type").agg(
        F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value"))).alias("m")
    )
    return m.select(
        "user_id", "event_type",
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.ts").alias("last_ts"),
        F.col("m.value").alias("last_value"),
    )


@query(
    "component_stats",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
                JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), m AS (
      SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
    ), sizes AS (
      SELECT component, COUNT(*) AS sz FROM m GROUP BY component
    )
    SELECT sz AS cluster_size, COUNT(*) AS n_clusters FROM sizes GROUP BY sz
    """,
)
def component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution — the dedup pipeline's summary
    report (how much of the corpus is duplicated, at what cluster
    sizes). Two cheap aggregations on top of the connected-components
    output; the oracle recomputes the closure with a recursive CTE."""
    clusters = neardup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


@query(
    "bucketed_join",
    """
    SELECT o.o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           MIN(c.c_name) AS c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey
    """,
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides bucketed (and
    sorted) on the join key into 8 buckets, so the join AND the
    follow-up per-key aggregation reuse the on-disk partitioning —
    zero Exchange in the whole plan (asserted in tests/test_plans.py).
    This is the materialize-once-join-many pattern the reference cannot
    express (its store is position-addressed, SURVEY §4): at 100 TB,
    bucketing the fact table once amortizes every downstream key join."""
    import os

    _ensure_pkg_on_executors(spark)
    tag = _artifact_tag(sf_dir, "orders", "customer")
    base = f"/tmp/kccs_bucketed_{tag}"
    specs = [("orders", f"bk_orders_{tag}", "o_custkey"),
             ("customer", f"bk_customer_{tag}", "c_custkey")]
    for src, name, key in specs:
        # The metastore entry (spark-warehouse) can outlive the /tmp data
        # directory — if the backing path is gone, drop and rebuild the
        # table instead of failing on every scan until manual cleanup.
        exists = spark.catalog.tableExists(name)
        if exists and not os.path.isdir(f"{base}/{name}"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            exists = False
        if not exists:
            (
                _t(spark, sf_dir, src)
                .write.bucketBy(8, key).sortBy(key)
                .option("path", f"{base}/{name}")
                .mode("overwrite").format("parquet")
                .saveAsTable(name)
            )
    o = spark.table(f"bk_orders_{tag}")
    c = spark.table(f"bk_customer_{tag}")
    # merge hint: at test SFs the dimension side is under the broadcast
    # threshold, which would hide the point — the bucketed sort-merge
    # join reads both sides pre-partitioned AND pre-sorted (no Exchange,
    # no Sort), the plan a 100 TB fact⋈fact join needs.
    return (
        o.join(c.hint("merge"), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.min("c_name").alias("c_name"),
        )
    )


@query(
    "unpivot_metrics",
    """
    SELECT l_returnflag, metric, val FROM (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    ) UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): aggregate once, melt the metric columns into
    (group, metric, value) rows — the inverse of pivot_returns. Spark's
    unpivot is a zero-shuffle projection over the agg output."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.sum(_dec("l_discount")).cast("double").alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "val"
    )


@query(
    "date_spine",
    """
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1998-12-01',
                                         INTERVAL 1 MONTH)) AS DATE) AS month
    ), rev AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT spine.month, COALESCE(rev.n_orders, 0) AS n_orders,
           COALESCE(rev.revenue, CAST(0 AS DOUBLE)) AS revenue
    FROM spine LEFT JOIN rev ON spine.month = rev.month
    """,
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine left join: a generated monthly spine keeps empty
    months in the report (gap-free time series — the pattern BI layers
    need). The spine is a tiny generated relation (broadcast side);
    revenue aggregates once on (month)."""
    o = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1998-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month")
    )
    rev = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
    )
    return spine.join(rev, "month", "left").select(
        "month",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
    )


@query(
    "window_range_frame",
    """
    SELECT event_id, user_id, us,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_10m
    FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (event-time trailing 10 minutes, not N rows):
    the frame is defined by timestamp distance, so ties and gaps behave
    correctly. Decimal accumulation inside the frame keeps the sum exact
    (window engines disagree on double association order). One shuffle
    on user_id."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("value").cast("decimal(18,4)").alias("__v"),
    ).select(
        "event_id", "user_id", "us",
        F.sum("__v").over(w).cast("double").alias("trailing_10m"),
    )


@query(
    "upsert_orders",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey <= 2000
    ), upd AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey > 1500 AND o_orderkey <= 2500
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
)
def upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert (MERGE semantics without a table format): update rows
    win wholesale, unmatched base rows survive, brand-new update rows
    insert — one full-outer equi-join on the key (both sides shuffle on
    the key; on a lakehouse this is Delta/Iceberg MERGE, the Spark plan
    is the same join). Update rows replace EVERY column (update-wins per
    row, not per column) so a NULL written by an update survives."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    base = o.filter("o_orderkey <= 2000")
    upd = (
        o.filter("o_orderkey > 1500 AND o_orderkey <= 2500")
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    )
    from knime_core_columnar_spark.operators.relational import upsert

    return upsert(base, upd, keys=["o_orderkey"])


@query(
    "fuzzy_match_names",
    """
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    )
    SELECT a.block, COUNT(*) AS n_pairs,
           COUNT(DISTINCT a.p_partkey) AS n_left
    FROM p a JOIN p b
      ON a.block = b.block AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    GROUP BY a.block
    """,
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs meet only within a block
    key (last name token) — the classic entity-resolution shape that
    replaces the O(n²) cross product with a per-block join — then exact
    Levenshtein ≤ 2 verifies (length-gap pre-filter + thresholded
    banded DP).

    AGGREGATE-THROUGH-THE-JOIN: record-level pair counts reconstruct
    EXACTLY from name-level aggregates, so the expensive verification
    runs over DISTINCT names only (the same clique-contraction insight
    as entity_resolution, extended to the counting semantics):
      · same-name pairs all verify (lev = 0) → C(cnt, 2) per name;
      · a verified name pair (n1, n2) contributes cnt1·cnt2 record
        pairs (each unordered record pair counted once under the
        id_a < id_b convention);
      · a record is a LEFT (appears as the smaller id of some verified
        pair) iff some verified partner has a larger id: all but the
        max-id record of a multi-record name qualify via their own
        clique (cnt − 1), and the max-id record qualifies iff a
        verified neighbor name's max id exceeds it.
    At 100 TB the pair join touches |distinct names|, not |rows| —
    record-level cost is one hash aggregation."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    names = p.groupBy("block", "p_name").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("p_partkey").alias("maxid")
    )
    a = names.select(
        "block", F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"), F.col("maxid").alias("max_a"),
    )
    b = names.select(
        "block", F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"), F.col("maxid").alias("max_b"),
    )
    vp = (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .filter(F.levenshtein("name_a", "name_b", 2) >= 0)
    )
    nbr = (
        vp.select("block", F.col("name_a").alias("p_name"),
                  F.col("max_b").alias("__nm"))
        .unionByName(vp.select("block", F.col("name_b").alias("p_name"),
                               F.col("max_a").alias("__nm")))
        .groupBy("block", "p_name")
        .agg(F.max("__nm").alias("nbr_max"))
    )
    per_name = names.join(nbr, ["block", "p_name"], "left").select(
        "block",
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("same_pairs"),
        (
            (F.col("cnt") - 1)
            + F.when(F.col("nbr_max") > F.col("maxid"), 1).otherwise(0)
        ).cast("long").alias("lefts"),
    )
    cross = vp.groupBy("block").agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("cross_pairs")
    )
    return (
        per_name.groupBy("block")
        .agg(F.sum("same_pairs").alias("__sp"), F.sum("lefts").alias("__lf"))
        .join(cross, "block", "left")
        .select(
            "block",
            (F.col("__sp") + F.coalesce(F.col("cross_pairs"), F.lit(0)))
            .cast("long").alias("n_pairs"),
            F.col("__lf").cast("long").alias("n_left"),
        )
        .filter(F.col("n_pairs") > 0)
    )


@query(
    "stratified_sample_stats",
    """
    WITH h AS (
      SELECT o_orderpriority,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '|strata'),
                                1, 15))::BIGINT % 10000 AS b
      FROM orders
    )
    SELECT o_orderpriority, COUNT(*) AS n
    FROM h
    WHERE (o_orderpriority = '1-URGENT' AND b < 5000)
       OR (o_orderpriority = '2-HIGH' AND b < 2500)
       OR (o_orderpriority NOT IN ('1-URGENT', '2-HIGH') AND b < 1000)
    GROUP BY o_orderpriority
    """,
)
def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (training-data class
    rebalancing): each priority keeps its own fraction, decided by the
    md5 key hash — same rows at any parallelism, and the exact per-row
    membership is oracle-gated (aggregated per stratum for compactness)."""
    from knime_core_columnar_spark.operators.sampling import stratified_sample

    o = _t(spark, sf_dir, "orders")
    s = stratified_sample(
        o, ["o_orderkey"], "o_orderpriority",
        {"1-URGENT": 0.5, "2-HIGH": 0.25}, default_fraction=0.1,
    )
    return s.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "zscore_normalize",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           round((l_quantity - sx / nd)
                 / sqrt((nd * sxx - sx * sx) / (nd * (nd - 1))), 6) AS z_qty
    FROM lineitem JOIN m USING (l_returnflag)
    """,
)
def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (feature normalization for
    training): mean and sample variance from EXACT decimal moment sums
    (one partial-aggregated pass over 6 groups), broadcast-joined back —
    per-row arithmetic is deterministic double math. Two scans total,
    no window shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    nd, sx, sxx = F.col("nd"), F.col("sx"), F.col("sxx")
    return (
        li.join(F.broadcast(m), "l_returnflag")
        .select(
            F.concat_ws(
                "_", F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ).alias("_row_key"),
            F.round(
                (F.col("l_quantity") - sx / nd)
                / F.sqrt((nd * sxx - sx * sx) / (nd * (nd - 1))),
                6,
            ).alias("z_qty"),
        )
    )


@query(
    "iqr_outliers",
    """
    WITH q AS (
      SELECT o_orderpriority,
             CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS q1,
             CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, COUNT(*) AS n_outliers,
           MIN(o_totalprice) AS min_out, MAX(o_totalprice) AS max_out
    FROM orders JOIN q USING (o_orderpriority)
    WHERE o_totalprice < q1 - 0.5 * (q3 - q1)
       OR o_totalprice > q3 + 0.5 * (q3 - q1)
    GROUP BY o_orderpriority
    """,
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection (Tukey-style fences, k=0.5 to fit the
    synthetic distribution's tails) per group — data-quality filtering
    before training. Exact percentiles (continuous interpolation,
    identical to quantile_cont) computed once per group, broadcast back;
    fences are deterministic double arithmetic."""
    o = _t(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .filter(
            (F.col("o_totalprice") < F.col("q1") - 0.5 * iqr)
            | (F.col("o_totalprice") > F.col("q3") + 0.5 * iqr)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("o_totalprice").alias("min_out"),
            F.max("o_totalprice").alias("max_out"),
        )
    )


@query(
    "chunk_documents",
    """
    SELECT doc_id,
           CAST(off // 150 AS INTEGER) AS chunk_idx,
           CAST(off AS BIGINT) AS chunk_start,
           substring(text, off + 1, 200) AS chunk_text
    FROM (
      SELECT doc_id, text,
             unnest(range(0, greatest(length(text), 1), 150)) AS off
      FROM documents
    )
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 200-char chunks, 50-char overlap
    (operators.text.chunk_text) — the 1→N expansion feeding any
    window-bounded trainer. Pure Catalyst sequence+explode+substring;
    zero shuffle, zero Python."""
    from knime_core_columnar_spark.operators.text import chunk_text

    d = _t(spark, sf_dir, "documents")
    return chunk_text(d, "doc_id", "text", chunk_chars=200, overlap=50)


@query(
    "doc_repetition",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                   i -> array_to_string(t[i:i+1], ' '))) AS gram
      FROM toks
    ), per_gram AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
    ), per_doc AS (
      SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM per_gram GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(round(CAST(mx AS DOUBLE) / tot, 6), 0.0) AS rep_ratio
    FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: share of all word bigrams
    taken by the most frequent one (operators.text.repetition_ratio).
    Heavy counting in codegen explode+agg; per-row HOFs only build the
    bounded n-gram array."""
    from knime_core_columnar_spark.operators.text import repetition_ratio

    d = _t(spark, sf_dir, "documents")
    return repetition_ratio(d, "doc_id", "text", n=2)


@query(
    "quality_filter_flags",
    """
    WITH s AS (
      SELECT doc_id,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS symbol_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS digit_ratio,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
               / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS mean_token_len,
             CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS ttr
      FROM documents
    )
    SELECT doc_id, round(symbol_ratio, 6) AS symbol_ratio,
           round(digit_ratio, 6) AS digit_ratio,
           round(mean_token_len, 6) AS mean_token_len,
           round(ttr, 6) AS ttr,
           (symbol_ratio < 0.1 AND mean_token_len >= 2.0
            AND mean_token_len <= 12.0 AND ttr >= 0.3) AS keep
    FROM s
    """,
)
def quality_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gate: symbol ratio, digit ratio, mean token
    length, type-token ratio, and the combined keep decision — all
    closed-form Catalyst expressions (no explode, no Python), so the
    filter runs at scan speed and pushes into the pipeline's first
    pass."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    toks = F.split(F.trim(t), r"\s+")
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
    symbol_ratio = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast("double") / n_chars
    digit_ratio = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double") / n_chars
    mean_token_len = F.length(F.regexp_replace(t, "\\s", "")).cast("double") / n_toks
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_toks
    return d.select(
        "doc_id",
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(mean_token_len, 6).alias("mean_token_len"),
        F.round(ttr, 6).alias("ttr"),
        (
            (symbol_ratio < 0.1) & (mean_token_len >= 2.0)
            & (mean_token_len <= 12.0) & (ttr >= 0.3)
        ).alias("keep"),
    )


@query(
    "funnel_analysis",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_view_click,
           (SELECT COUNT(*) FROM s3) AS n_view_click_purchase
    """,
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click → purchase): each stage is the
    earliest qualifying event strictly after the previous stage's. Three
    keyed aggregations + broadcast-scale joins on user_id — the
    sequential-pattern query every event-analytics engine is asked for;
    no window over the full stream, state is one row per user per
    stage."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "cohort_retention",
    """
    WITH first_week AS (
      SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.week) // 7 AS INTEGER) AS week_offset,
           COUNT(*) AS n_active
    FROM first_week f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each later week they return (offset 0 = the cohort size).
    Two aggregations + one user-keyed join; the matrix is
    O(weeks²)-sized regardless of event volume."""
    ev = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort"))
    active = ev.select("user_id", week.alias("week")).distinct()
    return (
        first.join(active, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("week"), F.col("cohort")) / 7)
            .cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "simple_linear_workflow",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           l_orderkey, l_linenumber, l_returnflag, l_linestatus,
           l_quantity, l_extendedprice,
           upper(l_returnflag || '_' || l_linestatus) AS flag_status
    FROM lineitem
    WHERE l_quantity > 25
    """,
)
def simple_linear_workflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OWN benchmark workflow, end to end: CSV Reader →
    Column Filter → String Manipulation → Row Filter
    (SimpleLinearWorkflowBenchmark.java:80-87 runs exactly this node
    chain over a 64 MB CSV). Here: lineitem exported to CSV once (the
    ingest artifact), read back with a declared schema through the
    ColumnarTable API, then keep_only_columns → append_map → filter_rows
    — the same four stages as the reference's measured workflow. Spark
    CSV round-trips doubles via shortest-repr printing, so values stay
    bit-exact against the parquet-based oracle."""
    import os

    from knime_core_columnar_spark.sources.io import read_csv

    _ensure_pkg_on_executors(spark)
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_quantity", "l_extendedprice"]
    tag = _artifact_tag(sf_dir, "lineitem")
    csv_dir = f"/tmp/kccs_workflow_csv_{tag}"
    if not os.path.isdir(csv_dir):
        (
            _t(spark, sf_dir, "lineitem")
            .select(cols)
            .write.mode("overwrite").option("header", "true")
            .csv(f"{csv_dir}.part{os.getpid()}")
        )
        _publish_dir(f"{csv_dir}.part{os.getpid()}", csv_dir)
    schema = ("l_orderkey long, l_linenumber int, l_returnflag string, "
              "l_linestatus string, l_quantity double, l_extendedprice double")
    t = read_csv(
        spark, csv_dir, schema=schema,
        key_columns=["l_orderkey", "l_linenumber"],
    )
    t = t.keep_only_columns(*cols)  # Column Filter
    t = t.append_map({                # String Manipulation
        "flag_status": F.upper(
            F.concat_ws("_", F.col("l_returnflag"), F.col("l_linestatus"))
        )
    })
    t = t.filter_rows(F.col("l_quantity") > 25)  # Row Filter
    return t.df


@query(
    "partition_pruned_scan",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2
    """,
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning end to end: events materialized ONCE
    partitioned by event_type (the write-side layout decision), then the
    two-type query reads only those partition directories — the plan's
    PartitionFilters prune 3 of 5 partitions before any IO happens
    (asserted in tests/test_plans.py). At 100 TB this is the difference
    between scanning 40 TB and scanning 16 TB; the reference's store has
    no partition dimension at all (SURVEY §4)."""
    import os

    _ensure_pkg_on_executors(spark)
    tag = _artifact_tag(sf_dir, "events")
    part_dir = f"/tmp/kccs_events_by_type_{tag}"
    if not os.path.isdir(part_dir):
        (
            _t(spark, sf_dir, "events")
            .write.mode("overwrite").partitionBy("event_type")
            .parquet(f"{part_dir}.part{os.getpid()}")
        )
        _publish_dir(f"{part_dir}.part{os.getpid()}", part_dir)
    ev = spark.read.parquet(part_dir)
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


@query(
    "json_typed_extract",
    """
    SELECT event_id, CAST(props->>'k' AS INTEGER) AS k_typed,
           event_type
    FROM events
    WHERE CAST(props->>'k' AS INTEGER) > 90
    """,
)
def json_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing (from_json with a typed struct, not
    stringly get_json_object): the parsed struct is a real column whose
    fields prune and push like any other, and the filter on the typed
    field runs in codegen."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", "event_type",
        F.from_json(F.col("props"), "k int").alias("p"),
    )
    return (
        parsed.filter(F.col("p.k") > 90)
        .select("event_id", F.col("p.k").alias("k_typed"), "event_type")
    )


@query(
    "table_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey <= 2000
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 2500
    )
    SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
           CASE WHEN new.o_orderkey IS NOT NULL THEN new.o_orderstatus
                ELSE old.o_orderstatus END AS o_orderstatus,
           CASE WHEN new.o_orderkey IS NOT NULL THEN new.o_totalprice
                ELSE old.o_totalprice END AS o_totalprice,
           CASE WHEN old.o_orderkey IS NOT NULL AND new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderkey IS NULL AND new.o_orderkey IS NOT NULL THEN 'added'
                WHEN old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
                 AND old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice THEN 'unchanged'
                ELSE 'changed' END AS change
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed table diff (added/removed/changed/unchanged) — the
    regression-testing primitive the reference's test harness applies
    cell by cell, as one distributed full-outer join with null-safe
    struct equality (operators.relational.diff_tables)."""
    from knime_core_columnar_spark.operators.relational import diff_tables

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    old = o.filter("o_orderkey <= 2000")
    new = o.filter("o_orderkey > 500 AND o_orderkey <= 2500").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    return diff_tables(old, new, keys=["o_orderkey"])


@query(
    "scd2_intervals",
    """
    SELECT user_id, event_id, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current,
           value
    FROM events WHERE event_type = 'signup'
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: each state
    change opens a validity interval [ts, next_ts) closed by the next
    change for the same key; the open interval is the current row. One
    lead() window per key — the standard warehouse historization, and
    the batch construction the as-of join then queries."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id", "event_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "value",
    )


@query(
    "gaps_islands",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), g AS (
      SELECT user_id, day,
             CAST(day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                             AS INTEGER) AS DATE) AS grp
      FROM d
    )
    SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
           COUNT(*) AS streak_days
    FROM g GROUP BY user_id, grp
    """,
)
def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user via the
    day − row_number() grouping trick (equal within each unbroken run).
    Distinct + one window + one aggregation; everything shuffles once on
    user_id and stays there."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("grp", F.date_sub(F.col("day"), F.row_number().over(w)))
    return g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("grp")


@query(
    "pct_of_total",
    """
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, revenue,
           round(revenue / SUM(revenue) OVER (), 6) AS pct_total,
           round(revenue / SUM(revenue) OVER (PARTITION BY l_returnflag), 6)
             AS pct_of_flag
    FROM g
    """,
)
def pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total / ratio-to-report: share of overall and of the
    group's parent level via unpartitioned + partitioned window sums —
    computed over the 6-row AGGREGATE, so the 'global window' touches
    six rows, not the input (never window the raw fact table for a
    ratio you can take after aggregating)."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_extendedprice")).cast("double").alias("revenue")
    )
    w_all = Window.partitionBy()
    w_flag = Window.partitionBy("l_returnflag")
    return g.select(
        "l_returnflag", "l_linestatus", "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias("pct_total"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_flag), 6).alias("pct_of_flag"),
    )


@query(
    "array_set_ops",
    """
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split_regex(trim(text), '\\s+')) AS words,
             list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS lwords
    FROM documents
    )
    SELECT doc_id,
           array_to_string(list_sort(list_intersect(words, lwords)), ',') AS common,
           CAST(len(list_intersect(words, lwords)) AS INTEGER) AS n_common,
           CAST(len(words) AS INTEGER) AS n_words
    FROM t
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row array set algebra (intersect/size) — the list-typed column
    surface; arrays stay row-local (no explode, no shuffle), serialized
    to strings for the exact-hash gate."""
    d = _t(spark, sf_dir, "documents")
    words = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    lwords = F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    common = F.array_intersect(words, lwords)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(common), ",").alias("common"),
        F.size(common).alias("n_common"),
        F.size(words).alias("n_words"),
    )


@query(
    "regexp_extract_numbers",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '')
             AS numbers
    FROM documents
    """,
)
def regexp_extract_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all surface: every numeric token per document,
    counted and serialized — pure codegen scan work."""
    d = _t(spark, sf_dir, "documents")
    nums = F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(nums).alias("n_numbers"),
        F.array_join(nums, ",").alias("numbers"),
    )


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: the pricing-summary aggregation."""
    return q1_pricing_summary(spark, sf_dir)


@query(
    "contamination_check",
    """
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|corpus'), 1, 15))::BIGINT
               % 10000 AS b,
             string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, b,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), evd AS (
      SELECT DISTINCT doc_id, ('0x' || substring(md5(x), 1, 15))::BIGINT AS h
      FROM sh, unnest(s) AS u(x) WHERE b >= 8000
    ), tr AS (
      SELECT DISTINCT ('0x' || substring(md5(x), 1, 15))::BIGINT AS h
      FROM sh, unnest(s) AS u(x) WHERE b < 8000
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_ngrams FROM evd GROUP BY 1
    ), hits AS (
      SELECT evd.doc_id, COUNT(*) AS n_contaminated
      FROM evd JOIN tr USING (h) GROUP BY 1
    )
    SELECT tot.doc_id, n_ngrams,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
             AS contamination
    FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram contamination — the benchmark-hygiene pass of a
    training-data pipeline (operators.dedup.ngram_contamination): split
    documents 80/20 by key hash (reproducible, partitioning-independent),
    then for each eval doc report what fraction of its distinct 3-grams
    also occur anywhere in the train split. Shuffles only 60-bit shingle
    hashes; the md5 arithmetic is bit-identical in DuckDB, so the exact
    per-doc contamination ratio is oracle-gated."""
    from knime_core_columnar_spark.operators.dedup import ngram_contamination
    from knime_core_columnar_spark.operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    b = hash_bucket(["doc_id"], salt="corpus")
    train = d.filter(b < 8000)
    ev = d.filter(b >= 8000)
    return ngram_contamination(train, ev, "doc_id", "text", n=3)


@query(
    "boilerplate_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, ('0x' || substring(md5(x), 1, 15))::BIGINT AS h
      FROM grams, unnest(s) AS u(x)
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), dfq AS (
      SELECT h, COUNT(*) AS dfc FROM sh GROUP BY h
    ), boiler AS (
      SELECT h FROM dfq, nd WHERE dfc * 100 >= 5 * n_docs
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_ngrams FROM sh GROUP BY 1
    ), hits AS (
      SELECT doc_id, COUNT(*) AS n_boilerplate
      FROM sh JOIN boiler USING (h) GROUP BY 1
    )
    SELECT tot.doc_id, n_ngrams,
           COALESCE(n_boilerplate, 0) AS n_boilerplate,
           CAST(COALESCE(n_boilerplate, 0) AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
             AS boilerplate_ratio
    FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
    """,
)
def boilerplate_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated-content detection (operators.dedup.boilerplate_ngrams):
    3-grams present in ≥5% of all documents are boilerplate; per-doc
    boilerplate ratio is the quality-gate signal. One shingle pass, one
    document-frequency aggregation over 60-bit hashes, broadcast
    semi-join back — exact integer threshold, fully oracle-gated."""
    from knime_core_columnar_spark.operators.dedup import boilerplate_ngrams

    return boilerplate_ngrams(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, min_doc_pct=5
    )


@query(
    "pii_redact",
    """
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
               '\\b(hash|key|value)\\b', '[PII]', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '\\b(hash|key|value)\\b')) AS BIGINT)
             AS n_term_hits,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email_hits
    FROM documents
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / sensitive-term scrubbing (operators.text.redact): email-rule
    regex plus a whole-word term blocklist, applied as one codegen'd
    projection — the pre-tokenization cleaning pass of a training
    pipeline. Patterns use the Java-regex ∩ RE2 subset so the identical
    pattern string runs on Spark and the DuckDB oracle; per-doc match
    counts are the audit metric."""
    from knime_core_columnar_spark.operators.text import (
        PII_RULES,
        match_count,
        redact,
        term_pattern,
    )

    terms = ["hash", "key", "value"]
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        redact("text", rules={"email": PII_RULES["email"]}, terms=terms,
               replacement="[PII]").alias("redacted"),
        match_count("text", term_pattern(terms)).alias("n_term_hits"),
        match_count("text", PII_RULES["email"]).alias("n_email_hits"),
    )


@query(
    "corpus_shuffle",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|epoch0'), doc_id) - 1
             AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (operators.sampling.seeded_shuffle):
    a stable md5-keyed global permutation of the corpus — reproducible
    across runs and cluster sizes, re-seedable per epoch. Distributed
    range-sort plus the zipWithIndex offset trick; no global-window
    row_number, so no single-reducer stage at 100 TB."""
    from knime_core_columnar_spark.operators.sampling import seeded_shuffle

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return seeded_shuffle(d, ["doc_id"], seed="epoch0")


@query(
    "sequence_packing",
    """
    WITH RECURSIVE base AS (
      SELECT doc_id, stream, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn
      FROM (
        SELECT doc_id,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack'), 1, 15))::BIGINT
                 % 10000) % 8 AS stream,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
      )
    ), r AS (
      SELECT stream, rn, doc_id, n_tokens, n_tokens AS acc,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.stream, b.rn, b.doc_id, b.n_tokens,
             CASE WHEN r.acc + b.n_tokens > 512 THEN b.n_tokens
                  ELSE r.acc + b.n_tokens END,
             CASE WHEN r.acc + b.n_tokens > 512 THEN r.pack_id + 1
                  ELSE r.pack_id END
      FROM r JOIN base b ON b.stream = r.stream AND b.rn = r.rn + 1
    )
    SELECT doc_id, stream, pack_id, n_tokens FROM r
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget context-window packing (operators.packing
    .pack_sequences): greedy first-fit of documents into 512-token packs
    within 8 hash-partitioned streams. The sequential recurrence runs as
    an Arrow-batched applyInPandas over (id, stream, n_tokens) triples —
    text never enters Python; the DuckDB oracle replays the identical
    recurrence as a recursive CTE, so every pack assignment is
    value-checked."""
    from knime_core_columnar_spark.operators.packing import pack_sequences
    from knime_core_columnar_spark.operators.text import token_count

    _ensure_pkg_on_executors(spark)
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences(toks, "doc_id", "n_tokens", capacity=512, n_streams=8)


@query(
    "referential_audit",
    """
    SELECT
      (SELECT COUNT(*) FROM orders) AS n_orders,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_orders,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        AS n_childless_customers,
      (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
        AS n_active_customers
    """,
)
def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across a foreign key — the pre-join
    data-quality check an ETL pipeline runs before trusting a join:
    orphan facts (orders without a customer, left-anti), childless
    dimension rows (customers without orders, right-anti), and active
    key cardinality. ONE lazy plan (four 1-row aggregates cross-joined)
    — no driver-side counts; anti-joins broadcast the smaller key set."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n_orders = o.agg(F.count(F.lit(1)).alias("n_orders"))
    n_orphans = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_orphan_orders")
    )
    n_childless = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_childless_customers")
    )
    n_active = o.agg(F.countDistinct("o_custkey").alias("n_active_customers"))
    return (
        n_orders.crossJoin(n_orphans).crossJoin(n_childless).crossJoin(n_active)
    )


@query(
    "percentile_grid",
    """
    SELECT l_returnflag,
           CAST(quantile_cont(l_extendedprice, 0.10) AS DOUBLE) AS p10,
           CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75,
           CAST(quantile_cont(l_extendedprice, 0.90) AS DOUBLE) AS p90,
           CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile distribution summary per group — the profiling
    grid (p10…p99) in ONE aggregation pass: Spark's percentile()
    accepts the full quantile array, computing all cuts from a single
    sorted digest per group rather than six separate scans."""
    li = _t(spark, sf_dir, "lineitem")
    qs = [0.10, 0.25, 0.50, 0.75, 0.90, 0.99]
    g = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(*[F.lit(q) for q in qs])).alias("p")
    )
    return g.select(
        "l_returnflag",
        *[F.col("p")[i].alias(f"p{int(q * 100)}") for i, q in enumerate(qs)],
    )


@query(
    "column_profile",
    """
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
    FROM lineitem
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the KNIME Statistics node): per numeric column
    — row count, null count, exact distinct count, min/max — computed
    in ONE grouping-sets-free pass per column batch via a single
    aggregation emitting every column's stats, then unpivoted to the
    long profiling layout. One scan for all profiled columns."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    agg = li.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in cols],
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_v"),
                F.col(f"mx_{c}").alias("max_v"),
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@query(
    "user_lifetime_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
           date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) AS span_days,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def user_lifetime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime/engagement profile (the sessionization
    family's roll-up view): event counts, first/last seen, distinct
    active days vs calendar span, decimal-exact lifetime value. One
    partial-aggregated pass; count-distinct of the day expands to the
    standard two-phase distinct aggregate."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))).alias(
            "span_days"
        ),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@query(
    "rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), TIMESTAMP '2002-01-01') AS recency,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon_dec,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ), q AS (
      SELECT CAST(quantile_cont(recency, 0.5) AS DOUBLE) AS r_med,
             CAST(quantile_cont(frequency, 0.5) AS DOUBLE) AS f_med,
             CAST(quantile_cont(monetary, 0.5) AS DOUBLE) AS m_med
      FROM rfm
    )
    SELECT (CASE WHEN recency <= r_med THEN 'R1' ELSE 'R0' END
            || CASE WHEN frequency > f_med THEN 'F1' ELSE 'F0' END
            || CASE WHEN monetary > m_med THEN 'M1' ELSE 'M0' END) AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(mon_dec) AS DOUBLE) AS segment_value
    FROM rfm, q GROUP BY 1
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    median splits — the classic marketing-analytics workflow KNIME
    builds from GroupBy + Auto-Binner + Rule Engine nodes, as one
    query): per-customer RFM from one orders aggregation, exact-median
    fences broadcast back, 8 segments with counts and value. The
    monetary sums are decimal-exact, so segment_value is
    engine-identical."""
    o = _t(spark, sf_dir, "orders")
    # monetary rides in BOTH forms: double for the median fence /
    # segment compare, decimal for the outer sum (a double sum over a
    # segment would be summation-order-dependent across engines)
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("timestamp_ntz"), F.max("o_orderdate")
        ).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_dec("o_totalprice")).alias("mon_dec"),
        F.sum(_dec("o_totalprice")).cast("double").alias("monetary"),
    )
    q = rfm.agg(
        F.percentile("recency", F.lit(0.5)).alias("r_med"),
        F.percentile("frequency", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("recency") <= F.col("r_med"), "R1").otherwise("R0"),
        F.when(F.col("frequency") > F.col("f_med"), "F1").otherwise("F0"),
        F.when(F.col("monetary") > F.col("m_med"), "M1").otherwise("M0"),
    )
    return (
        rfm.crossJoin(F.broadcast(q))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon_dec").cast("double").alias("segment_value"),
        )
    )


@query(
    "knn_classify",
    """
    WITH nb AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                          / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                             * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6)
                          DESC, c.vec_id) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10 AND c.vec_id >= 10
      ) WHERE rank <= 5
    ), votes AS (
      SELECT nb.query_id, e.label, COUNT(*) AS cnt
      FROM nb JOIN embeddings e ON e.vec_id = nb.neighbor_id
      GROUP BY nb.query_id, e.label
    )
    SELECT query_id, label AS pred_label, CAST(cnt AS BIGINT) AS votes FROM (
      SELECT query_id, label, cnt,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cnt DESC, label) AS r
      FROM votes
    ) WHERE r = 1
    """,
)
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-NN classification (the KNIME K Nearest Neighbor
    node): exact cosine top-5 among the labeled corpus (vec_id ≥ 10)
    for each query vector, then majority vote with a deterministic
    tie-break (most votes, then smallest label). The neighbor search is
    the broadcast + WindowGroupLimit brute-force tier; votes aggregate
    per query; the winner is min(struct(-votes, label)) — no second
    window over the data."""
    from knime_core_columnar_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    nb = brute_force_topk(
        e.filter("vec_id >= 10"), e.filter("vec_id < 10"), k=5
    ).select("query_id", "neighbor_id")
    votes = (
        nb.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    win = votes.groupBy("query_id").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
        ).alias("w")
    )
    return win.select(
        "query_id",
        F.col("w.l").alias("pred_label"),
        (-F.col("w.nc")).cast("long").alias("votes"),
    )


@query(
    "label_coherence",
    """
    WITH u AS (
      SELECT label, d, round(CAST(SUM(x6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS m
      FROM (
        SELECT label,
               generate_subscripts(embedding, 1) AS d,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x6
        FROM embeddings
      ) GROUP BY label, d
    ), c AS (
      SELECT label, list(m ORDER BY d) AS cent FROM u GROUP BY label
    ), s AS (
      SELECT e.label,
             CAST(round(
               round(list_dot_product(e.embedding::DOUBLE[], c.cent)
                     / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(c.cent, c.cent)), 0), 6)
               * 1000000) AS BIGINT) AS cos6
      FROM embeddings e JOIN c USING (label)
    )
    SELECT label, COUNT(*) AS n_vecs,
           round(CAST(SUM(cos6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_cos,
           round(CAST(MIN(cos6) AS DOUBLE) / 1000000.0, 6) AS min_cos
    FROM s GROUP BY label
    """,
)
def label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-data quality check over the labeled embedding corpus:
    per-label centroids (scaled-int64 exact means, the kmeans update
    machinery without iteration), then each vector's cosine to its OWN
    label centroid, aggregated to per-label mean/min coherence — low
    coherence flags mislabeled or heterogeneous classes before
    training. Broadcast centroids, one narrow scoring pass, scaled-int
    aggregation keeps every number engine-exact."""
    from knime_core_columnar_spark.operators.similarity import dot, l2_norm

    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("d", "x")
    ).select(
        "label",
        "d",
        F.round(F.col("x").cast("double") * 1_000_000, 0).cast("long").alias("x6"),
    )
    per_dim = dims.groupBy("label", "d").agg(
        F.round(
            F.sum("x6").cast("double") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
        ).alias("m")
    )
    cents = per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
        ).alias("cent")
    )
    scored = e.join(F.broadcast(cents), "label").select(
        "label",
        F.round(
            F.round(
                dot(F.col("embedding"), F.col("cent"))
                / F.nullif(
                    l2_norm(F.col("embedding")) * F.sqrt(dot(F.col("cent"), F.col("cent"))),
                    F.lit(0.0),
                ),
                6,
            )
            * 1_000_000,
            0,
        )
        .cast("long")
        .alias("cos6"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum("cos6").cast("double") / (F.count(F.lit(1)) * F.lit(1_000_000.0)),
            6,
        ).alias("avg_cos"),
        F.round(F.min("cos6").cast("double") / F.lit(1_000_000.0), 6).alias(
            "min_cos"
        ),
    )


@query(
    "tokenize_to_ids",
    """
    WITH t AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ), c AS (
      SELECT token, COUNT(*) AS cnt FROM t GROUP BY token HAVING COUNT(*) >= 5
    ), v AS (
      SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1 AS token_id
      FROM c
    ), w AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS token,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
      FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           string_agg(CAST(COALESCE(token_id, -1) AS VARCHAR), ',' ORDER BY pos)
             AS token_ids
    FROM w LEFT JOIN v USING (token)
    GROUP BY doc_id
    """,
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained vocabulary (text.build_vocab) to the corpus —
    the tokenize-to-ids step that turns documents into the integer
    sequences a training run consumes: per doc, the ordered token-id
    array (OOV → -1), token count, and OOV count. Scale shape: explode
    → broadcast-join the vocab (AQE; vocab ≪ corpus) → one per-doc
    collect of (pos, id) structs sorted positionally — ids identical at
    any parallelism because the vocab ids themselves are deterministic.
    The id sequence is serialized to a CSV string (the collect_sorted
    pattern): the harness canonicalizer sorts rows with pandas, which
    cannot hash list cells, so a raw array column would not be
    value-checkable."""
    from knime_core_columnar_spark.operators.text import build_vocab, tokens

    d = _t(spark, sf_dir, "documents")
    vocab = build_vocab(d, "text", min_count=5).select("token", "token_id")
    w = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )
    j = w.join(F.broadcast(vocab), "token", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("int")).alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos", F.coalesce("token_id", F.lit(-1)).alias("tid")
                        )
                    )
                ),
                lambda s: s["tid"].cast("string"),
            ),
            ",",
        ).alias("token_ids"),
    )


@query(
    "audio_stats",
    """
    WITH p AS (
      SELECT doc_id, encode(text) AS payload,
             octet_length(encode(text)) AS n
      FROM documents
    ), h AS (
      SELECT doc_id, n,
             list_transform(range(1, least(n, 256) + 1),
                            i -> ('0x' || substring(hex(payload), (i-1)*2 + 1, 2))::INT)
               AS head
      FROM p
    )
    SELECT doc_id,
           CAST(n // 2 AS BIGINT) AS n_samples,
           round(CAST(n // 2 AS DOUBLE) / 16000.0, 6) AS duration_s,
           round(CAST(list_sum(head) AS DOUBLE) / len(head), 6) AS mean_amp,
           CAST(list_max(head) AS INTEGER) AS peak_amp
    FROM h
    """,
)
def audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-tier multimodal plumbing (operators.multimodal
    .decode_audio_features): binary payloads through the Arrow-batched
    mapInPandas decode — treated as int16 PCM @ 16 kHz by the
    deterministic fake kernel (the marked swap-in point for
    soundfile/librosa) — yielding sample counts, durations, and
    amplitude stats, every value checked against the oracle's hex-byte
    replay."""
    from knime_core_columnar_spark.operators.multimodal import (
        attach_binary_payload,
        decode_audio_features,
    )

    _ensure_pkg_on_executors(spark)
    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return decode_audio_features(d, "doc_id", "payload")


@query(
    "quality_monitor_batch",
    """
    WITH d AS (
      SELECT source,
             TIMESTAMP '1970-01-01 00:00:00'
               + (1700000000 + doc_id * 60) * INTERVAL 1 SECOND AS ts,
             CAST(length(text) AS DOUBLE) AS n,
             len(string_split_regex(trim(text), '\\s+')) AS ntok,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
               / length(text) AS pr
      FROM documents
    ), q AS (
      SELECT source, date_trunc('hour', ts) AS win_start, ntok,
             CAST(round((
               (CASE WHEN n < 20 THEN n / 20.0 WHEN n > 4000 THEN 0.5 ELSE 1.0 END) * 0.4
               + (1.0 - least(pr * 5.0, 1.0)) * 0.3
               + (CASE WHEN n / ntok >= 3.0 AND n / ntok <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.3
             ) * 1000000) AS BIGINT) AS q6
      FROM d
    )
    SELECT win_start, source, COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(q6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_quality,
           CAST(SUM(CASE WHEN q6 < 800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
    FROM q GROUP BY win_start, source
    """,
)
def quality_monitor_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming corpus-quality monitor
    (streaming.corpus_quality_monitor) run in batch mode — the SAME
    code executes as a readStream in production; here the driver
    value-checks it against SQL (1-hour tumbling windows align to epoch
    hours, so the oracle's date_trunc replays Spark's window()). The
    stream/batch parity itself is pinned by
    test_corpus_quality_monitor_stream_matches_batch."""
    from knime_core_columnar_spark.streaming.ops import corpus_quality_monitor

    # tz-free synthetic event time (NTZ + interval arithmetic): neither
    # side of the oracle comparison may depend on a session timezone
    d = _t(spark, sf_dir, "documents").withColumn(
        "ts",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        + F.make_interval(
            secs=(F.lit(1_700_000_000) + F.col("doc_id") * 60).cast("decimal(18,6)")
        ),
    )
    return corpus_quality_monitor(d, window="1 hour", watermark=None)


@query(
    "anomaly_hours",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS nh,
             CAST(SUM(n) AS DOUBLE) AS s,
             CAST(SUM(n * n) AS DOUBLE) AS sq
      FROM h GROUP BY event_type
    )
    SELECT event_type, hour, n,
           round((n - s / nh)
                 / nullif(sqrt((nh * sq - s * s) / (nh * (nh - 1))), 0), 6) AS z
    FROM h JOIN m USING (event_type)
    WHERE abs((n - s / nh)
              / nullif(sqrt((nh * sq - s * s) / (nh * (nh - 1))), 0)) > 2.0
    """,
)
def anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: hourly counts per event type,
    z-scored against that type's own distribution (exact integer moment
    sums → closed-form mean/stddev), hours beyond 2σ flagged — the
    monitoring query a pipeline runs over ingestion telemetry. Two
    partial-aggregated passes (hourly rollup, per-type moments) and a
    broadcast join back; integer moments make the flags engine-exact.
    The hourly rollup IS streaming.hourly_counts (one shared
    definition with the events_hourly monitoring query, ntz-typed) —
    the z-scores flag the same series the dashboards show."""
    from knime_core_columnar_spark.streaming.ops import hourly_counts

    e = _t(spark, sf_dir, "events")
    h = hourly_counts(e).withColumnRenamed("hr", "hour")
    m = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nh"),
        F.sum("n").cast("double").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("sq"),
    )
    nh, s, sq = F.col("nh"), F.col("s"), F.col("sq")
    z = (F.col("n") - s / nh) / F.nullif(
        F.sqrt((nh * sq - s * s) / (nh * (nh - 1))), F.lit(0.0)
    )
    return (
        h.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 2.0)
        .select("event_type", "hour", "n", F.round(z, 6).alias("z"))
    )


@query(
    "entity_resolution",
    """
    WITH RECURSIVE p AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[-1] AS block FROM part
    ), pairs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM p a JOIN p b ON a.block = b.block AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS entity FROM reach GROUP BY node
    ), assign AS (
      SELECT p.p_partkey, COALESCE(comp.entity, p.p_partkey) AS entity_id
      FROM p LEFT JOIN comp ON comp.node = p.p_partkey
    )
    SELECT entity_id, COUNT(*) AS n_records
    FROM assign GROUP BY entity_id HAVING COUNT(*) > 1
    """,
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage end-to-end, TWO-TIER:

    1. EXACT tier — identical names collapse to one representative per
       name (min p_partkey) with a single hash aggregation. Identical
       rows are the bulk of real duplicate mass, and every same-name
       pair trivially verifies (lev = 0), so carrying them into the
       fuzzy tier would square the edge count for nothing (measured at
       sf0.1: 5.5 M part-level edges vs 24 distinct-name edges).
    2. FUZZY tier — blocking (last name token) → length-gap pre-filter
       (lev >= |Δlen|) → THRESHOLDED Levenshtein (banded DP, early exit;
       returns -1 past the threshold so >= 0 <=> lev <= 2) →
       connected components over the REPRESENTATIVE graph (same
       min-label propagation as the near-dup pipeline).

    The collapse is exact, not an approximation: same-name records form
    cliques in the record-level graph, so contracting each clique to
    its min-id node preserves components and the min-id entity label.
    At 100 TB the exact tier is one shuffle on the join key and the
    fuzzy tier's cost scales with DISTINCT values, not rows — when all
    names are unique it degenerates to the original record-level plan.
    Output: multi-record entities with sizes — the merge queue a data
    steward reviews. Oracle replays the closure as a recursive CTE over
    record-level pairs — a different evaluation strategy validating
    both the Spark loop and the clique contraction."""
    from knime_core_columnar_spark.operators.dedup import connected_components

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    names = p.groupBy("p_name", "block").agg(
        F.min("p_partkey").alias("rep"), F.count(F.lit(1)).alias("cnt")
    )
    a = names.select(
        F.col("rep").alias("id_a"), F.col("p_name").alias("name_a"), "block"
    )
    b = names.select(
        F.col("rep").alias("id_b"), F.col("p_name").alias("name_b"), "block"
    )
    pairs = (
        a.join(b, ["block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .filter(F.levenshtein("name_a", "name_b", 2) >= 0)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b")
    name_entity = names.join(comp, names["rep"] == comp["node"], "left").select(
        "p_name", F.coalesce(F.col("label"), F.col("rep")).alias("entity_id")
    )
    assign = p.join(name_entity, "p_name").select("p_partkey", "entity_id")
    return (
        assign.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


@query(
    "incremental_agg_merge",
    """
    WITH base AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
      GROUP BY o_orderpriority
    ), delta AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY o_orderpriority
    ), merged AS (
      SELECT o_orderpriority,
             CAST(SUM(n) AS BIGINT) AS n,
             SUM(s) AS s
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           CAST(s AS DOUBLE) AS total_price,
           round(CAST(s AS DOUBLE) / n, 6) AS avg_price
    FROM merged
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the mergeable-partials
    pattern every incremental ETL relies on: a historical partial
    aggregate (count + decimal-exact sum per key) merged with a fresh
    delta partition's partials WITHOUT re-scanning history. Count and
    sum are mergeable; avg derives at read time from the merged
    moments. The oracle recomputes the same merge; equality proves the
    partials lose nothing."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01").cast("timestamp_ntz")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum(_dec("o_totalprice")).alias("s")
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "o_orderpriority",
        "n",
        F.col("s").cast("double").alias("total_price"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_price"),
    )


@query(
    "token_shards",
    """
    WITH ordered AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '|epoch0') AS h,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM ordered
    )
    SELECT CAST(prefix // 5000 AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM c GROUP BY prefix // 5000
    """,
)
def token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment — the greedy sharding pass that
    splits a shuffled corpus into ~5000-token output shards:
    shard = exclusive-prefix-token-sum // budget over the stable
    epoch-shuffle order. The prefix sum comes from
    sampling.distributed_cumsum (two-phase scan: per-partition totals →
    broadcast offsets → local running sums) — exact integer math,
    identical to the oracle's single ``SUM() OVER`` window but WITHOUT
    funnelling 100 TB through one reducer."""
    from knime_core_columnar_spark.operators.sampling import distributed_cumsum
    from knime_core_columnar_spark.operators.text import token_count

    d = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit("epoch0"))).alias("h"),
            token_count("text").cast("long").alias("n_tokens"),
        )
    )
    c = distributed_cumsum(
        d,
        [F.col("h"), F.col("doc_id")],
        F.col("n_tokens"),
        out_col="prefix",
        exclusive=True,
    )
    return (
        # integer division (div), NOT double /: exact at any prefix size
        c.withColumn("shard_id", F.expr("prefix div 5000"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )


@query(
    "correlation_matrix",
    """
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_p,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_d,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq_q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sq_p,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sq_d,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_qp,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_qd,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_pd
      FROM lineitem
    )
    SELECT 'quantity' AS var_a, 'extendedprice' AS var_b,
           round((n * s_qp - s_q * s_p)
                 / nullif(sqrt(n * sq_q - s_q * s_q) * sqrt(n * sq_p - s_p * s_p), 0), 6) AS corr
    FROM m
    UNION ALL
    SELECT 'quantity', 'discount',
           round((n * s_qd - s_q * s_d)
                 / nullif(sqrt(n * sq_q - s_q * s_q) * sqrt(n * sq_d - s_d * s_d), 0), 6)
    FROM m
    UNION ALL
    SELECT 'extendedprice', 'discount',
           round((n * s_pd - s_p * s_d)
                 / nullif(sqrt(n * sq_p - s_p * s_p) * sqrt(n * sq_d - s_d * s_d), 0), 6)
    FROM m
    """,
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (the KNIME Linear Correlation
    node): ALL pairwise correlations of the selected numeric columns
    from ONE aggregation pass — 9 decimal-exact moment sums, then each
    pair's closed form in doubles. One scan however many variables;
    long-form output (var_a, var_b, corr)."""
    li = _t(spark, sf_dir, "lineitem")
    q, p, d = _dec("l_quantity"), _dec("l_extendedprice"), _dec("l_discount")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s_q"),
        F.sum(p).cast("double").alias("s_p"),
        F.sum(d).cast("double").alias("s_d"),
        F.sum(q * q).cast("double").alias("sq_q"),
        F.sum(p * p).cast("double").alias("sq_p"),
        F.sum(d * d).cast("double").alias("sq_d"),
        F.sum(q * p).cast("double").alias("s_qp"),
        F.sum(q * d).cast("double").alias("s_qd"),
        F.sum(p * d).cast("double").alias("s_pd"),
    )
    n = F.col("n")

    def corr(sa, sb, sqa, sqb, sab):
        return F.round(
            (n * F.col(sab) - F.col(sa) * F.col(sb))
            / F.nullif(
                F.sqrt(n * F.col(sqa) - F.col(sa) * F.col(sa))
                * F.sqrt(n * F.col(sqb) - F.col(sb) * F.col(sb)),
                F.lit(0.0),
            ),
            6,
        )

    pairs = F.array(
        F.struct(
            F.lit("quantity").alias("var_a"),
            F.lit("extendedprice").alias("var_b"),
            corr("s_q", "s_p", "sq_q", "sq_p", "s_qp").alias("corr"),
        ),
        F.struct(
            F.lit("quantity").alias("var_a"),
            F.lit("discount").alias("var_b"),
            corr("s_q", "s_d", "sq_q", "sq_d", "s_qd").alias("corr"),
        ),
        F.struct(
            F.lit("extendedprice").alias("var_a"),
            F.lit("discount").alias("var_b"),
            corr("s_p", "s_d", "sq_p", "sq_d", "s_pd").alias("corr"),
        ),
    )
    return m.select(F.explode(pairs).alias("__p")).select(
        "__p.var_a", "__p.var_b", "__p.corr"
    )


@query(
    "equal_freq_binning",
    """
    WITH q AS (
      SELECT CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS q1,
             CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS q2,
             CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= q1 THEN 0
                WHEN o_totalprice <= q2 THEN 1
                WHEN o_totalprice <= q3 THEN 2
                ELSE 3 END AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders, q GROUP BY 1
    """,
)
def equal_freq_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quartile) binning — the KNIME Auto-Binner's
    second mode: exact continuous-interpolation quartiles from one
    aggregate, broadcast back; bin membership by closed upper fences.
    Same percentile machinery the driver already value-checks in
    iqr_outliers."""
    o = _t(spark, sf_dir, "orders")
    q = o.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    v = F.col("o_totalprice")
    bin_ = (
        F.when(v <= F.col("q1"), 0)
        .when(v <= F.col("q2"), 1)
        .when(v <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(q))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@query(
    "mad_outliers",
    """
    WITH med AS (
      SELECT l_returnflag, CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS m
      FROM lineitem GROUP BY l_returnflag
    ), mad AS (
      SELECT l_returnflag, m,
             CAST(quantile_cont(abs(l_quantity - m), 0.5) AS DOUBLE) AS mad
      FROM lineitem JOIN med USING (l_returnflag)
      GROUP BY l_returnflag, m
    )
    SELECT l_returnflag, round(m, 6) AS median_qty, round(mad, 6) AS mad_qty,
           COUNT(*) AS n_outliers
    FROM lineitem JOIN mad USING (l_returnflag)
    WHERE abs(l_quantity - m) > 1.4 * mad
    GROUP BY l_returnflag, m, mad
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (the
    robust sibling of iqr_outliers; 1.4·MAD fences fit the synthetic
    tails): two exact-percentile aggregates — median, then median of
    absolute deviations — each broadcast back over the scan. Nested
    robust statistics stay differentially testable because Spark's
    percentile() and DuckDB's quantile_cont interpolate identically."""
    li = _t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("m")
    )
    j = li.join(F.broadcast(med), "l_returnflag")
    mad = j.groupBy("l_returnflag", "m").agg(
        F.percentile(F.abs(F.col("l_quantity") - F.col("m")), F.lit(0.5)).alias(
            "mad"
        )
    )
    return (
        li.join(F.broadcast(mad), "l_returnflag")
        .filter(F.abs(F.col("l_quantity") - F.col("m")) > 1.4 * F.col("mad"))
        .groupBy("l_returnflag", "m", "mad")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .select(
            "l_returnflag",
            F.round("m", 6).alias("median_qty"),
            F.round("mad", 6).alias("mad_qty"),
            "n_outliers",
        )
    )


@query(
    "weighted_sample",
    """
    WITH p AS (
      SELECT doc_id, n_chars,
             -ln(((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|wsample'), 1, 15))::BIGINT
                   % 10000) + 0.5) / 10000.0)
               / CAST(n_chars AS DOUBLE) AS prio
      FROM documents
    )
    SELECT doc_id, n_chars
    FROM p ORDER BY prio, doc_id LIMIT 100
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling without replacement
    (operators.sampling.weighted_sample_topk, the A-ExpJ exponential
    race): inclusion probability ∝ n_chars, yet fully deterministic —
    the uniform draw is the stable key hash, so the same corpus always
    yields the same sample at any parallelism. Top-100 by priority via
    per-partition heaps (TakeOrderedAndProject).

    The priority itself is NOT in the compared output: DuckDB's ln()
    differs from the JVM's by 1 ulp (measured), so the float is not
    hash-comparable — but the SELECTED SET is stable because distinct
    priorities differ by many orders of magnitude more than 1 ulp; the
    oracle checks the actual sampled ids."""
    from knime_core_columnar_spark.operators.sampling import weighted_sample_topk

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(d, ["doc_id"], F.col("n_chars"), k=100).select(
        "doc_id", "n_chars"
    )


@query(
    "vocab_build",
    """
    WITH v AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ), c AS (
      SELECT token, COUNT(*) AS count FROM v GROUP BY token HAVING COUNT(*) >= 5
    )
    SELECT token, count,
           ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS token_id
    FROM c
    """,
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vocabulary construction (operators.text.build_vocab):
    corpus token frequencies with dense frequency-ranked ids — the
    tokenizer-training primitive. Ids come from a range-partitioned
    sort + per-partition offsets (zipWithIndex trick), not a
    single-task global window, so the id assignment distributes for
    very large vocabularies."""
    from knime_core_columnar_spark.operators.text import build_vocab

    d = _t(spark, sf_dir, "documents")
    return build_vocab(d, "text", min_count=5)


@query(
    "kmeans_clusters",
    """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS c
      FROM (
        SELECT vec_id, embedding,
               ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|kmeans-seeds'), 1, 15))::BIGINT
                 % 10000 AS h
        FROM embeddings
      ), nn
      WHERE h <= least(10000, CAST(floor(320000.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, seeds s
      ) WHERE rk = 1
    ),
    u1 AS (
      SELECT cell_id, d, round(CAST(SUM(x6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS m
      FROM (
        SELECT a1.cell_id,
               generate_subscripts(e.embedding, 1) AS d,
               CAST(round(CAST(unnest(e.embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x6
        FROM embeddings e JOIN a1 USING (vec_id)
      ) GROUP BY cell_id, d
    ),
    c1 AS (SELECT cell_id, list(m ORDER BY d) AS c FROM u1 GROUP BY cell_id),
    a2 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, c1 s
      ) WHERE rk = 1
    ),
    u2 AS (
      SELECT cell_id, d, round(CAST(SUM(x6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS m
      FROM (
        SELECT a2.cell_id,
               generate_subscripts(e.embedding, 1) AS d,
               CAST(round(CAST(unnest(e.embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x6
        FROM embeddings e JOIN a2 USING (vec_id)
      ) GROUP BY cell_id, d
    ),
    c2 AS (SELECT cell_id, list(m ORDER BY d) AS c FROM u2 GROUP BY cell_id)
    SELECT a2.cell_id, COUNT(*) AS n_members,
           round(sqrt(list_dot_product(any_value(c2.c), any_value(c2.c))), 6)
             AS centroid_norm
    FROM a2 JOIN c2 USING (cell_id)
    GROUP BY a2.cell_id
    """,
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means, k=8, two fixed Lloyd iterations
    (operators.clustering.kmeans_lite — the KNIME k-Means node's
    capability, Spark-first): hash-sampled seeds, broadcast argmin
    assignment, scaled-int64 exact centroid updates. The ENTIRE
    iterative algorithm — both assignments, both updates — is unrolled
    in the oracle and value-checked, demonstrating that fixed-iteration
    ML loops remain differentially testable."""
    from knime_core_columnar_spark.operators.clustering import kmeans_lite

    e = _t(spark, sf_dir, "embeddings")
    return kmeans_lite(
        e, k=8, iters=2, corpus_count=_parquet_rows(sf_dir, "embeddings")
    )


@query(
    "minmax_normalize",
    """
    WITH mm AS (
      SELECT l_returnflag,
             CAST(MIN(l_quantity) AS DOUBLE) AS mn,
             CAST(MAX(l_quantity) AS DOUBLE) AS mx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS _row_key,
           round((l_quantity - mn) / nullif(mx - mn, 0), 6) AS qty_01
    FROM lineitem JOIN mm USING (l_returnflag)
    """,
)
def minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max [0,1] normalization per group (the KNIME Normalizer
    node's min-max mode, sibling of zscore_normalize): exact per-group
    extrema from one partial-aggregated pass, broadcast back; per-row
    scaling is deterministic double arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    mm = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").cast("double").alias("mn"),
        F.max("l_quantity").cast("double").alias("mx"),
    )
    # nullif guard: a constant group (mx == mn) yields NULL in BOTH
    # engines — DuckDB's IEEE division would return Inf/NaN while
    # Spark's returns NULL, a latent oracle divergence otherwise
    return li.join(F.broadcast(mm), "l_returnflag").select(
        F.concat_ws("_", "l_orderkey", "l_linenumber").alias("_row_key"),
        F.round(
            (F.col("l_quantity") - F.col("mn"))
            / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0)),
            6,
        ).alias("qty_01"),
    )


@query(
    "ols_simple_regression",
    """
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n, 6)
             AS intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
    FROM m
    """,
)
def ols_simple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple linear regression per group (the KNIME Linear Regression
    learner, univariate case): slope/intercept/R² from decimal-EXACT
    moment sums in one partial-aggregated pass — closed-form doubles,
    bit-stable at any parallelism (same machinery as moment_stats). The
    100 TB path for OLS with one predictor: no gradient iterations, no
    collect."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = _dec("l_quantity"), _dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # nullif guards: constant-x groups give NULL slope/r2 in BOTH
    # engines instead of Spark-NULL-vs-DuckDB-Inf divergence
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / F.nullif((n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)),
            6,
        ).alias("r2"),
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_7'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 (Suppliers Who Kept Orders Waiting) adapted to the
    synthetic schema: no l_receiptdate/l_commitdate exist, so "late" is
    l_shipdate > o_orderdate + 60 days — the multi-supplier EXISTS /
    sole-late-supplier NOT EXISTS shape is intact. Spark-first: the two
    correlated subqueries collapse into ONE per-order aggregation
    (distinct suppliers, distinct LATE suppliers); a lineitem qualifies
    iff it is late, the order has ≥2 suppliers, and exactly one
    supplier shipped late. One lineitem⋈orders shuffle, one per-order
    agg joined back, supplier/nation broadcast, TakeOrdered top-100 —
    no semi/anti join pair over the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qualifying = (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        qualifying.join(
            F.broadcast(s.join(n, s["s_nationkey"] == n["n_nationkey"])),
            qualifying["l_suppkey"] == s["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "equal_width_binning",
    """
    WITH mm AS (
      SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS mn,
             CAST(MAX(o_totalprice) AS DOUBLE) AS mx
      FROM orders
    ), b AS (
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE CAST(least(9, floor((o_totalprice - mn) / ((mx - mn) / 10.0))) AS INT)
             END AS bin,
             mn, mx, o_totalprice
      FROM orders, mm
    )
    SELECT bin,
           round(mn + bin * ((mx - mn) / 10.0), 6) AS bin_lo,
           round(mn + (bin + 1) * ((mx - mn) / 10.0), 6) AS bin_hi,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM b GROUP BY bin, mn, mx
    """,
)
def equal_width_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width auto-binning (the KNIME Auto-Binner node's
    equal-width mode): 10 bins spanning [min, max], the top edge closed
    (least(9, ...) puts v = max in the last bin). Min/max come from one
    exact aggregate broadcast back over the scan; bin assignment is
    deterministic double arithmetic; per-bin totals are decimal-exact."""
    o = _t(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").cast("double").alias("mn"),
        F.max("o_totalprice").cast("double").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / 10.0
    # constant column (mx == mn): everything lands in bin 0 in BOTH
    # engines rather than dividing by zero
    b = o.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(9),
                F.floor((F.col("o_totalprice") - F.col("mn")) / width),
            ).cast("int")
        )
        .alias("bin"),
        "mn",
        "mx",
        "o_totalprice",
    )
    return b.groupBy("bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    ).select(
        "bin",
        F.round(F.col("mn") + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.col("mn") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
        "n",
        "total",
    )


@query(
    "spearman_corr",
    """
    WITH r AS (
      SELECT l_returnflag,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rq2,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS rp2
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(rq2 AS DECIMAL(19,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(rp2 AS DECIMAL(19,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rq2 AS DECIMAL(19,0)) * CAST(rq2 AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(rp2 AS DECIMAL(19,0)) * CAST(rp2 AS DECIMAL(19,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rq2 AS DECIMAL(19,0)) * CAST(rp2 AS DECIMAL(19,0))) AS DOUBLE) AS sxy
      FROM r GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0),
                 6) AS spearman
    FROM s
    """,
)
def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group (operators.relational
    .spearman — the KNIME Rank Correlation node): doubled average ranks
    in exact integer space, decimal moment sums, Pearson-on-ranks
    closed form. Two window sorts + one aggregation; no UDFs."""
    from knime_core_columnar_spark.operators.relational import spearman

    li = _t(spark, sf_dir, "lineitem")
    return spearman(li, "l_quantity", "l_extendedprice", ["l_returnflag"])


@query(
    "crosstab_chi2",
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS observed
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), t AS (
      SELECT o_orderpriority, o_orderstatus, observed,
             SUM(observed) OVER (PARTITION BY o_orderpriority) AS row_tot,
             SUM(observed) OVER (PARTITION BY o_orderstatus) AS col_tot,
             SUM(observed) OVER () AS grand_tot
      FROM c
    )
    SELECT o_orderpriority, o_orderstatus, observed,
           round(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                 / CAST(grand_tot AS DOUBLE), 6) AS expected,
           round(pow(CAST(observed AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                       / CAST(grand_tot AS DOUBLE), 2)
                 / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                    / CAST(grand_tot AS DOUBLE)), 6) AS chi2_contrib
    FROM t
    """,
)
def crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table with chi-square contributions (the KNIME
    Crosstab node): one exact count aggregation, row/column/grand
    totals as window sums over the tiny cell table (never over the fact
    table), expected counts and χ² cell contributions in closed-form
    doubles. The full-table χ² is the sum of the published cells."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("observed")
    )
    t = c.select(
        "o_orderpriority",
        "o_orderstatus",
        "observed",
        F.sum("observed").over(Window.partitionBy("o_orderpriority")).alias("row_tot"),
        F.sum("observed").over(Window.partitionBy("o_orderstatus")).alias("col_tot"),
        F.sum("observed").over(
            Window.partitionBy()
        ).alias("grand_tot"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand_tot").cast("double")
    )
    return t.select(
        "o_orderpriority",
        "o_orderstatus",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(
            F.pow(F.col("observed").cast("double") - expected, F.lit(2)) / expected, 6
        ).alias("chi2_contrib"),
    )


@query(
    "impute_timeseries",
    """
    WITH m AS (
      SELECT event_id, user_id,
             CASE WHEN ('0x' || substring(md5(CAST(event_id AS VARCHAR) || '|gap'), 1, 15))::BIGINT
                       % 10000 >= 2000
                  THEN value END AS v
      FROM events
    ), w AS (
      SELECT event_id, user_id, v,
             last_value(v IGNORE NULLS) OVER fw AS pv,
             first_value(v IGNORE NULLS) OVER bw AS nv,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
               OVER fw AS px,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
               OVER bw AS nx,
             CAST(SUM(CAST(v AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS DOUBLE)
               / COUNT(v) OVER (PARTITION BY user_id) AS mean_v
      FROM m
      WINDOW fw AS (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             bw AS (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, v,
           COALESCE(v, pv) AS v_ffill,
           COALESCE(v, nv) AS v_bfill,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE round(pv + (nv - pv) * (CAST(event_id AS DOUBLE) - px) / (nx - px), 6)
           END AS v_linear,
           COALESCE(v, round(mean_v, 6)) AS v_mean
    FROM w
    """,
)
def impute_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation (operators.impute.impute — the KNIME
    Missing Value node's strategy family): 20% of event values are
    deterministically masked to NULL (stable md5 gap mask), then filled
    four ways in one window stage — previous, next, linear
    interpolation on the event_id axis, and decimal-exact partition
    mean. Every filled cell is value-checked against the SQL replay."""
    from knime_core_columnar_spark.operators.impute import impute
    from knime_core_columnar_spark.operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    d = e.withColumn(
        "v", F.when(hash_bucket(["event_id"], "gap") >= 2000, F.col("value"))
    ).drop("value")
    d = impute(d, "v", "event_id", ["user_id"], "previous", "v_ffill")
    d = impute(d, "v", "event_id", ["user_id"], "next", "v_bfill")
    d = impute(d, "v", "event_id", ["user_id"], "linear", "v_linear")
    d = impute(d, "v", "event_id", ["user_id"], "mean", "v_mean")
    return d


@query(
    "segment_dedup",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    ), w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM corpus
    ), c0 AS (
      SELECT doc_id, CAST((i - 1) // 15 AS INT) AS cid, word, i FROM w
    ), c AS (
      SELECT doc_id, cid, string_agg(word, ' ' ORDER BY i) AS chunk
      FROM c0 GROUP BY doc_id, cid
    ), k AS (
      SELECT doc_id, cid, chunk,
             ROW_NUMBER() OVER (PARTITION BY substring(md5(chunk), 1, 16)
                                ORDER BY doc_id, cid) = 1 AS kept
      FROM c
    )
    SELECT doc_id, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN kept THEN chunk END, ' ' ORDER BY cid), '')
             AS dedup_text
    FROM k GROUP BY doc_id
    """,
)
def segment_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level exact dedup (operators.dedup.segment_dedup): the
    corpus is documents plus a mirrored copy of every 7th doc (simulating
    syndicated/mirrored pages); each 15-word segment survives only at its
    first (doc_id, position) occurrence and documents are reassembled
    from surviving segments. Mirrors therefore come back with
    n_kept = 0 and empty text while originals are untouched — every
    byte of the rewrite is value-checked against the oracle's
    window-function replay."""
    from knime_core_columnar_spark.operators.dedup import segment_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mirrors = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return segment_dedup(d.unionByName(mirrors))


@query(
    "unigram_lm_quality",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    ), v AS (
      SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
    ), t AS (
      SELECT CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) AS tot
      FROM documents
    ), lp AS (
      SELECT word, cnt,
             CAST(round(round(ln(CAST(cnt AS DOUBLE) / tot), 6) * 1000000)
               AS BIGINT) AS lp6
      FROM v, t
    )
    SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           round(CAST(SUM(lp6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_logprob
    FROM w JOIN lp USING (word) GROUP BY doc_id
    """,
)
def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM scoring (operators.text
    .unigram_logprob): mean token log-probability per document — the
    KenLM-free perplexity-style quality gate. Per-token log-probs are
    rounded and scaled to int64 BEFORE summing, so the per-doc
    aggregation is exact integer math on both engines (summation-order
    independent); the oracle replays the identical two-pass train+score
    pipeline in SQL."""
    from knime_core_columnar_spark.operators.text import unigram_logprob

    d = _t(spark, sf_dir, "documents")
    return unigram_logprob(d, "doc_id", "text", rare_threshold=5)


@query(
    "source_quality_rollup",
    """
    WITH t0 AS (
      SELECT source, CAST(length(text) AS DOUBLE) AS n,
             len(string_split_regex(trim(text), '\\s+')) AS ntok,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
               / length(text) AS pr,
             length(text) AS nchars
      FROM documents
    ), q AS (
      SELECT source, ntok, nchars,
             CAST(round((
               (CASE WHEN n < 20 THEN n / 20.0 WHEN n > 4000 THEN 0.5 ELSE 1.0 END) * 0.4
               + (1.0 - least(pr * 5.0, 1.0)) * 0.3
               + (CASE WHEN n / ntok >= 3.0 AND n / ntok <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.3
             ) * 1000000) AS BIGINT) AS q6
      FROM t0
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           CAST(SUM(nchars) AS BIGINT) AS total_chars,
           round(CAST(SUM(q6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_quality,
           CAST(SUM(CASE WHEN q6 < 800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
    FROM q GROUP BY source
    """,
)
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality rollup — the domain-level curation view (keep
    or drop whole sources by aggregate quality, as web pipelines do per
    domain): document counts, token/char budgets, mean composite quality
    (scaled-int64 exact aggregation of the per-row score), and the count
    of low-quality docs per source. One scan, one partial-aggregated
    groupBy on the source key."""
    from knime_core_columnar_spark.operators import text as X

    d = _t(spark, sf_dir, "documents")
    q6 = F.round(X.quality_score("text") * 1_000_000, 0).cast("long")
    per = d.select(
        "source",
        q6.alias("q6"),
        X.token_count("text").alias("ntok"),
        F.length("text").alias("nchars"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("total_tokens"),
        F.sum("nchars").alias("total_chars"),
        F.round(
            F.sum("q6").cast("double") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
        ).alias("avg_quality"),
        F.sum((F.col("q6") < 800_000).cast("int")).alias("n_low_quality"),
    )


@query(
    "mixture_by_lang",
    """
    WITH b AS (
      SELECT lang,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, 15))::BIGINT
               % 10000 AS bkt,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ntok
      FROM documents
    ), k AS (
      SELECT lang, ntok,
             CASE WHEN lang = 'en' THEN bkt < 3000
                  WHEN lang = 'de' THEN bkt < 10000
                  WHEN lang = 'fr' THEN bkt < 10000
                  WHEN lang = 'es' THEN bkt < 8000
                  ELSE bkt < 1000 END AS kept
      FROM b
    )
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(ntok) AS BIGINT) AS w_total,
           CAST(SUM(CASE WHEN kept THEN ntok ELSE 0 END) AS BIGINT) AS w_kept
    FROM k GROUP BY lang
    """,
)
def mixture_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture audit (operators.sampling.mixture_report):
    deterministic per-language keep-decisions (downsample dominant
    English to 30%, keep the rest at 100/100/80/10%) reported as
    total vs kept rows and token weights per language — the mixing-ratio
    / token-budget check a pipeline runs before materializing an epoch.
    The keep bit is the stable row-key hash, so the report is an exact
    preview of what stratified_sample would emit."""
    from knime_core_columnar_spark.operators.sampling import mixture_report
    from knime_core_columnar_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    return mixture_report(
        d,
        ["doc_id"],
        "lang",
        {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 0.8},
        weight_col=F.col("n_tokens"),
        default_fraction=0.1,
        salt="mix",  # the oracle embeds '|mix' in its md5 literals
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


# ---------------------------------------------------------------------------
# Avro source/sink (SURVEY §2.4 — the one remaining format gap; the
# spark-avro jar is absent from this container, so the pure-Python
# container codec in sources/avro.py carries the roundtrip)
# ---------------------------------------------------------------------------

@query(
    "avro_roundtrip",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS _row_key,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity Avro container roundtrip: customer exported once to
    deflate-compressed .avro (one file per partition, encoded
    executor-side), read back through ``read_avro`` — which, with no
    spark-avro jar in this container, exercises the pure-Python Avro 1.11
    decoder's distributed tier (binaryFile + per-file mapInPandas decode,
    sources/avro.py). Longs/doubles/strings are binary-exact through the
    Avro wire format, so the result hashes identically to the parquet
    oracle."""
    import os

    from knime_core_columnar_spark.sources.avro import write_avro
    from knime_core_columnar_spark.sources.io import read_avro

    _ensure_pkg_on_executors(spark)
    tag = _artifact_tag(sf_dir, "customer")
    avro_dir = f"/tmp/kccs_customer_avro_{tag}"
    if not os.path.isdir(avro_dir):
        staging = f"{avro_dir}.part{os.getpid()}"
        write_avro(_t(spark, sf_dir, "customer"), staging, codec="deflate")
        _publish_dir(staging, avro_dir)
    t = read_avro(spark, avro_dir, key_columns=["c_custkey"])
    return t.df.select(
        "_row_key", "c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# Graph + sequence analytics (round-4 batch; registered AFTER the driver
# window, so these queue for the round-5/6 correctness windows)
# ---------------------------------------------------------------------------

@query(
    "event_transitions",
    """
    WITH p AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM p WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), t AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n AS DOUBLE) / t.tot AS prob
    FROM c JOIN t ON t.from_type = c.from_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the standard behavioral
    model input. One window pass (lead over user-partitioned,
    (ts, event_id)-tie-broken order — the window shuffle partitions by
    user, so it scales with user cardinality, never a global sort),
    then a tiny (|types|² ≤ 25-row) aggregate; the totals join runs on
    that aggregate, not on the fact table. The probability is one int÷int
    IEEE division — identical operands on both engines, so hash-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return counts.join(totals, "from_type").select(
        "from_type", "to_type", "n",
        (F.col("n").cast("double") / F.col("tot")).alias("prob"),
    )


_NEARDUP_EDGE_CTE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
                JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    )
"""

_PAGERANK_ITER_SQL = """
    r{k} AS (
      SELECT n.node,
             150000 + COALESCE(CAST(SUM(
               (prev.rank * 85) // (d.outdeg * 100)) AS BIGINT), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.b = n.node
      LEFT JOIN r{km1} prev ON prev.node = e.a
      LEFT JOIN deg d ON d.node = e.a
      GROUP BY n.node
    )
"""


@query(
    "neardup_pagerank",
    _NEARDUP_EDGE_CTE
    + """
    , nodes AS (SELECT DISTINCT a AS node FROM e),
    deg AS (SELECT a AS node, COUNT(*) AS outdeg FROM e GROUP BY a),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    """
    + ",".join(
        _PAGERANK_ITER_SQL.format(k=k, km1=k - 1) for k in (1, 2, 3)
    )
    + """
    SELECT node AS doc_id, rank FROM r3
    """,
)
def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality inside the near-duplicate graph: 3 supersteps of
    integer-scaled PageRank (operators/graph.py) over the verified LSH
    near-dup pairs — the canonical-copy-selection signal that degree
    alone misses (a doc bridging two dup clusters outranks a leaf).

    Integer micro-unit arithmetic makes the recurrence bit-identical in
    Spark and DuckDB (float PageRank is reduction-order-dependent and
    cannot be hash-compared). The oracle replays the same 3 unrolled
    iterations in SQL over the same recursive-CTE edge derivation used
    by neardup_clusters. Per superstep only (dst, int64) pairs shuffle;
    the LSH edge subtree is materialized once, not once per round."""
    from knime_core_columnar_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from knime_core_columnar_spark.operators.graph import pagerank_scaled

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    ranks = pagerank_scaled(sym, "src", "dst", iterations=3)
    return ranks.select(F.col("node").alias("doc_id"), "rank")


def _pq_oracle_sql(m: int = 4, d: int = 16, ks: int = 16, k: int = 5) -> str:
    """Unrolled PQ encode + ADC oracle: per subspace j, codes are the
    argmin of x·x + c·c − 2·x·c over the hash-sampled codebook (the
    identical float expression tree the numpy kernels accumulate —
    similarity._sq_dist_terms); the ADC distance is the fixed-order sum
    lut0 + lut1 + … — left-associative in SQL exactly as the kernel's
    j-loop accumulates."""
    def sl(col: str, j: int) -> str:  # 1-based inclusive DuckDB slice
        return f"({col})[{j * d + 1}:{(j + 1) * d}]"

    enc = ",\n".join(
        f"""
    enc{j} AS (
      SELECT vec_id, code_id FROM (
        SELECT e.vec_id, s.code_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.xs, e.xs) + list_dot_product(s.cs, s.cs)
                 - 2 * list_dot_product(e.xs, s.cs), s.code_id) AS rk
        FROM (SELECT vec_id, {sl('embedding::DOUBLE[]', j)} AS xs FROM embeddings) e,
             (SELECT code_id, {sl('c', j)} AS cs FROM seeds) s
      ) WHERE rk = 1
    )"""
        for j in range(m)
    )
    lut = ",\n".join(
        f"""
    lut{j} AS (
      SELECT q.vec_id AS query_id, s.code_id,
             list_dot_product(q.qs, q.qs) + list_dot_product(s.cs, s.cs)
             - 2 * list_dot_product(q.qs, s.cs) AS v
      FROM (SELECT vec_id, {sl('embedding::DOUBLE[]', j)} AS qs
            FROM embeddings WHERE vec_id < {k}) q,
           (SELECT code_id, {sl('c', j)} AS cs FROM seeds) s
    )"""
        for j in range(m)
    )
    enc_joins = "\n      ".join(
        f"JOIN enc{j} e{j} USING (vec_id)" for j in range(1, m)
    )
    lut_joins = "\n      ".join(
        f"JOIN lut{j} l{j} ON l{j}.code_id = e{j}.code_id "
        f"AND l{j}.query_id = l0.query_id"
        for j in range(1, m)
    )
    dist = " + ".join(f"l{j}.v" for j in range(m))
    return f"""
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS code_id, c
      FROM (
        SELECT vec_id, embedding::DOUBLE[] AS c,
               ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|pq-codebook'), 1, 15))::BIGINT
                 % 10000 AS h
        FROM embeddings
      ), nn
      WHERE h <= least(10000, CAST(floor({4 * ks * 10000}.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT {ks}
    ),
    {enc},
    {lut},
    scored AS (
      SELECT l0.query_id, e0.vec_id AS neighbor_id, {dist} AS dist
      FROM enc0 e0
      {enc_joins}
      JOIN lut0 l0 ON l0.code_id = e0.code_id
      {lut_joins}
      WHERE e0.vec_id != l0.query_id
    )
    SELECT query_id, neighbor_id, round(dist, 6) AS approx_dist, rank FROM (
      SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dist, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@query("pq_topk_adc", _pq_oracle_sql())
def pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_train/pq_encode/pq_topk):
    hash-sampled 4x16 codebooks over the 64-dim embeddings, corpus
    encoded to 4 small-int codes/row (16x smaller than the float
    vectors), 5 queries scored in the compressed domain via per-query
    ADC lookup tables. The ENTIRE pipeline — sampling, per-subspace
    argmin encode, fixed-order ADC sums, top-k — is unrolled in the SQL
    oracle and value-checked including the float distances: the kernels
    accumulate per-dimension sequentially (_sq_dist_terms) precisely so
    the doubles are bit-identical to list_dot_product arithmetic."""
    from knime_core_columnar_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    _ensure_pkg_on_executors(spark)
    e = _t(spark, sf_dir, "embeddings")
    cb = pq_train(
        e, m=4, ks=16, corpus_count=_parquet_rows(sf_dir, "embeddings")
    )
    codes = pq_encode(e, cb)
    out = pq_topk(codes, e.filter("vec_id < 5"), cb, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("approx_dist", 6).alias("approx_dist"), "rank",
    )


def _zorder_oracle_sql() -> str:
    from knime_core_columnar_spark.operators.layout import zvalue_sql

    return f"""
    SELECT event_id, user_id,
           {zvalue_sql(['user_id', 'event_id'], bits=16)} AS zval
    FROM events
    """


@query("zorder_layout", _zorder_oracle_sql())
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, event_id) — the
    multi-dimensional file-skipping layout lever (operators/layout.py:
    Delta's OPTIMIZE ZORDER BY technique, here as plain Catalyst bit
    arithmetic). ``zorder_repartition`` range-partitions on this key so
    every parquet file covers a compact hyper-rectangle and min/max
    stats prune scans on EITHER column; this query oracle-checks the key
    itself — the SQL oracle is generated from the same ``zvalue_sql``
    the equivalence test pins against the Column form, then evaluated by
    an independent engine. Exact integer bit ops: hash-identical by
    construction."""
    from knime_core_columnar_spark.operators.layout import zvalue

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id",
        zvalue(["user_id", "event_id"], bits=16).alias("zval"),
    )


# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# (registration order).  Cumulative driver-green after rounds 1-3: 98
# distinct queries (CORRECTNESS_r01 ∪ r02 ∪ r03).  Round 4 rotates the
# window onto 50 of the 55 queries that have never received a driver
# CORRECTNESS row; the remaining 5 (struct_roundtrip, map_ops,
# explode_words, array_set_ops, pct_of_total) head the round-5 window.
# Every query still runs in tools/check.py locally regardless of order.
#
# Layout after reorder:
#   slots 1-50   : _DRIVER_WINDOW_R4 (never driver-checked; round-3
#                  analytics family first, then round-2 leftovers)
#   slots 51-55  : the 5 remaining never-driver-checked queries
#   slots 56+    : the 98 cumulative driver-green queries
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R4 = [
    "kmeans_clusters", "impute_timeseries", "segment_dedup",
    "unigram_lm_quality", "q21_waiting_suppliers", "knn_classify",
    "entity_resolution", "token_shards", "correlation_matrix",
    "ann_topk_ivf", "window_rank_stats", "string_agg_sorted",
    "window_first_last", "window_ntile", "topk_ties",
    "conditional_agg", "unpivot_metrics", "date_spine",
    "json_typed_extract", "table_diff", "scd2_intervals",
    "gaps_islands", "regexp_extract_numbers", "contamination_check",
    "boilerplate_ngrams", "pii_redact", "corpus_shuffle",
    "sequence_packing", "referential_audit", "percentile_grid",
    "column_profile", "user_lifetime_stats", "rfm_segments",
    "label_coherence", "tokenize_to_ids", "audio_stats",
    "quality_monitor_batch", "anomaly_hours", "incremental_agg_merge",
    "equal_freq_binning", "mad_outliers", "weighted_sample",
    "vocab_build", "minmax_normalize", "ols_simple_regression",
    "equal_width_binning", "spearman_corr", "crosstab_chi2",
    "source_quality_rollup", "mixture_by_lang",
]

# Queries driver-verified green in CORRECTNESS_r01/r02/r03 (cumulative).
_DRIVER_GREEN_R123 = [
    "json_extract", "q12_priority_class", "concat_uniquify",
    "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "q13_custdist",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive", "q22_idle_balance",
    "asof_join_events", "asof_forward_events", "range_join_events",
    "moment_stats", "corr_stats", "ann_topk_lsh",
    "embedding_neardup_lsh", "hash_split_stats", "stratified_sample_stats",
    "zscore_normalize", "iqr_outliers", "salted_join_skew",
    "bucketed_join", "upsert_orders", "events_dedup_latest",
    "argmax_per_group", "fuzzy_match_names", "tfidf_top_terms",
    "chunk_documents", "doc_repetition", "quality_filter_flags",
    "multimodal_meta", "video_frame_sample", "session_windows_batch",
    "sliding_windows_batch", "funnel_analysis", "cohort_retention",
    "window_range_frame", "approx_aggregates", "registry_functions",
    "rearrange_cellfactory", "pivot_returns", "component_stats",
    "simple_linear_workflow", "partition_pruned_scan", "q1_pricing_summary",
    "select_project_map", "filter_rows", "slice_rows",
    "multi_slice", "concatenate_union", "append_hstack",
    "row_index", "cast_spec", "missing_value_columns",
    "join_customer_orders", "sort_topk", "distinct_rows",
    "window_topk_per_group", "join_semi", "join_anti",
    "join_left_outer", "q3_shipping_priority", "q5_local_supplier",
    "rollup_returns", "cube_orders", "grouping_sets",
    "set_intersect", "set_except", "union_distinct",
    "window_running_sum", "window_lag_lead", "window_moving_avg",
    "count_distinct_agg", "percentile_stats", "collect_sorted",
    "string_funcs", "date_funcs", "math_funcs",
    "case_when_buckets", "events_hourly", "domain_stats",
    "concat_regenerate", "text_stats", "text_quality_lang",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ngram_jaccard", "neardup_pipeline", "neardup_clusters",
    "embedding_neardup", "ann_topk",
]


def _apply_driver_window() -> None:
    """Reorder QUERIES/ORACLES: window first, unchecked next, greens last."""
    global QUERIES, ORACLES
    assert len(_DRIVER_WINDOW_R4) == 50, len(_DRIVER_WINDOW_R4)
    missing = [n for n in _DRIVER_WINDOW_R4 if n not in QUERIES]
    assert not missing, f"driver window names not registered: {missing}"
    window = set(_DRIVER_WINDOW_R4)
    greens = set(_DRIVER_GREEN_R123)
    rest_unchecked = [n for n in QUERIES if n not in window and n not in greens]
    rest_green = [n for n in QUERIES if n in greens and n not in window]
    order = _DRIVER_WINDOW_R4 + rest_unchecked + rest_green
    assert len(order) == len(QUERIES)
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_apply_driver_window()


# ---------------------------------------------------------------------------
# ROUND-5 PLAYBOOK — EXECUTED (round 5, after CORRECTNESS_r04 landed
# 50/50 green): `apply_round5_layout()` now runs at import time (bottom
# of this module). It registers the staged r5+r6 batches and rotates the
# driver window onto _DRIVER_WINDOW_R5 (50 slots: 5 never-driver-checked
# leftovers + 5 round-4 registrations + 10 freshly staged r5/r6 names +
# 30 rotation greens — see the list itself, which is the source of
# truth). _DRIVER_WINDOW_R4 is treated as green (folded into the greens
# set inside apply_round5_layout).
# Burn-down schedule (committed in README §Staging): R7+R8 flip in
# round 6, R9 in round 7 — zero `_R*_STAGED` dicts left by round 7.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Round-5 STAGED registrations — implemented, tested, and oracle-gated in
# pytest THIS round, but kept OUT of QUERIES to honor the driver-coverage
# freeze (VERDICT r3 next-round #2: ≤5 new registered queries per round
# until cumulative driver coverage catches up; round 4's five were
# avro_roundtrip, event_transitions, neardup_pagerank, pq_topk_adc,
# zorder_layout). Round 5: call register_r5_queries(force=True) at import
# time (replace the guarded call at the bottom) and fold these names into
# the round-5 driver window.
# ---------------------------------------------------------------------------

SEMDEDUP_ORACLE = """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS c
      FROM (
        SELECT vec_id, embedding,
               ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|kmeans-seeds'), 1, 15))::BIGINT
                 % 10000 AS h
        FROM embeddings
      ), nn
      WHERE h <= least(10000, CAST(floor(320000.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, seeds s
      ) WHERE rk = 1
    ),
    m AS (
      SELECT a1.vec_id AS id, a1.cell_id, e.embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS nrm
      FROM a1 JOIN embeddings e USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT b.id AS id
      FROM m a JOIN m b ON a.cell_id = b.cell_id AND a.id < b.id
      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    )
    SELECT m.id AS vec_id, m.cell_id, dropped.id IS NULL AS keep
    FROM m LEFT JOIN dropped ON m.id = dropped.id
"""

BIGRAM_LM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
    ), r AS (
      SELECT doc_id, l[CAST(i AS INT)] AS w1, l[CAST(i + 1 AS INT)] AS w2
      FROM toks, LATERAL (SELECT unnest(range(1, len(l))) AS i) t
    ), c12 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM r GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ), v AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS V FROM c1
    ), model AS (
      SELECT w1, w2,
             CAST(round(round(ln((CAST(c12 AS DOUBLE) + 0.5)
                                 / (CAST(c1 AS DOUBLE) + 0.5 * V)), 6) * 1000000)
               AS BIGINT) AS lp6
      FROM c12 JOIN c1 USING (w1), v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(lp6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
             AS avg_bigram_logprob
    FROM r JOIN model USING (w1, w2) GROUP BY doc_id
"""

DECONTAMINATE_BLOOM_ORACLE = """
    SELECT d.doc_id FROM documents d
    ANTI JOIN (
      SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 7 = 0
    ) c ON md5(d.text) = c.k
"""

STREAM_STREAM_JOIN_ORACLE = """
    WITH l AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id AS r_user_id, ts AS r_ts, value AS r_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.user_id, l.ts, l.value, r.r_ts, r.r_value
    FROM l JOIN r ON l.user_id = r.r_user_id
      AND r.r_ts >= l.ts AND r.r_ts <= l.ts + INTERVAL 2 HOUR
"""


def _r5_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup embedding dedup (operators.semdedup.semantic_dedup):
    deterministic kmeans assignment + within-cluster cosine prune,
    min-id winner; the oracle unrolls seeds→assignment→pairwise in SQL."""
    from knime_core_columnar_spark.operators.semdedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, k=8, threshold=0.4, corpus_count=_parquet_rows(sf_dir, "embeddings")
    )


def _r5_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM fluency scoring (operators.text.bigram_logprob):
    add-0.5 smoothing, scaled-int64 exact per-doc aggregation."""
    from knime_core_columnar_spark.operators.text import bigram_logprob

    d = _t(spark, sf_dir, "documents")
    return bigram_logprob(d, "doc_id", "text", alpha=0.5)


def _r5_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered EXACT decontamination (operators.bloom
    .bloom_anti_join): the simulated benchmark set is every 7th doc's
    text hash; result equals the plain anti-join (the oracle), but the
    plan keeps Bloom-negative rows (the vast majority at scale) out of
    the join entirely."""
    from knime_core_columnar_spark.operators.bloom import bloom_anti_join

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", F.md5("text").alias("k"))
    keys = d.filter(F.col("doc_id") % 7 == 0).select(F.md5("text").alias("k"))
    return bloom_anti_join(corpus, keys, "k", num_bits=1 << 18).select("doc_id")


def _r5_stream_stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_stream_interval_join (the
    click→purchase attribution shape): same code path the streaming
    parity test drives with real micro-batches."""
    from knime_core_columnar_spark.streaming.ops import (
        stream_stream_interval_join,
    )

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return stream_stream_interval_join(left, right, on="user_id", within="2 hours")


def _r5_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators.bpe.bpe_train) — iterative and
    data-dependent, hence NOT SQL-expressible: registered without an
    oracle (driver records the weaker rows-only check; the algorithm is
    pytest-pinned to the original paper's worked example)."""
    from knime_core_columnar_spark.operators.bpe import bpe_merges_df, bpe_train

    d = _t(spark, sf_dir, "documents")
    return bpe_merges_df(spark, bpe_train(d, num_merges=30, max_types=5000))


_R5_STAGED: dict[str, tuple] = {
    "semantic_dedup": (_r5_semantic_dedup, SEMDEDUP_ORACLE),
    "bigram_lm_quality": (_r5_bigram_lm_quality, BIGRAM_LM_ORACLE),
    "decontaminate_bloom": (_r5_decontaminate_bloom, DECONTAMINATE_BLOOM_ORACLE),
    "stream_stream_join_batch": (
        _r5_stream_stream_join_batch,
        STREAM_STREAM_JOIN_ORACLE,
    ),
    "bpe_merges": (_r5_bpe_merges, None),
}


def register_r5_queries(force: bool = False) -> bool:
    """Fold the staged round-5 queries into QUERIES/ORACLES. No-op until
    round 5 flips ``force`` (or sets SPARK_GRAFT_REGISTER_R5=1)."""
    import os

    if not (force or os.environ.get("SPARK_GRAFT_REGISTER_R5")):
        return False
    for name, (fn, oracle) in _R5_STAGED.items():
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    return True


register_r5_queries()


# ---------------------------------------------------------------------------
# bpe_encode — hash-checkable companion to the oracle-less bpe_merges
# (VERDICT r5 "Next round #4"): the ENCODE half of the tokenizer applied
# with a FIXED literal merge table, so DuckDB can replay the same greedy
# merges as a rank-ordered replace chain and the driver gets a
# hash-matched CORRECTNESS row for the distributed encode path.
# ---------------------------------------------------------------------------

# Literal merge table (rank, left, right), fitted to the corpus's
# highest-frequency words (scan/hash/join/row). CHAIN-SAFETY INVARIANT —
# what makes a rank-ordered SQL replace chain equal to the library's
# lowest-rank-first one-at-a-time segmenter (_segment_ranked): every
# multi-char component is produced by a strictly EARLIER merge, and no
# merge's output equals a component of an EARLIER pair, so a later merge
# can never create a new occurrence of an earlier pair. Pinned by
# tests/test_llm_ops.py::test_bpe_encode_matches_replace_chain_oracle.
BPE_ENCODE_MERGES: list = [
    (0, "a", "t"), (1, "e", "r"), (2, "i", "n"), (3, "s", "c"),
    (4, "sc", "a"), (5, "sca", "n"), (6, "h", "a"), (7, "ha", "s"),
    (8, "has", "h"), (9, "j", "o"), (10, "jo", "in"), (11, "r", "o"),
    (12, "ro", "w"),
]


def _bpe_encode_oracle() -> str:
    """Unroll BPE_ENCODE_MERGES into a DuckDB replace chain. Each word
    becomes '|c||h||a||r||</w>|' (every symbol wrapped in its own '|'
    pair — adjacent matches share NO characters, so replace()'s
    leftmost-non-overlapping scan equals repeated leftmost merging);
    each merge (a,b) is one replace('|a||b|' -> '|ab|') applied in rank
    order. Safe because the corpus alphabet is [a-z ] (checked: no '|'
    or '</w>' occurs in any documents.parquet at any SF)."""
    chain = "s0"
    for _, a, b in BPE_ENCODE_MERGES:
        chain = f"replace({chain}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS words
      FROM documents
    ), s AS (
      SELECT doc_id,
             array_to_string(list_transform(words,
                 x -> regexp_replace(x, '(.)', '|\\1|', 'g') || '|</w>|'),
                 '') AS s0
      FROM w
    ), enc AS (
      SELECT doc_id, replace(trim({chain}, '|'), '||', ' ') AS pieces_str
      FROM s
    )
    SELECT doc_id, pieces_str,
           CAST(CASE WHEN pieces_str = '' THEN 0
                     ELSE len(string_split(pieces_str, ' ')) END AS BIGINT)
             AS n_pieces
    FROM enc
"""


BPE_ENCODE_ORACLE = _bpe_encode_oracle()


@query("bpe_encode", BPE_ENCODE_ORACLE)
def _bpe_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenization (operators.bpe.bpe_encode) with the
    literal BPE_ENCODE_MERGES table: merge ranks ship in the task
    closure (KB-sized), the corpus streams through ONE Arrow-batched
    mapInPandas scan with per-partition word-type memoization and no
    shuffle at all. Pieces are emitted space-joined (the corpus alphabet
    is [a-z], piece strings never contain a space) so the driver hashes
    scalar columns; the array form stays available from the operator.
    Covers the encode half of the tokenizer with a hash oracle —
    bpe_merges (the training loop) remains rows-only by design."""
    from knime_core_columnar_spark.operators.bpe import bpe_encode

    d = _t(spark, sf_dir, "documents")
    merges = [(r, a, b, 0) for r, a, b in BPE_ENCODE_MERGES]
    enc = bpe_encode(d, merges, "doc_id", "text")
    return enc.select(
        "doc_id",
        F.array_join("pieces", " ").alias("pieces_str"),
        "n_pieces",
    )


# ---------------------------------------------------------------------------
# Round-6 STAGED registrations — same freeze discipline as _R5_STAGED:
# implemented, pytest-gated, and oracle-checked by tools/check.py THIS
# round (set SPARK_GRAFT_REGISTER_R6=1), registered with the driver in a
# later window once cumulative coverage allows.
# ---------------------------------------------------------------------------

HEAVY_HITTER_TOKENS_ORACLE = """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM toks WHERE token <> ''
    GROUP BY token
    HAVING COUNT(*) >= greatest(20, (SELECT COUNT(*) FROM documents) // 12)
"""


def _r6_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter tokens via Misra-Gries + exact recount
    (operators.sketch.top_tokens_exact): the sketch pass bounds state at
    'capacity' rows/partition; the recount makes the output exactly the
    oracle's GROUP BY ... HAVING. Threshold scales with corpus size so
    the same query is sound at every sf."""
    from knime_core_columnar_spark.operators.sketch import top_tokens_exact

    d = _t(spark, sf_dir, "documents")
    min_count = max(20, _parquet_rows(sf_dir, "documents") // 12)
    return top_tokens_exact(d, min_count=min_count, capacity=8192)


def _fingerprint_oracle_part(table: str, cols: list[str]) -> str:
    canon = lambda c: (  # noqa: E731
        f"coalesce(CAST({c} AS VARCHAR), chr(0)||'NULL'||chr(0))"
    )
    h60 = lambda e: f"('0x' || substring(md5({e}),1,15))::BIGINT"  # noqa: E731
    cksum = lambda e: (  # noqa: E731
        f"CAST(CAST(SUM(CAST({e} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        f" % 1000000007 AS BIGINT)"
    )
    rowcat = "concat_ws(chr(31)," + ",".join(canon(c) for c in cols) + ")"
    parts = [
        f"SELECT '{table}' AS table_name, '__table__' AS part,"
        f" COUNT(*) AS n_nulls, coalesce({cksum(h60(rowcat))}, 0) AS checksum"
        f" FROM {table}"
    ]
    for c in cols:
        parts.append(
            f"SELECT '{table}', '{c}',"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
            f" coalesce({cksum(h60(canon(c)))}, 0) FROM {table}"
        )
    return " UNION ALL ".join(parts)


_FP_ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
    "o_orderpriority",
]
_FP_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_linenumber", "l_shipdate", "l_returnflag",
]

TABLE_CHECKSUMS_ORACLE = (
    _fingerprint_oracle_part("orders", _FP_ORDERS_COLS)
    + " UNION ALL "
    + _fingerprint_oracle_part("lineitem", _FP_LINEITEM_COLS)
)


def _r6_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent replication-audit checksums
    (operators.relational.table_fingerprint) over the engine-stable
    column types of orders+lineitem — the compare-100TB-tables-by-
    kilobytes primitive. One partial-agg scan per table."""
    from knime_core_columnar_spark.operators.relational import table_fingerprint

    o = _t(spark, sf_dir, "orders").select(*_FP_ORDERS_COLS)
    li = _t(spark, sf_dir, "lineitem").select(*_FP_LINEITEM_COLS)
    return (
        table_fingerprint(o)
        .select(F.lit("orders").alias("table_name"), "part", "n_nulls", "checksum")
        .unionByName(
            table_fingerprint(li).select(
                F.lit("lineitem").alias("table_name"),
                "part", "n_nulls", "checksum",
            )
        )
    )


COPURCHASE_TRIANGLES_ORACLE = """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT nodes.node AS part_id,
           CAST(coalesce(pn.n, 0) AS BIGINT) AS n_triangles
    FROM nodes LEFT JOIN pn USING (node)
"""


def _r6_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts of the co-purchase graph (parts sharing an order)
    via operators.graph.triangle_counts — degree-oriented wedge join, so
    a hub part generates O(m^1.5) wedges instead of deg². The triad set
    is orientation-invariant, hence the plain id-ordered oracle."""
    from knime_core_columnar_spark.operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    return triangle_counts(edges).select(
        F.col("node").alias("part_id"), "n_triangles"
    )


DUPLICATE_SPAN_PROFILE_ORACLE = """
    WITH w AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS l
      FROM documents
    ),
    anchors AS (
      SELECT doc_id, l, i
      FROM w, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) t
      WHERE i = 1
         OR ('0x' || substring(md5(l[CAST(i AS INT)]), 1, 15))::BIGINT % 8 = 0
    ),
    spans AS (
      SELECT doc_id,
             substring(md5(array_to_string(
               l[CAST(i AS INT):CAST(i + 15 AS INT)], ' ')), 1, 16) AS h
      FROM anchors
    ),
    counts AS (SELECT h, COUNT(*) AS c FROM spans GROUP BY h)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_ratio
    FROM spans JOIN counts USING (h)
    GROUP BY doc_id
"""


def _r6_duplicate_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate profile (operators.dedup.duplicate_spans):
    content-defined anchors (word-hash ≡ 0 mod 8) make shifted copies
    line up; only (doc_id, span-hash) pairs shuffle."""
    from knime_core_columnar_spark.operators.dedup import duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return duplicate_spans(d, window_words=16, anchor_stride=8)


HYBRID_SEARCH_RRF_ORACLE = """
    WITH qd AS (
      SELECT doc_id AS query_id,
             list_distinct(list_filter(
               string_split_regex(trim(coalesce(text, '')), '\\s+'),
               w -> w <> '')) AS qw
      FROM documents WHERE doc_id IN (3, 47, 205)
    ),
    dw AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(trim(coalesce(text, '')), '\\s+'),
               w -> w <> '')) AS dw
      FROM documents
    ),
    lexs AS (
      SELECT query_id, doc_id, len(list_intersect(dw, qw)) AS ov
      FROM dw, qd WHERE len(list_intersect(dw, qw)) > 0
    ),
    lex AS (
      SELECT query_id, doc_id, lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ov DESC, doc_id) AS lex_rank
        FROM lexs
      ) WHERE lex_rank <= 25
    ),
    qv AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings WHERE vec_id IN (3, 47, 205)
    ),
    vs AS (
      SELECT qv.query_id, e.vec_id AS doc_id,
             round(list_dot_product(qv.v, e.embedding::DOUBLE[])
               / (qv.nrm * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[]))), 6)
               AS cos
      FROM embeddings e, qv WHERE e.vec_id <> qv.query_id
    ),
    vec AS (
      SELECT query_id, doc_id, vec_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS vec_rank
        FROM vs
      ) WHERE vec_rank <= 25
    ),
    fused AS (
      SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
             coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex.lex_rank, vec.vec_rank,
             CAST(coalesce(1000000 // (60 + lex.lex_rank), 0)
                  + coalesce(1000000 // (60 + vec.vec_rank), 0) AS BIGINT)
               AS rrf_scaled
      FROM lex FULL OUTER JOIN vec
        ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id
    )
    SELECT query_id, doc_id, lex_rank, vec_rank, rrf_scaled, fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_scaled DESC, doc_id)
                  AS fused_rank
      FROM fused
    ) WHERE fused_rank <= 10
"""


def _r6_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion
    (operators.similarity.rrf_hybrid_topk): term-overlap list ⊕ cosine
    list, integer micro-unit fusion; cosine rounded exactly like the
    driver-green ann_topk family."""
    from knime_core_columnar_spark.operators.similarity import rrf_hybrid_topk

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return rrf_hybrid_topk(d, e, [3, 47, 205], k=10, n_per_system=25)


_R6_STAGED: dict[str, tuple] = {
    "heavy_hitter_tokens": (_r6_heavy_hitter_tokens, HEAVY_HITTER_TOKENS_ORACLE),
    "table_checksums": (_r6_table_checksums, TABLE_CHECKSUMS_ORACLE),
    "copurchase_triangles": (
        _r6_copurchase_triangles,
        COPURCHASE_TRIANGLES_ORACLE,
    ),
    "duplicate_span_profile": (
        _r6_duplicate_span_profile,
        DUPLICATE_SPAN_PROFILE_ORACLE,
    ),
    "hybrid_search_rrf": (_r6_hybrid_search_rrf, HYBRID_SEARCH_RRF_ORACLE),
}


def register_r6_queries(force: bool = False) -> bool:
    """Fold the staged round-6 queries into QUERIES/ORACLES. No-op until
    a later round flips ``force`` (or sets SPARK_GRAFT_REGISTER_R6=1)."""
    import os

    if not (force or os.environ.get("SPARK_GRAFT_REGISTER_R6")):
        return False
    for name, (fn, oracle) in _R6_STAGED.items():
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    return True


register_r6_queries()


# ---------------------------------------------------------------------------
# Round-7 STAGED registrations — same freeze discipline as _R5_STAGED /
# _R6_STAGED: implemented, pytest-gated, and replica-oracle-checked now;
# folded into QUERIES by a later round once driver coverage has caught
# up (register_r7_queries(force=True) or SPARK_GRAFT_REGISTER_R7=1).
# ---------------------------------------------------------------------------

CMS_FREQUENCY_ORACLE = """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ), tok AS (SELECT token FROM toks WHERE token <> ''),
    tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    probes AS (
      SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents WHERE doc_id < 20
    ), pr AS (SELECT token FROM probes WHERE token <> ''),
    cells AS (
      SELECT t.r,
             ('0x' || substring(md5(CAST(t.r AS VARCHAR) || '|' || tc.token), 1, 15))::BIGINT
               % 64 AS bucket,
             CAST(SUM(tc.n) AS BIGINT) AS cnt
      FROM tc CROSS JOIN range(4) t(r)
      GROUP BY 1, 2
    ),
    pb AS (
      SELECT pr.token, t.r,
             ('0x' || substring(md5(CAST(t.r AS VARCHAR) || '|' || pr.token), 1, 15))::BIGINT
               % 64 AS bucket
      FROM pr CROSS JOIN range(4) t(r)
    ),
    est AS (
      SELECT pb.token, MIN(COALESCE(cells.cnt, 0)) AS est_count
      FROM pb LEFT JOIN cells ON cells.r = pb.r AND cells.bucket = pb.bucket
      GROUP BY pb.token
    )
    SELECT est.token, CAST(est.est_count AS BIGINT) AS est_count,
           CAST(COALESCE(tc.n, 0) AS BIGINT) AS exact_count,
           CAST(est.est_count - COALESCE(tc.n, 0) AS BIGINT) AS overcount
    FROM est LEFT JOIN tc ON tc.token = est.token
"""


def _r7_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators.sketch.cms_*):
    per-source shard sketches are built and MERGED (proving the
    incremental-maintenance contract: merge = bucket-count sum), then
    probed for the vocabulary of the first 20 docs; exact recounts of
    the probe set expose the guaranteed-nonnegative overcount. Width 64
    deliberately forces collisions so the min-over-rows estimate does
    real work. All md5/integer — bit-identical on any engine; the
    oracle replays the identical sketch in SQL from full token counts
    (equivalent because bucket counts are sums over colliding tokens)."""
    from knime_core_columnar_spark.operators.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    sketch = cms_merge(
        cms_sketch(tok, "token", depth=4, width=64, shard_cols=["source"])
    )
    probes = (
        d.filter(F.col("doc_id") < 20)
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    est = cms_estimate(sketch, probes, "token", depth=4, width=64)
    exact = (
        tok.join(F.broadcast(probes), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "token", "left")
        .select(
            "token",
            F.col("est_count").cast("long").alias("est_count"),
            F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
            (F.col("est_count") - F.coalesce("exact_count", F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


SET_SIMILARITY_JOIN_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> ('0x' || substring(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT)) AS s
      FROM toks
    ), nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS n_overlap,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS n_union
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(n_overlap AS BIGINT) AS n_overlap,
           CAST(n_union AS BIGINT) AS n_union
    FROM pairs WHERE 5 * n_overlap >= 3 * n_union
"""


def _r7_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 3/5 self-join via PPJoin-style prefix filtering
    (operators.dedup.prefix_filter_jaccard_pairs) — zero false
    negatives, unlike the MinHash tier. The oracle is a brute-force
    all-pairs list_intersect in DuckDB over the same 60-bit shingle
    hashes: feasible at sf0.01, and precisely the quadratic scan the
    prefix filter provably reproduces without running it."""
    from knime_core_columnar_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold_num=3, threshold_den=5
    )


GOLDEN_RECORD_ORACLE = """
    WITH RECURSIVE p AS (
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             string_split(p_name, ' ')[-1] AS block FROM part
    ), prs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM p a JOIN p b ON a.block = b.block AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION ALL
      SELECT id_b, id_a FROM prs
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS entity FROM reach GROUP BY node
    ), assign AS (
      SELECT p.*, COALESCE(comp.entity, p.p_partkey) AS entity_id
      FROM p LEFT JOIN comp ON comp.node = p.p_partkey
    ), multi AS (
      SELECT entity_id FROM assign GROUP BY entity_id HAVING COUNT(*) > 1
    ), m AS (
      SELECT assign.* FROM assign JOIN multi USING (entity_id)
    ), bm AS (
      SELECT entity_id, p_brand,
             ROW_NUMBER() OVER (PARTITION BY entity_id
                                ORDER BY COUNT(*) DESC, p_brand) AS rk
      FROM m GROUP BY entity_id, p_brand
    ), tm AS (
      SELECT entity_id, p_type,
             ROW_NUMBER() OVER (PARTITION BY entity_id
                                ORDER BY COUNT(*) DESC, p_type) AS rk
      FROM m GROUP BY entity_id, p_type
    )
    SELECT m.entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           MIN(m.p_partkey) AS canonical_id,
           MAX(m.p_size) AS max_size,
           MIN(bm.p_brand) AS brand_mode,
           MIN(tm.p_type) AS type_mode
    FROM m
    JOIN bm ON bm.entity_id = m.entity_id AND bm.rk = 1
    JOIN tm ON tm.entity_id = m.entity_id AND tm.rk = 1
    GROUP BY m.entity_id
"""


def _r7_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge after entity resolution
    (operators.relational.golden_records): the same blocking + edit
    distance + connected components as the entity_resolution query,
    then each multi-record entity collapses to one golden record —
    mode-with-deterministic-tie-break for categoricals (brand, type),
    max for p_size, min p_partkey as the canonical id. The oracle
    replays survivorship with window functions over the recursive-CTE
    closure. Oracle practicality note: the DuckDB recursive closure is
    quadratic in component size and impractical at sf0.1 (an inherited
    property of the entity_resolution oracle, whose Spark side runs
    sf0.1 in ~35 s); driver comparisons run at sf0.01 where both sides
    are seconds."""
    from knime_core_columnar_spark.operators.dedup import connected_components
    from knime_core_columnar_spark.operators.relational import golden_records

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    # two-tier edge derivation (see entity_resolution): exact-name
    # collapse to min-id representatives, then blocked + length-gap +
    # thresholded-Levenshtein verification over DISTINCT names only —
    # clique contraction preserves components and min-id labels exactly
    names = p.groupBy("p_name", "block").agg(
        F.min("p_partkey").alias("rep")
    )
    a = names.select(F.col("rep").alias("id_a"),
                     F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("rep").alias("id_b"),
                     F.col("p_name").alias("name_b"), "block")
    pairs = (
        a.join(b, ["block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .filter(F.levenshtein("name_a", "name_b", 2) >= 0)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b")
    name_entity = names.join(comp, names["rep"] == comp["node"], "left").select(
        "p_name", F.coalesce(F.col("label"), F.col("rep")).alias("entity_id")
    )
    assign = p.join(name_entity, "p_name").select(p["*"], "entity_id")
    multi = (
        assign.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("entity_id")
    )
    members = assign.join(multi, "entity_id")
    g = golden_records(
        members, "entity_id", "p_partkey",
        mode_cols=["p_brand", "p_type"], max_cols=["p_size"],
    )
    return g.select(
        "entity_id",
        F.col("n_records").cast("long").alias("n_records"),
        F.col("canonical_id"),
        F.col("p_size_max").alias("max_size"),
        F.col("p_brand_mode").alias("brand_mode"),
        F.col("p_type_mode").alias("type_mode"),
    )


SOURCE_QUOTA_SAMPLE_ORACLE = """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|quota'), doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), q AS (
      SELECT *, least(n, CAST(floor(10 * sqrt(n)) AS BIGINT)) AS quota FROM r
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(quota) AS BIGINT) AS quota,
           CAST(SUM(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk <= quota THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept
    FROM q GROUP BY source
"""


def _r7_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping with sqrt temperature
    (operators.sampling.quota_sample): each source keeps at most
    10·sqrt(n) docs, chosen by a deterministic md5 order — the
    domain-rebalancing step of web-corpus curation. chars_kept makes
    the check sensitive to WHICH rows survive, not just how many."""
    from knime_core_columnar_spark.operators.sampling import quota_sample

    d = _t(spark, sf_dir, "documents")
    kept = quota_sample(d, "source", "doc_id", scale=10, salt="quota")
    return kept.groupBy("source").agg(
        F.max("__n_group").cast("long").alias("n_docs"),
        F.max("__quota").cast("long").alias("quota"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


CLUSTER_CONSENSUS_LANG_ORACLE = (
    _NEARDUP_EDGE_CTE
    + """
    , reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    ), m AS (
      SELECT comp.cluster_id, d.doc_id, d.lang
      FROM comp JOIN documents d ON d.doc_id = comp.node
    ), lc AS (
      SELECT cluster_id, lang, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY COUNT(*) DESC, lang) AS rk
      FROM m GROUP BY cluster_id, lang
    ), agg AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM m GROUP BY cluster_id
    )
    SELECT agg.cluster_id, lc.lang AS consensus_lang, agg.n_docs,
           agg.n_langs, CAST(agg.n_docs - lc.n AS BIGINT) AS n_minority
    FROM agg JOIN lc ON lc.cluster_id = agg.cluster_id AND lc.rk = 1
    WHERE agg.n_docs > 1
    """
)


def _r7_cluster_consensus_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language consensus over near-duplicate clusters: the lang-ID
    repair step of corpus curation (near-identical docs should agree on
    language; a minority label inside a dup cluster is usually a
    misclassification). Reuses the full near-dup machinery — MinHash
    LSH candidates → exact-Jaccard verify → connected components — then
    a per-cluster majority vote with a deterministic tie-break
    (max count, then smallest lang), plus the minority count a repair
    pass would flip. Only multi-doc clusters are reported."""
    from knime_core_columnar_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    m = comp.join(
        d.select("doc_id", "lang"), comp["node"] == F.col("doc_id")
    ).select(F.col("label").alias("cluster_id"), "doc_id", "lang")
    lc = m.groupBy("cluster_id", "lang").agg(F.count(F.lit(1)).alias("__n"))
    winner = lc.groupBy("cluster_id").agg(
        F.min(
            F.struct((-F.col("__n")).alias("__neg"), F.col("lang").alias("__v"),
                     F.col("__n").alias("__cnt"))
        ).alias("__w")
    ).select(
        "cluster_id", F.col("__w.__v").alias("consensus_lang"),
        F.col("__w.__cnt").alias("__win_n"),
    )
    agg = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
    )
    return (
        agg.join(winner, "cluster_id")
        .filter(F.col("n_docs") > 1)
        .select(
            "cluster_id", "consensus_lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_langs").cast("long").alias("n_langs"),
            (F.col("n_docs") - F.col("__win_n")).cast("long").alias("n_minority"),
        )
    )


GOPHER_RULES_ORACLE = """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0)
                  AS DOUBLE) / greatest(len(toks), 1) AS mean_wl,
             CAST(len(list_filter(toks, x -> contains(x, '#')
                                        OR contains(x, '...')
                                        OR contains(x, '…'))) AS DOUBLE)
               / greatest(len(toks), 1) AS symbol_ratio,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / greatest(len(toks), 1) AS alpha_ratio,
             len(list_filter(toks, x -> list_contains(
                 ['the','be','to','of','and','that','have','with'],
                 lower(x)))) AS n_stop
      FROM s
    ), r AS (
      SELECT doc_id, n_words, mean_wl, symbol_ratio, alpha_ratio, n_stop,
             list_filter([
               CASE WHEN n_words < 20 THEN 'too_few_words' END,
               CASE WHEN n_words > 80 THEN 'too_many_words' END,
               CASE WHEN mean_wl < 3.2 THEN 'mean_word_len_low' END,
               CASE WHEN mean_wl > 4.2 THEN 'mean_word_len_high' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_ratio_high' END,
               CASE WHEN alpha_ratio < 0.8 THEN 'alpha_ratio_low' END,
               CASE WHEN n_stop < 1 THEN 'too_few_stopwords' END
             ], x -> x IS NOT NULL) AS reasons
      FROM m
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(mean_wl, 6) AS mean_word_len,
           round(symbol_ratio, 6) AS symbol_ratio,
           round(alpha_ratio, 6) AS alpha_ratio,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           len(reasons) = 0 AS keep,
           coalesce(array_to_string(reasons, ','), '') AS fail_reasons
    FROM r
"""


def _r7_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery (operators.text.gopher_rules) with thresholds
    fitted to the synthetic corpus (20-80 words, mean word length
    3.2-4.2, >=1 stopword) so keeps and every fail reason both occur.
    One scan, zero shuffles: all seven rules are array expressions over
    the token split, and the fail_reasons audit column is built from
    the same conditions — no second pass, no Python."""
    from knime_core_columnar_spark.operators.text import gopher_rules

    d = _t(spark, sf_dir, "documents")
    return gopher_rules(
        d, min_words=20, max_words=80, min_mean_word_len=3.2,
        max_mean_word_len=4.2, max_symbol_ratio=0.1,
        min_alpha_ratio=0.8, min_stopwords=1,
    )


C4_LINE_FILTER_ORACLE = """
    WITH t AS (
      SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS text2
      FROM documents
    ), s AS (
      SELECT doc_id, text2,
             list_filter(list_transform(string_split(text2, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS lines
      FROM t
    ), k AS (
      SELECT doc_id, text2, lines,
             list_filter(lines, x ->
                 len(list_filter(string_split_regex(x, '\\s+'),
                                 w -> w <> '')) >= 4
                 AND regexp_matches(x, '[.!?"'']$')
                 AND NOT contains(lower(x), 'javascript')
                 AND NOT contains(lower(x), '{')) AS kept
      FROM s
    )
    SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           (len(kept) >= 2
            AND NOT contains(lower(text2), 'lorem ipsum')) AS keep
    FROM k
"""


def _r7_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaner (operators.text.c4_line_filter). The
    synthetic corpus has no natural newlines, so the query first
    synthesizes line structure deterministically — every literal
    ' table ' becomes '.' + newline (identical left-to-right
    non-overlapping replace in both engines) — then applies the real
    operator: terminal-punctuation + min-4-words + blocklist line
    rules, document dropped under 2 surviving lines. Pure Catalyst
    (split / filter / array_join), no explode, no shuffle."""
    from knime_core_columnar_spark.operators.text import c4_line_filter

    d = _t(spark, sf_dir, "documents")
    d2 = d.withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    )
    return c4_line_filter(
        d2, min_words_per_line=4, require_terminal_punct=True,
        min_kept_lines=2,
    )


_R7_STAGED: dict[str, tuple] = {
    "cms_frequency": (_r7_cms_frequency, CMS_FREQUENCY_ORACLE),
    "gopher_rules": (_r7_gopher_rules, GOPHER_RULES_ORACLE),
    "c4_line_filter": (_r7_c4_line_filter, C4_LINE_FILTER_ORACLE),
    "set_similarity_join": (_r7_set_similarity_join, SET_SIMILARITY_JOIN_ORACLE),
    "golden_record": (_r7_golden_record, GOLDEN_RECORD_ORACLE),
    "source_quota_sample": (_r7_source_quota_sample, SOURCE_QUOTA_SAMPLE_ORACLE),
    "cluster_consensus_lang": (
        _r7_cluster_consensus_lang,
        CLUSTER_CONSENSUS_LANG_ORACLE,
    ),
}


def register_r7_queries(force: bool = False) -> bool:
    """Fold the staged round-7 queries into QUERIES/ORACLES. No-op until
    a later round flips ``force`` (or sets SPARK_GRAFT_REGISTER_R7=1)."""
    import os

    if not (force or os.environ.get("SPARK_GRAFT_REGISTER_R7")):
        return False
    for name, (fn, oracle) in _R7_STAGED.items():
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    return True


register_r7_queries()


# ---------------------------------------------------------------------------
# Round-8 STAGED registrations — same freeze discipline as _R5/_R6/_R7:
# implemented, pytest-gated, replica-oracle-checked now; registration
# deferred (register_r8_queries(force=True) / SPARK_GRAFT_REGISTER_R8=1).
# ---------------------------------------------------------------------------

JOIN_EXPLOSION_ORACLE = """
    WITH l AS (
      SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS n_left
      FROM events GROUP BY 1
    ), r AS (
      SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS n_right
      FROM events GROUP BY 1
    ), t AS (
      SELECT CAST((SELECT COUNT(*) FROM events) // 128 AS BIGINT) AS thr
    )
    SELECT l.key, CAST(l.n_left AS BIGINT) AS n_left,
           CAST(r.n_right AS BIGINT) AS n_right,
           CAST(l.n_left * r.n_right AS BIGINT) AS n_output_rows,
           CAST(ceil(CAST(l.n_left * r.n_right AS DOUBLE) / 5000000.0) AS INTEGER)
             AS salt_factor
    FROM l JOIN r USING (key), t
    WHERE l.n_left >= greatest(50, t.thr) AND r.n_right >= greatest(50, t.thr)
"""


def _r8_join_explosion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size pre-flight (operators.relational.join_explosion_profile):
    which keys of a planned events⋈events stream-stream self-join would
    explode? Both sides scanned with Misra-Gries-bounded state + exact
    recount — never a full GROUP BY of the fact table; output is exact
    (every key heavy on BOTH sides, exact counts, exact row product,
    suggested salt fan-out). Thresholds scale with the table so the
    same query is sound at every sf."""
    from knime_core_columnar_spark.operators.relational import (
        join_explosion_profile,
    )

    e = _t(spark, sf_dir, "events")
    n = _parquet_rows(sf_dir, "events")
    thr = max(50, n // 128)
    return join_explosion_profile(
        e, e, "event_type", "event_type", min_left=thr, min_right=thr,
        capacity=256, left_total=n, right_total=n,
    )


SOURCE_SIMILARITY_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), shr AS (
      SELECT d.source, unnest(sh.s) AS x
      FROM sh JOIN documents d USING (doc_id)
    ), h0 AS (
      SELECT source,
             ('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647 AS h
      FROM shr
    ), sig AS (
      SELECT source, t.i,
             MIN(((2 * t.i + 1) * h0.h + 104729 * t.i) % 2147483647) AS m
      FROM h0 CROSS JOIN range(16) t(i)
      GROUP BY source, t.i
    )
    SELECT a.source AS grp_a, b.source AS grp_b,
           CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
    GROUP BY a.source, b.source
"""


def _r8_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level similarity sketches
    (operators.dedup.minhash_group_signatures): one mergeable 16-component
    MinHash signature per source (elementwise min over member docs =
    MinHash of the shingle-set union), then all-pairs component-match
    counts — n_match/16 estimates the source-pair Jaccard without ever
    comparing documents. The signature table is one row per source, so
    the pair join broadcasts; the oracle replays the identical hash
    family in SQL."""
    from knime_core_columnar_spark.operators.dedup import (
        group_signature_matches,
        minhash_group_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_group_signatures(d, "source", "doc_id", "text",
                                    num_perm=16, shingle_n=3)
    return group_signature_matches(sigs, "source", num_perm=16)


LENGTH_BUCKETED_BATCHES_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents
    ), nz AS (SELECT * FROM toks WHERE n > 0),
    b AS (
      SELECT doc_id, n,
             CASE WHEN n <= 1 THEN 0
                  ELSE CAST(length(bin(n - 1)) AS BIGINT) END AS bucket
      FROM nz
    ), r AS (
      SELECT bucket, n,
             ROW_NUMBER() OVER (PARTITION BY bucket
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|lenbatch'), doc_id)
               AS rk
      FROM b
    )
    SELECT bucket, CAST((rk - 1) // 32 AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(MAX(n) * COUNT(*) AS BIGINT) AS padded_tokens
    FROM r GROUP BY bucket, (rk - 1) // 32
"""


def _r8_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning
    (operators.packing.length_bucketed_batches): power-of-two token-
    length classes via integer bit-length (no float log2), deterministic
    md5 order inside each bucket, 32-doc batches padding to their own
    max — the padding-efficiency batching strategy for variable-length
    SFT/eval sets, complementary to pack_sequences' concat packing."""
    from knime_core_columnar_spark.operators.packing import (
        length_bucketed_batches,
    )

    d = _t(spark, sf_dir, "documents")
    return length_bucketed_batches(d, "doc_id", "text", batch_size=32)


NOVELTY_SCORES_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> ('0x' || substring(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT))
               AS s
      FROM toks
    ), rows_ AS (
      SELECT doc_id, unnest(s) AS h FROM sh WHERE len(s) > 0
    ), freq AS (
      SELECT h, COUNT(*) AS df FROM rows_ GROUP BY h
    )
    SELECT rows_.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN freq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel
    FROM rows_ JOIN freq USING (h)
    GROUP BY rows_.doc_id
"""


def _r8_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty (operators.dedup.shingle_novelty): the share
    of a doc's distinct shingles that occur nowhere else — the
    diversity-sampling signal complementary to boilerplate_ngrams.
    One shingle pass + one DF aggregation + one join back; integer
    output."""
    from knime_core_columnar_spark.operators.dedup import shingle_novelty

    d = _t(spark, sf_dir, "documents")
    return shingle_novelty(d, "doc_id", "text", shingle_n=3)


STREAM_QUOTA_ADMISSION_ORACLE = """
    WITH r AS (
      SELECT event_id, ts, event_type, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS admit_rank
      FROM events
    )
    SELECT event_id, ts, event_type, user_id, value,
           CAST(admit_rank AS BIGINT) AS admit_rank
    FROM r WHERE admit_rank <= 100
"""


def _r8_stream_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.ops.streaming_quota_admission: the first
    100 events per type in (ts, event_id) order — exactly the admitted
    set the stateful streaming operator produces when the stream is
    replayed in timestamp order (pinned by the micro-batch parity
    test). Expressed with the per-key window the streaming kernel
    guarantees; state per key in the stream is ONE integer."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("admit_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("admit_rank") <= 100)
        .select("event_id", "ts", "event_type", "user_id", "value",
                "admit_rank")
    )


DSIR_SELECT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, (text LIKE '%spark%') AS tgt,
             string_split_regex(trim(text), '\\s+') AS l FROM documents
    ), r AS (
      SELECT doc_id, tgt,
             ('0x' || substring(md5(l[CAST(i AS INT)] || ' '
                                    || l[CAST(i + 1 AS INT)]), 1, 15))::BIGINT
               % 8192 AS b
      FROM toks, LATERAL (SELECT unnest(range(1, len(l))) AS i) t
    ), c AS (
      SELECT b, COUNT(*) AS rb,
             SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tb
      FROM r GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(rb) AS BIGINT) AS R, CAST(SUM(tb) AS BIGINT) AS T FROM c
    ), lam AS (
      SELECT b, CAST(round(round(
                 ln(CAST(2 * tb + 1 AS DOUBLE) / CAST(2 * T + 8192 AS DOUBLE))
               - ln(CAST(2 * rb + 1 AS DOUBLE) / CAST(2 * R + 8192 AS DOUBLE)),
               6) * 1000000) AS BIGINT) AS lp6
      FROM c, tot
    )
    , scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             round(CAST(SUM(lp6) AS DOUBLE) / 1000000.0, 6) AS dsir_logratio,
             SUM(lp6) > 0 AS selected
      FROM r JOIN lam USING (b) GROUP BY doc_id
    )
    -- bigram-less docs (< 2 tokens) score 0.0 / selected=false instead
    -- of vanishing (sampling.dsir_logratio parity)
    SELECT d.doc_id,
           CAST(COALESCE(scored.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           COALESCE(scored.dsir_logratio, 0.0) AS dsir_logratio,
           COALESCE(scored.selected, FALSE) AS selected
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN scored ON d.doc_id = scored.doc_id
"""


def _r8_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators.sampling.dsir_logratio,
    after Xie et al. NeurIPS 2023): hashed-bigram log-likelihood ratio
    of a target slice vs the raw corpus, per-bucket weights scaled
    to int64 before the per-doc sum so selection (Σλ6 > 0) is
    integer-exact cross-engine. One bucket agg (8192 rows) + broadcast
    λ join + one per-doc agg. Target = docs mentioning 'spark' — a
    CONTENT-based slice whose bigram distribution genuinely differs
    from the corpus (the synthetic langs all share one vocabulary, so a
    lang-based target would be distributionally identical to raw and
    the smoothing term would push every score slightly negative)."""
    from knime_core_columnar_spark.operators.sampling import dsir_logratio

    d = _t(spark, sf_dir, "documents")
    return dsir_logratio(
        d, F.col("text").like("%spark%"), "doc_id", "text", n_buckets=8192
    )


URL_HOST_STATS_ORACLE = """
    WITH u AS (
      SELECT doc_id, lang,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
             || source || '.example.'
             || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END)
             || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
             || '/' || lang || '/page/' || CAST(doc_id % 50 AS VARCHAR)
             || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 2 = 1 THEN '?utm_source=feed' ELSE '' END)
             || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
               AS url
      FROM documents
    ), s AS (
      SELECT doc_id,
             regexp_replace(split_part(split_part(lower(trim(url)), '#', 1),
                                       '?', 1),
                            '^[a-z][a-z0-9+.-]*://', '') AS rest
      FROM u
    ), p AS (
      SELECT doc_id, split_part(rest, '/', 1) AS hostport,
             regexp_replace(substr(rest, length(split_part(rest, '/', 1)) + 1),
                            '/+$', '') AS path
      FROM s
    ), h AS (
      -- userinfo strip, then port, then www (web.canonical_url_parts)
      SELECT doc_id, path,
             regexp_replace(regexp_replace(
                 regexp_replace(hostport, '^[^/@]*@', ''),
                 ':[0-9]+$', ''), '^www\\.', '') AS host
      FROM p
    )
    SELECT host AS url_host,
           regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS url_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host || path) AS BIGINT) AS n_urls,
           CAST(MAX(CASE WHEN host IN ('src3.example.com', 'src3.example.org')
                           OR regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
                              IN ('blocked.test')
                         THEN 1 ELSE 0 END) AS BOOLEAN) AS blocked
    FROM h GROUP BY host
"""


def _r8_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + per-host curation rollup
    (operators.web.canonicalize_url / host_stats). The synthetic corpus
    has no URL column, so the query first synthesizes one
    deterministically from (doc_id, source, lang) — mixed-case scheme,
    www prefix, explicit port, trailing slash, tracking query, fragment
    — exercising every canonicalization rule; page ids collide mod 50
    so re-crawl detection (n_docs vs n_urls) is non-trivial. Pure
    Catalyst string expressions; one host-keyed hash aggregation."""
    from knime_core_columnar_spark.operators.web import host_stats

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://")),
        F.when(did % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example."),
        F.when(did % 2 == 0, F.lit("com")).otherwise(F.lit("org")),
        F.when(did % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/page/"),
        (did % 50).cast("string"),
        F.when(did % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 2 == 1, F.lit("?utm_source=feed")).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return host_stats(
        d.withColumn("url", url),
        "url",
        blocklist=["src3.example.com", "src3.example.org", "blocked.test"],
    )


INCREMENTAL_ADMIT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
               AS s
      FROM toks
    ), nz AS (
      SELECT doc_id, s FROM sh WHERE len(s) > 0
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT
                               % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM nz
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|'
                 || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cor AS (
      SELECT DISTINCT b, key FROM bands WHERE doc_id % 10 <> 0
    ), bat AS (
      SELECT doc_id, b, key FROM bands WHERE doc_id % 10 = 0
    ), hits AS (
      SELECT bat.doc_id, CAST(COUNT(cor.key) AS BIGINT) AS n
      FROM bat LEFT JOIN cor ON bat.b = cor.b AND bat.key = cor.key
      GROUP BY bat.doc_id
    )
    -- shingle-less batch docs (< shingle_n words) are admitted, not
    -- dropped: join back to the full batch id set (dedup.py parity)
    SELECT d.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_hit_bands,
           COALESCE(hits.n, 0) = 0 AS admitted
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
"""


def _r8_incremental_dedup_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission
    (operators.dedup.incremental_dedup_admit): every 10th doc plays the
    NEW ingest batch, the rest the existing corpus whose persisted
    ``minhash_band_table`` index is the only corpus artifact consulted
    — the daily-crawl admission pattern where per-ingest cost is
    O(batch) signatures + one key join, never a corpus re-read."""
    from knime_core_columnar_spark.operators.dedup import (
        incremental_dedup_admit,
        minhash_band_table,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    idx = minhash_band_table(corpus, "doc_id", "text", num_perm=16, bands=4)
    return incremental_dedup_admit(batch, idx, "doc_id", "text",
                                   num_perm=16, bands=4)


_R8_STAGED: dict[str, tuple] = {
    "dsir_select": (_r8_dsir_select, DSIR_SELECT_ORACLE),
    "url_host_stats": (_r8_url_host_stats, URL_HOST_STATS_ORACLE),
    "incremental_dedup_admit": (
        _r8_incremental_dedup_admit, INCREMENTAL_ADMIT_ORACLE,
    ),
    "join_explosion_profile": (
        _r8_join_explosion_profile, JOIN_EXPLOSION_ORACLE,
    ),
    "source_similarity": (_r8_source_similarity, SOURCE_SIMILARITY_ORACLE),
    "length_bucketed_batches": (
        _r8_length_bucketed_batches, LENGTH_BUCKETED_BATCHES_ORACLE,
    ),
    "novelty_scores": (_r8_novelty_scores, NOVELTY_SCORES_ORACLE),
    "stream_quota_admission": (
        _r8_stream_quota_admission, STREAM_QUOTA_ADMISSION_ORACLE,
    ),
}


def register_r8_queries(force: bool = False) -> bool:
    """Fold the staged round-8 queries into QUERIES/ORACLES. No-op until
    a later round flips ``force`` (or sets SPARK_GRAFT_REGISTER_R8=1)."""
    import os

    if not (force or os.environ.get("SPARK_GRAFT_REGISTER_R8")):
        return False
    for name, (fn, oracle) in _R8_STAGED.items():
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    return True


register_r8_queries()


# ---------------------------------------------------------------------------
# ROUND-5 WINDOW — ACTIVE since round 5 (CORRECTNESS_r04 landed 50/50
# green, so _DRIVER_WINDOW_R4 is folded into the greens set here).
# `apply_round5_layout()` is invoked at the bottom of this module.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R5 = [
    # the 5 never-driver-checked leftovers (head of the round-5 window)
    "struct_roundtrip", "map_ops", "explode_words", "array_set_ops",
    "pct_of_total",
    # the round-4 registrations (driver-checkable for the first time)
    "avro_roundtrip", "event_transitions", "neardup_pagerank",
    "pq_topk_adc", "zorder_layout",
    # the staged r5+r6 batches, folded in by apply_round5_layout()
    "semantic_dedup", "bigram_lm_quality", "decontaminate_bloom",
    "stream_stream_join_batch", "bpe_merges",
    "heavy_hitter_tokens", "table_checksums", "copurchase_triangles",
    "duplicate_span_profile", "hybrid_search_rrf",
    # 30 rotation greens (oldest driver evidence first: r01-era queries
    # whose CORRECTNESS rows predate two rounds of refactoring)
    "q1_pricing_summary", "select_project_map", "filter_rows",
    "slice_rows", "multi_slice", "concatenate_union", "append_hstack",
    "row_index", "cast_spec", "missing_value_columns",
    "join_customer_orders", "sort_topk", "distinct_rows",
    "window_topk_per_group", "join_semi", "join_anti",
    "join_left_outer", "q3_shipping_priority", "q5_local_supplier",
    "rollup_returns", "cube_orders", "grouping_sets",
    "set_intersect", "set_except", "union_distinct",
    "window_running_sum", "window_lag_lead", "window_moving_avg",
    "count_distinct_agg", "percentile_stats",
]


def _reorder_for_window(window_names: list[str], greens: set[str]) -> None:
    """Reorder QUERIES/ORACLES: window first, then never-checked, then
    greens — the same layout contract as _apply_driver_window."""
    global QUERIES, ORACLES
    missing = [n for n in window_names if n not in QUERIES]
    assert not missing, f"driver window names not registered: {missing}"
    window = set(window_names)
    rest_unchecked = [
        n for n in QUERIES if n not in window and n not in greens
    ]
    rest_green = [n for n in QUERIES if n in greens and n not in window]
    order = window_names + rest_unchecked + rest_green
    assert len(order) == len(QUERIES)
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


def apply_round5_layout() -> None:
    """Round-5 flip: fold the staged r5+r6 batches into the catalog and
    rotate the driver window onto _DRIVER_WINDOW_R5 (50 slots: 5
    leftovers + 5 round-4 registrations + 10 freshly staged + 30
    rotation greens)."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    assert len(_DRIVER_WINDOW_R5) == 50, len(_DRIVER_WINDOW_R5)
    _reorder_for_window(
        _DRIVER_WINDOW_R5,
        set(_DRIVER_GREEN_R123) | set(_DRIVER_WINDOW_R4),
    )


# ---------------------------------------------------------------------------
# Round-9 STAGED registrations — same freeze discipline as _R5.._R8.
# ---------------------------------------------------------------------------

_BENFORD_CASE = (
    "CASE obs.digit WHEN 1 THEN 0.3010299956639812 "
    "WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 "
    "WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 "
    "WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 "
    "WHEN 8 THEN 0.05115252244738129 ELSE 0.04575749056067514 END"
)

BENFORD_AUDIT_ORACLE = f"""
    WITH src AS (
      SELECT 'o_totalprice' AS col_name,
             CAST(abs(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS DECIMAL(20,0))) AS VARCHAR) AS s
      FROM orders
      UNION ALL
      SELECT 'l_extendedprice',
             CAST(abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS DECIMAL(20,0))) AS VARCHAR)
      FROM lineitem
    ), digits AS (
      SELECT col_name, CAST(substring(s, 1, 1) AS INTEGER) AS digit FROM src
    ), obs AS (
      SELECT col_name, digit, CAST(COUNT(*) AS BIGINT) AS n_observed
      FROM digits WHERE digit >= 1 GROUP BY col_name, digit
    ), tot AS (
      SELECT col_name, CAST(SUM(n_observed) AS BIGINT) AS n
      FROM obs GROUP BY col_name
    )
    SELECT obs.col_name, obs.digit, obs.n_observed,
           CAST(floor((CAST(tot.n AS DOUBLE) * ({_BENFORD_CASE}))
                      * 1000000.0) AS BIGINT) AS expected_micro
    FROM obs JOIN tot USING (col_name)
"""


def _r9_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit (operators.validate.benford_digit_audit)
    over the two money columns — the fabricated-amounts forensic.
    Exact-decimal digit extraction (no float-to-string); expected counts
    multiply the identical compile-time double literals in both engines
    (same IEEE product ⇒ same floor; the quota_sample sqrt argument)."""
    from knime_core_columnar_spark.operators.validate import (
        benford_digit_audit,
    )

    o = benford_digit_audit(_t(spark, sf_dir, "orders"), ["o_totalprice"])
    l = benford_digit_audit(
        _t(spark, sf_dir, "lineitem"), ["l_extendedprice"]
    )
    return o.unionByName(l).withColumnRenamed("column", "col_name")


K_ANONYMITY_ORACLE = """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS k_min,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk
    FROM g
"""


def _r9_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators.validate.k_anonymity_audit) over the
    customer quasi-identifiers (nation, market segment) at k=5 — the
    privacy release gate: one hash aggregation on the quasi tuple, a
    one-row report of groups and rows a release would expose."""
    from knime_core_columnar_spark.operators.validate import k_anonymity_audit

    return k_anonymity_audit(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=5
    )


CDC_APPLY_ORACLE = """
    WITH base AS (
      SELECT event_id, ts, user_id, value FROM (
        SELECT event_id, ts, user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE ts < TIMESTAMP '2024-01-15'
      ) WHERE rk = 1
    ), ch AS (
      SELECT event_id, ts, user_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    ), latest AS (
      SELECT * FROM (
        SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rk
        FROM ch
      ) WHERE rk = 1
    )
    SELECT event_id, ts, user_id, value
    FROM base WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT event_id, ts, user_id, value FROM latest WHERE op <> 'D'
"""


def _r9_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog replay (operators.relational.apply_changelog): the
    base snapshot is each user's last event before Jan 15; events from
    Jan 15 on replay as a changelog where 'error' means DELETE and
    anything else upserts. Winner per key = greatest (ts, event_id) —
    a total order, so the final state is engine- and partitioning-
    exact. One window over the changelog only; base rows join, never
    window."""
    from knime_core_columnar_spark.operators.relational import apply_changelog
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        e.filter(F.col("ts") < cutoff)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("event_id", "ts", "user_id", "value")
    )
    changelog = e.filter(F.col("ts") >= cutoff).select(
        "event_id", "ts", "user_id", "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )
    return apply_changelog(
        base, changelog, keys=["user_id"], op_col="op",
        seq_cols=["ts", "event_id"],
    )


CONTAINMENT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> ('0x' || substring(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT)) AS s
      FROM toks
    ), nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_overlap,
           CAST(len(a.s) AS BIGINT) AS size_a
    FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
    WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(a.s)
"""


def _r9_containment_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment ≥ 4/5
    (operators.dedup.containment_pairs) — the quote/excerpt detector
    Jaccard cannot be (a short doc embedded in a long host scores
    containment 1.0 but Jaccard ≈ 0). Inverted-index candidates +
    integer verify; the oracle is brute-force ordered-pairs
    list_intersect."""
    from knime_core_columnar_spark.operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents")
    return containment_pairs(
        d, "doc_id", "text", shingle_n=3, threshold_num=4, threshold_den=5
    )


CONCENTRATION_ORACLE = """
    SELECT * FROM (
      SELECT 'o_orderstatus' AS col_name,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                       AS DECIMAL(38,0)) AS VARCHAR) AS sum_sq_counts,
             CAST(MAX(n) AS BIGINT) AS top_count
      FROM (SELECT o_orderstatus, COUNT(*) AS n FROM orders
            WHERE o_orderstatus IS NOT NULL GROUP BY 1)
      UNION ALL
      SELECT 'o_orderpriority', CAST(SUM(n) AS BIGINT),
             CAST(COUNT(*) AS BIGINT),
             CAST(CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                       AS DECIMAL(38,0)) AS VARCHAR), CAST(MAX(n) AS BIGINT)
      FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders
            WHERE o_orderpriority IS NOT NULL GROUP BY 1)
      UNION ALL
      SELECT 'l_returnflag', CAST(SUM(n) AS BIGINT),
             CAST(COUNT(*) AS BIGINT),
             CAST(CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                       AS DECIMAL(38,0)) AS VARCHAR), CAST(MAX(n) AS BIGINT)
      FROM (SELECT l_returnflag, COUNT(*) AS n FROM lineitem
            WHERE l_returnflag IS NOT NULL GROUP BY 1)
    )
"""


def _r9_concentration_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer value-concentration audit
    (operators.validate.concentration_profile): n, distinct, Σcount²,
    top count per categorical column — Gini impurity and top-share are
    exact rationals derived from these, with none of entropy's
    cross-engine ln() hazard."""
    from knime_core_columnar_spark.operators.validate import (
        concentration_profile,
    )

    o = concentration_profile(
        _t(spark, sf_dir, "orders"), ["o_orderstatus", "o_orderpriority"]
    )
    l = concentration_profile(_t(spark, sf_dir, "lineitem"), ["l_returnflag"])
    return o.unionByName(l).withColumnRenamed("column", "col_name")


def _moji_oracle() -> str:
    """Mojibake oracle SQL, built at import from the SAME pattern
    constants the operator uses (operators/text.py keeps the PATTERN
    constants in \\u escapes; the catalog's damage-injection literals
    and text.py's explanatory comment do intentionally contain the raw
    sequences)."""
    from knime_core_columnar_spark.operators.text import (
        CONTROL_PATTERN,
        MOJIBAKE_PATTERN,
        REPLACEMENT_CHAR,
    )

    return f"""
    WITH corrupted AS (
      SELECT doc_id,
             text
             || (CASE WHEN doc_id % 3 = 0
                      THEN ' caf' || chr(195) || chr(169) ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN chr(65533) ELSE '' END)
             || (CASE WHEN doc_id % 7 = 0 THEN chr(1) ELSE '' END) AS t2
      FROM documents
    ), counts AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t2, '{MOJIBAKE_PATTERN}')) AS BIGINT)
               AS n_mojibake,
             CAST(len(regexp_extract_all(t2, '{REPLACEMENT_CHAR}')) AS BIGINT)
               AS n_replacement,
             CAST(len(regexp_extract_all(t2, '{CONTROL_PATTERN}')) AS BIGINT)
               AS n_control
      FROM corrupted
    )
    SELECT doc_id, n_mojibake, n_replacement, n_control,
           (n_mojibake = 0 AND n_replacement = 0 AND n_control = 0) AS clean
    FROM counts
"""


MOJIBAKE_AUDIT_ORACLE = _moji_oracle()


def _r9_mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage audit (operators.text.mojibake_audit). The
    synthetic corpus is clean ASCII, so the query first injects
    deterministic damage — a double-decoded e-acute every 3rd doc, a
    U+FFFD every 5th, a C0 control byte every 7th — then runs the real
    operator. Zero-exchange scan-speed plan; the oracle counts the
    identical RE2 matches via regexp_extract_all."""
    from knime_core_columnar_spark.operators.text import mojibake_audit

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    corrupted = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit(" cafÃ©")).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit("�")).otherwise(F.lit("")),
            F.when(did % 7 == 0, F.lit("\x01")).otherwise(F.lit("")),
        ),
    )
    return mojibake_audit(corrupted, "doc_id", "text")


TOKEN_BUDGET_PLAN_ORACLE = """
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT *,
             CAST(CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT)
                            % 9 = 4
                       THEN 0
                       ELSE 10 + (CAST(regexp_extract(source, '([0-9]+)$', 1)
                                       AS INT) % 7) * 5 END AS BIGINT)
               AS weight
      FROM src
    ), tot AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS W FROM w WHERE weight > 0
    ), prefixed AS (
      SELECT w.*, W,
             CAST(n_tokens AS DOUBLE) / weight AS rk,
             SUM(n_tokens) OVER ord - n_tokens AS pt,
             SUM(weight) OVER ord - weight AS pw
      FROM w, tot WHERE weight > 0
      WINDOW ord AS (ORDER BY CAST(n_tokens AS DOUBLE) / weight, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), flags AS (
      SELECT *,
             MIN(CASE WHEN (24000 - pt) * weight >= n_tokens * (W - pw)
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY rk, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
               AS saturated
      FROM prefixed
    ), sat AS (
      SELECT coalesce(SUM(CASE WHEN saturated THEN n_tokens END), 0) AS st,
             coalesce(SUM(CASE WHEN saturated THEN weight END), 0) AS sw
      FROM flags
    ), alloc AS (
      SELECT source, n_docs, n_tokens, weight, saturated,
             CAST(CASE WHEN saturated THEN n_tokens
                       ELSE (24000 - st) * weight // (W - sw) END AS BIGINT)
               AS alloc_tokens
      FROM flags, sat
      UNION ALL
      SELECT source, n_docs, n_tokens, weight, FALSE AS saturated,
             CAST(0 AS BIGINT) AS alloc_tokens
      FROM w WHERE NOT (weight > 0)
    )
    SELECT source, n_docs, n_tokens, weight, saturated, alloc_tokens,
           CASE WHEN n_tokens > 0
                THEN round(CAST(alloc_tokens AS DOUBLE) / n_tokens, 6)
                ELSE 0.0 END AS sample_rate
    FROM alloc
"""


def _r9_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact water-filling token-budget mixture planning
    (operators.sampling.token_budget_plan): per-mille-ish weights
    derived deterministically from the source number (with two
    zero-weight sources exercising the excluded branch), budget 24000
    tokens — below the ~27k-token supply at the gate SFs so the
    high-weight sources saturate and the rest split the redistributed
    remainder (a genuine mixed case). Integer cross-multiplied
    saturation test; the only windows run over the ≤20-row source
    table."""
    from knime_core_columnar_spark.operators.sampling import token_budget_plan

    d = _t(spark, sf_dir, "documents")
    num = F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("int")
    weight = F.when(num % 9 == 4, F.lit(0)).otherwise(
        10 + (num % 7) * 5
    )
    return token_budget_plan(d, "source", weight, budget=24000)


DUP_SPAN_EXTRACT_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, pos, array_to_string(w[pos:pos+7], ' ') AS g
      FROM toks,
           UNNEST(generate_series(1, greatest(len(w) - 7, 0))) AS t(pos)
    ), flagged AS (
      SELECT doc_id, pos FROM grams
      WHERE g IN (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2)
    ), with_prev AS (
      SELECT doc_id, pos,
             MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
      FROM flagged
    ), islands AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM with_prev
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 8 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_dup_grams
    FROM islands GROUP BY doc_id, island
"""


def _r9_dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span extraction (operators.dedup.dup_span_extract,
    k=8): maximal merged token intervals whose every 8-gram repeats
    corpus-wide — the removal ranges of suffix-array substring dedup,
    computed as hash-count + gaps-and-islands. ~2.1k flagged positions
    across 47 docs at sf0.01 collapse into a few hundred spans. The
    oracle replays the identical pipeline on gram STRINGS (Spark counts
    two-independent-seed xxhash64 key pairs — same multiset barring
    ~1e-13 collisions)."""
    from knime_core_columnar_spark.operators.dedup import dup_span_extract

    return dup_span_extract(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=8, min_count=2
    )


LEAKAGE_SAFE_SPLIT_ORACLE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                          i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
                JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
    )
    SELECT doc_id, component,
           CASE WHEN ('0x' || substring(md5('split_' || CAST(component AS VARCHAR)), 1, 8))::BIGINT
                     % 1000 < 100 THEN 'test'
                WHEN ('0x' || substring(md5('split_' || CAST(component AS VARCHAR)), 1, 8))::BIGINT
                     % 1000 < 200 THEN 'val'
                ELSE 'train' END AS split
    FROM labeled
"""


def _r9_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split
    (operators.sampling.leakage_safe_split): near-dup clusters from the
    verified MinHash+LSH edge list (same derivation neardup_clusters
    pins), split decided per CLUSTER by salted label hash — a near-copy
    can never land in a different split than its twin. Oracle replays
    the closure as a recursive CTE and the split as the documented
    keyed_hash32 SQL equivalent."""
    from knime_core_columnar_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from knime_core_columnar_spark.operators.sampling import (
        leakage_safe_split,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    return leakage_safe_split(
        d, pairs, "doc_id", test_permille=100, val_permille=100
    )


TOKEN_FERTILITY_ORACLE = """
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
             CAST(len(string_split_regex(trim(
               regexp_replace(text, '([0-9]+|[^\\sA-Za-z0-9])', ' \\1 ', 'g')
             ), '\\s+')) AS BIGINT) AS n_pieces,
             CAST(len(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           round(CAST(SUM(n_pieces) AS DOUBLE) / SUM(n_words), 6) AS pieces_per_word,
           round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_pieces), 6) AS chars_per_piece
    FROM per_doc GROUP BY lang
"""


def _r9_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per language, whitespace words vs
    BPE-ish sub-word pieces (text.bpe_ish_token_count) and characters —
    pieces_per_word (fertility) and chars_per_piece (compression) are
    the go/no-go numbers for a tokenizer on a new language mix. One
    scan, one partially-aggregated groupBy(lang); ratios are single
    IEEE divisions of exact int64 sums."""
    from knime_core_columnar_spark.operators.text import (
        bpe_ish_token_count,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        token_count(F.col("text")).cast("long").alias("__w"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("__p"),
        F.length("text").cast("long").alias("__c"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("n_words"),
        F.sum("__p").alias("n_pieces"),
        F.sum("__c").alias("n_chars"),
        F.round(
            F.sum("__p").cast("double") / F.sum("__w").cast("double"), 6
        ).alias("pieces_per_word"),
        F.round(
            F.sum("__c").cast("double") / F.sum("__p").cast("double"), 6
        ).alias("chars_per_piece"),
    )


CALIBRATION_REPORT_ORACLE = """
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR) || '|cal_s'), 1, 15))::BIGINT
               % 10000 AS b1,
             ('0x' || substring(md5(CAST(event_id AS VARCHAR) || '|cal_y'), 1, 15))::BIGINT
               % 10000 AS b2
      FROM events
    ), scored AS (
      SELECT b1 / 10000.0 AS score,
             CASE WHEN b2 < b1 THEN 1 ELSE 0 END AS y
      FROM h
    ), binned AS (
      SELECT least(9, CAST(floor(score * 10) AS INT)) AS bin, score, y
      FROM scored
    ), agg AS (
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             round(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
               AS mean_score,
             round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS frac_pos
      FROM binned GROUP BY bin
    )
    SELECT bin, n, n_pos, mean_score, frac_pos,
           round(abs(mean_score - frac_pos), 6) AS gap
    FROM agg
"""


def _r9_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (operators.ml.calibration_report, 10 bins)
    over a synthetic well-calibrated classifier: score = stable hash
    bucket / 10⁴, label ~ Bernoulli(score) via an independent hash —
    so frac_pos tracks mean_score and the per-bin gap is small by
    construction. One partially-aggregated scan; decimal-exact score
    sums."""
    from knime_core_columnar_spark.operators.ml import calibration_report
    from knime_core_columnar_spark.operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "events").select("event_id")
    scored = e.select(
        (hash_bucket(["event_id"], "cal_s") / F.lit(10000.0)).alias("score"),
        (
            hash_bucket(["event_id"], "cal_y")
            < hash_bucket(["event_id"], "cal_s")
        ).alias("label"),
    )
    return calibration_report(scored, "score", "label", n_bins=10)


NUMERIC_DRIFT_ORACLE = """
    WITH old AS (
      SELECT value FROM events WHERE event_id % 2 = 0
    ), new AS (
      SELECT value * 1.2 + 10 AS value FROM events WHERE event_id % 2 = 1
    ), ob AS (
      SELECT CAST(CASE WHEN value < 0 THEN -1
                       WHEN value >= 500 THEN 10
                       ELSE least(9, CAST(floor((value - 0) / 50.0) AS INT)) END AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_old
      FROM old WHERE value IS NOT NULL GROUP BY 1
    ), nb AS (
      SELECT CAST(CASE WHEN value < 0 THEN -1
                       WHEN value >= 500 THEN 10
                       ELSE least(9, CAST(floor((value - 0) / 50.0) AS INT)) END AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_new
      FROM new WHERE value IS NOT NULL GROUP BY 1
    ), merged AS (
      SELECT COALESCE(ob.bin, nb.bin) AS bin,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM ob FULL OUTER JOIN nb ON ob.bin = nb.bin
    ), tot AS (
      SELECT CAST(SUM(n_old) AS BIGINT) AS t_o, CAST(SUM(n_new) AS BIGINT) AS t_n
      FROM merged
    )
    SELECT bin, n_old, n_new,
           round(n_old / t_o, 6) AS pct_old,
           round(n_new / t_n, 6) AS pct_new,
           round(n_new / t_n - n_old / t_o, 6) AS pct_diff
    FROM merged, tot
"""


def _r9_numeric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift audit (operators.validate.numeric_drift_report):
    the 'old' snapshot is the even-event half of events.value, the
    'new' snapshot the odd half scaled+shifted (×1.2 + 10) — a real
    location/scale drift the per-bin table makes visible. Fixed bin
    edges [0, 500) / 50 so the binning is engine-portable; exact int64
    counts, IEEE-division percentages."""
    from knime_core_columnar_spark.operators.validate import (
        numeric_drift_report,
    )

    e = _t(spark, sf_dir, "events").select("event_id", "value")
    old = e.filter(F.col("event_id") % 2 == 0).select("value")
    new = e.filter(F.col("event_id") % 2 == 1).select(
        (F.col("value") * 1.2 + 10).alias("value")
    )
    return numeric_drift_report(old, new, "value", lo=0.0, hi=500.0, n_bins=10)


DUP_SPAN_APPLY_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, pos, array_to_string(w[pos:pos+7], ' ') AS g
      FROM toks,
           UNNEST(generate_series(1, greatest(len(w) - 7, 0))) AS t(pos)
    ), counts AS (
      SELECT g, count(*) AS c,
             MIN(doc_id * 1000000 + pos) AS win
      FROM grams GROUP BY g HAVING count(*) >= 2
    ), losers AS (
      SELECT doc_id, pos
      FROM grams JOIN counts USING (g)
      WHERE NOT (doc_id = win // 1000000 AND pos = win % 1000000)
    ), with_prev AS (
      SELECT doc_id, pos,
             MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
      FROM losers
    ), islands AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM with_prev
    ), cuts AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
      FROM islands GROUP BY doc_id, island
    ), cut_pos AS (
      SELECT DISTINCT doc_id, cp
      FROM cuts, UNNEST(generate_series(s, e - 1)) AS u(cp)
    ), posns AS (
      SELECT doc_id, i, w[i] AS tok
      FROM toks, UNNEST(generate_series(1, len(w))) AS gi(i)
    ), kept AS (
      SELECT p.doc_id, p.i, p.tok, (cp.cp IS NOT NULL) AS cut
      FROM posns p LEFT JOIN cut_pos cp
        ON cp.doc_id = p.doc_id AND cp.cp = p.i
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN NOT cut THEN tok END, ' '
                               ORDER BY i), '') AS clean_text
    FROM kept GROUP BY doc_id
"""


def _r9_dup_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-dedup REWRITE (operators.dedup.dup_span_apply,
    k=8): the corpus-first occurrence of every duplicated 8-gram
    survives, all other copies are cut, documents are reassembled from
    surviving tokens. Oracle replays winner selection (encoded
    min(doc*1e6+pos) — positions ≪ 1e6 at every gate SF), the island
    merge, and the token-level rebuild on gram STRINGS."""
    from knime_core_columnar_spark.operators.dedup import dup_span_apply

    return dup_span_apply(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=8, min_count=2
    )


DIVERSE_SAMPLE_ORACLE = """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS c
      FROM (
        SELECT vec_id, embedding,
               ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|kmeans-seeds'), 1, 15))::BIGINT
                 % 10000 AS h
        FROM embeddings
      ), nn
      WHERE h <= least(10000, CAST(floor(320000.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, seeds s
      ) WHERE rk = 1
    ),
    u1 AS (
      SELECT cell_id, d, round(CAST(SUM(x6) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS m
      FROM (
        SELECT a1.cell_id,
               generate_subscripts(e.embedding, 1) AS d,
               CAST(round(CAST(unnest(e.embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x6
        FROM embeddings e JOIN a1 USING (vec_id)
      ) GROUP BY cell_id, d
    ),
    c1 AS (SELECT cell_id, list(m ORDER BY d) AS c FROM u1 GROUP BY cell_id),
    a2 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, c1 s
      ) WHERE rk = 1
    )
    SELECT vec_id, cell_id, CAST(rk AS BIGINT) AS rank_in_cell FROM (
      SELECT vec_id, cell_id,
             ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY
               ('0x' || substring(md5('diverse' || '_' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
               vec_id) AS rk
      FROM a2
    ) WHERE rk <= 10
"""


def _r9_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-balanced subset (operators.clustering.diverse_sample,
    k=8 cells × 10 per cell): the Lloyd loop of kmeans_clusters (same
    seeds, same two unrolled iterations in the oracle) followed by a
    salted-hash per-cell pick — every discovered embedding mode
    contributes equally to the sample."""
    from knime_core_columnar_spark.operators.clustering import diverse_sample

    e = _t(spark, sf_dir, "embeddings")
    return diverse_sample(
        e, k=8, n_per_cell=10, iters=2,
        corpus_count=_parquet_rows(sf_dir, "embeddings"),
    )


DRIFT_MONITOR_ORACLE = """
    WITH vals AS (
      SELECT ts, CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL
    ), binv AS (
      SELECT ts,
             CAST(CASE WHEN v < 0 THEN -1
                       WHEN v >= 500 THEN 10
                       ELSE least(9, CAST(floor((v - 0) / 50.0) AS INT)) END
                  AS BIGINT) AS bin
      FROM vals
    ), rb AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n FROM binv GROUP BY bin
    ), rt AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t FROM rb
    ), ref AS (
      SELECT bin, round(n / t, 6) AS ref_pct FROM rb, rt
    ), wc AS (
      SELECT date_trunc('hour', ts) AS win_start, bin,
             CAST(count(*) AS BIGINT) AS n
      FROM binv GROUP BY 1, 2
    ), grid AS (
      SELECT w.win_start, CAST(b.bin AS BIGINT) AS bin
      FROM (SELECT DISTINCT win_start FROM wc) w,
           (SELECT unnest(generate_series(-1, 10)) AS bin) b
    ), filled AS (
      SELECT g.win_start, g.bin, COALESCE(wc.n, 0) AS n
      FROM grid g LEFT JOIN wc ON wc.win_start = g.win_start
                               AND wc.bin = g.bin
    ), wt AS (
      SELECT win_start, CAST(SUM(n) AS BIGINT) AS t
      FROM filled GROUP BY win_start
    )
    SELECT f.win_start, f.bin, f.n,
           round(f.n / wt.t, 6) AS pct,
           COALESCE(ref.ref_pct, 0.0) AS ref_pct,
           round(f.n / wt.t - COALESCE(ref.ref_pct, 0.0), 6) AS pct_diff
    FROM filled f
    JOIN wt ON wt.win_start = f.win_start
    LEFT JOIN ref ON ref.bin = f.bin
"""


def _r9_drift_monitor_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift monitor (streaming.streaming_drift_monitor)
    run in batch mode — the SAME code executes as a readStream in
    production; the reference distribution is the full-corpus bin
    shares of events.value, so per-hour windows drift against the
    all-time shape. Stream/batch parity is pinned by
    test_drift_monitor_stream_matches_batch. Zero-count bins are
    emitted per window (a disappearing mode IS drift)."""
    from knime_core_columnar_spark.operators.validate import bin_shares
    from knime_core_columnar_spark.streaming.ops import (
        streaming_drift_monitor,
    )

    e = _t(spark, sf_dir, "events").select("ts", "value")
    ref = bin_shares(e, "value", 0.0, 500.0, 10)
    return streaming_drift_monitor(
        e, ref, "value", "ts", lo=0.0, hi=500.0, n_bins=10,
        window="1 hour", watermark=None,
    )


RESAMPLE_FFILL_ORACLE = """
    WITH obs AS (
      SELECT user_id AS k, ts AS ots, CAST(MAX(value) AS DOUBLE) AS v
      FROM events GROUP BY user_id, ts
    ), span AS (
      SELECT k, date_trunc('hour', MIN(ots)) AS lo, MAX(ots) AS hi
      FROM obs GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gts
      FROM span
    )
    SELECT g.k AS user_id, g.gts AS grid_ts, o.v AS value
    FROM grid g ASOF LEFT JOIN obs o
      ON g.k = o.k AND g.gts >= o.ots
"""


def _r9_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling (operators.temporal.resample_timeseries,
    ffill): each user's irregular event values align to an hourly grid
    spanning exactly that user's observed range, gap hours carrying the
    last observation forward. Observations pre-aggregate to one row
    per (user, ts) (max value) so the as-of tie rule is moot and both
    engines are deterministic; the oracle replays the grid with
    generate_series and the carry-forward with DuckDB's native ASOF
    JOIN — a genuinely different evaluation strategy than the
    union+carry plan."""
    from knime_core_columnar_spark.operators.temporal import (
        resample_timeseries,
    )

    e = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").cast("double").alias("value"))
    )
    return resample_timeseries(
        e, "user_id", "ts", "value", step="1 hour", strategy="ffill"
    )


RESAMPLE_INTERP_ORACLE = """
    WITH obs AS (
      SELECT user_id AS k, ts AS ots, CAST(MAX(value) AS DOUBLE) AS v
      FROM events GROUP BY user_id, ts
    ), span AS (
      SELECT k, date_trunc('hour', MIN(ots)) AS lo, MAX(ots) AS hi
      FROM obs GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gts
      FROM span
    ), b AS (
      SELECT g.k, g.gts, o.v AS pv, o.ots AS pts
      FROM grid g ASOF LEFT JOIN obs o ON g.k = o.k AND g.gts >= o.ots
    ), f AS (
      SELECT g.k, g.gts, o.v AS nv, o.ots AS nts
      FROM grid g ASOF LEFT JOIN obs o ON g.k = o.k AND g.gts <= o.ots
    )
    SELECT b.k AS user_id, b.gts AS grid_ts,
           CASE WHEN pv IS NULL THEN nv
                WHEN nv IS NULL OR epoch(nts) = epoch(pts) THEN pv
                ELSE pv + (nv - pv)
                     * ((epoch(b.gts) - epoch(pts))
                        / (epoch(nts) - epoch(pts)))
           END AS value
    FROM b JOIN f ON b.k = f.k AND b.gts = f.gts
"""


def _r9_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling (the other
    resample_timeseries strategy): each grid hour's value interpolates
    between the straddling observations on the epoch-seconds axis
    (boundary hours fall back to the nearest observation). Integer
    epoch differences keep the frac exact-input IEEE math identical
    across engines; the oracle uses a backward + forward native ASOF
    JOIN pair."""
    from knime_core_columnar_spark.operators.temporal import (
        resample_timeseries,
    )

    e = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").cast("double").alias("value"))
    )
    return resample_timeseries(
        e, "user_id", "ts", "value", step="1 hour", strategy="interp"
    )


CURRICULUM_ORDER_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT)
             AS curriculum_pos
    FROM t
"""


def _r9_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: every document's 0-based position in the
    short-to-long training order (the classic length curriculum;
    doc_id tie-break makes the order total). The global rank comes
    from sampling.global_index — range-partitioned two-phase prefix
    sum, NOT a single-reducer ROW_NUMBER window — so the ordering step
    a curriculum dataloader shards by survives a 100 TB corpus. The
    oracle IS the single-reducer window, validating the distributed
    numbering against the naive total order."""
    from knime_core_columnar_spark.operators.sampling import global_index
    from knime_core_columnar_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return global_index(
        d, [F.col("n_tokens"), F.col("doc_id")], "curriculum_pos"
    ).select(
        "doc_id", "n_tokens", F.col("curriculum_pos").cast("long").alias("curriculum_pos")
    )


def _norm_oracle() -> str:
    """normalize_text oracle, built from the SAME class constants the
    operator uses (kept in \\u escapes in operators/text.py)."""
    from knime_core_columnar_spark.operators.text import (
        DASH_PATTERN,
        DOUBLE_QUOTE_PATTERN,
        NBSP_PATTERN,
        SINGLE_QUOTE_PATTERN,
        ZERO_WIDTH_PATTERN,
    )

    return f"""
    WITH damaged AS (
      SELECT doc_id,
             text
             || (CASE WHEN doc_id % 3 = 0
                      THEN ' ' || chr(8216) || 'q' || chr(8217) || ' '
                           || chr(8220) || 'qq' || chr(8221) ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0
                      THEN chr(8203) || chr(8212) || 'dash' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0
                      THEN chr(160) || ' padded' ELSE '' END) AS t
      FROM documents
    ), n AS (
      SELECT doc_id, t,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(t, '{ZERO_WIDTH_PATTERN}', '', 'g'),
                       '{SINGLE_QUOTE_PATTERN}', '''', 'g'),
                     '{DOUBLE_QUOTE_PATTERN}', '"', 'g'),
                   '{DASH_PATTERN}', '-', 'g'),
                 '{NBSP_PATTERN}', ' ', 'g'),
               '\\s+', ' ', 'g')) AS norm_text
      FROM damaged
    )
    SELECT doc_id, norm_text, (norm_text != t) AS changed FROM n
"""


NORMALIZE_TEXT_ORACLE = _norm_oracle()


def _r9_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typographic normalization (operators.text.normalize_text — the
    repair counterpart of mojibake_audit's detection): deterministic
    damage is injected (curly quotes every 3rd doc, zero-width +
    em-dash every 4th, NBSP every 5th), then the fixed normalization
    chain strips invisibles, unifies glyphs to ASCII, and collapses
    whitespace. Zero-exchange scan-speed plan; the oracle replays the
    identical regexp chain from the shared class constants."""
    from knime_core_columnar_spark.operators.text import normalize_text

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    damaged = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.lit(" \u2018q\u2019 \u201cqq\u201d"),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0, F.lit("\u200b\u2014dash")
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0, F.lit("\u00a0 padded")
            ).otherwise(F.lit("")),
        ),
    )
    return normalize_text(damaged, "doc_id", "text")


def _fix_moji_oracle() -> str:
    """fix_mojibake oracle: the identical ordered literal-replace chain,
    generated from the SAME MOJIBAKE_FIXES constant."""
    from knime_core_columnar_spark.operators.text import MOJIBAKE_FIXES

    expr = "t"
    for src, dst in sorted(MOJIBAKE_FIXES, key=lambda q: -len(q[0])):
        src_sql = "||".join(f"chr({ord(c)})" for c in src)
        dst_sql = "||".join(f"chr({ord(c)})" for c in dst) if dst != " " else "' '"
        expr = f"replace({expr}, {src_sql}, {dst_sql})"
    return f"""
    WITH damaged AS (
      SELECT doc_id,
             text
             || (CASE WHEN doc_id % 3 = 0
                      THEN ' caf' || chr(195) || chr(169) ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0
                      THEN chr(226) || chr(8364) || chr(8482) || 's quote'
                      ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0
                      THEN chr(194) || chr(160) || 'pad' ELSE '' END) AS t
      FROM documents
    )
    SELECT doc_id, {expr} AS fixed_text,
           CAST(length(t) - length({expr}) AS BIGINT) AS chars_removed
    FROM damaged
"""


FIX_MOJIBAKE_ORACLE = _fix_moji_oracle()


def _r9_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-decode repair (operators.text.fix_mojibake): deterministic
    damage injection (double-decoded e-acute every 3rd doc, curly-quote
    triple every 4th, NBSP pair every 5th), then the ordered
    literal-replace chain restores the intended characters. The oracle
    generates the identical chain from the shared MOJIBAKE_FIXES
    constant."""
    from knime_core_columnar_spark.operators.text import fix_mojibake

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    damaged = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit(" caf\u00c3\u00a9")).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.lit("\u00e2\u20ac\u2122s quote"),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0, F.lit("\u00c2\u00a0pad")
            ).otherwise(F.lit("")),
        ),
    )
    return fix_mojibake(damaged, "doc_id", "text")


_R9_STAGED: dict[str, tuple] = {
    "fix_mojibake": (_r9_fix_mojibake, FIX_MOJIBAKE_ORACLE),
    "normalize_text": (_r9_normalize_text, NORMALIZE_TEXT_ORACLE),
    "curriculum_order": (_r9_curriculum_order, CURRICULUM_ORDER_ORACLE),
    "resample_interp": (_r9_resample_interp, RESAMPLE_INTERP_ORACLE),
    "resample_ffill": (_r9_resample_ffill, RESAMPLE_FFILL_ORACLE),
    "drift_monitor_batch": (_r9_drift_monitor_batch, DRIFT_MONITOR_ORACLE),
    "diverse_sample": (_r9_diverse_sample, DIVERSE_SAMPLE_ORACLE),
    "dup_span_apply": (_r9_dup_span_apply, DUP_SPAN_APPLY_ORACLE),
    "numeric_drift_report": (_r9_numeric_drift, NUMERIC_DRIFT_ORACLE),
    "calibration_report": (_r9_calibration_report, CALIBRATION_REPORT_ORACLE),
    "leakage_safe_split": (_r9_leakage_safe_split, LEAKAGE_SAFE_SPLIT_ORACLE),
    "token_fertility": (_r9_token_fertility, TOKEN_FERTILITY_ORACLE),
    "dup_span_extract": (_r9_dup_span_extract, DUP_SPAN_EXTRACT_ORACLE),
    "mojibake_audit": (_r9_mojibake_audit, MOJIBAKE_AUDIT_ORACLE),
    "token_budget_plan": (_r9_token_budget_plan, TOKEN_BUDGET_PLAN_ORACLE),
    "benford_audit": (_r9_benford_audit, BENFORD_AUDIT_ORACLE),
    "k_anonymity_audit": (_r9_k_anonymity_audit, K_ANONYMITY_ORACLE),
    "cdc_apply_changelog": (_r9_cdc_apply, CDC_APPLY_ORACLE),
    "containment_quotes": (_r9_containment_quotes, CONTAINMENT_ORACLE),
    "concentration_profile": (
        _r9_concentration_profile, CONCENTRATION_ORACLE,
    ),
}


def register_r9_queries(force: bool = False) -> bool:
    """Fold the staged round-9 queries into QUERIES/ORACLES. No-op until
    a later round flips ``force`` (or sets SPARK_GRAFT_REGISTER_R9=1)."""
    import os

    if not (force or os.environ.get("SPARK_GRAFT_REGISTER_R9")):
        return False
    for name, (fn, oracle) in _R9_STAGED.items():
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    return True


register_r9_queries()



# ---------------------------------------------------------------------------
# ROUND-7 PRE-STAGING — dormant until the round-7 flip (after
# CORRECTNESS_r06 lands green): replace the `apply_round6_layout()`
# call at the bottom of this module with `apply_round7_layout()`. That
# registers the R9 batch (all earlier batches re-applied first) and
# rotates the window onto the 20 R9 names (their FIRST driver check)
# + 30 rotation greens drawn from rows NOT in the r5/r6 windows —
# after this flip, zero `_R*_STAGED` dicts remain and every
# implemented operator is driver-registered.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R7 = [
    # the staged r9 batch, registered by apply_round7_layout()
    'benford_audit', 'calibration_report', 'cdc_apply_changelog',
    'concentration_profile', 'containment_quotes', 'curriculum_order',
    'diverse_sample', 'drift_monitor_batch', 'dup_span_apply',
    'dup_span_extract', 'fix_mojibake', 'k_anonymity_audit',
    'leakage_safe_split', 'mojibake_audit', 'normalize_text',
    'numeric_drift_report', 'resample_ffill', 'resample_interp',
    'token_budget_plan', 'token_fertility',
    # 30 rotation greens: driver-green rows absent from the r5 AND r6
    # windows (longest-unchecked first by catalog order)
    'kmeans_clusters', 'impute_timeseries', 'segment_dedup',
    'unigram_lm_quality', 'q21_waiting_suppliers', 'knn_classify',
    'entity_resolution', 'token_shards', 'correlation_matrix',
    'ann_topk_ivf', 'window_rank_stats', 'string_agg_sorted',
    'window_first_last', 'window_ntile', 'topk_ties', 'conditional_agg',
    'unpivot_metrics', 'date_spine', 'json_typed_extract', 'table_diff',
    'scd2_intervals', 'gaps_islands', 'regexp_extract_numbers',
    'contamination_check', 'boilerplate_ngrams', 'pii_redact',
    'corpus_shuffle', 'sequence_packing', 'referential_audit',
    # doc_repetition's rotation slot moved here from the r6 window
    # (displaced by bpe_encode); percentile_grid keeps its r0x green row
    'doc_repetition',
]


def apply_round7_layout() -> None:
    """Round-7 flip: register every staged batch and rotate the driver
    window onto _DRIVER_WINDOW_R7 (50 slots: 20 R9 first-time checks +
    30 rotation greens). Greens = everything driver-checked through
    round 6."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    register_r7_queries(force=True)
    register_r8_queries(force=True)
    register_r9_queries(force=True)
    assert len(_DRIVER_WINDOW_R7) == 50, len(_DRIVER_WINDOW_R7)
    _reorder_for_window(
        _DRIVER_WINDOW_R7,
        set(_DRIVER_GREEN_R123)
        | set(_DRIVER_WINDOW_R4)
        | set(_DRIVER_WINDOW_R5)
        | set(_DRIVER_WINDOW_R6),
    )

# Round-6 flip (executed per the ROUND-6 PLAYBOOK below): register the
# staged R7+R8 batches and rotate the driver window onto
# _DRIVER_WINDOW_R6. Runs at import time so the driver's `queries()`
# sees the rotated 50-name head. NOTE: apply_round6_layout() is defined
# below; the call is deferred to the bottom of the module.


# ---------------------------------------------------------------------------
# ROUND-6 PLAYBOOK (for the next session, once CORRECTNESS_r05 lands
# green): one-line flip — replace the `apply_round5_layout()` call above
# with `apply_round6_layout()`. That registers the staged R7+R8 batches
# (atop R5+R6, which apply_round6_layout re-applies first) and rotates
# the window onto _DRIVER_WINDOW_R6: the 15 R7+R8 names (first driver
# check; includes round-5's gopher_rules + c4_line_filter + dsir_select
# + url_host_stats + incremental_dedup_admit additions)
# + 35 rotation greens whose driver evidence is oldest (r02-era,
# not already re-checked by the round-5 rotation). After round 5 every
# registered name has a driver row, so there are no never-checked
# leftovers. Round 7 then registers R9 (register_r9_queries(force=True))
# and the staging program is complete — see README §Staging.
# test_round6_layout_prestaged pins the mechanics.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R6 = [
    # the staged r7+r8 batches, registered by apply_round6_layout()
    'cms_frequency', 'gopher_rules', 'c4_line_filter',
    'set_similarity_join', 'golden_record',
    'source_quota_sample', 'cluster_consensus_lang', 'join_explosion_profile',
    'source_similarity', 'length_bucketed_batches', 'novelty_scores',
    'stream_quota_admission', 'dsir_select', 'url_host_stats',
    'incremental_dedup_admit',
    # 16th first-time check, added in-round per VERDICT r5 #4: the
    # hash-checkable encode companion to the oracle-less bpe_merges
    'bpe_encode',
    # 34 rotation greens, oldest driver evidence first (r02-era rows
    # that were not part of the round-5 rotation). doc_repetition's
    # re-check moved to the round-7 window to make room for bpe_encode.
    'json_extract', 'q12_priority_class',
    'concat_uniquify', 'q4_order_priority', 'q6_forecast_revenue',
    'q7_nation_volume', 'q8_market_share', 'q10_returned_items',
    'q13_custdist', 'q14_promo_revenue', 'q15_top_supplier',
    'q17_small_qty_revenue', 'q18_large_orders', 'q19_disjunctive',
    'q22_idle_balance', 'asof_join_events', 'asof_forward_events',
    'range_join_events', 'moment_stats', 'corr_stats',
    'ann_topk_lsh', 'embedding_neardup_lsh', 'hash_split_stats',
    'stratified_sample_stats', 'zscore_normalize', 'iqr_outliers',
    'salted_join_skew', 'bucketed_join', 'upsert_orders',
    'events_dedup_latest', 'argmax_per_group', 'fuzzy_match_names',
    'tfidf_top_terms', 'chunk_documents',
]


def apply_round6_layout() -> None:
    """Round-6 flip: register the staged r7+r8 batches (r5+r6 first, for
    call-order independence) and rotate the driver window onto
    _DRIVER_WINDOW_R6 (50 slots: 15 freshly staged + 35 rotation
    greens). Greens = everything driver-checked through round 5."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    register_r7_queries(force=True)
    register_r8_queries(force=True)
    assert len(_DRIVER_WINDOW_R6) == 50, len(_DRIVER_WINDOW_R6)
    _reorder_for_window(
        _DRIVER_WINDOW_R6,
        set(_DRIVER_GREEN_R123)
        | set(_DRIVER_WINDOW_R4)
        | set(_DRIVER_WINDOW_R5),
    )


# Round-6 flip (see ROUND-6 PLAYBOOK above): register the staged R7+R8
# batches and rotate the driver window onto _DRIVER_WINDOW_R6. Runs at
# import time so the driver's `queries()` sees the rotated 50-name head.
# Round-7 playbook: replace this call with `apply_round7_layout()`.
apply_round6_layout()
