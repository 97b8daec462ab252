"""Additional TPC-H-adapted queries + approximate aggregates + nested types.

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
    query,
)

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


