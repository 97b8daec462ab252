"""Round-2 widening (part 1): analytic aggregates, ties, argmax, co-location.

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
    _artifact_tag,
    _dec,
    _ensure_pkg_on_executors,
    _publish_dir,
    _t,
    query,
)
from knime_core_columnar_spark.catalog.core import (  # noqa: F401
    q1_pricing_summary,
)
from knime_core_columnar_spark.catalog.llm_text import (  # noqa: F401
    neardup_clusters,
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
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t FROM documents
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
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t FROM documents
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
               / greatest(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')), 1) AS mean_token_len,
             CAST(len(list_distinct(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))) AS DOUBLE)
               / greatest(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')), 1) AS ttr
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
    ColumnarTable API; the three transform nodes are NOT hand-coded —
    they are expressed as KNIME node settings (the same NodeSettings
    shape the real workflow serializes, see
    tests/fixtures/simple_linear/) and compiled to a Plan by
    plans.workflow.compile_workflow, the code path that also compiles
    the reference's real settings.xml files in
    tests/test_knime_workflow.py. Spark CSV round-trips doubles via
    shortest-repr printing, so values stay bit-exact against the
    parquet-based oracle."""
    import os

    from knime_core_columnar_spark.plans.workflow import (
        WorkflowNode,
        compile_workflow,
    )
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
    t = read_csv(  # CSV Reader (bound per the node's CsvSourceSpec role)
        spark, csv_dir, schema=schema,
        key_columns=["l_orderkey", "l_linenumber"],
    )
    nodes = [
        WorkflowNode(  # Column Filter (#2)'s model shape
            factory="org.knime.base.node.preproc.filter.column."
                    "DataColumnSpecFilterNodeFactory",
            model={"column-filter": {"filter-type": "STANDARD",
                                     "included_names": cols}},
        ),
        WorkflowNode(  # String Manipulation (#3)'s model shape
            factory="org.knime.base.node.preproc.stringmanipulation."
                    "StringManipulationNodeFactory",
            model={"expression":
                   'upperCase(joinSep("_", $l_returnflag$, $l_linestatus$))',
                   "replaced_column": "flag_status",
                   "append_column": True},
        ),
        WorkflowNode(  # Row Filter (#4)'s model shape
            factory="org.knime.base.node.preproc.filter.row3."
                    "RowFilterNodeFactory",
            model={"matchCriteria": "AND", "outputMode": "MATCHING",
                   "predicates": {"0": {
                       "column": {"selected": "l_quantity"},
                       "operator": "GT",
                       "predicateValues": {"inputKind": "SINGLE", "values": {
                           "0": {"typeIdentifier": {"cell_class":
                                 "org.knime.core.data.def.IntCell"},
                                 "value": 25}}},
                   }}},
        ),
    ]
    plan, _ = compile_workflow(nodes, source_table="lineitem_csv")
    return plan.execute(spark, {"lineitem_csv": t}).df


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
             list_distinct(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS words,
             list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS lwords
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
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
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
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t FROM documents
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
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
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


