"""Property-based DIFFERENTIAL tests for the RELATIONAL surface —
joins (null/duplicate keys, all four how-modes), group-by aggregation
(NULL groups), min-RowID distinct, top-k ordering (NULLS FIRST
parity), set ops (null-safe value equality) and window row-numbering —
random small nullable frames on Spark vs the same semantics replayed
in DuckDB. Extends tests/test_r8_differential.py (core table algebra)
to the operator family where NULL semantics diverge most easily
between engines: join keys never match on NULL, GROUP BY and
INTERSECT/EXCEPT treat NULLs as equal, and sort NULL placement is an
engine default (Spark NULLS FIRST vs DuckDB NULLS LAST) that the
operator must pin explicitly.

Deterministic (derandomize=True), same conventions as the core suite:
column families fixed per name, |int| ≤ 2^40 so bigint↔double
promotion stays exact, no NaN/Inf. -0.0 is normalized to 0.0 in the
generated DATA (both engines see the same cleaned values) because
engines may legitimately differ on whether -0.0 and 0.0 share a
group/distinct bucket.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given
from hypothesis import strategies as st

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable
from tests.test_r8_differential import (
    _DTYPES,
    _FAMILY,
    _SETTINGS,
    _VALUES,
    _duck_table,
    _multiset,
    _norm,
    _spark_rows,
    _spark_table,
)


def _clean(cols):
    """Normalize -0.0 → 0.0 in place-built value lists (see module doc)."""
    return {
        c: (dt, [0.0 if isinstance(v, float) and v == 0 else v for v in vals])
        for c, (dt, vals) in cols.items()
    }


@st.composite
def frame_with(draw, required=("a",), min_rows=0, max_rows=8):
    """Like frame_spec, but the ``required`` columns are always present."""
    extra = draw(
        st.lists(st.sampled_from(list(_FAMILY)), min_size=0, max_size=3,
                 unique=True)
    )
    names = sorted(set(required) | set(extra))
    n = draw(st.integers(min_rows, max_rows))
    cols = {}
    for c in names:
        dt = draw(st.sampled_from(_DTYPES[_FAMILY[c]]))
        cols[c] = (dt, [draw(_VALUES[dt]) for _ in range(n)])
    return n, _clean(cols)


@st.composite
def frame_pair_shared_pool(draw, required=("a",)):
    """Two frames with IDENTICAL column specs whose rows are sampled
    from a small per-column value pool — guarantees value overlap so
    set-op tests exercise non-empty intersections."""
    extra = draw(
        st.lists(st.sampled_from(list(_FAMILY)), min_size=0, max_size=2,
                 unique=True)
    )
    names = sorted(set(required) | set(extra))
    pools = {}
    for c in names:
        dt = draw(st.sampled_from(_DTYPES[_FAMILY[c]]))
        pools[c] = (dt, draw(st.lists(_VALUES[dt], min_size=1, max_size=3)))
    n1 = draw(st.integers(0, 6))
    n2 = draw(st.integers(0, 6))
    c1 = {c: (dt, [draw(st.sampled_from(pool)) for _ in range(n1)])
          for c, (dt, pool) in pools.items()}
    c2 = {c: (dt, [draw(st.sampled_from(pool)) for _ in range(n2)])
          for c, (dt, pool) in pools.items()}
    return (n1, _clean(c1)), (n2, _clean(c2))


def _ordered(rows, colnames):
    """Order-SENSITIVE canonical form (columns sorted by name, row
    order preserved) — for asserting sorted results."""
    order = sorted(range(len(colnames)), key=lambda k: colnames[k])
    return [tuple(_norm(r[k]) for k in order) for r in rows]


@_SETTINGS
@given(s1=frame_with(), s2=frame_with(),
       how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
def test_join_matches_duckdb(spark_session, s1, s2, how):
    """Equi-join on a nullable numeric key (duplicates amplify, NULL
    keys never match) ≡ DuckDB JOIN / EXISTS / NOT EXISTS, including
    the concat-RowID rule and the _r rename of duplicate right
    columns."""
    from knime_core_columnar_spark.operators.relational import join

    n1, c1 = s1
    n2, c2 = s2
    t1 = _spark_table(spark_session, n1, c1, "x")
    t2 = _spark_table(spark_session, n2, c2, "y")
    rows, names = _spark_rows(join(t1, t2, on=["a"], how=how))

    con = duckdb.connect()
    _duck_table(con, "l", n1, c1, "x")
    _duck_table(con, "r", n2, c2, "y")
    lcols = [c for c in c1]
    rcols = [c for c in c2]
    if how in ("left_semi", "left_anti"):
        op = "" if how == "left_semi" else "NOT "
        sql = (
            f"SELECT l.* FROM l WHERE {op}EXISTS "
            "(SELECT 1 FROM r WHERE r.a = l.a)"
        )
    else:
        dup = set(lcols) & set(rcols)
        sel = ["CASE WHEN l.rk IS NULL THEN r.rk WHEN r.rk IS NULL THEN l.rk"
               " ELSE l.rk || '_' || r.rk END AS rk"]
        sel += [f"l.{c} AS {c}" for c in lcols]
        sel += [f"r.{c} AS {c + '_r' if c in dup else c}" for c in rcols]
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = f"SELECT {', '.join(sel)} FROM l {kw} r ON l.a = r.a"
    want = con.execute(sql)
    wnames = [d[0] for d in want.description]
    assert sorted(names) == sorted(wnames)
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=frame_with(required=("a", "c")))
def test_aggregate_matches_duckdb(spark_session, s):
    """groupBy on a nullable string key (NULL is a group in both
    engines) with order-insensitive aggregates, including the
    KNIME-style group-key RowID (null → '?')."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.operators.relational import aggregate

    n, cols = s
    t = _spark_table(spark_session, n, cols, "r")
    got = aggregate(
        t,
        ["c"],
        {
            "n": F.count(F.lit(1)),
            "n_a": F.count("a"),
            "mn": F.min("a"),
            "mx": F.max("a"),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "r")
    want = con.execute(
        "SELECT COALESCE(c, '?') AS rk, c,"
        " CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(a) AS BIGINT) AS n_a,"
        " MIN(a) AS mn, MAX(a) AS mx FROM t GROUP BY c"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=frame_with(min_rows=1))
def test_distinct_min_rowid_matches_duckdb(spark_session, s):
    """distinct keeps the MIN-RowID row per duplicate value tuple
    (NULLs equal) — pinned against DuckDB GROUP BY over all data
    columns. The frame is doubled (two RowID ranges, identical data)
    so every value tuple is a real duplicate group."""
    from knime_core_columnar_spark.operators.relational import distinct

    n, cols = s
    t1 = _spark_table(spark_session, n, cols, "x")
    t2 = _spark_table(spark_session, n, cols, "y")
    t = ColumnarTable(t1.df.unionByName(t2.df))
    rows, names = _spark_rows(distinct(t))

    con = duckdb.connect()
    _duck_table(con, "t1", n, cols, "x")
    _duck_table(con, "t2", n, cols, "y")
    datacols = ", ".join(cols)
    want = con.execute(
        f"SELECT MIN(rk) AS rk, {datacols} FROM "
        f"(SELECT * FROM t1 UNION ALL SELECT * FROM t2) GROUP BY {datacols}"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=frame_with(), k=st.integers(0, 5))
def test_sort_topk_matches_duckdb(spark_session, s, k):
    """Top-k by a nullable numeric with RowID tie-break, ORDER-SENSITIVE
    compare — pins Spark's NULLS FIRST default against an explicit
    DuckDB NULLS FIRST (DuckDB defaults to NULLS LAST)."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.operators.relational import sort

    n, cols = s
    t = _spark_table(spark_session, n, cols, "r")
    got = sort(t, [F.col("a").asc(), F.col(ROW_KEY).asc()], limit=k)
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "r")
    want = con.execute(
        f"SELECT * FROM t ORDER BY a ASC NULLS FIRST, rk LIMIT {k}"
    )
    wnames = [d[0] for d in want.description]
    assert sorted(names) == sorted(wnames)
    assert _ordered(rows, names) == _ordered(want.fetchall(), wnames)


@_SETTINGS
@given(pair=frame_pair_shared_pool())
def test_intersect_except_match_duckdb(spark_session, pair):
    """INTERSECT / EXCEPT with null-safe value equality and the
    re-derived min-RowID key, on frames sampled from a shared value
    pool (so intersections are usually non-empty)."""
    from knime_core_columnar_spark.operators.relational import except_, intersect

    (n1, c1), (n2, c2) = pair
    t1 = _spark_table(spark_session, n1, c1, "x")
    t2 = _spark_table(spark_session, n2, c2, "y")

    con = duckdb.connect()
    _duck_table(con, "l", n1, c1, "x")
    _duck_table(con, "r", n2, c2, "y")
    datacols = list(c1)
    cl = ", ".join(datacols)
    nullsafe = " AND ".join(
        f"(l.{c} IS NOT DISTINCT FROM v.{c})" for c in datacols
    )
    for op, fn in (("INTERSECT", intersect), ("EXCEPT", except_)):
        rows, names = _spark_rows(fn(t1, t2))
        want = con.execute(
            f"WITH v AS (SELECT {cl} FROM l {op} SELECT {cl} FROM r) "
            f"SELECT (SELECT MIN(l.rk) FROM l WHERE {nullsafe}) AS rk, v.*"
            " FROM v"
        )
        wnames = [d[0] for d in want.description]
        assert _multiset(rows, names) == _multiset(want.fetchall(), wnames), op


@_SETTINGS
@given(s=frame_with(required=("a", "d")))
def test_window_row_number_matches_duckdb(spark_session, s):
    """row_number partitioned by a nullable boolean (NULL is its own
    partition in both engines), ordered by RowID."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.operators.relational import window_apply

    n, cols = s
    t = _spark_table(spark_session, n, cols, "r")
    got = window_apply(
        t, ["d"], [F.col(ROW_KEY)],
        {"rn": lambda w: F.row_number().over(w)},
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "r")
    want = con.execute(
        "SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY d ORDER BY rk)"
        " AS BIGINT) AS rn FROM t"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s1=frame_with(required=("a", "c")), s2=frame_with(required=("a",)),
       k=st.integers(1, 4))
def test_chained_join_agg_topk_matches_duckdb(spark_session, s1, s2, k):
    """Three relational ops CHAINED — inner join on a nullable numeric
    key, group-by on a nullable string, top-k of the group counts —
    against one DuckDB query: catches interactions (join duplicate
    amplification feeding group cardinalities feeding an ordered limit)
    the per-op tests cannot."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.operators.relational import (
        aggregate,
        join,
        sort,
    )

    n1, c1 = s1
    n2, c2 = s2
    t1 = _spark_table(spark_session, n1, c1, "x")
    t2 = _spark_table(spark_session, n2, c2, "y")
    joined = join(t1, t2, on=["a"], how="inner")
    agged = aggregate(joined, ["c"], {"n": F.count(F.lit(1))})
    got = sort(agged, [F.col("n").desc(), F.col("c").asc_nulls_first()],
               limit=k)
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "l", n1, c1, "x")
    _duck_table(con, "r", n2, c2, "y")
    want = con.execute(
        # qualified l.c: the right frame may draw its own c column
        "SELECT COALESCE(l.c, '?') AS rk, l.c AS c,"
        " CAST(COUNT(*) AS BIGINT) AS n"
        " FROM l JOIN r ON l.a = r.a GROUP BY l.c"
        f" ORDER BY n DESC, l.c ASC NULLS FIRST LIMIT {k}"
    )
    wnames = [d[0] for d in want.description]
    assert _ordered(rows, names) == _ordered(want.fetchall(), wnames)


def test_join_null_keys_never_match(spark_session):
    """Hand case: a NULL join key matches nothing in any how-mode —
    the SQL three-valued-logic rule the fuzz relies on."""
    from knime_core_columnar_spark.operators.relational import join

    l = ColumnarTable(spark_session.createDataFrame(
        [("x0", None), ("x1", 1)], "_row_key string, a long"))
    r = ColumnarTable(spark_session.createDataFrame(
        [("y0", None), ("y1", 1)], "_row_key string, a long"))
    assert join(l, r, on=["a"], how="inner").df.count() == 1
    semi = join(l, r, on=["a"], how="left_semi").df
    anti = join(l, r, on=["a"], how="left_anti").df
    assert [row["_row_key"] for row in semi.collect()] == ["x1"]
    assert [row["_row_key"] for row in anti.collect()] == ["x0"]
