"""Property-based DIFFERENTIAL tests for the WINDOW-FUNCTION surface —
rank/dense_rank/cume_dist under order-key ties and NULLs, lag/lead,
running sums over ROWS frames, bounded RANGE frames (peers included),
ntile bucketing, and first/last with IGNORE NULLS — random small
nullable frames on Spark vs the same semantics replayed in DuckDB.

Window functions are where engines diverge subtly: NULL placement in
the window ORDER BY is an engine default (Spark ASC = NULLS FIRST,
DuckDB = NULLS LAST — the replay pins NULLS FIRST explicitly), ties
make row_number/lag/ntile nondeterministic (every test that needs a
total order orders by the unique RowID; tie-tolerant functions — rank,
dense_rank, cume_dist, RANGE-frame aggregates, which include peers by
definition — are the ones ordered by a deliberately tie-heavy key),
and DuckDB's SUM(BIGINT) widens to HUGEINT where Spark stays BIGINT
(the replay casts back).

Deterministic (derandomize=True); integer sums only (float window
accumulation order is not bit-stable across engines).
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.relational import window_apply
from knime_core_columnar_spark.schema import ROW_KEY
from tests.test_r8_differential import (
    _SETTINGS,
    _duck_table,
    _multiset,
    _spark_rows,
    _spark_table,
)

# a: nullable bigint value; c: nullable 2-pool partition key (NULL is
# its own partition in both engines); o: non-null tie-heavy order key
_A = st.one_of(st.none(), st.integers(-(2**40), 2**40))
_TIE = st.one_of(st.none(), st.integers(0, 3))


@st.composite
def wframe(draw, a_values=_A):
    n = draw(st.integers(0, 10))
    cols = {
        "a": ("bigint", [draw(a_values) for _ in range(n)]),
        "c": ("string",
              [draw(st.one_of(st.none(), st.sampled_from(["p", "q"])))
               for _ in range(n)]),
        "o": ("bigint", [draw(st.integers(0, 4)) for _ in range(n)]),
    }
    return n, cols


@_SETTINGS
@given(s=wframe(a_values=_TIE))
def test_rank_family_under_ties_matches_duckdb(spark_session, s):
    """rank / dense_rank / cume_dist partitioned by a nullable string,
    ordered by a TIE-HEAVY nullable key — deterministic despite ties
    (peers share ranks by definition). Pins NULLS FIRST parity and
    NULL-peers-of-each-other semantics."""
    n, cols = s
    t = _spark_table(spark_session, n, cols, "w")
    got = window_apply(
        t, ["c"], [F.col("a").asc()],
        {
            "rnk": lambda w: F.rank().over(w),
            "drnk": lambda w: F.dense_rank().over(w),
            "cd": lambda w: F.cume_dist().over(w),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "w")
    want = con.execute(
        "SELECT *,"
        " CAST(RANK() OVER win AS INT) AS rnk,"
        " CAST(DENSE_RANK() OVER win AS INT) AS drnk,"
        " CUME_DIST() OVER win AS cd"
        " FROM t WINDOW win AS (PARTITION BY c ORDER BY a NULLS FIRST)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=wframe())
def test_lag_lead_matches_duckdb(spark_session, s):
    """lag(1) / lead(2) with NULL defaults over a unique total order
    (RowID) — offsets past the partition edge are NULL in both."""
    n, cols = s
    t = _spark_table(spark_session, n, cols, "w")
    got = window_apply(
        t, ["c"], [F.col(ROW_KEY)],
        {
            "lg": lambda w: F.lag("a", 1).over(w),
            "ld": lambda w: F.lead("a", 2).over(w),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "w")
    want = con.execute(
        "SELECT *, LAG(a, 1) OVER win AS lg, LEAD(a, 2) OVER win AS ld"
        " FROM t WINDOW win AS (PARTITION BY c ORDER BY rk)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=wframe())
def test_running_sum_and_ntile_match_duckdb(spark_session, s):
    """ROWS UNBOUNDED PRECEDING..CURRENT running sum (NULL values
    skipped by SUM, all-NULL prefix stays NULL) + ntile(3) bucket
    assignment, both over the unique RowID order. DuckDB's HUGEINT sum
    is cast back to BIGINT."""
    n, cols = s
    t = _spark_table(spark_session, n, cols, "w")
    got = window_apply(
        t, ["c"], [F.col(ROW_KEY)],
        {
            "rs": lambda w: F.sum("a").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            "nt": lambda w: F.ntile(3).over(w),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "w")
    want = con.execute(
        "SELECT *,"
        " CAST(SUM(a) OVER (PARTITION BY c ORDER BY rk ROWS BETWEEN"
        "  UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs,"
        " CAST(NTILE(3) OVER (PARTITION BY c ORDER BY rk) AS INT) AS nt"
        " FROM t"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=wframe())
def test_range_frame_matches_duckdb(spark_session, s):
    """RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING over a tie-heavy
    non-null integer order key: the frame is VALUE-bounded and includes
    peers, so it is deterministic under ties — the semantics a ROWS
    frame cannot express and the easiest to get silently wrong."""
    n, cols = s
    t = _spark_table(spark_session, n, cols, "w")
    wr = (
        Window.partitionBy("c").orderBy(F.col("o")).rangeBetween(-2, 1)
    )
    got = window_apply(
        t, ["c"], [F.col("o")],
        {
            "s": F.sum("a").over(wr).cast("long"),
            "cnt": F.count(F.lit(1)).over(wr).cast("long"),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "w")
    want = con.execute(
        "SELECT *,"
        " CAST(SUM(a) OVER win AS BIGINT) AS s,"
        " CAST(COUNT(*) OVER win AS BIGINT) AS cnt"
        " FROM t WINDOW win AS (PARTITION BY c ORDER BY o"
        "  RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=wframe())
def test_first_last_ignore_nulls_match_duckdb(spark_session, s):
    """first/last with IGNORE NULLS over the growing ROWS prefix frame
    (the forward-fill primitive): last non-NULL value so far, and the
    partition's first non-NULL once one has appeared."""
    n, cols = s
    t = _spark_table(spark_session, n, cols, "w")
    got = window_apply(
        t, ["c"], [F.col(ROW_KEY)],
        {
            "fv": lambda w: F.first("a", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            "lv": lambda w: F.last("a", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        },
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "w")
    want = con.execute(
        "SELECT *,"
        " FIRST_VALUE(a IGNORE NULLS) OVER win AS fv,"
        " LAST_VALUE(a IGNORE NULLS) OVER win AS lv"
        " FROM t WINDOW win AS (PARTITION BY c ORDER BY rk ROWS BETWEEN"
        "  UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)
