"""Property-based DIFFERENTIAL tests for the multi-level grouping
surface — ROLLUP / CUBE through the aggregate wrapper vs DuckDB's
GROUP BY ROLLUP / CUBE, on random frames whose group columns contain
NULLs. That is the semantic minefield: a data-NULL group and a
rolled-up subtotal carry identical values, and only the multiset (or
an explicit GROUPING() id) separates correct from merged/duplicated
output. Also pins the KNIME-style RowID derivation ('?' for NULL, '_'
join) and the ``include_grouping_id`` disambiguator against DuckDB's
GROUPING() bitmask. Deterministic (derandomize=True).
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st

from knime_core_columnar_spark.operators.relational import aggregate
from knime_core_columnar_spark.schema import ROW_KEY
from tests.test_r8_differential import (
    _SETTINGS,
    _duck_table,
    _multiset,
    _spark_rows,
    _spark_table,
)


@st.composite
def gframe(draw, min_rows=0):
    n = draw(st.integers(min_rows, 10))
    cols = {
        "a": ("bigint",
              [draw(st.one_of(st.none(), st.integers(-5, 5)))
               for _ in range(n)]),
        "c": ("string",
              [draw(st.one_of(st.none(), st.sampled_from(["p", "q"])))
               for _ in range(n)]),
        "d": ("boolean",
              [draw(st.one_of(st.none(), st.booleans()))
               for _ in range(n)]),
    }
    return n, cols


_DUCK_KEY = (
    "COALESCE(CAST(c AS VARCHAR), '?') || '_' || "
    "COALESCE(CAST(d AS VARCHAR), '?')"
)


@_SETTINGS
@given(s=gframe(min_rows=1), mode=st.sampled_from(["rollup", "cube"]))
def test_rollup_cube_match_duckdb(spark_session, s, mode):
    """count + integer sum over (nullable c, nullable d): every
    grouping-set row — including the ambiguous data-NULL twins — must
    appear with exactly the right multiplicity and RowID. Non-empty
    frames only: over empty input Spark itself omits the standard
    grand-total row (pinned below; empty_grand_total=True restores it
    and is fuzzed on all frames including empty)."""
    from pyspark.sql import functions as F

    n, cols = s
    t = _spark_table(spark_session, n, cols, "g")
    got = aggregate(
        t, ["c", "d"],
        {"n": F.count(F.lit(1)), "s": F.sum("a")},
        grouping=mode,
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "g")
    kw = "ROLLUP" if mode == "rollup" else "CUBE"
    want = con.execute(
        f"SELECT {_DUCK_KEY} AS rk, c, d,"
        " CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS s"
        f" FROM t GROUP BY {kw} (c, d)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=gframe(min_rows=1))
def test_grouping_id_disambiguates_null_groups(spark_session, s):
    """include_grouping_id ≡ DuckDB GROUPING(c, d), and the id-suffixed
    RowID is UNIQUE even when data-NULL groups shadow subtotals."""
    from pyspark.sql import functions as F

    n, cols = s
    t = _spark_table(spark_session, n, cols, "g")
    got = aggregate(
        t, ["c", "d"], {"n": F.count(F.lit(1))},
        grouping="rollup", include_grouping_id=True,
    )
    rows, names = _spark_rows(got)
    rk_idx = names.index("rk")
    keys = [r[rk_idx] for r in rows]
    assert len(keys) == len(set(keys))  # collision-free despite NULLs

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "g")
    want = con.execute(
        f"SELECT {_DUCK_KEY} || '#' || CAST(GROUPING(c, d) AS VARCHAR)"
        " AS rk, c, d, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(GROUPING(c, d) AS BIGINT) AS grouping_id"
        " FROM t GROUP BY ROLLUP (c, d)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@_SETTINGS
@given(s=gframe(), mode=st.sampled_from(["rollup", "cube"]))
def test_empty_grand_total_matches_duckdb_on_all_frames(spark_session, s,
                                                        mode):
    """empty_grand_total=True ≡ DuckDB on EVERY frame, including the
    empty one where Spark's native rollup/cube emit nothing — the
    spliced global aggregate must be indistinguishable from the
    standard () grouping-set row (same counts, sums, RowID)."""
    from pyspark.sql import functions as F

    n, cols = s
    t = _spark_table(spark_session, n, cols, "g")
    got = aggregate(
        t, ["c", "d"],
        {"n": F.count(F.lit(1)), "s": F.sum("a")},
        grouping=mode, empty_grand_total=True,
    )
    rows, names = _spark_rows(got)

    con = duckdb.connect()
    _duck_table(con, "t", n, cols, "g")
    kw = "ROLLUP" if mode == "rollup" else "CUBE"
    want = con.execute(
        f"SELECT {_DUCK_KEY} AS rk, c, d,"
        " CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS s"
        f" FROM t GROUP BY {kw} (c, d)"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


def test_spark_empty_rollup_divergence_pinned(spark_session):
    """The divergence the fuzz found, pinned: Spark's native rollup on
    empty input emits NO rows (the SQL standard and DuckDB emit the
    grand-total row); the wrapper default inherits that single-scan
    behavior and empty_grand_total=True restores the standard row."""
    from pyspark.sql import functions as F

    t = _spark_table(spark_session, 0, {"c": ("string", [])}, "g")
    assert aggregate(
        t, ["c"], {"n": F.count(F.lit(1))}, grouping="rollup"
    ).df.count() == 0
    rows = aggregate(
        t, ["c"], {"n": F.count(F.lit(1))}, grouping="rollup",
        empty_grand_total=True,
    ).df.collect()
    assert len(rows) == 1 and rows[0]["n"] == 0 and rows[0]["c"] is None
