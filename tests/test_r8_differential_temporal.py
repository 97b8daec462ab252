"""Property-based DIFFERENTIAL tests for the temporal join family and
keyed upsert — the operators whose semantics live in inequality
predicates and tie/NULL rules, replayed in DuckDB with transparently
correct formulations (correlated subqueries / explicit inequality
joins) rather than replays of the engine's bucketing tricks:

- asof_join (backward/forward × strict/inclusive): every left row vs a
  LIMIT-1 correlated subquery. Right frames are drawn with UNIQUE
  (key, ts) pairs — with duplicate right timestamps the winning ROW is
  an engine-specific tie rule (pinned by the operator's own unit
  tests), so the fuzz stays on the domain where the winner is unique.
  NULL by-keys are excluded: the operator's shuffle-by-key groups NULL
  keys together while SQL equi-semantics never match them.
- range_join (all four bounds variants): the bucket-probe equi-join
  must equal the plain inequality band join. Timestamps are integer
  epoch seconds (the operator casts internally), so the oracle is pure
  integer arithmetic; NULL keys and NULL timestamps are IN domain
  (both engines drop them through the join predicate).
- upsert (null-safe keyed MERGE): update-wins-wholesale vs a FULL
  OUTER JOIN ON IS NOT DISTINCT FROM. NULL keys are in domain — the
  operator deliberately matches them (eqNullSafe).
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS, _multiset, _norm

_KEY = st.sampled_from(["a", "b", "c"])
_TS = st.integers(0, 50)
_VAL = st.integers(-1000, 1000)


@st.composite
def asof_frames(draw):
    rights = draw(st.lists(st.tuples(_KEY, _TS), unique=True, max_size=10))
    right = [(k, t, draw(_VAL)) for k, t in rights]
    left = draw(st.lists(st.tuples(_KEY, _TS, _VAL), max_size=10))
    return left, right


def _load(con, name, rows, decl):
    con.execute(f"CREATE OR REPLACE TABLE {name}({decl})")
    if rows:
        ph = ", ".join(["?"] * len(decl.split(",")))
        con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)


@_SETTINGS
@given(frames=asof_frames(),
       direction=st.sampled_from(["backward", "forward"]),
       strict=st.booleans())
def test_asof_join_matches_duckdb(spark_session, frames, direction, strict):
    from knime_core_columnar_spark.operators.temporal import asof_join

    left, right = frames
    l = spark_session.createDataFrame(
        [(i, k, t, x) for i, (k, t, x) in enumerate(left)],
        "lid long, k string, ts long, x long",
    )
    r = spark_session.createDataFrame(right, "k string, ts long, v long")
    got = asof_join(l, r, on="ts", by="k", strict=strict,
                    direction=direction)
    rows = [tuple(x) for x in got.collect()]
    names = got.columns

    op = {("backward", False): "<=", ("backward", True): "<",
          ("forward", False): ">=", ("forward", True): ">"}[
        (direction, strict)]
    order = "DESC" if direction == "backward" else "ASC"
    con = duckdb.connect()
    _load(con, "l", [(i, k, t, x) for i, (k, t, x) in enumerate(left)],
          "lid BIGINT, k VARCHAR, ts BIGINT, x BIGINT")
    _load(con, "r", right, "k VARCHAR, ts BIGINT, v BIGINT")
    sub = (f"(SELECT {{col}} FROM r WHERE r.k = l.k AND r.ts {op} l.ts "
           f"ORDER BY r.ts {order} LIMIT 1)")
    want = con.execute(
        "SELECT l.lid, l.k, l.ts, l.x, "
        + sub.format(col="r.ts") + " AS ts_r, "
        # the operator suffixes ONLY right columns that collide with a
        # left column name: ts -> ts_r, v stays v
        + sub.format(col="r.v") + " AS v FROM l"
    )
    wnames = [d[0] for d in want.description]
    assert sorted(names) == sorted(wnames)
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@st.composite
def range_frames(draw):
    key = st.one_of(st.none(), _KEY)
    ts = st.one_of(st.none(), _TS)
    left = draw(st.lists(st.tuples(key, ts), max_size=8))
    right = draw(st.lists(st.tuples(key, ts, _VAL), max_size=8))
    return left, right


@_SETTINGS
@given(frames=range_frames(), band=st.integers(1, 10),
       bounds=st.sampled_from(["(]", "[]", "()", "[)"]))
def test_range_join_matches_duckdb(spark_session, frames, band, bounds):
    from knime_core_columnar_spark.operators.temporal import range_join

    left, right = frames
    l = spark_session.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k string, lts long",
    )
    r = spark_session.createDataFrame(
        [(i, k, t, w) for i, (k, t, w) in enumerate(right)],
        "rid long, k string, rts long, w long",
    )
    got = range_join(l, r, key="k", left_ts="lts", right_ts="rts",
                     band_seconds=band, bounds=bounds)
    rows = [tuple(x) for x in got.collect()]
    names = got.columns

    lo_op = ">=" if bounds[0] == "[" else ">"
    hi_op = "<=" if bounds[1] == "]" else "<"
    con = duckdb.connect()
    _load(con, "l", [(i, k, t) for i, (k, t) in enumerate(left)],
          "lid BIGINT, k VARCHAR, lts BIGINT")
    _load(con, "r", [(i, k, t, w) for i, (k, t, w) in enumerate(right)],
          "rid BIGINT, k VARCHAR, rts BIGINT, w BIGINT")
    want = con.execute(
        "SELECT l.lid, l.k, l.lts, r.rid, r.rts, r.w FROM l JOIN r"
        f" ON l.k = r.k AND r.rts {lo_op} l.lts"
        f" AND r.rts {hi_op} l.lts + {band}"
    )
    wnames = [d[0] for d in want.description]
    assert sorted(names) == sorted(wnames)
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)


@st.composite
def upsert_frames(draw):
    key = st.one_of(st.none(), st.integers(0, 4))
    base = draw(st.lists(st.tuples(key, _VAL), max_size=8))
    updates = draw(st.lists(st.tuples(key, _VAL), max_size=8))
    return base, updates


@_SETTINGS
@given(frames=upsert_frames())
def test_upsert_matches_duckdb_merge(spark_session, frames):
    from knime_core_columnar_spark.operators.relational import upsert

    base, updates = frames
    b = spark_session.createDataFrame(base, "k long, v long")
    u = spark_session.createDataFrame(updates, "k long, v long")
    got = upsert(b, u, keys=["k"])
    rows = [tuple(x) for x in got.collect()]
    names = got.columns

    con = duckdb.connect()
    _load(con, "b", base, "k BIGINT, v BIGINT")
    _load(con, "u", updates, "k BIGINT, v BIGINT")
    want = con.execute(
        "SELECT CASE WHEN uu.__p IS NOT NULL THEN uu.k ELSE b.k END AS k,"
        " CASE WHEN uu.__p IS NOT NULL THEN uu.v ELSE b.v END AS v"
        " FROM b FULL OUTER JOIN"
        " (SELECT k, v, TRUE AS __p FROM u) uu"
        " ON b.k IS NOT DISTINCT FROM uu.k"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames)
