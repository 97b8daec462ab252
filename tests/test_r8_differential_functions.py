"""Property-based DIFFERENTIAL tests for the scalar function registry
(functions/library.py) — each engine-portable builder applied through
``apply_function`` on random nullable inputs vs the equivalent DuckDB
expression on the same values.

Scope is the PORTABLE subset: functions whose semantics the two engines
define identically (ASCII string ops, exact math, date arithmetic on
DATE values, null handling, list ops). Deliberately excluded, with the
reason, so nobody "fixes" the suite by adding them back naively:

- transcendentals (exp/ln/log10/pow/sqrt): libm last-ulp differences
  across engines (see library.py module doc);
- to_date/format_date: Java pattern syntax vs strftime;
- greatest/least: engines disagree on NULL absorption;
- array_distinct: result ORDER is first-occurrence in Spark,
  unspecified in DuckDB;
- soundex: algorithm variants differ on non-letter input;
- upper/lower on non-ASCII: ICU vs utf8proc case tables;
- replace/index_of with EMPTY search string: boundary semantics
  differ;
- mod by zero: NULL in Spark, error in DuckDB;
- is_nan on NULL: Spark's isnan is null-REJECTING (returns false,
  documented), DuckDB's ISNAN propagates NULL — fuzzed on non-null
  input only (found by this suite's first run);
- array_join on an EMPTY array: Spark returns '' (the Postgres
  behavior), DuckDB's array_to_string returns NULL — fuzzed on
  non-empty arrays only (also found by this suite's first run);
- ceil/floor results are compared as doubles (Spark returns BIGINT),
  with inputs bounded to ±1e6 so the cast cannot overflow.

Inputs are drawn small and ASCII; nullable positions also draw NULL so
both engines must agree on propagation. Spark inputs go through a
one-row TYPED DataFrame (never an untyped void literal).
"""

from __future__ import annotations

import datetime

import duckdb
from hypothesis import given
from hypothesis import strategies as st

from knime_core_columnar_spark.functions.library import apply_function
from tests.test_r8_differential import _SETTINGS, _norm

_S = st.one_of(st.none(), st.text("abcXY z01_.,-", min_size=0, max_size=8))
_S1 = st.text("abxy z", min_size=1, max_size=3)  # non-empty needle
_I = st.one_of(st.none(), st.integers(-(2**40), 2**40))
_DM = st.one_of(  # bounded double: survives Spark's ceil/floor → BIGINT
    st.none(),
    st.floats(-1e6, 1e6, allow_nan=False, width=32),
)
_POS = st.integers(1, 9)
_N0 = st.integers(0, 9)
_PADC = st.text("*#", min_size=1, max_size=1)
_DAYS = st.integers(-40000, 40000)  # ±~109 years around 2000-01-01
_ARR = st.lists(st.integers(-1000, 1000), min_size=0, max_size=6)

_EPOCH = datetime.date(2000, 1, 1)
_D0 = "DATE '2000-01-01'"


def _lit_sql(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, list):
        return "[" + ", ".join(_lit_sql(x) for x in v) + "]"
    return repr(v)


# name -> (strategies, spark column types (None = pass raw to the
# builder as a Python arg), duckdb template over {0},{1},..., optional
# cast applied to BOTH engines' result column)
_CASES = {
    "upper": ((_S,), ("string",), "UPPER({0})", None),
    "lower": ((_S,), ("string",), "LOWER({0})", None),
    "strip": ((_S,), ("string",), "TRIM({0})", None),
    "length": ((_S,), ("string",), "LENGTH({0})", "bigint"),
    "substr": ((_S, _POS, _N0), ("string", None, None),
               "SUBSTRING({0}, {1}, {2})", None),
    "replace": ((_S, _S1, st.text("qz", max_size=2)),
                ("string", None, None), "REPLACE({0}, {1}, {2})", None),
    "index_of": ((_S, _S1), ("string", None), "STRPOS({0}, {1})", "bigint"),
    "pad_left": ((_S, _N0, _PADC), ("string", None, None),
                 "LPAD({0}, {1}, {2})", None),
    "pad_right": ((_S, _N0, _PADC), ("string", None, None),
                  "RPAD({0}, {1}, {2})", None),
    "reverse": ((_S,), ("string",), "REVERSE({0})", None),
    "starts_with": ((_S, _S1), ("string", None), "STARTS_WITH({0}, {1})",
                    None),
    "ends_with": ((_S, _S1), ("string", None), "ENDS_WITH({0}, {1})", None),
    "contains": ((_S, _S1), ("string", None), "CONTAINS({0}, {1})", None),
    "levenshtein": ((_S, _S), ("string", "string"),
                    "LEVENSHTEIN({0}, {1})", "bigint"),
    "md5": ((_S,), ("string",), "MD5({0})", None),
    "concat": ((_S, _S), ("string", "string"), "({0} || {1})", None),
    "abs": ((_I,), ("bigint",), "ABS({0})", "bigint"),
    "ceil": ((_DM,), ("double",), "CEIL({0})", "double"),
    "floor": ((_DM,), ("double",), "FLOOR({0})", "double"),
    "round": ((_DM, st.integers(0, 3)), ("double", None),
              "ROUND({0}, {1})", "double"),
    "mod": ((_I, st.integers(1, 97)), ("bigint", None), "({0} % {1})",
            "bigint"),
    "sign": ((_DM,), ("double",), "SIGN({0})", "double"),
    "is_nan": ((st.floats(-1e6, 1e6, allow_nan=False, width=32),),
               ("double",), "ISNAN({0})", None),
    "if_missing": ((_I, st.integers(-5, 5)), ("bigint", None),
                   "COALESCE({0}, {1})", "bigint"),
    "null_if": ((_I, st.integers(-2, 2)), ("bigint", None),
                "NULLIF({0}, {1})", "bigint"),
    "is_missing": ((_I,), ("bigint",), "({0} IS NULL)", None),
    "year": ((_DAYS,), ("date",), f"YEAR({_D0} + {{0}})", "bigint"),
    "month": ((_DAYS,), ("date",), f"MONTH({_D0} + {{0}})", "bigint"),
    "day": ((_DAYS,), ("date",), f"DAY({_D0} + {{0}})", "bigint"),
    "quarter": ((_DAYS,), ("date",), f"QUARTER({_D0} + {{0}})", "bigint"),
    "day_of_year": ((_DAYS,), ("date",), f"DAYOFYEAR({_D0} + {{0}})",
                    "bigint"),
    "week_of_year": ((_DAYS,), ("date",), f"WEEKOFYEAR({_D0} + {{0}})",
                     "bigint"),
    "last_day_of_month": ((_DAYS,), ("date",), f"LAST_DAY({_D0} + {{0}})",
                          None),
    "date_add_days": ((_DAYS, st.integers(-500, 500)), ("date", None),
                      f"({_D0} + {{0}} + {{1}})", None),
    "date_diff_days": ((_DAYS, _DAYS), ("date", "date"),
                       f"DATEDIFF('day', {_D0} + {{1}}, {_D0} + {{0}})",
                       "bigint"),
    "array_length": ((_ARR,), ("array<bigint>",), "LEN({0})", "bigint"),
    "array_contains": ((_ARR, st.integers(-1000, 1000)),
                       ("array<bigint>", None), "LIST_CONTAINS({0}, {1})",
                       None),
    "array_sort": ((_ARR,), ("array<bigint>",), "LIST_SORT({0})", None),
    "array_join": ((st.lists(st.integers(-1000, 1000), min_size=1,
                             max_size=6), st.just("|")),
                   ("array<bigint>", None), "ARRAY_TO_STRING({0}, {1})",
                   None),
    "array_max": ((_ARR,), ("array<bigint>",), "LIST_MAX({0})", "bigint"),
    "array_min": ((_ARR,), ("array<bigint>",), "LIST_MIN({0})", "bigint"),
}

# date-typed args: the drawn int is a day offset; the Spark column gets
# the materialized date, the DuckDB template the raw offset (added to
# DATE '2000-01-01' in SQL so both engines do their own date math)
def _spark_value(v, typ):
    if typ == "date":
        return _EPOCH + datetime.timedelta(days=v)
    return v


def _canon(v):
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return _norm(v)


def _run_case(spark, name, drawn):
    strategies, argtypes, tmpl, cast = _CASES[name]
    fields, rowvals, spark_args = [], [], []
    for i, (v, typ) in enumerate(zip(drawn, argtypes)):
        if typ is None:
            spark_args.append(v)
        else:
            fields.append(f"c{i} {typ}")
            rowvals.append(_spark_value(v, typ))
            spark_args.append(f"c{i}")
    df = spark.createDataFrame([tuple(rowvals)], ", ".join(fields))
    col = apply_function(name, *spark_args)
    if cast:
        col = col.cast(cast)
    got = df.select(col.alias("v")).collect()[0]["v"]

    sql = tmpl.format(*[_lit_sql(v) for v in drawn])
    if cast:
        sql = f"CAST(({sql}) AS {'VARCHAR' if cast == 'string' else cast})"
    want = duckdb.connect().execute(f"SELECT {sql} AS v").fetchone()[0]
    assert _canon(got) == _canon(want), (name, drawn, got, want, sql)


def _make_test(name):
    strategies = _CASES[name][0]

    @_SETTINGS
    @given(drawn=st.tuples(*strategies))
    def t(spark_session, drawn):
        _run_case(spark_session, name, drawn)

    t.__name__ = f"test_fn_{name}_matches_duckdb"
    t.__doc__ = f"registry '{name}' ≡ DuckDB: {_CASES[name][2]}"
    return t


for _n in _CASES:
    globals()[f"test_fn_{_n}_matches_duckdb"] = _make_test(_n)
del _n
