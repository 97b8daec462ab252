"""Property-based DIFFERENTIAL tests for typed JSON extraction —
``from_json`` with a declared struct schema (the engine's
schema-declared JSON path, json_typed_extract) vs DuckDB's
``j ->> path`` + TRY_CAST over the SAME serialized documents.

Random flat + nested objects with missing keys, explicit nulls,
escape-heavy strings, and type-mismatched values: the coercion rules
(permissive-null on mismatch, missing ≡ null, nested access through a
missing parent) are where JSON engines quietly disagree. First run
proved the point: Spark's from_json is JSON-TYPE-STRICT — a quoted
"123" in a bigint field and a quoted "true" in a boolean field are
null, where DuckDB's text-path ->> + TRY_CAST resurrects them — so
the replay gates every cast on json_type(). Numbers and booleans
read into a STRING field stringify identically in both engines.
Deterministic (derandomize=True).
"""

from __future__ import annotations

import json

import duckdb
from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS, _multiset

_STR = st.text("ab\"\\\n\t é{}:,[]0", min_size=0, max_size=8)

_A_VALS = st.one_of(          # schema says BIGINT
    st.integers(-(2**40), 2**40),
    st.none(),
    st.sampled_from(["123", "xx", "12abc"]),   # digit-string + garbage
    st.booleans(),
)
_B_VALS = st.one_of(_STR, st.none(), st.integers(0, 9))  # schema: STRING
_C_VALS = st.one_of(st.booleans(), st.none(),
                    st.sampled_from(["true", "nope"]))   # schema: BOOLEAN
_G_VALS = st.one_of(st.integers(-100, 100), st.none())


@st.composite
def docs(draw):
    out = []
    for _ in range(draw(st.integers(0, 8))):
        d = {}
        if draw(st.booleans()):
            d["a"] = draw(_A_VALS)
        if draw(st.booleans()):
            d["b"] = draw(_B_VALS)
        if draw(st.booleans()):
            d["c"] = draw(_C_VALS)
        which = draw(st.integers(0, 2))
        if which == 1:
            d["f"] = {}
        elif which == 2:
            d["f"] = {"g": draw(_G_VALS)}
        out.append(json.dumps(d, ensure_ascii=False))
    return out


@_SETTINGS
@given(payloads=docs())
def test_from_json_matches_duckdb_try_cast(spark_session, payloads):
    from pyspark.sql import functions as F

    df = spark_session.createDataFrame(
        list(enumerate(payloads)), "id long, j string"
    )
    got = (
        df.select(
            "id",
            F.from_json(
                "j", "a bigint, b string, c boolean, f struct<g:bigint>"
            ).alias("p"),
        )
        .select(
            "id",
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("p.c").alias("c"),
            F.col("p.f.g").alias("g"),
        )
    )
    rows = [tuple(r) for r in got.collect()]
    names = got.columns

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, j VARCHAR)")
    if payloads:
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        list(enumerate(payloads)))
    # from_json is JSON-TYPE-STRICT (a quoted "123" in a bigint field
    # is null, 'true' in a boolean field is null), while ->> erases the
    # JSON type and TRY_CAST would resurrect them — the replay gates
    # every cast on json_type to encode Spark's exact coercion table
    want = con.execute(
        "SELECT id,"
        " CASE WHEN json_type(j, '$.a') IN ('BIGINT', 'UBIGINT')"
        "   THEN CAST(j ->> '$.a' AS BIGINT) END AS a,"
        " j ->> '$.b' AS b,"
        " CASE WHEN json_type(j, '$.c') = 'BOOLEAN'"
        "   THEN CAST(j ->> '$.c' AS BOOLEAN) END AS c,"
        " CASE WHEN json_type(j, '$.f.g') IN ('BIGINT', 'UBIGINT')"
        "   THEN CAST(j ->> '$.f.g' AS BIGINT) END AS g"
        " FROM t"
    )
    wnames = [d[0] for d in want.description]
    assert _multiset(rows, names) == _multiset(want.fetchall(), wnames), (
        payloads
    )
