"""Round-9 differential fuzz: the four new operators
(vocab_coverage_curve, span_corruption_masks, temperature_mixture_plan,
fim_transform) on Spark vs their REGISTERED DuckDB oracle SQL over
random corpora — the same harness the driver's correctness gate uses,
but on hypothesis-drawn documents instead of the fixed testdata, so
tokenization and hash-arithmetic edges (unicode words, whitespace
runs, empty/NULL docs, single-token docs) get exercised beyond the
gate corpus. Deterministic (derandomize=True)."""

from __future__ import annotations

import duckdb
import math
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)

_WORDS = ["the", "fox", "ab", "x1", "Zz", "naïve", "日本", "a-b",
          "don't", "#", "..."]

_DOC = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(
        " ".join
    ),
    # hostile whitespace: tabs/newlines inside, leading/trailing runs
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(
        lambda ws: "  " + "\t".join(ws) + " \n "
    ),
)


def _oracle_rows(name, rows):
    """Run the REGISTERED oracle SQL for ``name`` against an in-memory
    DuckDB documents view built from ``rows`` (doc_id, text, source)."""
    from knime_core_columnar_spark import catalog

    con = duckdb.connect(":memory:")
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "source VARCHAR)"
    )
    if rows:
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return con.execute(catalog.ORACLES[name]).df()


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    # pandas renders a nullable int column as float64 — fold integral
    # floats to int on BOTH sides so 3.0 == 3; genuine fractional
    # doubles (coverage/share) stay exact floats
    if isinstance(v, float):
        return int(v) if v.is_integer() else v
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def _compare(spark_df, oracle_pdf, float_cols=()):
    cols = sorted(spark_df.columns)
    assert sorted(oracle_pdf.columns) == cols
    got = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()),
        key=repr,
    )
    want = sorted(
        (tuple(_norm(v) for v in row)
         for row in oracle_pdf[cols].itertuples(index=False, name=None)),
        key=repr,
    )
    assert got == want


@_SETTINGS
@given(texts=st.lists(_DOC, min_size=0, max_size=8))
def test_vocab_coverage_differential(spark_session, texts):
    from knime_core_columnar_spark.operators.text import (
        vocab_coverage_curve,
    )

    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    got = vocab_coverage_curve(_docs_df(spark_session, rows))
    _compare(got, _oracle_rows("vocab_coverage_curve", rows))


@_SETTINGS
@given(texts=st.lists(_DOC, min_size=0, max_size=6))
def test_span_corruption_differential(spark_session, texts):
    from knime_core_columnar_spark.operators.text import (
        span_corruption_masks,
    )

    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    got = span_corruption_masks(_docs_df(spark_session, rows))
    _compare(got, _oracle_rows("span_corruption_masks", rows))


@_SETTINGS
@given(texts=st.lists(_DOC, min_size=1, max_size=8),
       nsrc=st.integers(1, 4))
def test_temperature_mixture_differential(spark_session, texts, nsrc):
    from knime_core_columnar_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    rows = [(i, t, f"s{i % nsrc}") for i, t in enumerate(texts)]
    got = temperature_mixture_plan(
        _docs_df(spark_session, rows), source_col="source",
        budget=100_000, alpha=0.5,
    )
    _compare(got, _oracle_rows("temperature_mixture_plan", rows))


@_SETTINGS
@given(texts=st.lists(_DOC, min_size=0, max_size=8))
def test_fim_differential(spark_session, texts):
    from knime_core_columnar_spark.operators.text import fim_transform

    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    got = fim_transform(_docs_df(spark_session, rows))
    _compare(got, _oracle_rows("fim_transform", rows))


@_SETTINGS
@given(texts=st.lists(_DOC, min_size=0, max_size=8))
def test_language_mix_differential(spark_session, texts):
    from knime_core_columnar_spark.operators.text import language_mix_audit

    # fold in multi-paragraph docs with language-marker words so the
    # majority/tie paths get drawn, not just 'und' paragraphs
    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    rows.append((900, "the of is\nder und ist\nle et est\nthe and to", "s0"))
    rows.append((901, "el que y\nel los es\nthe of and", "s1"))
    got = language_mix_audit(_docs_df(spark_session, rows))
    _compare(got, _oracle_rows("language_mix_audit", rows))
