"""Property-based DIFFERENTIAL tests for the DEDUP surface — the
prefix-filter similarity self-join vs a plain exact-Jaccard replay in
DuckDB (the prefix-length / length-filter math must lose NOTHING),
corpus-wide paragraph dedup vs an independent python replay of the
split → trim → first-occurrence → rejoin contract, and exact_dedup's
whitespace/case normalization vs its python replay.

These complement the fixed-corpus catalog oracles: random corpora are
drawn from SMALL pools (vocabulary / paragraph) so duplicate density
is high by construction — the regime where an off-by-one in the
prefix length p = s − ceil(t·s) + 1 or a trim/empty-paragraph edge
actually drops pairs. Deterministic (derandomize=True).
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_r8_differential import _SETTINGS

_VOCAB = ["ab", "cd", "ef", "gh", "ij", "kl"]


@st.composite
def corpus(draw, max_docs=7, max_tokens=16):
    n = draw(st.integers(0, max_docs))
    return [
        " ".join(
            draw(st.lists(st.sampled_from(_VOCAB), min_size=0,
                          max_size=max_tokens))
        )
        for _ in range(n)
    ]


@_SETTINGS
@given(
    texts=corpus(),
    thr=st.sampled_from([(1, 2), (3, 5), (2, 3), (1, 1)]),
)
def test_prefix_filter_matches_duckdb_exact_jaccard(spark_session, texts,
                                                    thr):
    """prefix_filter_jaccard_pairs (SSJoin/PPJoin prefix + length
    filter, integer verify) ≡ the unfiltered inverted-index exact
    Jaccard join replayed in DuckDB — the filters are provably
    lossless, so the pair sets and (n_overlap, n_union) must be
    IDENTICAL at every rational threshold."""
    from knime_core_columnar_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    num, den = thr
    df = spark_session.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_overlap"], r["n_union"])
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", shingle_n=2,
            threshold_num=num, threshold_den=den,
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    if texts:
        con.executemany(
            "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
        )
    want = {
        (ia, ib): (i, u)
        for ia, ib, i, u in con.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
              FROM docs
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(w) - 1, 0) + 1),
                       i -> array_to_string(w[i:i+1], ' '))) AS s
              FROM toks
            ), ex AS (
              SELECT doc_id, len(s) AS sz, unnest(s) AS g
              FROM sh WHERE len(s) > 0
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.sz AS sa, b.sz AS sb, COUNT(*) AS i
              FROM ex a JOIN ex b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b,
                   CAST(i AS BIGINT), CAST(sa + sb - i AS BIGINT)
            FROM inter WHERE {den} * i >= {num} * (sa + sb - i)
            """
        ).fetchall()
    }
    assert got == want, (texts, thr)


_PARAS = ["alpha beta", "  alpha beta  ", "gamma", "", "delta eps zz"]


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_PARAS), min_size=0, max_size=5),
        min_size=0, max_size=6,
    )
)
def test_dedup_paragraphs_matches_python_replay(spark_session, docs):
    """dedup_paragraphs ≡ an independent python replay: split on the
    separator, trim, drop empties, keep each distinct paragraph's
    first (doc_id, position) occurrence, rejoin survivors in order.
    The paragraph pool forces heavy cross-doc and within-doc sharing
    plus whitespace-variant copies (trimmed forms collide)."""
    from knime_core_columnar_spark.operators.dedup import dedup_paragraphs

    texts = ["\n".join(ps) for ps in docs]
    df = spark_session.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }

    seen: set[str] = set()
    want: dict[int, tuple[int, int, str]] = {}
    for doc_id, text in enumerate(texts):
        paras = [p.strip() for p in text.split("\n")]
        paras = [p for p in paras if p != ""]
        if not paras:
            continue  # docs with no non-empty paragraph are absent
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[doc_id] = (len(paras), len(kept), "\n".join(kept))
    assert got == want, texts


@_SETTINGS
@given(
    texts=st.lists(
        st.sampled_from(
            ["A  B", "a b", " a B ", "ab", "x\ty", "x y z", ""]
        ),
        min_size=0, max_size=8,
    )
)
def test_exact_dedup_matches_python_replay(spark_session, texts):
    """exact_dedup keeps the min-RowID row per NORMALIZED fingerprint
    (lowercase, whitespace collapsed) — replayed in python over texts
    chosen so case/whitespace variants collide but distinct contents
    never do."""
    from knime_core_columnar_spark.operators.dedup import exact_dedup
    from knime_core_columnar_spark.table import ColumnarTable

    rows = [(f"r{i:03d}", t) for i, t in enumerate(texts)]
    t = ColumnarTable(
        spark_session.createDataFrame(rows, "_row_key string, text string")
    )
    got = sorted(
        (r["_row_key"], r["text"]) for r in exact_dedup(t).df.collect()
    )

    first: dict[str, tuple[str, str]] = {}
    for rk, txt in rows:  # rows are already in ascending RowID order
        key = " ".join(txt.strip().split()).lower()
        if key not in first:
            first[key] = (rk, txt)
    assert got == sorted(first.values()), texts
