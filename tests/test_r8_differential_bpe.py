"""Differential + property fuzz for BPE training. The driver gate's
one rows-only entry is bpe_merges (iterative training is not
SQL-expressible), so this suite carries extra burden for it:

- the DISTRIBUTED stage (word_type_frequencies: explode → count →
  TakeOrdered) is fuzzed exactly against DuckDB on random
  whitespace-y corpora, including the ''-token edge of split(trim());
- the driver-side merge loop is pinned by ALGORITHM INVARIANTS that
  hold for any corpus: applying the learned merges to every corpus
  word reconstructs it exactly, merge pair counts are non-increasing
  in rank (a new pair involving the merged symbol can never out-count
  the merge that created it), ranks are contiguous from 0, and every
  recorded pair_count respects min_pair_count.
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS

_TEXT = st.text("ab c\t\nxy", min_size=0, max_size=24)


@_SETTINGS
@given(texts=st.lists(_TEXT, min_size=1, max_size=12),
       cap=st.integers(1, 12))
def test_word_type_frequencies_match_duckdb(spark_session, texts, cap):
    from knime_core_columnar_spark.operators.bpe import (
        word_type_frequencies,
    )

    df = spark_session.createDataFrame([(t,) for t in texts],
                                       "text string")
    got = word_type_frequencies(df, "text", max_types=cap)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    want = con.execute(
        "SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM ("
        "  SELECT unnest(list_filter(string_split_regex(trim(text),"
        "    '\\s+'), x -> x <> '')) AS w"
        "  FROM t)"
        f" GROUP BY w ORDER BY c DESC, w LIMIT {cap}"
    ).fetchall()
    assert got == [tuple(r) for r in want], (texts, cap, got, want)


@_SETTINGS
@given(texts=st.lists(st.text("abcd ", min_size=1, max_size=20),
                      min_size=1, max_size=10),
       num_merges=st.integers(1, 12))
def test_bpe_train_invariants(spark_session, texts, num_merges):
    from knime_core_columnar_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
        word_type_frequencies,
    )

    df = spark_session.createDataFrame([(t,) for t in texts],
                                       "text string")
    merges = bpe_train(df, "text", num_merges=num_merges,
                       min_pair_count=2)

    # ranks contiguous from 0; counts respect the floor and never
    # increase with rank
    assert [m[0] for m in merges] == list(range(len(merges)))
    counts = [m[3] for m in merges]
    assert all(c >= 2 for c in counts)
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts

    # segmentation with the learned merges reconstructs every word
    for word, _ in word_type_frequencies(df, "text", 1000):
        segs = bpe_segment(word, merges)
        joined = "".join(segs)
        assert joined in (word + "</w>", word), (word, segs)
