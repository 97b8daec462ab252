"""Differential fuzz for sequence packing: the per-stream greedy
first-fit is a sequential recurrence, so the oracle is a direct python
replay over each stream's rows in ascending id order. Domain includes
zero-token documents (join the current pack for free) and documents
larger than the capacity (a pack of their own, spec behavior)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS


def _replay(ids_tokens, cap):
    packs = {}
    acc, pack = 0, -1
    for i, t in sorted(ids_tokens):
        if pack < 0 or acc + t > cap:
            pack += 1
            acc = t
        else:
            acc += t
        packs[i] = pack
    return packs


@st.composite
def corpus(draw):
    ids = draw(st.lists(st.integers(-1000, 1000), unique=True, max_size=20))
    cap = draw(st.integers(1, 30))
    rows = [(i, draw(st.integers(0, cap + 10))) for i in ids]
    return rows, cap


@_SETTINGS
@given(data=corpus(), n_streams=st.sampled_from([1, 4]))
def test_pack_sequences_matches_python_replay(spark_session, data,
                                              n_streams):
    from knime_core_columnar_spark.operators.packing import pack_sequences

    rows, cap = data
    df = spark_session.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", capacity=cap,
                         n_streams=n_streams).collect()
    assert len(out) == len(rows)
    assert {r["doc_id"] for r in out} == {i for i, _ in rows}

    # replay each stream independently (the stream split is the
    # engine's deterministic hash; the recurrence is what's under test)
    streams = {}
    tok = dict(rows)
    for r in out:
        streams.setdefault(r["stream"], []).append(r["doc_id"])
        assert r["n_tok"] == tok[r["doc_id"]]
    for s, ids in streams.items():
        want = _replay([(i, tok[i]) for i in ids], cap)
        got = {r["doc_id"]: r["pack_id"] for r in out if r["stream"] == s}
        assert got == want, (s, cap, sorted((i, tok[i]) for i in ids))

    # pack invariants: totals never exceed capacity unless the pack is
    # a single oversize doc
    packs = {}
    for r in out:
        packs.setdefault((r["stream"], r["pack_id"]), []).append(
            tok[r["doc_id"]])
    for members in packs.values():
        assert sum(members) <= cap or len(members) == 1


def test_pack_sequences_stream_assignment_is_input_order_invariant(spark):
    from knime_core_columnar_spark.operators.packing import pack_sequences

    rows = [(i, (i * 7) % 13) for i in range(40)]
    a = spark.createDataFrame(rows, "doc_id long, n_tok long")
    b = spark.createDataFrame(list(reversed(rows)),
                              "doc_id long, n_tok long").repartition(7)
    pa = {(r["doc_id"]): (r["stream"], r["pack_id"])
          for r in pack_sequences(a, "doc_id", "n_tok", 20).collect()}
    pb = {(r["doc_id"]): (r["stream"], r["pack_id"])
          for r in pack_sequences(b, "doc_id", "n_tok", 20).collect()}
    assert pa == pb
