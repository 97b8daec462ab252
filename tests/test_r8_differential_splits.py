"""Invariant/replay fuzz for the leakage-safe split family:

- leakage_safe_split on random doc sets + random near-dup edge lists:
  exactly one split per doc, components agree with a python
  union-find, and — the operator's whole point — no two documents
  connected by any edge path ever straddle a split boundary.
- temporal_split_embargo replayed exactly in python (same int64
  epoch-micros fences, same single double multiply per fence), counts,
  distinct users and band extents compared row-for-row.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS
from tests.test_r8_differential_graph import _uf_labels

_DOC = st.integers(0, 20)


@_SETTINGS
@given(
    docs=st.lists(_DOC, unique=True, min_size=1, max_size=16),
    edges=st.lists(st.tuples(_DOC, _DOC), max_size=12),
    permille=st.sampled_from([(0, 0), (100, 100), (300, 200)]),
)
def test_leakage_safe_split_never_straddles_clusters(spark_session, docs,
                                                     edges, permille):
    from knime_core_columnar_spark.operators.sampling import (
        leakage_safe_split,
    )

    # edges may reference docs outside the corpus — keep only in-corpus
    # endpoints so every component member exists (matching how verified
    # near-dup pairs are produced from the corpus itself)
    edges = [(a, b) for a, b in edges if a in docs and b in docs]
    df = spark_session.createDataFrame([(d,) for d in docs],
                                       "doc_id long")
    pairs = spark_session.createDataFrame(edges or [(docs[0], docs[0])],
                                          "id_a long, id_b long")
    test_pm, val_pm = permille
    out = leakage_safe_split(df, pairs, test_permille=test_pm,
                             val_permille=val_pm).collect()

    assert sorted(r["doc_id"] for r in out) == sorted(docs)
    split_of = {r["doc_id"]: r["split"] for r in out}
    comp_of = {r["doc_id"]: r["component"] for r in out}
    assert set(split_of.values()) <= {"train", "val", "test"}
    if test_pm == val_pm == 0:
        assert set(split_of.values()) == {"train"}

    labels = _uf_labels(edges)
    for d in docs:
        assert comp_of[d] == labels.get(d, d)
    for a, b in edges:
        assert split_of[a] == split_of[b], (a, b, split_of)
    # same component -> same split, and the split is a pure function
    # of the component label
    by_comp = {}
    for d in docs:
        by_comp.setdefault(comp_of[d], set()).add(split_of[d])
    assert all(len(s) == 1 for s in by_comp.values())


@_SETTINGS
@given(
    events=st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 5)),
                    min_size=1, max_size=24),
    fracs=st.sampled_from([(0.5, 0.7), (0.7, 0.8), (0.6, 0.6)]),
)
def test_temporal_split_embargo_matches_python_replay(spark_session,
                                                      events, fracs):
    from knime_core_columnar_spark.operators.sampling import (
        temporal_split_embargo,
    )

    train_frac, emb_frac = fracs
    df = spark_session.createDataFrame(events, "ts long, user_id long")
    got = {r["split"]: (r["n_events"], r["n_users"], r["first_us"],
                        r["last_us"])
           for r in temporal_split_embargo(
               df, "ts", "user_id", train_frac, emb_frac).collect()}

    us = [t * 1_000_000 for t, _ in events]
    t0, t1 = min(us), max(us)
    span = float(t1) - float(t0)
    import math

    f1 = t0 + int(math.floor(train_frac * span))
    f2 = t0 + int(math.floor(emb_frac * span))
    bands = {}
    for (t, u) in events:
        tu = t * 1_000_000
        s = "train" if tu < f1 else "embargo" if tu < f2 else "test"
        bands.setdefault(s, []).append((tu, u))
    want = {
        s: (len(v), len({u for _, u in v}),
            min(tu for tu, _ in v), max(tu for tu, _ in v))
        for s, v in bands.items()
    }
    assert got == want, (events, fracs, f1, f2)
