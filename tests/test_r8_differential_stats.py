"""Differential fuzz for the rank-correlation operator: Spearman per
group vs an INDEPENDENT numpy implementation of the standard
definition (average ranks with tie handling via argsort bookkeeping,
then Pearson on the ranks) — a genuinely different evaluation strategy
from the engine's windowed doubled-rank integer formulation. Non-null
domain (the engine ranks NULLs as a tied lowest group, which is a
deliberate extension of the textbook definition, pinned in its unit
tests)."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from tests.test_r8_differential import _SETTINGS


def _avg_ranks(v):
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and v[order[j + 1]] == v[order[i]]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _py_spearman(xs, ys):
    if len(xs) == 0:
        return None
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    dx, dy = rx - rx.mean(), ry - ry.mean()
    denom = np.sqrt((dx * dx).sum()) * np.sqrt((dy * dy).sum())
    if denom == 0:
        return None
    return float((dx * dy).sum() / denom)


_V = st.integers(-5, 5)  # small domain → heavy ties


@_SETTINGS
@given(rows=st.lists(st.tuples(st.sampled_from(["g1", "g2"]), _V, _V),
                     min_size=1, max_size=24))
def test_spearman_matches_numpy(spark_session, rows):
    from knime_core_columnar_spark.operators.relational import spearman

    df = spark_session.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: (r["n"], r["spearman"])
           for r in spearman(df, "x", "y", ["g"]).collect()}

    for g in {r[0] for r in rows}:
        xs = [x for gg, x, _ in rows if gg == g]
        ys = [y for gg, _, y in rows if gg == g]
        n, s = got[g]
        assert n == len(xs)
        want = _py_spearman(xs, ys)
        if want is None:
            assert s is None, (g, xs, ys, s)
        else:
            assert s is not None and abs(s - want) <= 1e-6, (g, xs, ys,
                                                             s, want)
