"""Differential/property tests for the round-5 operators: each checks
a Spark implementation against an INDEPENDENT pure-Python reference
(different algorithm where possible), over seeded randomized inputs
evaluated in one Spark job per test."""

import math
import random

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# word_ngrams (let_col rewrite) vs a direct Python reference
# ---------------------------------------------------------------------------

def test_word_ngrams_matches_python_reference(spark):
    from knime_core_columnar_spark.operators.text import word_ngrams

    rng = random.Random(20260814)
    vocab = ["alpha", "b", "ccc", "dd", "e1", "züm", "x-y", "7"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(60)
    ] + ["", "one", "one two", "  padded   whitespace  run  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    for n in (2, 3):
        got = {
            r["i"]: list(r["g"])
            for r in df.select("i", word_ngrams(F.col("text"), n).alias("g")).collect()
        }
        for i, t in enumerate(texts):
            # Spark's split(trim(t), '\s+') of "" gives [""] (one empty
            # token); mirror that exactly
            toks = t.strip().split() if t.strip() else [""]
            want = (
                [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
                if len(toks) >= n
                else []
            )
            assert got[i] == want, (i, t, n, got[i], want)


# ---------------------------------------------------------------------------
# drift_bin boundary behavior (the clamp) vs a Python reference
# ---------------------------------------------------------------------------

def test_drift_bin_boundaries_and_clamp(spark):
    from knime_core_columnar_spark.operators.validate import drift_bin

    lo, hi, n_bins = 0.0, 485.97910379315636, 11  # inexact width on purpose
    width = (hi - lo) / n_bins
    rng = random.Random(7)
    vals = [rng.uniform(-50, 550) for _ in range(200)]
    vals += [lo, hi, math.nextafter(hi, 0), math.nextafter(lo, -1), 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["v"]: r["b"]
        for r in df.select("v", drift_bin(F.col("v"), lo, hi, n_bins).alias("b")).collect()
    }
    for v in vals:
        if v < lo:
            want = -1
        elif v >= hi:
            want = n_bins
        else:
            want = min(n_bins - 1, int(math.floor((v - lo) / width)))
        assert got[v] == want, (v, got[v], want)
        # the invariant the clamp protects: in-range values never land
        # in the overflow bin
        if lo <= v < hi:
            assert got[v] < n_bins


# ---------------------------------------------------------------------------
# token_budget_plan closed form vs the ITERATIVE water-filling fixpoint
# ---------------------------------------------------------------------------

def _py_waterfill(sources, budget):
    """Textbook iterative algorithm (genuinely different from the
    operator's sorted-prefix closed form): repeatedly saturate every
    source whose supply fits under the current fill level, until
    stable; then floor-allocate the rest."""
    active = {s for s, (t, w) in sources.items() if w > 0}
    sat = set()
    while True:
        st = sum(sources[s][0] for s in sat)
        sw = sum(sources[s][1] for s in sat)
        rw = sum(sources[s][1] for s in active - sat)
        if rw == 0:
            break
        newly = {
            s for s in active - sat
            if sources[s][0] * rw <= (budget - st) * sources[s][1]
        }
        if not newly:
            break
        sat |= newly
    st = sum(sources[s][0] for s in sat)
    sw = sum(sources[s][1] for s in sat)
    rw = sum(sources[s][1] for s in active - sat)
    out = {}
    for s, (t, w) in sources.items():
        if s in sat:
            out[s] = (True, t)
        elif s in active:
            out[s] = (False, (budget - st) * w // rw)
        else:
            out[s] = (False, 0)
    return out


def test_token_budget_plan_matches_iterative_fixpoint(spark):
    from knime_core_columnar_spark.operators.sampling import token_budget_plan

    rng = random.Random(20260814)
    for trial in range(4):
        n_src = rng.randint(2, 7)
        sources = {}
        rows = []
        for s in range(n_src):
            name = f"s{s}"
            n_tok = rng.randint(0, 40)
            w = rng.choice([0, 0, 5, 10, 15, 40])
            sources[name] = (n_tok, w)
            # one doc with exactly n_tok whitespace tokens (or empty)
            rows.append((name, " ".join(["w"] * n_tok) if n_tok else ""))
        # NB: an empty doc still splits to one "" token in Spark — give
        # empty sources one token of supply in the reference too
        for name, (t, w) in list(sources.items()):
            if t == 0:
                sources[name] = (1, w)
        budget = rng.randint(1, 120)
        df = spark.createDataFrame(rows, "source string, text string")
        wexpr = F.lit(None).cast("long")
        for name, (_, w) in sources.items():
            wexpr = F.when(F.col("source") == name, F.lit(w)).otherwise(wexpr)
        got = {
            r["source"]: (r["saturated"], r["alloc_tokens"])
            for r in token_budget_plan(df, "source", wexpr, budget=budget).collect()
        }
        want = _py_waterfill(sources, budget)
        assert got == want, (trial, budget, sources, got, want)
        # global invariants: never over-allocated, never over budget
        assert all(a <= sources[s][0] for s, (_, a) in got.items())
        assert sum(a for _, a in got.values()) <= budget or all(
            sat for s, (sat, _) in got.items() if sources[s][1] > 0
        )
