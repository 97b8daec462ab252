"""Round-7 staged operators: count-min sketch, prefix-filtered exact
Jaccard join, survivorship merge, sqrt-temperature quota sampling, and
the cluster-consensus catalog wiring."""

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from knime_core_columnar_spark.operators.relational import golden_records
from knime_core_columnar_spark.operators.sampling import quota_sample
from knime_core_columnar_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def _token_df(spark, counts: dict, shard: str = "s0"):
    rows = [(shard, k) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "source string, token string")


def test_cms_estimate_never_undercounts(spark):
    counts = {f"t{i}": (i % 9) + 1 for i in range(200)}
    df = _token_df(spark, counts)
    sk = cms_merge(cms_sketch(df, "token", depth=4, width=32))
    probes = spark.createDataFrame([(k,) for k in counts], "token string")
    est = {
        r["token"]: r["est_count"]
        for r in cms_estimate(sk, probes, "token", depth=4, width=32).collect()
    }
    assert set(est) == set(counts)
    # classic CMS guarantee: estimates are never below the true count
    for k, n in counts.items():
        assert est[k] >= n
    # width 32 << 200 keys forces collisions: at least one overcount
    assert any(est[k] > n for k, n in counts.items())


def test_cms_shard_merge_equals_direct_sketch(spark):
    c1 = {"a": 5, "b": 3, "c": 7}
    c2 = {"a": 2, "d": 9}
    df1 = _token_df(spark, c1, "s1")
    df2 = _token_df(spark, c2, "s2")
    both = df1.unionByName(df2)
    merged = cms_merge(
        cms_sketch(both, "token", depth=3, width=16, shard_cols=["source"])
    )
    direct = cms_merge(cms_sketch(both, "token", depth=3, width=16))
    got = {(r["row"], r["bucket"], r["n"]) for r in merged.collect()}
    want = {(r["row"], r["bucket"], r["n"]) for r in direct.collect()}
    assert got == want


def test_cms_partitioning_invariant(spark):
    counts = {f"k{i}": i + 1 for i in range(50)}
    df = _token_df(spark, counts)
    probes = spark.createDataFrame([(k,) for k in counts], "token string")

    def run(frame):
        sk = cms_merge(cms_sketch(frame, "token", depth=4, width=16))
        return {
            (r["token"], r["est_count"])
            for r in cms_estimate(sk, probes, "token", depth=4, width=16).collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(13, "token"))


def test_cms_rejects_bad_shape(spark):
    df = _token_df(spark, {"a": 1})
    with pytest.raises(ValueError):
        cms_sketch(df, "token", depth=0)


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join
# ---------------------------------------------------------------------------

_DOCS = [
    (1, "w x y z a b c d e f"),
    (2, "w x y z a b c d e g"),   # near-dup of 1
    (3, "w x y z a b c d e f"),   # exact dup of 1
    (4, "p q r s t u v m n o"),   # disjoint
    (5, "p q r s t u v m n k"),   # near-dup of 4
    (6, "one two"),               # < shingle_n tokens: no shingles
]


def _brute_force(spark, docs, num, den):
    """All-pairs exact Jaccard via the inverted-index path of
    ngram_jaccard_pairs (no candidate pruning), integerized."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=num / den
    )
    return {(r["id_a"], r["id_b"]) for r in out.collect()}


def test_prefix_filter_matches_brute_force(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = prefix_filter_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold_num=3, threshold_den=5
    )
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert pairs == _brute_force(spark, _DOCS, 3, 5)
    # exact dup pair present with full overlap
    row = {
        (r["id_a"], r["id_b"]): (r["n_overlap"], r["n_union"])
        for r in got.collect()
    }
    assert row[(1, 3)][0] == row[(1, 3)][1]


def test_prefix_filter_partitioning_invariant(spark):
    df = spark.createDataFrame(_DOCS * 3, "doc_id long, text string").distinct()

    def run(frame):
        out = prefix_filter_jaccard_pairs(frame, threshold_num=1,
                                          threshold_den=2)
        return {
            (r["id_a"], r["id_b"], r["n_overlap"], r["n_union"])
            for r in out.collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(17, "doc_id"))


def test_prefix_filter_rejects_bad_threshold(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(df, threshold_num=0)
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(df, threshold_num=7, threshold_den=5)


# ---------------------------------------------------------------------------
# Survivorship merge
# ---------------------------------------------------------------------------

def test_golden_records_rules_and_tiebreak(spark):
    rows = [
        # entity 1: brand mode is B1 (2 vs 1); tie on type -> smallest wins
        (1, 10, "B1", "t2", 5),
        (1, 11, "B1", "t1", 9),
        (1, 12, "B2", None, 7),
        # entity 2: single record
        (2, 20, "B9", "t9", 1),
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, id long, brand string, typ string, size int"
    )
    out = {
        r["entity_id"]: r
        for r in golden_records(
            df, "entity_id", "id",
            mode_cols=["brand", "typ"], max_cols=["size"], min_cols=["size"],
        ).collect()
    }
    e1 = out[1]
    assert e1["n_records"] == 3
    assert e1["canonical_id"] == 10
    assert e1["brand_mode"] == "B1"
    # null dropped; t1 vs t2 each count 1 -> lexicographically smallest
    assert e1["typ_mode"] == "t1"
    assert e1["size_max"] == 9 and e1["size_min"] == 5
    assert out[2]["brand_mode"] == "B9"


def test_golden_records_partitioning_invariant(spark):
    rows = [(i % 5, i, f"b{i % 3}", f"t{i % 4}", i) for i in range(100)]
    df = spark.createDataFrame(
        rows, "entity_id long, id long, brand string, typ string, size int"
    )

    def run(frame):
        return {
            tuple(r)
            for r in golden_records(
                frame, "entity_id", "id", mode_cols=["brand", "typ"],
                max_cols=["size"],
            ).collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(11, "id"))


# ---------------------------------------------------------------------------
# Quota sampling
# ---------------------------------------------------------------------------

def test_quota_sample_quota_math_and_determinism(spark):
    # group sizes: g0=100 (quota 100 -> min(100, floor(10*10)=100) = 100),
    # g1=400 (quota min(400, 200)=200), g2=4 (quota 4: floor(10*2)=20 > 4)
    rows = (
        [("g0", i) for i in range(100)]
        + [("g1", 1000 + i) for i in range(400)]
        + [("g2", 9000 + i) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    kept = quota_sample(df, "source", "doc_id", scale=10)
    per = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"g0": 100, "g1": 200, "g2": 4}
    # deterministic kept SET under adversarial partitioning
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in quota_sample(
            df.repartition(23, "doc_id"), "source", "doc_id", scale=10
        ).collect()
    }
    assert ids1 == ids2


def test_quota_sample_no_global_window(spark):
    rows = [("g0", i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    plan = quota_sample(df, "source", "doc_id")._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must be partitioned (no empty partition spec
    # = single-reducer global window)
    for line in plan.splitlines():
        if "Window " in line and "partitionBy" not in line:
            assert "source" in line, f"global window in plan: {line}"


# ---------------------------------------------------------------------------
# Staged registration wiring
# ---------------------------------------------------------------------------

R7_NAMES = [
    "cms_frequency", "set_similarity_join", "golden_record",
    "source_quota_sample", "cluster_consensus_lang", "gopher_rules",
    "c4_line_filter",
]


def test_r7_section_registered():
    """The round-7 section registers at import (flat registry; the
    staging gates were removed in the round-7 refactor)."""
    from knime_core_columnar_spark import catalog

    for name in R7_NAMES:
        assert callable(catalog.QUERIES[name])
        assert name in catalog.ORACLES
    assert set(catalog.ORACLES) <= set(catalog.QUERIES)


def test_prefix_filter_randomized_matches_brute_force(spark):
    """Randomized differential check of the no-false-negative claim:
    seeded random corpora (small vocab -> dense overlaps, the worst
    case for prefix pruning) must yield EXACTLY the brute-force pair
    set at several thresholds."""
    import random

    for seed, (num, den) in [(11, (1, 2)), (23, (3, 5)), (47, (4, 5))]:
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
            for i in range(60)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"])
            for r in prefix_filter_jaccard_pairs(
                df, threshold_num=num, threshold_den=den
            ).collect()
        }
        want = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_n=3, threshold=num / den
            ).collect()
        }
        assert got == want, f"seed {seed} t={num}/{den}"


def test_cms_width_one_degenerates_to_total_count(spark):
    """Sanity invariant: with width=1 every key collides into the same
    bucket, so every estimate equals the total stream length."""
    counts = {f"k{i}": i + 1 for i in range(10)}
    total = sum(counts.values())
    df = _token_df(spark, counts)
    sk = cms_merge(cms_sketch(df, "token", depth=3, width=1))
    probes = spark.createDataFrame([(k,) for k in counts], "token string")
    est = cms_estimate(sk, probes, "token", depth=3, width=1).collect()
    assert all(r["est_count"] == total for r in est)
