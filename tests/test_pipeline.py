"""operators/pipeline.py — end-to-end curation composition semantics:
stage ordering, canonical re-election, nothing-vanishes."""

from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.pipeline import (
    curate_corpus,
    curation_report,
)


def _corpus(spark):
    good = "the quick brown fox jumps over the lazy dog and then runs away home"
    rows = [
        (0, good),                                  # canonical keeper
        (1, good),                                  # exact dup of 0
        (2, good.replace("dog", "cat")),            # near dup of 0
        (3, "a a a a a a a a a a a a a a a a"),     # low quality (repetition)
        (4, "contact me at bob@example.com for the quick brown fox story today ok"),
        (5, "completely different words about spark engines processing data at scale"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages_and_redaction(spark):
    out = {r["doc_id"]: r for r in curate_corpus(_corpus(spark)).collect()}
    assert len(out) == 6  # every input doc reported
    assert out[0]["kept"] and out[0]["drop_stage"] is None
    assert out[1]["drop_stage"] == "exact_dup"
    assert out[2]["drop_stage"] == "near_dup"
    assert out[3]["drop_stage"] == "repetition"
    assert out[5]["kept"]
    # PII redacted in kept text, dropped docs carry no text
    assert out[4]["kept"] and "bob@example.com" not in out[4]["final_text"]
    assert "[EMAIL]" in out[4]["final_text"] or "@" not in out[4]["final_text"]
    assert out[1]["final_text"] is None and out[1]["n_tokens"] is None
    assert out[0]["n_tokens"] == 14


def test_curate_corpus_canonical_reelection(spark):
    """If a near-dup cluster's min-id copy fails an upstream gate, the
    cluster must elect a new canonical among survivors — not drop the
    whole cluster via a stale winner."""
    good = "the quick brown fox jumps over the lazy dog and then runs away home"
    # doc 0: pure repetition -> fails the repetition gate
    rows = [
        (0, "z z z z z z z z z z z z z z z z z z z z"),
        (1, good),
        (2, good.replace("dog", "cat")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curate_corpus(df).collect()}
    assert out[0]["drop_stage"] == "repetition"
    # 1 and 2 are near-dups of each other: exactly one survives
    kept = [i for i in (1, 2) if out[i]["kept"]]
    assert kept == [1]
    assert out[2]["drop_stage"] == "near_dup"


def test_curation_report_adds_up_and_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = curate_corpus(docs)
    rep = {r["outcome"]: r for r in curation_report(cur).collect()}
    assert sum(r["n_docs"] for r in rep.values()) == docs.count()
    assert "kept" in rep and rep["kept"]["total_tokens"] > 0
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, curate_corpus(docs.repartition(13)).collect()))
    assert a == b
