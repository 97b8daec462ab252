"""assemble_packed_sequences (round-10): the writer step after
pack_sequences — packed text, document-token-space boundaries, md5
certification. Hand cases + contiguity/coverage properties + plan pin
(text crosses exactly one exchange, the capacity-bounded pack group)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.packing import (
    assemble_packed_sequences,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundaries_are_contiguous_and_cover_packs(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(40)]
    out = assemble_packed_sequences(
        _docs(spark, rows), capacity=16, n_streams=4
    ).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["stream"], r["pack_id"]), []).append(r)
    assert by_pack
    for _, docs in by_pack.items():
        docs.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in docs:
            assert r["start_tok"] == pos          # exclusive prefix sum
            assert r["end_tok"] > r["start_tok"]
            pos = r["end_tok"]
        assert pos <= 16 or len(docs) == 1        # oversized doc alone
        assert len({r["pack_md5"] for r in docs}) == 1


def test_pack_md5_matches_python_assembly(spark):
    rows = [(1, "a  b\tc"), (2, "d e"), (3, "f"), (4, None), (5, "")]
    out = assemble_packed_sequences(
        _docs(spark, rows), capacity=100, n_streams=1
    ).collect()
    # everything lands in one stream/pack (total tokens 6 <= 100)
    docs = sorted(out, key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in docs] == [1, 2, 3, 4, 5]
    packed = " <|doc|> ".join(["a b c", "d e", "f", "", ""])
    want = hashlib.md5(packed.encode()).hexdigest()
    assert {r["pack_md5"] for r in docs} == {want}
    assert [(r["start_tok"], r["end_tok"]) for r in docs] == [
        (0, 3), (3, 5), (5, 6), (6, 6), (6, 6)
    ]


def test_assignments_match_pack_sequences(spark):
    """The writer must not re-decide packing: (id -> stream, pack)
    equals pack_sequences on the same token counts."""
    rows = [(i, " ".join(["tok"] * (3 + (i * 7) % 11))) for i in range(60)]
    d = _docs(spark, rows)
    out = assemble_packed_sequences(d, capacity=20, n_streams=4)
    toks = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.trim(F.coalesce("text", F.lit(""))),
                                r"\s+"), lambda x: x != ""))
        .cast("long").alias("n"),
    )
    want = pack_sequences(toks, "doc_id", "n", capacity=20, n_streams=4)
    a = {(r["doc_id"]): (r["stream"], r["pack_id"]) for r in out.collect()}
    b = {(r["doc_id"]): (r["stream"], r["pack_id"]) for r in want.collect()}
    assert a == b


def test_packed_text_one_exchange_plan(spark):
    from knime_core_columnar_spark import catalog

    df = catalog.QUERIES["packed_sequences_text"](
        spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "CartesianProduct" not in p
    assert "Window" not in p
    # pack assignment kernel + one id-keyed join + one pack grouping
    assert "FlatMapGroupsInPandas" in p
