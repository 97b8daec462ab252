"""BPE merge training: verified against the worked example from the
original paper (Sennrich et al. 2016) plus segmentation behavior and
corpus-scale smoke on the documents table."""

from knime_core_columnar_spark.operators.bpe import (
    bpe_merges_df,
    bpe_segment,
    bpe_train,
    word_type_frequencies,
)


def _paper_corpus(spark):
    # word frequencies low:5 lower:2 newest:6 widest:3 — the classic
    # example; expressed as documents so the distributed stage runs
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")


def test_paper_example_merges(spark):
    df = _paper_corpus(spark)
    merges = bpe_train(df, num_merges=5, min_pair_count=1)
    got = [(a, b) for _, a, b, _ in merges]
    # e+s (9) → es+t (9) → est+</w> (9) → l+o (7) → lo+w (7)
    assert got == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")
    ]
    assert [c for *_, c in merges] == [9, 9, 9, 7, 7]


def test_word_type_frequencies_cap_and_order(spark):
    df = _paper_corpus(spark)
    types = word_type_frequencies(df, max_types=2)
    assert types == [("newest", 6), ("low", 5)]


def test_segment_applies_learned_merges(spark):
    df = _paper_corpus(spark)
    merges = bpe_train(df, num_merges=10, min_pair_count=1)
    assert bpe_segment("lowest", merges)[-1] == "est</w>"
    # unseen characters stay atomic
    assert "?" in bpe_segment("?", merges)[0]


def test_min_pair_count_stops_early(spark):
    df = _paper_corpus(spark)
    merges = bpe_train(df, num_merges=1000, min_pair_count=8)
    assert all(c >= 8 for *_, c in merges) and len(merges) == 3


def test_merges_df_roundtrip(spark):
    df = _paper_corpus(spark)
    merges = bpe_train(df, num_merges=3, min_pair_count=1)
    out = bpe_merges_df(spark, merges)
    assert out.columns == ["rank", "left", "right", "pair_count"]
    assert out.count() == 3


def test_corpus_scale_smoke(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(d, num_merges=20, max_types=5000)
    assert len(merges) == 20
    ranks = [r for r, *_ in merges]
    assert ranks == list(range(20))
    # counts are non-increasing is NOT guaranteed by BPE, but all must
    # be >= min_pair_count (default 2)
    assert all(c >= 2 for *_, c in merges)


def test_bpe_encode_matches_per_word_segmenter(spark):
    from knime_core_columnar_spark.operators.bpe import bpe_encode, bpe_segment

    df = _paper_corpus(spark)
    merges = bpe_train(df, num_merges=10, min_pair_count=1)
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "newest"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    want1 = (
        bpe_segment("low", merges)
        + bpe_segment("lower", merges)
        + bpe_segment("lowest", merges)
    )
    assert out[1]["pieces"] == want1
    assert out[1]["n_pieces"] == len(want1)
    assert out[2]["pieces"] == bpe_segment("newest", merges)
    assert out[3]["pieces"] == [] and out[4]["pieces"] == []  # no dropped rows
    # every word reconstructs: concatenating its pieces strips to word+</w>
    joined = "".join(out[2]["pieces"]).replace("</w>", " ").strip()
    assert joined == "newest"


def test_bpe_encode_preserves_id_column_type(spark):
    """String (and int) doc-ids pass through untouched — the mapInPandas
    output schema derives the id field's type from the input, it is not
    hardcoded to long."""
    from knime_core_columnar_spark.operators.bpe import bpe_encode

    merges = bpe_train(_paper_corpus(spark), num_merges=3, min_pair_count=1)
    docs = spark.createDataFrame(
        [("doc-a", "low"), ("doc-b", "newest")], "doc_id string, text string"
    )
    out = bpe_encode(docs, merges)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    got = {r["doc_id"]: r["pieces"] for r in out.collect()}
    assert set(got) == {"doc-a", "doc-b"} and got["doc-a"]

    docs_int = spark.createDataFrame([(7, "low")], "doc_id int, text string")
    assert (
        bpe_encode(docs_int, merges).schema["doc_id"].dataType.simpleString()
        == "int"
    )


def test_bpe_encode_partition_invariant_on_corpus(spark, sf_dir):
    from knime_core_columnar_spark.operators.bpe import bpe_encode

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges = bpe_train(d, num_merges=15, max_types=5000)
    a = sorted(
        (r["doc_id"], tuple(r["pieces"])) for r in bpe_encode(d, merges).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["pieces"]))
        for r in bpe_encode(d.repartition(13), merges).collect()
    )
    assert a == b and len(a) == 100
    assert all(p for _, p in a)  # non-empty docs encode to pieces


def _replay_chain(word: str, merges) -> list[str]:
    """Pure-Python replay of the DuckDB replace-chain oracle semantics:
    rank-ordered full passes, each pass replacing leftmost
    non-overlapping occurrences (what SQL replace() does on the
    '|sym|'-wrapped representation)."""
    s = "".join(f"|{c}|" for c in word) + "|</w>|"
    for _, a, b in merges:
        s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
    return [p for p in s.strip("|").split("||")]


def test_bpe_encode_matches_replace_chain_oracle(spark, sf_dir):
    """Chain-safety differential for the catalog's literal merge table
    (catalog.BPE_ENCODE_MERGES): the rank-ordered replace chain the
    DuckDB oracle unrolls must equal the library's lowest-rank-first
    one-at-a-time segmenter on EVERY distinct word of the corpus plus
    adversarial overlap/interaction words. Any future edit to the merge
    table that breaks the chain-safety invariant fails here before it
    can flake the driver gate."""
    from knime_core_columnar_spark import catalog
    from knime_core_columnar_spark.operators.bpe import _segment_ranked

    merges = catalog.BPE_ENCODE_MERGES
    ranks = {(a, b): r for r, a, b in merges}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = {
        w
        for row in d.select("text").collect()
        for w in (row["text"] or "").split()
    }
    # adversarial shapes: self-overlap, merged-symbol adjacency, pairs
    # competing for the same character, empty-ish words
    words |= {
        "atat", "aat", "ata", "scat", "scscan", "hashash", "joinjoin",
        "rowrow", "hasha", "scana", "erer", "inin", "a", "t", "x",
    }
    for w in sorted(words):
        assert _replay_chain(w, merges) == _segment_ranked(
            w, ranks, "</w>"
        ), w


def test_bpe_encode_catalog_query_shape(spark, sf_dir):
    """The registered bpe_encode query: scalar output columns, empty
    docs yield ('', 0), n_pieces consistent with the joined string."""
    from knime_core_columnar_spark import catalog

    out = catalog.QUERIES["bpe_encode"](spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "pieces_str", "n_pieces"
    ]
    rows = out.collect()
    assert len(rows) == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows:
        n = len(r["pieces_str"].split()) if r["pieces_str"] else 0
        assert n == r["n_pieces"]
