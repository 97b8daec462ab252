"""Byte-pair-encoding merge training (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, structured the way production BPE trainers are:

1. DISTRIBUTED: one pass over the corpus aggregates word-type
   frequencies (types ≪ tokens — the corpus never leaves this step),
   capped to the ``max_types`` most frequent types (count desc, word
   asc — deterministic). The cap bounds driver memory by a constant
   regardless of corpus size; at 100 TB the frequency table is the only
   shuffle, and it is a partial-aggregated word count.
2. DRIVER: the classic greedy merge loop over the (symbols, freq)
   table — each iteration counts adjacent symbol pairs weighted by word
   frequency and merges the most frequent pair. Work is
   O(num_merges × Σ|word|) over ≤ max_types words: independent of
   corpus size, exactly why every real BPE trainer (subword-nmt,
   SentencePiece, HF tokenizers) runs this loop on one node over the
   type table. Ties break deterministically: count desc, then pair
   lexicographic asc.

Words are segmented into unicode characters with a ``</w>``
end-of-word marker appended (the original formulation); merges never
cross word boundaries.

Not SQL-expressible (data-dependent iteration), so this operator is
pytest-verified against the paper's worked example rather than
oracle-compared; the distributed word-frequency stage reuses
``text.tokens`` whose explode+count shape IS oracle-checked via
vocab_build.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.text import tokens

__all__ = [
    "word_type_frequencies", "bpe_train", "bpe_merges_df", "bpe_segment",
    "bpe_encode",
]


def word_type_frequencies(
    df: DataFrame, text_col: str = "text", max_types: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed stage: the ``max_types`` most frequent word types as
    (word, count), ordered count desc then word asc. The orderBy+limit
    compiles to TakeOrdered (per-partition top-N + driver merge), not a
    global sort."""
    rows = (
        df.select(F.explode(tokens(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("__w"))
        .limit(max_types)
        .collect()
    )
    return [(r["__w"], r["__cnt"]) for r in rows]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += freq
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + freq
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    max_types: int = 50_000,
    min_pair_count: int = 2,
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns
    [(rank, left, right, pair_count)] in merge order. Stops early when
    the best remaining pair occurs fewer than ``min_pair_count`` times
    (weighted by word frequency)."""
    types = word_type_frequencies(df, text_col, max_types)
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in types:
        syms = tuple(list(word) + [end_of_word])
        vocab[syms] = vocab.get(syms, 0) + freq
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic best: count desc, then pair lexicographic asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        vocab = _merge_vocab(vocab, (a, b))
    return merges


def bpe_merges_df(spark: SparkSession, merges) -> DataFrame:
    """Merge table as a DataFrame (rank, left, right, pair_count) for
    persisting next to the corpus or broadcasting to a segmenter."""
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def _segment_ranked(word: str, ranks: dict, end_of_word: str) -> list[str]:
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_segment(word: str, merges, end_of_word: str = "</w>") -> list[str]:
    """Apply learned merges to one word (greedy by merge rank) — the
    inference side, exposed for tests and for driving tokenize-to-ids
    pipelines with a learned vocabulary."""
    ranks = {(a, b): r for r, a, b, _ in merges}
    return _segment_ranked(word, ranks, end_of_word)


def bpe_encode(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Distributed corpus tokenization with a TRAINED merge table — the
    inference half of the tokenizer (bpe_train learns merges; this
    applies them to every document). The merge table (≤ num_merges
    rows — kilobytes) ships inside the task closure, the standard
    broadcast-the-model shape; the corpus streams through one
    Arrow-batched ``mapInPandas`` scan with no shuffle at all.

    Per-partition word→pieces memoization does the heavy lifting: word
    TYPES repeat massively in natural text (Zipf), so the greedy merge
    loop runs once per distinct word per partition, not once per token.
    Encoding is a pure per-row function of (text, merges) — results are
    independent of partitioning and batch boundaries.

    Returns (id_col, pieces array<string>, n_pieces). NULL/empty text
    yields an empty piece list, not a dropped row.
    """
    import pandas as pd

    ranks = {(a, b): r for r, a, b, _ in merges}

    def enc(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, pieces_col, n_col = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in (t or "").split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _segment_ranked(w, ranks, end_of_word)
                    pieces.extend(got)
                ids.append(i)
                pieces_col.append(pieces)
                n_col.append(len(pieces))
            yield pd.DataFrame(
                {id_col: ids, "pieces": pieces_col, "n_pieces": n_col}
            )

    # the id column keeps its incoming type (string doc-ids are as
    # common as int64 ones); only pieces/n_pieces are invented here
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        enc, schema=f"{id_col} {id_type}, pieces array<string>, n_pieces long"
    )
