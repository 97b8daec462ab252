"""Mergeable summary sketches for corpus-scale frequency questions.

Complements ``sampling.hll_shard_sketches`` (distinct counts) with the
frequency side: Misra-Gries heavy hitters with an exact-recount second
pass, so the FINAL answer is exact (oracle-comparable) while the scan
that finds candidates keeps only O(capacity) state per partition.

The reference engine has no sketch surface (its statistics are the
exact per-column domains of ``DomainWritable``,
``org.knime.core.data.columnar.domain``); these exist for the
training-data workloads the engine targets — top-token audits,
vocabulary pruning, boilerplate screens — where a full GROUP BY over a
100 TB token explosion is the thing to avoid.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition's key stream: at most ``capacity``
    (key, undercount) survivors. Classic guarantee: any key with local
    frequency > n_p/(capacity+1) is present in the summary."""
    counters: dict = {}
    for pdf in batches:
        for k in pdf["__key"]:
            if k in counters:
                counters[k] += 1
            elif len(counters) < capacity:
                counters[k] = 1
            else:
                dead = [c for c, v in counters.items() if v == 1]
                for c in counters:
                    counters[c] -= 1
                for c in dead:
                    del counters[c]
    yield pd.DataFrame(
        {"__key": list(counters.keys()), "__undercount": list(counters.values())}
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    capacity: int = 256,
    total_count: int | None = None,
) -> DataFrame:
    """EXACT frequent-items query answered with sketch-bounded state:
    every ``key_col`` value occurring at least ``min_count`` times, with
    its exact count.

    Two passes over the keys, neither of which builds the full GROUP BY:

    1. Per-partition Misra-Gries (``mapInPandas``, ≤ ``capacity`` rows
       of state and output per partition). Summing the partial summaries
       keeps the pigeonhole guarantee: a key with global frequency
       f > n/(capacity+1) exceeds the local threshold in at least one
       partition, so it is in some summary. The candidate union is at
       most ``capacity × partitions`` rows — kilobytes, not the corpus.
    2. Exact recount of candidates only: broadcast semi-join of the key
       stream against the candidate set, then a GROUP BY whose input is
       just the candidate occurrences.

    Exactness precondition (checked): ``min_count`` must exceed
    n/(capacity+1), else a qualifying key could evade every local
    summary. Pass ``total_count`` when the key-stream size is known
    (e.g. tokens ≈ rows × mean length from profile stats) to keep the
    plan one-pass; otherwise the check spends one count of the key
    stream. The candidate SET may vary with partitioning, but it is
    always a superset of the true answer, and the exact recount makes
    the OUTPUT partitioning-invariant.

    Returns (key_col, n_occurrences) — exactly
    ``SELECT key, COUNT(*) .. GROUP BY key HAVING COUNT(*) >= min_count``.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keys = df.select(F.col(key_col).cast("string").alias("__key"))
    n = keys.count() if total_count is None else total_count
    if n > 0 and min_count * (capacity + 1) <= n:
        raise ValueError(
            f"min_count={min_count} is below the Misra-Gries exactness "
            f"floor n/(capacity+1)={n/(capacity+1):.1f}; raise capacity "
            f"to > {n // min_count} or raise min_count"
        )
    summaries = keys.mapInPandas(
        lambda it: _mg_partition(it, capacity),
        schema="__key string, __undercount long",
    )
    candidates = (
        summaries.groupBy("__key")
        .agg(F.sum("__undercount").alias("__lb"))
        .select("__key")
    )
    exact = (
        keys.join(F.broadcast(candidates), "__key")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    return exact.select(F.col("__key").alias(key_col), "n_occurrences")


def top_tokens_exact(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 50,
    capacity: int = 1024,
) -> DataFrame:
    """Heavy-hitter TOKENS of a document corpus — the vocabulary-head
    audit (which boilerplate tokens dominate the corpus?) without a full
    token GROUP BY. Whitespace tokenization matches ``text.tokens``."""
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return heavy_hitters(toks, "token", min_count=min_count, capacity=capacity)
