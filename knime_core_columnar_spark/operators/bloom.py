"""Broadcast Bloom-filter membership pre-filter — the 100 TB
decontamination / semi-join accelerator.

Problem shape: a huge corpus must be checked against a membership set
(benchmark-contamination keys, a blocklist, an allowlist) that is far
smaller than the corpus but too large to broadcast as a join build side
row-for-row, and an exact join would shuffle the ENTIRE corpus on the
key. A Bloom filter collapses the membership set to a fixed bit array
(1.2 MB per 10M keys at 1% FP) that broadcasts to every executor; one
narrow scan splits the corpus into definite-misses (the overwhelming
majority at 100 TB) and possible-hits, and only the possible-hits —
true hits plus the ~1% false positives — continue into the exact join.
The final result is EXACT: the Bloom tier only prunes, never decides.

Reference parity: the reference engine has no Bloom machinery — this is
one of the beyond-reference training-data-pipeline operators (exact
dedup / contamination live in operators/dedup.py; this is their scale
path when the membership set outgrows a plain broadcast join but the
corpus outgrows a shuffle).

Determinism: positions come from xxhash64 (seeded 0..k-1) mod m inside
the JVM scan — engine-internal only. Oracles never reproduce the Bloom
tier; they state the exact semi/anti-join the two-phase plan must equal.

Scale shape:
- build: one pass over the membership keys, positions exploded and
  collapsed to ``m/64`` (word, or-of-bits) rows — the aggregate is
  bounded by the FILTER SIZE, not the key count; the driver collects
  ≤ m/64 longs (128 KiB per 2^20 bits).
- probe: positions computed per corpus row in codegen; the bit test is
  one Arrow-batched pandas UDF over an int-array column against the
  broadcast numpy words (no Python per-row, no corpus shuffle).
- decide: survivors (tiny) exact-join the membership keys; for
  anti-join (decontamination), Bloom-negative rows are DEFINITE keeps
  and bypass the join entirely — only Bloom-positive rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = [
    "BloomFilter",
    "build_bloom",
    "bloom_prefilter",
    "bloom_semi_join",
    "bloom_anti_join",
]


class BloomFilter:
    """Immutable built filter: ``words`` is an int64 numpy array of
    ``num_bits / 64`` packed little-endian bit words."""

    def __init__(self, words: np.ndarray, num_bits: int, num_hashes: int):
        assert words.dtype == np.int64 and len(words) == num_bits // 64
        self.words = words
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    @property
    def fill_ratio(self) -> float:
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum() / self.num_bits
        )


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """k Bloom positions for one key — codegen JVM expressions."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)).cast("long")
            for i in range(num_hashes)
        ]
    )


def build_bloom(
    keys_df: DataFrame,
    key: Column | str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> BloomFilter:
    """One distributed pass over the membership keys → packed bit words
    on the driver. The aggregation output is ≤ ``num_bits/64`` rows
    regardless of key count; duplicates in ``keys_df`` are free (bit-or
    is idempotent). Size ``num_bits ≈ 10 × n_keys`` for ~1% FP at
    ``num_hashes=5``."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64: {num_bits}")
    k = F.col(key) if isinstance(key, str) else key
    words = (
        keys_df.select(F.explode(_positions(k, num_bits, num_hashes)).alias("__p"))
        .select(
            (F.col("__p") / 64).cast("long").alias("__w"),
            # SQL form: pyspark's shiftleft() only takes a literal count
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__bits"))
        .collect()
    )
    arr = np.zeros(num_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["__w"]] = r["__bits"]
    return BloomFilter(arr, num_bits, num_hashes)


def bloom_prefilter(
    df: DataFrame,
    key: Column | str,
    bloom: BloomFilter,
    negate: bool = False,
) -> DataFrame:
    """Rows whose key is possibly (``negate=False``) or definitely not
    (``negate=True``) in the filter. The membership test is one
    Arrow-batched kernel over the k-position int arrays against the
    broadcast words — vectorized numpy, no corpus shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.words)

    @F.pandas_udf(BooleanType())
    def __bloom_contains(pos: pd.Series) -> pd.Series:
        w = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        m = np.vstack(pos.to_numpy())  # (rows, k) int64 positions
        hit = ((w[m >> 6] >> (m & 63)) & 1).all(axis=1)
        return pd.Series(hit)

    k = F.col(key) if isinstance(key, str) else key
    test = __bloom_contains(_positions(k, bloom.num_bits, bloom.num_hashes))
    return df.filter(~test if negate else test)


def bloom_semi_join(
    df: DataFrame,
    keys_df: DataFrame,
    on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT ``df SEMI JOIN keys_df ON on`` via Bloom pruning: only the
    Bloom-positive slice (true hits + ~FP-rate of the corpus) reaches
    the exact semi-join; definite misses are dropped in the scan."""
    bloom = build_bloom(keys_df, on, num_bits, num_hashes)
    cand = bloom_prefilter(df, on, bloom)
    return cand.join(keys_df.select(on).distinct(), on, "semi")


def bloom_anti_join(
    df: DataFrame,
    keys_df: DataFrame,
    on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT ``df ANTI JOIN keys_df ON on`` (decontamination): Bloom
    NEGATIVES are definite keeps and bypass the join entirely — the
    union's second leg (Bloom positives that survive the exact
    anti-join, i.e. the false positives) is the only part that
    shuffles. At 100 TB with a 1% FP filter, 99% of the corpus never
    leaves its input partition."""
    bloom = build_bloom(keys_df, on, num_bits, num_hashes)
    definite_keep = bloom_prefilter(df, on, bloom, negate=True)
    rescued_fp = bloom_prefilter(df, on, bloom).join(
        keys_df.select(on).distinct(), on, "anti"
    )
    return definite_keep.unionByName(rescued_fp)
