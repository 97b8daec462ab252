"""Deduplication operators for training-data pipelines: exact content
dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.

Scale design (the whole point at 100 TB):
- Signatures (MinHash, SimHash, fingerprints) are pure array/column
  expressions — computed in one narrow pass, no shuffle, no Python.
- Candidate generation is LSH band-bucketing: explode only the B band
  keys per doc (B ≈ 4-16, not the full shingle set), shuffle on the band
  key, join within buckets. Cost ∝ bucket sizes, not n².
- Exact verification (Jaccard) runs only on LSH candidates.
- Exact dedup is a single hash-groupBy keeping the min RowID
  (deterministic winner at any parallelism).

Hashes are the cross-engine md5 scheme from operators.text so every
stage is differentially testable against DuckDB."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.text import (
    fingerprint,
    keyed_hash32,
    tokens,
    word_shingles,
)
from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(table: ColumnarTable, text_col: str = "text") -> ColumnarTable:
    """Content-hash dedup: keep the minimum-RowID row per normalized
    content fingerprint. One shuffle on the 16-byte hash (not the full
    text) — group keys stay small however large the documents are."""
    from pyspark.sql import Window

    df = table.df.withColumn("__fp", fingerprint(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(ROW_KEY))
    return ColumnarTable(
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(text_col: Column | str, num_perm: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as an array<long> of ``num_perm`` minima over the
    keyed-hash family h_i(s) = md5_32(i || '_' || s). Pure expression:
    one pass, no explode."""
    sh = word_shingles(text_col, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: keyed_hash32(i, s))),
    )


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: key_b = md5(b || '|' || sig[b·r .. b·r+r)).
    Docs sharing any band key are near-dup candidates (standard
    banding estimate: P(candidate) = 1-(1-j^r)^b)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat(
                b.cast("string"),
                F.lit("|"),
                F.array_join(F.slice(sig, b * rows_per_band + 1, rows_per_band), ","),
            )
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing ≥1 LSH band.

    Plan shape: narrow signature pass → explode B band keys → shuffle on
    band key → in-bucket self-join → distinct pairs. The only shuffled
    payload is (id, band_key); document text never moves."""
    rows = num_perm // bands
    sig = minhash_signature(text_col, num_perm, shingle_n)
    banded = (
        df.select(F.col(id_col), lsh_band_keys(sig, bands, rows).alias("__bands"))
        .select(id_col, F.posexplode("__bands").alias("__b", "__key"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification of LSH candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word-shingle sets.

    With ``candidates`` (the LSH output) the join is candidate-sized — the
    100 TB path. Without it, an inverted-index self-join on shingles
    (still sub-quadratic: only docs sharing a shingle meet)."""
    sh = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh")
    ).withColumn("__size", F.size("__sh"))

    if candidates is not None:
        pairs = (
            candidates.join(sh.select(F.col(id_col).alias("id_a"),
                                      F.col("__sh").alias("__sh_a"),
                                      F.col("__size").alias("size_a")), "id_a")
            .join(sh.select(F.col(id_col).alias("id_b"),
                            F.col("__sh").alias("__sh_b"),
                            F.col("__size").alias("size_b")), "id_b")
            .withColumn("inter", F.size(F.array_intersect("__sh_a", "__sh_b")))
        )
        out = pairs.select(
            "id_a", "id_b",
            (F.col("inter").cast("double")
             / (F.col("size_a") + F.col("size_b") - F.col("inter"))).alias("jaccard"),
        )
        return out.filter(F.col("jaccard") >= threshold)

    ex = sh.select(id_col, "__size", F.explode("__sh").alias("__s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.__s") == F.col("b.__s"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__size").alias("size_a"),
            F.col("b.__size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter.select(
        "id_a", "id_b",
        (F.col("inter").cast("double")
         / (F.col("size_a") + F.col("size_b") - F.col("inter"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text_col: Column | str, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: token hash h(t) = md5-based 60-bit
    value; bit j of the signature is set iff Σ_tokens (±1 by bit j of
    h(t)) > 0. Near-duplicates have small Hamming distance
    (``hamming_distance`` below). Pure expression, one narrow pass."""
    # hash each token once (60-bit md5 prefix), then fold per bit; the
    # bit loop is unrolled in Python (shift counts must be literals)
    hs = F.transform(
        tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    def bit_sum(j: int) -> Column:
        mask = F.lit(1 << j)
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda a, h: a + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    total = F.lit(0).cast("long")
    for j in range(bits):
        total = total + F.when(bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return total


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs. Scale path: band the signature into
    ``bits/band_bits`` chunks — two docs within ``max_hamming < bands``
    share at least one identical chunk (pigeonhole), so an equi-join per
    chunk finds all such pairs without n² comparisons."""
    sh = df.select(F.col(id_col), simhash(text_col, bits).alias("__sim"))
    bands = bits // band_bits
    mask = (1 << band_bits) - 1
    chunks = sh.select(
        id_col, "__sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("__sim"), b * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("chunk"),
                )
                for b in range(bands)
            ])
        ).alias("__c"),
    ).select(id_col, "__sim", "__c.band", "__c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming_distance(F.col("a.__sim"), F.col("b.__sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
