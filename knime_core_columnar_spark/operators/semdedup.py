"""Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540)
— embedding-space near-duplicate pruning via cluster-then-compare:

1. cluster the corpus embeddings with the deterministic hash-seeded
   k-means machinery (one Lloyd assignment over broadcast centroids —
   no vector shuffle);
2. WITHIN each cluster only, compare all member pairs by cosine;
3. drop every member that has a lower-id member within ``threshold``
   cosine in its cluster (min-id winner — the same canonical-survivor
   rule as operators/dedup.py).

This is the scalable middle ground between exact/MinHash dedup (misses
paraphrases) and all-pairs embedding comparison (O(n²) — the
embedding_near_dup_pairs exact tier): pair comparison is confined to
clusters, so total work is Σ|cluster|² ≈ n²/k. At 100 TB, k grows with
the corpus (k ≈ n / desired-cluster-size), holding per-cluster work
constant; the cluster-keyed self-join shuffles each vector once on its
cell_id. The known caveat is cluster skew — a giant cluster re-creates
the quadratic blowup — so callers at scale should pick k from the
corpus size and monitor ``n_members`` from kmeans; recall is
approximate by design (near-dups split across cluster boundaries are
not compared — the SemDeDup trade).

Determinism: seeds and assignment are the engine-reproducible kmeans
expressions (scaled-int math, cell_id tie-breaks); pair cosine is
rounded to 6 decimals before thresholding, the same cross-engine
discipline as embedding_near_dup_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.clustering import (
    _sq_norm,
    assign_cells,
    hash_seed_centroids,
)
from knime_core_columnar_spark.operators.similarity import dot

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
) -> DataFrame:
    """One row per input: ``id_col``, ``cell_id`` (assigned cluster) and
    ``keep`` — false iff a lower-id same-cluster member lies within
    ``threshold`` cosine. ``SUM(keep)`` rows survive the prune.

    Plan shape: broadcast-argmin assignment (narrow) → self-join on
    cell_id with ``a.id < b.id`` and the cosine filter (one shuffle of
    (id, vec) keyed by cell) → distinct dropped ids → left-anti mark.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    cents = hash_seed_centroids(
        df, k, id_col, vec_col, corpus_count, salt="kmeans-seeds"
    )
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        _sq_norm(F.col(vec_col)).alias("__vv"),
    )
    assigned = assign_cells(vecs, cents, id_col)
    m = assigned.select(
        F.col(id_col).alias("__id"),
        "cell_id",
        "__v",
        F.sqrt(_sq_norm(F.col("__v"))).alias("__n"),
    )
    a, b = m.alias("a"), m.alias("b")
    cos = F.round(
        dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n")), 6
    )
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("b.__id").alias("__dropped"))
        .distinct()
    )
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["__dropped"], "left"
        )
        .select(
            id_col,
            "cell_id",
            F.col("__dropped").isNull().alias("keep"),
        )
    )
