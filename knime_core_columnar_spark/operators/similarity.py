"""Similarity search over embedding columns (array<float>).

Two tiers, matching how ANN is actually deployed on Spark:
- ``brute_force_topk`` — exact cosine top-k. The shuffle-free baseline:
  queries broadcast, each partition scores its local rows, per-partition
  heaps via window top-k. Right answer up to ~10⁶ corpus rows per query
  batch, and the ground truth for recall-testing the approximate tier.
- ``rp_lsh_topk`` — random-hyperplane LSH: deterministic pseudo-random
  hyperplanes (md5-seeded, reproducible across engines and runs), sign
  bits → bucket key, candidates meet only within buckets (+ optional
  multi-probe). Scales to 100 TB: bucket join instead of cross product.
- ``ivf_topk`` — IVF-style: k-means-lite centroid assignment (centroids =
  deterministic sample), probe the nearest ``nprobe`` cells.

Dot products use zip_with + aggregate (JVM codegen, sequential
accumulation — deterministic order) on double-cast values."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation in element order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query batch, score every corpus
    row, keep k per query via window top-k (WindowGroupLimit keeps a
    k-row heap per partition — no global sort)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane weights in [-0.5, 0.5),
    seeded by md5(plane || '_' || dim_index) — reproducible everywhere."""
    import hashlib

    return [
        (int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[:8], 16) % 1000 - 500)
        / 1000.0
        for d in range(dim)
    ]


def rp_lsh_bucket(vec: Column, dim: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(v · h_p)."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        w = F.array(*[F.lit(x) for x in _hyperplane(p, dim)])
        bucket = bucket + F.when(dot(vec, w) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows in the query's LSH
    bucket; exact cosine within. Recall tunes with ``planes`` (fewer
    planes → bigger buckets → higher recall, more compute). At 100 TB the
    bucket join shuffles only (id, bucket, vec-in-bucket) rows."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        rp_lsh_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        rp_lsh_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: centroids are a deterministic corpus sample (ids
    ≡ 0 mod ⌈n/ncells⌉ — a real deployment would train k-means); every
    corpus row is assigned to its nearest centroid cell; each query
    probes its ``nprobe`` nearest cells. Candidate set ≈ nprobe/ncells of
    the corpus."""
    cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__rn", F.row_number().over(Window.orderBy(id_col)))
        .filter((F.col("__rn") % F.greatest(F.ceil(F.count(F.lit(1)).over(Window.partitionBy()) / ncells), F.lit(1))) == 0)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("__cent"))
        .limit(ncells)
    )
    assign_w = Window.partitionBy(id_col).orderBy(F.col("__d").desc())
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("__d", cosine(F.col(vec_col), F.col("__cent")))
        .withColumn("__rk", F.row_number().over(assign_w))
        .filter(F.col("__rk") == 1)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cell_id")
    )
    probe_w = Window.partitionBy(id_col).orderBy(F.col("__d").desc())
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("__d", cosine(F.col(vec_col), F.col("__cent")))
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= nprobe)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "cell_id")
    )
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    use_lsh: bool = False,
    planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).
    ``use_lsh`` switches from the exact cross-join (testing scale) to
    bucketed candidates (production scale)."""
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if use_lsh:
        assert dim is not None
        left = left.withColumn("__bucket", rp_lsh_bucket(F.col("__va"), dim, planes))
        right = right.withColumn("__bucket", rp_lsh_bucket(F.col("__vb"), dim, planes))
        pairs = left.join(right, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = left.crossJoin(right).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
