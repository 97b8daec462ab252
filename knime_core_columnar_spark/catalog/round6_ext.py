"""Round-6 in-round extensions — queries added AFTER the round-6 window
flip, so they register at the TAIL of the catalog (the layout reorder in
``layout_final`` has already run by the time this module imports; the
driver's 50-name round-6 window head is untouched). Their first driver
check is scheduled in the round-7 window (see ``_DRIVER_WINDOW_R7``).

Every entry follows the registry determinism rules (_registry.py
docstring): scaled-int64 sums, 6-decimal rounds before ordering, every
computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knime_core_columnar_spark.catalog._registry import _t, query


@query(
    "bm25_topk",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(lower(trim(text)), '\W+')) AS t
      FROM documents
    ), tf AS (
      SELECT id, t, COUNT(*) AS tf FROM toks WHERE t <> '' GROUP BY 1, 2
    ), dl AS (
      SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), dfq AS (
      SELECT t, COUNT(*) AS df FROM tf GROUP BY 1
    ), q AS (
      SELECT doc_id AS query_id,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\W+'),
               w -> w <> ''))) AS t
      FROM documents WHERE doc_id IN (3, 47, 205)
    ), cand AS (
      SELECT q.query_id, tf.id AS doc_id,
             CAST(round(round(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
             6) * 1000000, 0) AS BIGINT) AS s6
      FROM tf JOIN q USING (t) JOIN dfq USING (t) JOIN dl USING (id), stats
    ), agg AS (
      SELECT query_id, doc_id, COUNT(*) AS n_terms_hit,
             CAST(SUM(s6) AS BIGINT) AS bm25_scaled
      FROM cand GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_terms_hit, bm25_scaled, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY bm25_scaled DESC, doc_id) AS rank
      FROM agg
    ) WHERE rank <= 10
    """,
)
def _r6x_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (operators.similarity.bm25_topk): Lucene
    k1=1.2 / b=0.75 scoring with +1-shifted IDF; per-term scores are
    6-decimal-rounded int64 micro-units BEFORE the per-(query, doc) sum,
    so ranking is engine-exact. Query batch = the hybrid_search_rrf
    query documents (their full text is the keyword query)."""
    from knime_core_columnar_spark.operators.similarity import bm25_topk

    d = _t(spark, sf_dir, "documents")
    q = d.filter(F.col("doc_id").isin([3, 47, 205])).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    return bm25_topk(d, q, k=10)


@query(
    "embedding_covariance",
    r"""
    WITH x AS (
      SELECT vec_id,
             unnest(list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)))
               AS xi,
             unnest(range(len(embedding))) AS d
      FROM embeddings
    ), sxy AS (
      SELECT a.d AS i, b.d AS j,
             SUM(CAST(a.xi * b.xi AS DECIMAL(38,0))) AS sxy
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d <= b.d
      GROUP BY 1, 2
    ), sx AS (
      SELECT d, SUM(CAST(xi AS DECIMAL(38,0))) AS sx, COUNT(*) AS n
      FROM x GROUP BY 1
    )
    SELECT sxy.i, sxy.j, si.n AS n_vecs,
           round((CAST(sxy AS DOUBLE)
                  - CAST(si.sx AS DOUBLE) * CAST(sj.sx AS DOUBLE)
                    / CAST(si.n AS DOUBLE))
                 / CAST(si.n AS DOUBLE) / 1000000000000.0, 9) AS cov
    FROM sxy JOIN sx si ON sxy.i = si.d JOIN sx sj ON sxy.j = sj.d
    """,
)
def _r6x_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding covariance matrix, long-form upper triangle
    (operators.similarity.embedding_covariance): int64 micro-unit
    products summed as decimal(38,0) — engine/partitioning-exact; the
    d-row/d²-row aggregates are the distributed step of PCA
    (pca_project runs numpy eigh on this dimension-sized result)."""
    from knime_core_columnar_spark.operators.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(_t(spark, sf_dir, "embeddings"))
