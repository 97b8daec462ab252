"""Semantic dedup (SemDeDup): behavior on synthetic near-dups plus a
full DuckDB differential oracle on the real embeddings table — the SQL
here is the staged round-5 catalog oracle, exercised through the same
dtype-sensitive comparison the external driver uses."""

import sys

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.semdedup import semantic_dedup

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def vectors(spark):
    # two tight groups + one singleton; ids chosen so min-id winners are known
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (5, [0.999, 0.01, 0.0]),   # near-dup of 1
        (9, [1.0, 0.001, 0.0]),    # near-dup of 1
        (2, [0.0, 1.0, 0.0]),
        (7, [0.0, 0.998, 0.02]),   # near-dup of 2
        (3, [0.0, 0.0, 1.0]),      # singleton
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_min_id_survives(spark, vectors):
    out = {r["vec_id"]: r["keep"] for r in
           semantic_dedup(vectors, k=3, threshold=0.99).collect()}
    assert out[1] and out[2] and out[3]
    assert not out[5] and not out[9] and not out[7]


def test_threshold_one_keeps_separated(spark):
    # pairs far enough apart that no cosine ROUNDS to 1.0 (the operator
    # thresholds on round(cos, 6), so cos >= 0.9999995 counts as 1.0)
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=2, threshold=1.0)
    assert out.filter(~F.col("keep")).count() == 0


def test_validation(spark, vectors):
    with pytest.raises(ValueError):
        semantic_dedup(vectors, threshold=0.0)


SEMDEDUP_ORACLE = """
    WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
    seeds AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS c
      FROM (
        SELECT vec_id, embedding,
               ('0x' || substring(md5(CAST(vec_id AS VARCHAR) || '|kmeans-seeds'), 1, 15))::BIGINT
                 % 10000 AS h
        FROM embeddings
      ), nn
      WHERE h <= least(10000, CAST(floor(320000.0 / n + 0.5) AS BIGINT))
      ORDER BY h, vec_id LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, s.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                 + list_dot_product(s.c, s.c)
                 - 2 * list_dot_product(e.embedding::DOUBLE[], s.c), s.cell_id) AS rk
        FROM embeddings e, seeds s
      ) WHERE rk = 1
    ),
    m AS (
      SELECT a1.vec_id AS id, a1.cell_id, e.embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS nrm
      FROM a1 JOIN embeddings e USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT b.id AS id
      FROM m a JOIN m b ON a.cell_id = b.cell_id AND a.id < b.id
      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    )
    SELECT m.id AS vec_id, m.cell_id, dropped.id IS NULL AS keep
    FROM m LEFT JOIN dropped ON m.id = dropped.id
"""


def test_semdedup_duckdb_oracle(spark, sf_dir):
    import duckdb

    from check import frame_to_multiset, oracle_type_problems

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = semantic_dedup(
        emb, k=8, threshold=0.4, corpus_count=emb.count()
    ).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    assert not oracle_type_problems(con, SEMDEDUP_ORACLE)
    want = con.execute(SEMDEDUP_ORACLE).fetchdf()

    assert len(got) == len(want) > 0
    assert (~got["keep"]).sum() > 0, "threshold should drop at least one row"
    assert frame_to_multiset(got) == frame_to_multiset(want)
