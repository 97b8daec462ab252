"""operators/graph.py — integer-scaled PageRank.

Expected values are hand-computed from the documented recurrence
(micro-units, integer division), so the test pins semantics rather than
echoing the implementation.
"""

from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.graph import pagerank_scaled


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_hand_computed(spark):
    # 1 -> 2, 1 -> 3, 2 -> 1;  3 dangling (no out-edges)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    # rank0 = 1_000_000 each; base = 150_000
    # iter1: c(1->2)=c(1->3)=(1e6*85) div 200=425_000; c(2->1)=850_000
    #   r1 = {1: 1_000_000, 2: 575_000, 3: 575_000}
    # iter2: c(1->*)=(1_000_000*85) div 200=425_000; c(2->1)=488_750
    #   r2 = {1: 638_750, 2: 575_000, 3: 575_000}
    r1 = _ranks(pagerank_scaled(edges, iterations=1))
    assert r1 == {1: 1_000_000, 2: 575_000, 3: 575_000}
    r2 = _ranks(pagerank_scaled(edges, iterations=2))
    assert r2 == {1: 638_750, 2: 575_000, 3: 575_000}


def test_pagerank_zero_iterations_and_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23],
        "src long, dst long",
    )
    r0 = _ranks(pagerank_scaled(edges, iterations=0))
    assert set(r0.values()) == {1_000_000}
    a = _ranks(pagerank_scaled(edges, iterations=3))
    b = _ranks(pagerank_scaled(edges.repartition(13), iterations=3))
    assert a == b  # integer recurrence: partitioning cannot change results


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_scaled(edges, iterations=2).count() == 0


def test_pagerank_mass_conservation_bound(spark):
    """On a symmetric graph every node has out-edges, so total rank stays
    within [base*|V|, scale*|V|] — a cheap structural sanity check."""
    pairs = [(i, i + 1) for i in range(50)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    r = pagerank_scaled(edges, iterations=4)
    total = r.agg(F.sum("rank")).collect()[0][0]
    n = 51
    assert 150_000 * n <= total <= 1_000_000 * n


def test_triangle_counts_hand_graph(spark):
    from knime_core_columnar_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5-1 +
    # duplicate/reversed/self edges that must be ignored
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(2, 1), (1, 1), (5, 1), (1, 5)], "src long, dst long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_counts_partition_invariant_and_star_safe(spark):
    from knime_core_columnar_spark.operators.graph import triangle_counts

    # star around hub 0 (no triangles) + one closed pair
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 40)] + [(1, 2)], "src long, dst long"
    )
    a = sorted(map(tuple, triangle_counts(edges).collect()))
    b = sorted(map(tuple, triangle_counts(edges.repartition(7)).collect()))
    assert a == b
    d = dict(a)
    assert d[0] == 1 and d[1] == 1 and d[2] == 1 and d[3] == 0
