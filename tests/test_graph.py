"""Unit tests for the degree-oriented triangle counter on known graphs
(the registered supplier query is covered by the generic oracle gate)."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators.graph import triangles_per_node


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long").distinct()


def test_triangles_k4_and_path(spark):
    # K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles, coef 1.0.
    # Disjoint path 10-11-12: zero triangles, coef 0.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    path = [(10, 11), (11, 12)]
    out = triangles_per_node(_sym_edges(spark, k4 + path))
    got = {r["node"]: r for r in out.collect()}
    assert len(got) == 7
    for n in range(1, 5):
        assert got[n]["n_triangles"] == 3
        assert got[n]["clustering_coef"] == 1.0
    for n in (10, 11, 12):
        assert got[n]["n_triangles"] == 0
        assert got[n]["clustering_coef"] == 0.0


def test_triangles_participation_multiple_of_three(spark):
    # A triangle with a pendant vertex: total participation counts are
    # 3 x n_triangles; the pendant's coefficient is 0 by the deg<2 rule.
    out = triangles_per_node(
        _sym_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    )
    total = out.agg(F.sum("n_triangles")).collect()[0][0]
    assert total == 3
    assert out.where("node = 4").collect()[0]["clustering_coef"] == 0.0


def test_triangles_hub_is_never_the_pivot(spark):
    # Star K1,5 plus one rim edge: exactly one triangle; the hub's
    # coefficient is 1/C(5,2) = 0.1.
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    out = triangles_per_node(_sym_edges(spark, star))
    got = {r["node"]: r for r in out.collect()}
    assert got[0]["n_triangles"] == 1
    assert abs(got[0]["clustering_coef"] - 0.1) < 1e-9
    assert got[1]["n_triangles"] == 1 and got[2]["n_triangles"] == 1
    assert got[3]["n_triangles"] == 0


def test_dense_bitmap_path_matches_sparse_path(spark):
    """Both physical strategies must produce identical rows on a graph
    with triangles, pendants, isolated-from-triangle paths, and a hub —
    and on a random-ish denser graph exercising multi-word bitmaps
    (node ids spread past 64 so j DIV 64 > 0)."""
    from mapreduce_framework_in_go_spark.operators.graph import (
        triangles_per_node_dense,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    spread = [(100 + 7 * i, 100 + 7 * j) for i in range(12) for j in range(i + 1, 12) if (i + j) % 3]
    for pairs in (k4, star, k4 + star + [(4, 100)] + spread):
        edges = _sym_edges(spark, pairs)
        a = sorted(map(tuple, triangles_per_node(edges).collect()))
        b = sorted(map(tuple, triangles_per_node_dense(edges).collect()))
        assert a == b
