"""Integer-quantized PageRank: exactness vs a scalar reference,
partition invariance, structural sanity."""

import pytest

from geotrellis_server_spark.operators.graph import SCALE, pagerank


def _ref_pagerank(E, n_iter, num=85, den=100):
    nodes = sorted({u for e in E for u in e})
    deg = {}
    for u, _ in E:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: SCALE for v in nodes}
    tel = SCALE * (den - num) // den
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in E:
            s[v] += pr[u] // deg[u]
        pr = {v: tel + num * s[v] // den for v in nodes}
    return pr


def test_pagerank_matches_integer_reference(spark):
    E = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(edges, n_iter=10).collect()}
    assert got == _ref_pagerank(E, 10)
    # 3 has the most in-mass; 4 is a source-only node (teleport + nothing)
    assert got[3] == max(got.values())
    assert got[4] == SCALE * 15 // 100


def test_pagerank_partition_invariant(spark):
    E = [(i, (i * 7) % 23) for i in range(23) for _ in (0,)]
    edges = spark.createDataFrame(E, "src long, dst long")
    a = sorted(map(tuple, pagerank(edges.repartition(11),
                                   n_iter=6).collect()))
    b = sorted(map(tuple, pagerank(edges.coalesce(1), n_iter=6).collect()))
    assert a == b


def test_pagerank_zero_iter_and_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(edges, n_iter=0).collect()}
    assert got == {1: SCALE, 2: SCALE}
    with pytest.raises(ValueError):
        pagerank(edges, n_iter=-1)
