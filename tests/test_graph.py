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


def _ref_lpa(E, n_iter):
    und = set()
    for a, b in E:
        und.add((a, b)); und.add((b, a))
    nodes = sorted({a for a, _ in und})
    lab = {v: v for v in nodes}
    for _ in range(n_iter):
        new = {}
        for v in nodes:
            cnt = {}
            for a, b in und:
                if a == v:
                    cnt[lab[b]] = cnt.get(lab[b], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


def test_label_propagation_matches_scalar_reference(spark):
    from geotrellis_server_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge
    E = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r.node: r.label
           for r in label_propagation(edges, n_iter=4).collect()}
    assert got == _ref_lpa(E, 4)
    # each triangle converges to its own min label community
    assert got[1] == got[2] == 1
    assert got[11] == got[12]


def test_label_propagation_partition_invariant(spark):
    from geotrellis_server_spark.operators.graph import label_propagation

    E = [(i, (i * 5) % 17) for i in range(17)]
    edges = spark.createDataFrame(E, "src long, dst long")
    a = sorted(map(tuple,
                   label_propagation(edges.repartition(13), 3).collect()))
    b = sorted(map(tuple,
                   label_propagation(edges.coalesce(1), 3).collect()))
    assert a == b


def test_kcore_peels_tail_and_keeps_core(spark):
    from geotrellis_server_spark.operators.graph import kcore

    # K4 core (1,2,3,4 fully connected) with a pendant chain 4-10-11
    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 10), (10, 11)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r.node: r.degree for r in kcore(edges, k=3,
                                           n_rounds=5).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(d == 3 for d in got.values())
    # k=2: the chain still dies (10 loses 11 then drops), K4 stays
    got2 = {r.node for r in kcore(edges, k=2, n_rounds=5).collect()}
    assert got2 == {1, 2, 3, 4}


def test_connected_components_two_islands(spark):
    from geotrellis_server_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)], "src long, dst long")
    out = {r.node: r.component
           for r in connected_components(edges, n_iter=4).collect()}
    assert {out[1], out[2], out[3], out[4]} == {1}
    assert {out[10], out[11], out[12]} == {10}


def test_connected_components_round_bound(spark):
    from geotrellis_server_spark.operators.graph import connected_components

    # path 1-2-3-4-5: node 5 is 4 hops from 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    out2 = {r.node: r.component
            for r in connected_components(edges, n_iter=2).collect()}
    assert out2[5] == 3  # min id within 2 hops
    out4 = {r.node: r.component
            for r in connected_components(edges, n_iter=4).collect()}
    assert all(v == 1 for v in out4.values())


def test_connected_components_partition_invariance(spark):
    from geotrellis_server_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, (i * 7) % 40 + 40) for i in range(40)], "src long, dst long")
    a = sorted(map(tuple, connected_components(edges, 5).collect()))
    b = sorted(map(tuple,
                   connected_components(edges.repartition(9), 5).collect()))
    assert a == b
