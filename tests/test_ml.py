"""Integer-quantized k-means / SemDeDup / Naive Bayes: exactness vs
scalar references, partition invariance, tie-break and bound checks."""

import math

import pytest

from geotrellis_server_spark.operators.ml import (
    KMEANS_SCALE,
    kmeans,
    nb_classify,
    semantic_dedup_pairs,
)


def _quant(v, scale):
    return [math.floor(float(x) * scale) for x in v]


def _ref_kmeans(rows, k, n_iter, scale=KMEANS_SCALE):
    """Scalar replay of the operator's exact-integer definition."""
    import hashlib

    q = {i: _quant(v, scale) for i, v in rows}
    order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode())
                                     .hexdigest(), i))
    cents = [list(q[i]) for i in order[:k]]

    def assign():
        out = {}
        for i, vec in q.items():
            d = [sum((a - b) * (a - b) for a, b in zip(vec, c))
                 for c in cents]
            m = min(d)
            out[i] = (d.index(m) + 1, m)
        return out

    for _ in range(n_iter):
        a = assign()
        groups = {}
        for i, (cid, _) in a.items():
            groups.setdefault(cid, []).append(q[i])
        for cid, vs in groups.items():
            n = len(vs)
            cents[cid - 1] = [
                math.floor(float(sum(col)) / n) for col in zip(*vs)]
    return assign()


def _toy_vecs(n=40, dim=6, seed=3):
    import random

    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]


def test_kmeans_matches_scalar_reference(spark):
    rows = _toy_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    # quantize from the FLOAT values the DataFrame actually stores
    stored = {r.vec_id: r.embedding
              for r in df.select("vec_id", "embedding").collect()}
    ref = _ref_kmeans(list(stored.items()), k=3, n_iter=2)
    got = {r.vec_id: (r.cluster_id, r.dist_q)
           for r in kmeans(df, k=3, n_iter=2).collect()}
    assert got == ref
    assert set(c for c, _ in got.values()) <= {1, 2, 3}


def test_kmeans_partition_invariant(spark):
    rows = _toy_vecs(n=30, seed=9)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    a = sorted(map(tuple, kmeans(df.repartition(7), k=4,
                                 n_iter=2).collect()))
    b = sorted(map(tuple, kmeans(df.coalesce(1), k=4,
                                 n_iter=2).collect()))
    assert a == b


def test_kmeans_validation(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError):
        kmeans(df, k=5)  # more clusters than rows


def test_semantic_dedup_finds_planted_near_dup(spark):
    # three well-separated directions; 10/11 are near-identical
    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (10, [0.9, 0.1, 0.0, 0.0]),
        (11, [0.89, 0.11, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    clusters = kmeans(df, k=2, n_iter=2)
    pairs = {(r.keep_id, r.drop_id) for r in semantic_dedup_pairs(
        df, clusters, theta_num=99, theta_den=100).collect()}
    # the 1/10/11 direction cone is above cos 0.99 (cos(e1, v10) ~ .994)
    # — pairs appear exactly when kmeans co-clusters them
    same = {r.vec_id: r.cluster_id for r in clusters.collect()}
    expect = {(a, b) for a, b in [(1, 10), (1, 11), (10, 11)]
              if same[a] == same[b]}
    assert pairs == expect
    # a permissive threshold keeps orthogonals apart (dot = 0 fails >0)
    lax = {(r.keep_id, r.drop_id) for r in semantic_dedup_pairs(
        df, clusters, theta_num=1, theta_den=100).collect()}
    assert (1, 2) not in lax and (2, 3) not in lax


def test_semantic_dedup_zero_norm_never_matches(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "vec_id long, cluster_id int")
    got = semantic_dedup_pairs(df, clusters, theta_num=1,
                               theta_den=100).collect()
    assert got == []


def _ref_nb(train, docs, S=1 << 20):
    classes = sorted({c for c, _ in train})
    toks = lambda t: [w for w in t.split(" ") if w]
    cnt, n_c = {}, {c: 0 for c in classes}
    vocab = set()
    for c, t in train:
        for w in toks(t):
            cnt[(c, w)] = cnt.get((c, w), 0) + 1
            n_c[c] += 1
            vocab.add(w)
    V = len(vocab)
    n_docs = len(train)
    prior = {c: sum(1 for cc, _ in train if cc == c) for c in classes}
    out = {}
    for i, t in docs:
        best = None
        for c in classes:
            den = n_c[c] + V
            s = math.floor(math.log(prior[c] / n_docs) * S)
            for w in toks(t):
                s += math.floor(
                    (math.log(cnt.get((c, w), 0) + 1) - math.log(den)) * S)
            if best is None or s > best[1]:
                best = (c, s)
        out[i] = best
    return out


def test_nb_classify_matches_scalar_reference(spark):
    train = [("en", "the cat sat on the mat"),
             ("en", "a dog and a cat"),
             ("fr", "le chat est sur le tapis"),
             ("fr", "un chien et un chat")]
    docs = [(1, "the cat and the dog"), (2, "le chat et le chien"),
            (3, "zz unseen words only"), (4, "")]
    tr = spark.createDataFrame(train, "lang string, text string") \
        .withColumn("doc_id", __import__("pyspark").sql.functions
                    .monotonically_increasing_id())
    dd = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.pred, r.score_q)
           for r in nb_classify(tr, dd).collect()}
    ref = _ref_nb(train, [(i, t) for i, t in docs if t])
    for i, t in docs:
        if t:
            assert got[i] == ref[i], (i, got[i], ref[i])
    assert got[1][0] == "en" and got[2][0] == "fr"
    # empty doc: prior-only argmax (tie -> lexically smallest class)
    assert got[4][0] == "en"


def test_nb_classify_null_label_rows_ignored(spark):
    tr = spark.createDataFrame(
        [("en", "hello world", 1), (None, "zz qq ww", 2)],
        "lang string, text string, doc_id long")
    dd = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    got = nb_classify(tr, dd).collect()
    assert got[0].pred == "en"
    with pytest.raises(ValueError):
        nb_classify(tr.where("lang IS NULL"), dd)


def test_kmeans_checkpoint_resume_bit_identical(spark, tmp_path):
    from geotrellis_server_spark.lineage import IterativeCheckpoint

    rows = _toy_vecs(n=30, seed=11)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    plain = sorted(map(tuple, kmeans(df, k=3, n_iter=3).collect()))

    # interrupted run: commit init + 2 of 3 rounds, then "crash"
    ck = IterativeCheckpoint(spark, str(tmp_path / "km"), "job1")
    kmeans(df, k=3, n_iter=2, checkpoint=ck)
    assert ck.resume_round() == 3  # init(0) + rounds 1..2 committed

    # resumed run: rounds 0..2 replayed from the manifest, round 3 live
    resumed = sorted(map(tuple, kmeans(df, k=3, n_iter=3,
                                       checkpoint=ck).collect()))
    assert resumed == plain
    assert ck.resume_round() == 4


def test_pagerank_checkpoint_resume_bit_identical(spark, tmp_path):
    from geotrellis_server_spark.lineage import IterativeCheckpoint
    from geotrellis_server_spark.operators.graph import pagerank

    E = [(i, (i * 7) % 19) for i in range(19)]
    edges = spark.createDataFrame(E, "src long, dst long")
    plain = sorted(map(tuple, pagerank(edges, n_iter=5).collect()))

    ck = IterativeCheckpoint(spark, str(tmp_path / "pr"), "job1")
    pagerank(edges, n_iter=3, checkpoint=ck)  # "crash" after round 3
    assert ck.resume_round() == 3
    resumed = sorted(map(tuple, pagerank(edges, n_iter=5,
                                         checkpoint=ck).collect()))
    assert resumed == plain


def test_gram_stats_and_ridge_fit_learn_planted_signal(spark):
    import numpy as np

    from geotrellis_server_spark.operators.ml import gram_stats, ridge_fit

    # planted linear model: y = round(3*x0 - 2*x1 + 1) over 4 dims
    rng = np.random.RandomState(7)
    X = rng.uniform(-1, 1, size=(200, 4)).astype(np.float32)
    y = np.rint(3.0 * X[:, 0] - 2.0 * X[:, 1] + 1.0).astype(int)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], int(y[i])) for i in range(200)],
        "vec_id long, embedding array<float>, label int")
    rows = gram_stats(df).collect()
    w, b = ridge_fit(rows, dim=4, lam=1e-6)
    assert abs(w[0] - 3.0) < 0.2 and abs(w[1] + 2.0) < 0.2
    assert abs(w[2]) < 0.2 and abs(w[3]) < 0.2
    assert abs(b - 1.0) < 0.2
    # exactness: statistics identical under repartitioning
    a = sorted(map(tuple, rows))
    bb = sorted(map(tuple, gram_stats(df.repartition(13)).collect()))
    assert a == bb


def test_gram_stats_scalar_rows(spark):
    from geotrellis_server_spark.operators.ml import gram_stats

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 2), (2, [0.0, 1.0], 4), (3, None, 9),
         (4, [1.0, 1.0], None)],
        "vec_id long, embedding array<float>, label int")
    got = {(r.i, r.j): r.v for r in gram_stats(df).collect()}
    assert got[(-1, -1)] == 2          # NULL vec / NULL label dropped
    assert got[(-1, -2)] == 6          # 2 + 4
    assert got[(0, -3)] == 1024 and got[(1, -3)] == 1024
    assert got[(0, 1)] == 0            # orthogonal rows
    assert got[(0, 0)] == 1024 * 1024
    assert got[(0, -1)] == 2 * 1024    # x0 appears with y=2


def test_pca_recovers_planted_principal_axis(spark):
    import numpy as np

    from geotrellis_server_spark.operators.ml import (
        gram_stats, pca_fit, pca_project)

    # variance overwhelmingly along (1, 1, 0, 0)/sqrt(2)
    rng = np.random.RandomState(3)
    t = rng.uniform(-1, 1, 400)
    X = np.zeros((400, 4), dtype=np.float32)
    X[:, 0] = t + rng.normal(0, 0.01, 400)
    X[:, 1] = t + rng.normal(0, 0.01, 400)
    X[:, 2] = rng.normal(0, 0.01, 400)
    X[:, 3] = 0.3  # constant offset -> tests centering
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], 0) for i in range(400)],
        "vec_id long, embedding array<float>, label int")
    comps, mu, vals = pca_fit(gram_stats(df).collect(), dim=4,
                              n_components=2)
    c0 = comps[0]
    assert abs(abs(c0[0]) - 2 ** -0.5) < 0.05
    assert abs(abs(c0[1]) - 2 ** -0.5) < 0.05
    assert abs(c0[2]) < 0.1 and abs(c0[3]) < 0.1
    assert vals[0] > 10 * vals[1]
    assert abs(mu[3] - 0.3) < 0.01
    # projection: first component carries ~all the variance
    P = np.array([r.proj for r in
                  pca_project(df, comps, mu).orderBy("vec_id").collect()])
    assert P.shape == (400, 2)
    assert P[:, 0].var() > 10 * P[:, 1].var()
    # deterministic sign: largest-|entry| coordinate positive
    assert c0[int(np.argmax(np.abs(c0)))] > 0
