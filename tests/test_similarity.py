"""Similarity search vs numpy brute force on the driver's embeddings
table."""

import numpy as np
import pytest

from geotrellis_server_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _brute_topk(ids, mat, q, k):
    qn = np.asarray(q, dtype=np.float64)
    sims = mat @ qn / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qn))
    order = sorted(zip(-sims, ids))[:k]
    return [int(i) for _, i in order]


def test_exact_topk_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    got = [r.vec_id for r in S.cosine_topk(emb, q, 10).orderBy("rank").collect()]
    assert got == _brute_topk(ids, mat, q, 10)
    assert got[0] == 0  # self-similarity = 1


def test_topk_plan_has_no_python(emb, emb_np):
    _, mat = emb_np
    plan = S.cosine_topk(emb, mat[0].tolist(), 5)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_lsh_ann_recall(emb, emb_np):
    # random 64-dim embeddings have weakly-correlated neighbors, so use a
    # coarse 4-plane bucketing (multi-probe covers 5/16 of the space);
    # production picks n_planes from the recall/scan-fraction tradeoff
    ids, mat = emb_np
    recalls = []
    for qi in (0, 7, 42):
        q = mat[qi].tolist()
        exact = set(_brute_topk(ids, mat, q, 10))
        approx = {r.vec_id for r in S.lsh_ann_topk(emb, q, 10, n_planes=4).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.4
    # the query vector itself always survives bucketing
    assert 0 in {r.vec_id for r in S.lsh_ann_topk(emb, mat[0].tolist(), 10, n_planes=4).collect()}


def test_lsh_scan_reduction(emb, emb_np):
    _, mat = emb_np
    planes = S._hyperplanes(mat.shape[1], 8)
    bucketed = emb.withColumn("_b", S.lsh_bucket_col("embedding", planes))
    sizes = bucketed.groupBy("_b").count().collect()
    total = sum(r["count"] for r in sizes)
    biggest = max(r["count"] for r in sizes)
    assert total == emb.count()
    assert biggest < total * 0.25  # buckets actually split the space


def test_near_dup_pairs_self_join(spark, emb_np):
    ids, mat = emb_np
    # duplicate a few vectors with tiny noise → must be found
    import pyspark.sql.functions as F

    rows = [(1000 + i, (mat[i] + 1e-6).astype(float).tolist()) for i in range(5)]
    extra = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    base = spark.createDataFrame(
        [(int(i), v.astype(float).tolist()) for i, v in zip(ids[:50], mat[:50])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    pairs = S.embedding_near_dup_pairs(base.union(extra), threshold=0.999)
    got = {(r.a, r.b) for r in pairs.collect()}
    for i in range(5):
        assert (i, 1000 + i) in got


def test_near_dup_degenerate_corpus_bounded(spark):
    # 5000 near-identical vectors -> one giant bucket. Without the bucket
    # guard this is a ~12.5M-row self-join; with the star guard it is
    # linear and must return exactly n-1 pairs anchored at the min id.
    import time

    from geotrellis_server_spark.operators.similarity import embedding_near_dup_pairs

    n = 5000
    df = spark.range(n).selectExpr(
        "id AS vec_id",
        # base vector + tiny deterministic per-id jitter (cosine ~ 1.0)
        "transform(sequence(0, 7), j -> CAST(1.0 + CAST(id % 97 AS DOUBLE) * 1e-7 "
        "* CAST(j + 1 AS DOUBLE) AS FLOAT)) AS embedding",
    )
    t0 = time.time()
    pairs = embedding_near_dup_pairs(df, threshold=0.95, max_bucket_size=500).collect()
    elapsed = time.time() - t0
    assert len(pairs) == n - 1
    assert all(p.a == 0 for p in pairs)  # star anchored at min id
    assert elapsed < 60.0, f"degenerate corpus took {elapsed:.1f}s"


def test_near_dup_small_buckets_unchanged(spark):
    # guard must not change results when every bucket is under the cap
    from geotrellis_server_spark.operators.similarity import embedding_near_dup_pairs

    df = spark.range(200).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), j -> CAST(sin(CAST(id AS DOUBLE) * 0.7 "
        "+ CAST(j AS DOUBLE)) AS FLOAT)) AS embedding",
    )
    a = {(p.a, p.b) for p in embedding_near_dup_pairs(df, threshold=0.9,
                                                      max_bucket_size=10**9).collect()}
    b = {(p.a, p.b) for p in embedding_near_dup_pairs(df, threshold=0.9,
                                                      max_bucket_size=1000).collect()}
    assert a == b


def test_detect_hot_keys_sampled_superset(spark):
    import pyspark.sql.functions as F

    from geotrellis_server_spark.grids import cells as C
    from geotrellis_server_spark.operators import skew
    from geotrellis_server_spark.sources import synth

    d = synth.extract_geometry(synth.docs(spark, 20000)).withColumn(
        "cell", C.cell_key_col("lon", "lat", 4)
    )
    exact = set(skew.detect_hot_keys(d, ["cell"], threshold=0.05, sample_fraction=None))
    sampled = set(skew.detect_hot_keys(d, ["cell"], threshold=0.05, sample_fraction=0.05))
    assert exact, "fixture must have hot cells"
    assert exact <= sampled  # sampled detection is a superset of the truth


def test_ivf_ann_recall_and_scan_reduction(spark):
    from geotrellis_server_spark.operators import similarity as S

    # clustered corpus (IVF's intended regime; the driver embeddings are
    # isotropic-random where ANY cell partition has near-zero recall at
    # low nprobe): 16 deterministic centers, members = center + small
    # deterministic jitter
    df = spark.range(800).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 15), j -> CAST("
        " sin(CAST(id % 16 AS DOUBLE) * 2.7 + CAST(j AS DOUBLE))"
        " + 0.05 * sin(CAST(id AS DOUBLE) * 0.913 + CAST(j AS DOUBLE) * 1.71)"
        " AS FLOAT)) AS embedding",
    )
    qvec = [float(v) for v in df.filter("vec_id = 37").first().embedding]
    cent = S.ivf_train(df, n_centroids=16, seed=7)
    assigned = S.ivf_assign(df, cent).cache()
    n_total = assigned.count()

    exact = [r.vec_id for r in S.cosine_topk(df, qvec, 10).collect()]
    got = [r.vec_id for r in S.ivf_ann_topk(assigned, cent, qvec, 10, nprobe=2).collect()]
    recall = len(set(got) & set(exact)) / 10.0
    assert recall >= 0.9, (recall, got, exact)

    # scan reduction: 2 of 16 cells probed
    import numpy as np

    q = np.asarray(qvec); q = q / np.linalg.norm(q)
    probes = np.argsort(-(cent @ q))[:2]
    n_scanned = assigned.filter(assigned._ivf_cell.isin([int(c) for c in probes])).count()
    assert n_scanned < n_total * 0.35
    assigned.unpersist()


def test_ivf_full_probe_is_exact_on_driver_table(spark):
    from geotrellis_server_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(v) for v in emb.filter("vec_id = 7").first().embedding]
    cent = S.ivf_train(emb, n_centroids=8, seed=7)
    exact = [r.vec_id for r in S.cosine_topk(emb, qvec, 10).collect()]
    full = [r.vec_id for r in S.ivf_ann_topk(emb, cent, qvec, 10, nprobe=8).collect()]
    assert full == exact  # probing every cell degrades to the exact scan


def test_ivf_train_invariant_under_repartitioning(spark):
    # Round-2 verdict item 3: the codebook must not depend on the input's
    # physical layout. Content-hash-ordered sampling is partition-
    # invariant where .limit() (first-partition rows) and .sample()
    # (per-partition seeded) are not.
    df = spark.range(3000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 15), j -> CAST(sin(CAST(id AS DOUBLE) * 0.31 "
        "+ CAST(j AS DOUBLE) * 1.7) AS FLOAT)) AS embedding",
    )
    a = S.ivf_train(df.repartition(16), n_centroids=8, seed=7, sample_limit=1000)
    b = S.ivf_train(df.coalesce(1), n_centroids=8, seed=7, sample_limit=1000)
    assert np.array_equal(a, b)


def test_ivf_partitioned_layout_prunes_partitions(spark, tmp_path):
    # the 100-TB shape: cells-as-partition-dirs; a probe's cell filter
    # must appear as PartitionFilters in the scan (planning-time pruning,
    # not a post-scan filter) and the probe result must equal the
    # in-memory ivf_ann_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(v) for v in emb.filter("vec_id = 3").first().embedding]
    cent = S.ivf_train(emb, n_centroids=8, seed=7)
    path = str(tmp_path / "ivf_layout")
    S.ivf_write_partitioned(emb, cent, path)

    got = S.ivf_read_probe(spark, path, cent, qvec, 10, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "ivf_cell" in pf  # pruning reaches the scan
    mem = S.ivf_ann_topk(S.ivf_assign(emb, cent, cell_col="_ivf_cell"),
                         cent, qvec, 10, nprobe=3, cell_col="_ivf_cell")
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]


# --- product quantization -------------------------------------------------


@pytest.fixture(scope="module")
def clustered(spark):
    df = spark.range(800).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 15), j -> CAST("
        " sin(CAST(id % 16 AS DOUBLE) * 2.7 + CAST(j AS DOUBLE))"
        " + 0.05 * sin(CAST(id AS DOUBLE) * 0.913 + CAST(j AS DOUBLE) * 1.71)"
        " AS FLOAT)) AS embedding",
    ).cache()
    df.count()
    return df


def test_pq_encode_shape_and_determinism(clustered):
    books = S.pq_train(clustered, n_subspaces=4, n_codes=16, seed=11)
    assert books.shape == (4, 16, 4)
    enc = S.pq_encode(clustered, books)
    rows = enc.select("vec_id", "pq_code").collect()
    assert all(len(r.pq_code) == 4 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_code)
    # deterministic across re-evaluation
    rows2 = enc.select("vec_id", "pq_code").collect()
    assert sorted(map(tuple, ((r.vec_id, tuple(r.pq_code)) for r in rows))) == \
           sorted(map(tuple, ((r.vec_id, tuple(r.pq_code)) for r in rows2)))


def test_pq_train_invariant_under_repartitioning(clustered):
    b1 = S.pq_train(clustered.repartition(16), n_subspaces=4, n_codes=8, seed=11)
    b2 = S.pq_train(clustered.coalesce(1), n_subspaces=4, n_codes=8, seed=11)
    np.testing.assert_array_equal(b1, b2)


def test_pq_adc_quality_and_rerank(clustered):
    # PQ resolves structure at codebook granularity, not within-cluster
    # jitter — so the honest guarantees are (a) ADC's top-k is as GOOD
    # as the exact top-k in cosine terms, and (b) exact re-rank of an
    # ADC candidate pool recovers the exact top-k (the IVF-PQ recipe).
    rows = clustered.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    qvec = [float(v) for v in vecs[37]]
    qn = np.asarray(qvec) / np.linalg.norm(qvec)
    def mean_cos(ids):
        return float(np.mean([
            vecs[i] @ qn / np.linalg.norm(vecs[i]) for i in ids]))
    exact = [r.vec_id for r in S.cosine_topk(clustered, qvec, 10).collect()]
    books = S.pq_train(clustered, n_subspaces=4, n_codes=32, seed=11)
    enc = S.pq_encode(clustered, books).cache()
    adc = [r.vec_id for r in S.pq_topk(enc, books, qvec, 10).collect()]
    assert mean_cos(adc) >= 0.98 * mean_cos(exact), (mean_cos(adc), mean_cos(exact))
    # exact re-rank of a 10x candidate pool recovers the exact top-k
    rr = [r.vec_id for r in S.pq_topk(enc, books, qvec, 10, rerank=100).collect()]
    assert len(set(rr) & set(exact)) / 10.0 >= 0.9, (rr, exact)


def test_pq_topk_plan_is_take_ordered_no_python(spark, clustered):
    books = S.pq_train(clustered, n_subspaces=4, n_codes=8, seed=11)
    # a materialized code table (the ivf_write_partitioned analog): the
    # ADC query itself must be pure JVM — no Python stage, no global sort
    rows = S.pq_encode(clustered, books).select("vec_id", "pq_code").collect()
    pdf = spark.createDataFrame(rows, "vec_id BIGINT, pq_code ARRAY<INT>")
    plan = S.pq_topk(pdf, books, [0.1] * 16, 5, code_col="pq_code") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan




def test_ivf_pq_topk_recall(clustered):
    # composite read path: coarse prune + ADC + exact rerank
    qvec = [float(v) for v in clustered.filter("vec_id = 37").first().embedding]
    exact = [r.vec_id for r in S.cosine_topk(clustered, qvec, 10).collect()]
    cent = S.ivf_train(clustered, n_centroids=16, seed=7)
    books = S.pq_train(clustered, n_subspaces=4, n_codes=32, seed=11)
    pre = S.pq_encode(S.ivf_assign(clustered, cent), books).cache()
    got = [r.vec_id for r in
           S.ivf_pq_topk(pre, cent, books, qvec, 10, nprobe=4, rerank=100).collect()]
    assert len(set(got) & set(exact)) / 10.0 >= 0.9, (got, exact)
