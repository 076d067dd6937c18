"""KMV distinct-count sketch: exactness below k, accuracy above, monoid
merge equivalence."""

import numpy as np
import pyspark.sql.functions as F

from geotrellis_server_spark.operators import sketch
from geotrellis_server_spark.operators.sketch import kmv_estimate, kmv_merge_sql


def test_kmv_exact_below_k(spark):
    df = spark.range(1000).selectExpr("CAST(id % 37 AS STRING) AS v")
    r = kmv_estimate(df, "v", k=64).collect()[0]
    assert r.n_seen_hashes == 37 and r.distinct_est == 37.0


def test_kmv_estimate_accuracy(spark):
    # 20k distinct values, k=256: KMV relative error ~ 1/sqrt(k) ≈ 6%
    df = spark.range(60000).selectExpr("CAST(id % 20000 AS STRING) AS v")
    r = kmv_estimate(df, "v", k=256).collect()[0]
    assert r.n_seen_hashes == 256
    assert abs(r.distinct_est - 20000) / 20000 < 0.2


def test_kmv_partition_invariant(spark):
    df = spark.range(5000).selectExpr("CAST(id % 999 AS STRING) AS v")
    a = kmv_estimate(df.repartition(16), "v", k=128).collect()[0].distinct_est
    b = kmv_estimate(df.coalesce(1), "v", k=128).collect()[0].distinct_est
    assert a == b  # bit-identical: the sketch is a pure function of the set


def test_kmv_grouped(spark):
    df = spark.range(2000).selectExpr(
        "CAST(id % 4 AS STRING) AS g", "CAST(id % 100 AS STRING) AS v"
    )
    rows = {r.g: r.distinct_est for r in
            kmv_estimate(df, "v", k=64, group_by=["g"]).collect()}
    # each group sees the 25 values congruent to it mod 4
    assert rows == {"0": 25.0, "1": 25.0, "2": 25.0, "3": 25.0}


def test_kmv_merge_monoid(spark):
    # merging per-part sketches == sketching the union
    k = 64
    df = spark.range(3000).selectExpr(
        "CAST(id % 2 AS STRING) AS part", "CAST(id % 500 AS STRING) AS v"
    )
    per_part = (
        df.groupBy("part")
        .agg(F.expr(f"slice(array_sort(collect_set(md5(CAST(v AS STRING)))), 1, {k})").alias("sk"))
        .agg(F.collect_list("sk").alias("sketches"))
        .selectExpr(f"{kmv_merge_sql(k)} AS merged")
        .collect()[0]
        .merged
    )
    direct = (
        df.selectExpr(f"slice(array_sort(collect_set(md5(CAST(v AS STRING)))), 1, {k})")
    )
    # build the direct sketch over the union
    whole = df.agg(
        F.expr(f"slice(array_sort(collect_set(md5(CAST(v AS STRING)))), 1, {k})").alias("sk")
    ).collect()[0].sk
    assert list(per_part) == list(whole)


def test_hash_sample_deterministic_and_uniformish(spark):
    from geotrellis_server_spark.operators.sketch import hash_sample

    df = spark.range(10000).selectExpr("id", "CAST(id % 100 AS DOUBLE) AS v")
    a = sorted(r.id for r in hash_sample(df.repartition(16), ["id"], 500).collect())
    b = sorted(r.id for r in hash_sample(df.coalesce(1), ["id"], 500).collect())
    assert a == b and len(a) == 500
    # roughly uniform over the id range (hash sample, not head rows)
    assert min(a) < 1000 and max(a) > 9000


def test_quantile_sketch_accuracy(spark):
    from geotrellis_server_spark.operators.sketch import quantile_sketch

    df = spark.range(20000).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    qs = {r.prob: r.value for r in
          quantile_sketch(df, "v", ["id"], k=2000, probs=[0.25, 0.5, 0.9]).collect()}
    assert abs(qs[0.5] - 10000) / 20000 < 0.05
    assert abs(qs[0.25] - 5000) / 20000 < 0.05
    assert abs(qs[0.9] - 18000) / 20000 < 0.05


def test_heavy_hitters_sampled(spark):
    from geotrellis_server_spark.operators.sketch import heavy_hitters_sampled

    # skewed: value 'hot' = 50%, others spread
    df = spark.range(20000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'hot' ELSE CAST(id % 57 AS STRING) END AS v"
    )
    rows = heavy_hitters_sampled(df, "v", ["id"], k=2000, top_n=3).collect()
    assert rows[0].value == "hot"
    assert abs(rows[0].est_count - 10000) / 10000 < 0.15


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    from geotrellis_server_spark.operators.sketch import cms_build, cms_query

    # 50 distinct values, skewed counts; width 256 >> 50 so collisions
    # are rare and most estimates are exact
    df = spark.range(5000).selectExpr("CAST(id % 50 AS STRING) AS v")
    true = {str(k): 100 for k in range(50)}
    cms = cms_build(df, "v", depth=4, width=256).cache()
    vals = spark.createDataFrame([(k,) for k in true], "v STRING")
    est = {r.value: r.est_count for r in cms_query(cms, vals, "v").collect()}
    assert all(est[k] >= true[k] for k in true)  # CMS upper bound
    assert sum(1 for k in true if est[k] == true[k]) >= 45  # mostly exact


def test_cms_unseen_value_estimates_small(spark):
    from geotrellis_server_spark.operators.sketch import cms_build, cms_query

    df = spark.range(1000).selectExpr("CAST(id % 10 AS STRING) AS v")
    cms = cms_build(df, "v", depth=4, width=512)
    vals = spark.createDataFrame([("never-seen",)], "v STRING")
    est = cms_query(cms, vals, "v").collect()[0].est_count
    assert est <= 100  # min over rows bounds collision noise


def test_cms_partition_invariant(spark):
    from geotrellis_server_spark.operators.sketch import cms_build

    df = spark.range(3000).selectExpr("CAST(id % 77 AS STRING) AS v")
    a = sorted(map(tuple, cms_build(df.repartition(16), "v").collect()))
    b = sorted(map(tuple, cms_build(df.coalesce(1), "v").collect()))
    assert a == b


def test_weighted_sample_proportional_and_deterministic(spark):
    from geotrellis_server_spark.operators.sketch import weighted_sample

    # 10k rows: ids < 5000 carry weight 10, rest weight 1
    df = spark.range(10000).selectExpr(
        "id", "CASE WHEN id < 5000 THEN 10.0 ELSE 1.0 END AS w"
    )
    s1 = {r.id for r in weighted_sample(df.repartition(16), "w", ["id"], 500).collect()}
    s2 = {r.id for r in weighted_sample(df.coalesce(1), "w", ["id"], 500).collect()}
    assert s1 == s2 and len(s1) == 500  # deterministic, partition-invariant
    heavy = sum(1 for i in s1 if i < 5000)
    # E-S inclusion: heavy items ~10x the rate of light ones
    assert heavy > 400, heavy


def test_weighted_sample_ulp_margin():
    """ULP-proof evidence for the sketch_weighted_sample50 gate query:
    every quantized rank key floor(ln(u)/w * 2^24) of the sf0.01 corpus
    sits FAR from a grid boundary, so a 1-ULP cross-engine ln()
    divergence (ULP of key*2^24 ~ 2e-10 here) cannot flip any floor —
    the Spark and DuckDB rankings are provably identical, not
    coincidentally identical."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    path = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
    t = pq.read_table(os.path.join(path, "documents.parquet"),
                      columns=["doc_id", "n_chars"]).to_pydict()
    denom = float(16**13)
    fracs = []
    for doc_id, w in zip(t["doc_id"], t["n_chars"]):
        if w <= 0:
            continue
        h13 = hashlib.md5(str(doc_id).encode()).hexdigest()[:13]
        u = (float(int(h13, 16)) + 1.0) / denom
        scaled = np.log(u) / float(w) * 16777216.0
        fr = scaled - np.floor(scaled)
        fracs.append(min(fr, 1.0 - fr))
    assert len(fracs) >= 400
    # min distance to a boundary, in units of the quantum: libm
    # divergence is ~1e-9 quanta, the corpus margin must dwarf that
    assert min(fracs) > 1e-4, min(fracs)


def test_weighted_sample_rejects_nonpositive(spark):
    from geotrellis_server_spark.operators.sketch import weighted_sample

    df = spark.range(100).selectExpr("id", "CASE WHEN id = 0 THEN 0.0 ELSE 1.0 END AS w")
    got = {r.id for r in weighted_sample(df, "w", ["id"], 99).collect()}
    assert 0 not in got and len(got) == 99


def test_kmv_ignores_nulls(spark):
    """Review r4 regression guard: a NULL value must not displace a real
    k-th hash (NULL md5 sorts first, then vanishes in collect_list,
    silently flipping the estimate into the 'exact' branch)."""
    df = spark.range(100).selectExpr(
        "CASE WHEN id = 0 THEN NULL ELSE CAST(id AS STRING) END AS v")
    r = kmv_estimate(df, "v", k=64).collect()[0]
    clean = spark.range(1, 100).selectExpr("CAST(id AS STRING) AS v")
    want = kmv_estimate(clean, "v", k=64).collect()[0]
    assert r.n_seen_hashes == want.n_seen_hashes == 64
    assert r.distinct_est == want.distinct_est  # NULL contributes nothing


def test_heavy_hitters_exact_two_pass(spark):
    # zipf-ish deterministic stream: value v_j appears ~N/2^j times,
    # plus a long tail of near-unique values
    df = spark.range(20000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'alpha' "
        "     WHEN id % 4 = 1 THEN 'beta' "
        "     WHEN id % 16 = 3 THEN 'gamma' "
        "     ELSE concat('tail_', CAST(id AS STRING)) END AS w"
    )
    got = {r["value"]: r["n"]
           for r in sketch.heavy_hitters(df, "w", one_in=20).collect()}
    # exact reference: plain groupBy with the same integer threshold
    exact = {r["w"]: r["n"] for r in df.groupBy("w")
             .agg(F.count("*").alias("n"))
             .where(F.col("n") * 20 >= 20000).collect()}
    assert got == exact
    assert set(got) == {"alpha", "beta", "gamma"}
    assert got["alpha"] == 10000 and got["beta"] == 5000

    # threshold edge: a value at EXACTLY N/one_in survives (>= compare)
    edge = spark.range(1000).selectExpr(
        "CASE WHEN id < 10 THEN 'edge' ELSE concat('t', CAST(id AS STRING)) "
        "END AS w")
    out = {r["value"] for r in
           sketch.heavy_hitters(edge, "w", one_in=100).collect()}
    assert out == {"edge"}


def test_hll_estimate_accuracy(spark):
    # 20k distinct values at p=12: standard error 1.04/sqrt(4096) = 1.6%,
    # assert within 4 sigma
    df = spark.range(20000).selectExpr("concat('v', CAST(id AS STRING)) AS v")
    sk = sketch.hll_sketch(df, "v", p=12)
    est = sketch.hll_estimate(sk, p=12)
    assert abs(est - 20000) / 20000 < 0.065


def test_hll_small_range_linear_counting(spark):
    df = spark.range(100).selectExpr("concat('x', CAST(id AS STRING)) AS v")
    est = sketch.hll_estimate(sketch.hll_sketch(df, "v", p=12), p=12)
    assert abs(est - 100) < 5  # linear counting is near-exact here


def test_hll_set_semantics_and_merge(spark):
    # register table is a pure function of the SET: duplication changes nothing
    a = spark.range(5000).selectExpr("concat('a', CAST(id % 1000 AS STRING)) AS v")
    a_once = spark.range(1000).selectExpr("concat('a', CAST(id AS STRING)) AS v")
    rows = lambda d: sorted((r.bucket, r.rho_max) for r in d.collect())
    assert rows(sketch.hll_sketch(a, "v")) == rows(sketch.hll_sketch(a_once, "v"))

    # merge monoid: sketch(A union B) == merge(sketch(A), sketch(B)) EXACTLY
    b = spark.range(1000).selectExpr("concat('b', CAST(id AS STRING)) AS v")
    both = a_once.unionByName(b)
    merged = sketch.hll_merge(sketch.hll_sketch(a_once, "v"),
                              sketch.hll_sketch(b, "v"))
    assert rows(sketch.hll_sketch(both, "v")) == rows(merged)


def test_hll_matches_duckdb_registers(spark, tmp_path):
    # the portability claim itself: same fragments, same registers in DuckDB
    import duckdb

    df = spark.range(3000).selectExpr("concat('w', CAST(id AS STRING)) AS v")
    pdf = df.toPandas()
    got = sorted((r.bucket, r.rho_max)
                 for r in sketch.hll_sketch(df, "v", p=8).collect())
    bucket, rho = sketch.hll_bucket_rho_sql("v", p=8)
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(tuple(r) for r in con.execute(
        f"SELECT {bucket} AS bucket, CAST(max({rho}) AS INT) AS rho_max "
        f"FROM t WHERE v IS NOT NULL GROUP BY 1").fetchall())
    assert got == want


def test_bloom_no_false_negatives_and_fp_bound(spark):
    from geotrellis_server_spark.operators.sketch import (bloom_build,
                                                          bloom_probe)

    members = spark.range(0, 200).selectExpr("id * 3 AS v")   # {0,3,6,...}
    bloom = bloom_build(members, "v", m_bits=4096, k=4)
    words = {int(r.word): int(r.bits) for r in bloom.collect()}
    probe = spark.range(0, 1200).selectExpr("id AS v")        # supersets members
    passed = {r.v for r in bloom_probe(probe, "v", words, 4096, 4).collect()}
    true = {i * 3 for i in range(200)}
    assert true <= passed                      # NO false negatives, ever
    fp = len(passed - true)
    # n=200, m=4096, k=4 -> theoretical fp ~0.24%; allow generous slack
    assert fp <= 0.05 * 1200, f"false positive count too high: {fp}"


def test_bloom_build_is_set_function(spark):
    from geotrellis_server_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([(i % 7,) for i in range(100)], "v int")
    b = spark.createDataFrame([(i,) for i in range(7)], "v int")
    ra = sorted(tuple(r) for r in bloom_build(a, "v", 512, 3).collect())
    rb = sorted(tuple(r) for r in
                bloom_build(b.repartition(5), "v", 512, 3).collect())
    assert ra == rb                            # dedup/partition-invariant


def test_bloom_probe_plan_no_shuffle(spark):
    from geotrellis_server_spark.operators.sketch import (bloom_build,
                                                          bloom_probe)

    members = spark.range(0, 50).selectExpr("id AS v")
    words = {int(r.word): int(r.bits)
             for r in bloom_build(members, "v", 1024, 4).collect()}
    pruned = bloom_probe(spark.range(0, 500).selectExpr("id AS v"),
                         "v", words, 1024, 4)
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    assert "Exchange" not in plan and "Join" not in plan


def test_bloom_prefilter_join_matches_plain_join(spark):
    from geotrellis_server_spark.operators.sketch import bloom_prefilter_join

    big = spark.createDataFrame([(i, i % 40) for i in range(400)],
                                "row_id int, fk int")
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(0, 40, 5)],
                                  "pk int, label string")
    out = bloom_prefilter_join(big, small, "fk", "pk", m_bits=2048, k=4)
    want = big.join(small, big.fk == small.pk)
    assert sorted(tuple(r) for r in out.collect()) == \
        sorted(tuple(r) for r in want.collect())


def test_kmv_set_ops_accuracy_and_determinism(spark):
    from geotrellis_server_spark.operators.sketch import kmv_set_ops

    a = spark.range(0, 1000).selectExpr("id AS v")
    b = spark.range(500, 1500).selectExpr("id AS v")
    r = kmv_set_ops(a, "v", b, "v", k=256).collect()[0]
    # true: union 1500, intersect 500, jaccard 1/3; ~1/sqrt(k)=6.25% noise
    assert abs(r.union_est - 1500) < 0.25 * 1500
    assert abs(r.intersect_est - 500) < 0.3 * 500
    assert abs(r.jaccard_est - 1 / 3) < 0.1
    # deterministic under repartitioning (pure function of the sets)
    r2 = kmv_set_ops(a.repartition(7), "v", b.repartition(3), "v",
                     k=256).collect()[0]
    assert tuple(r) == tuple(r2)


def test_kmv_set_ops_small_sets_exact(spark):
    from geotrellis_server_spark.operators.sketch import kmv_set_ops

    # both sets below k -> theta = 1, estimates are EXACT counts
    a = spark.createDataFrame([(i,) for i in range(30)], "v int")
    b = spark.createDataFrame([(i,) for i in range(20, 50)], "v int")
    r = kmv_set_ops(a, "v", b, "v", k=256).collect()[0]
    assert r.union_est == 50.0 and r.intersect_est == 10.0
    assert r.n_a == 30 and r.n_b == 30


def test_hash_sample_per_group(spark):
    from geotrellis_server_spark.operators.sketch import hash_sample_per_group

    df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS STRING) AS g")
    out = hash_sample_per_group(df, ["g"], ["id"], k=20)
    rows = out.collect()
    from collections import Counter
    per = Counter(r.g for r in rows)
    assert all(v == 20 for v in per.values()) and len(per) == 7
    # deterministic under repartitioning
    again = {(r.g, r.id) for r in
             hash_sample_per_group(df.repartition(9), ["g"], ["id"],
                                   k=20).collect()}
    assert again == {(r.g, r.id) for r in rows}
    # small groups come out whole
    tiny = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                                 "id int, g string")
    assert hash_sample_per_group(tiny, ["g"], ["id"], k=10).count() == 3


def test_quantiles_by_group_nearest_rank(spark):
    from geotrellis_server_spark.operators.sketch import quantiles_by_group

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r.g, r.p): r.value for r in quantiles_by_group(
        df, "v", ["g"], [0.5, 0.9, 1.0]).collect()}
    # nearest-rank: ceil(.5*10)=5 -> 5.0; ceil(.9*10)=9 -> 9.0; 10 -> 10.0
    assert got[("a", 0.5)] == 5.0 and got[("a", 0.9)] == 9.0
    assert got[("a", 1.0)] == 10.0
    assert got[("b", 0.5)] == 5.0  # single-element group
    import pytest

    with pytest.raises(ValueError):
        quantiles_by_group(df, "v", ["g"], [0.0])


def test_value_outliers_exact_flags(spark):
    from geotrellis_server_spark.operators.sketch import value_outliers

    # 20 values at 10.0 plus one wild 1000.0: only the wild one flags
    rows = [(i, "a", 10.0) for i in range(20)] + [(99, "a", 1000.0)]
    df = spark.createDataFrame(rows, "event_id long, g string, v double")
    got = [r.event_id for r in value_outliers(df, "v", ["g"]).collect()]
    assert got == [99]
    # constant group: variance 0, nothing flags (strict >)
    const = spark.createDataFrame([(i, "c", 5.0) for i in range(5)],
                                  "event_id long, g string, v double")
    assert value_outliers(const, "v", ["g"]).count() == 0
