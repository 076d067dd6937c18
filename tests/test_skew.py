"""Hot-cell salting: correctness equivalence + sub-group splitting."""

import pyspark.sql.functions as F

from geotrellis_server_spark.grids import cells as C
from geotrellis_server_spark.operators import skew
from geotrellis_server_spark.sources import synth

RES = 4  # 256 cells: uniform background ~0.4% each, clusters ~8% each


def _docs_with_cells(spark, n=4000):
    d = synth.extract_geometry(synth.docs(spark, n))
    return d.withColumn("cell", C.cell_key_col("lon", "lat", RES))


def test_detect_hot_keys_finds_clusters(spark):
    d = _docs_with_cells(spark)
    # exact path: no false positives (the sampled default trades a few
    # harmless false positives for a single-sample-scan detection — its
    # superset property is covered in test_similarity)
    hot = skew.detect_hot_keys(d, ["cell"], threshold=0.05, sample_fraction=None)
    assert 1 <= len(hot) <= 6
    # the hottest cell holds ~ n/12 of all docs (one cluster)
    counts = {r.cell: r["count"] for r in d.groupBy("cell").count().collect()}
    assert max(counts.values()) >= 4000 / 12 * 0.9
    assert all(counts[hk[0]] >= 4000 * 0.05 for hk in hot)


def test_salted_collect_equals_plain(spark):
    d = _docs_with_cells(spark, 3000)
    plain = {
        r.cell: sorted(r.values)
        for r in d.groupBy("cell").agg(F.collect_list("doc_id").alias("values")).collect()
    }
    salted = {
        r.cell: sorted(r.values)
        for r in skew.salted_collect_agg(
            d, ["cell"], "doc_id", id_col="doc_id", n_salt=8
        ).collect()
    }
    assert salted == plain


def test_hot_key_splits_into_salt_subgroups(spark):
    d = _docs_with_cells(spark, 3000)
    hot = skew.detect_hot_keys(d, ["cell"], threshold=0.05)
    assert hot
    hk = hot[0][0]
    sub = (
        skew.with_salt(d.filter(F.col("cell") == hk), "doc_id", 8)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(sub) == 8  # the hot cell's rows spread across all salts
    counts = [r["count"] for r in sub]
    assert max(counts) < sum(counts) * 0.5  # no salt bucket dominates


def test_salted_join_equals_plain(spark):
    d = _docs_with_cells(spark, 2000)
    # a per-cell attribute table too "large" to broadcast (simulated)
    attrs = d.groupBy("cell").count().withColumnRenamed("count", "cell_pop")
    plain = (
        d.join(attrs, "cell").select("doc_id", "cell_pop").orderBy("doc_id").collect()
    )
    salted = (
        skew.salted_join(d, attrs, "cell", id_col="doc_id", n_salt=4)
        .select("doc_id", "cell_pop")
        .orderBy("doc_id")
        .collect()
    )
    assert salted == plain
