"""Observation-based metrics: zero-cost per-stage counters."""

import pyspark.sql.functions as F

from geotrellis_server_spark.obs import MetricsLog


def test_observe_counts_without_extra_action(spark):
    log = MetricsLog(spark)
    df = spark.range(100).selectExpr("id", "id % 3 AS k")
    staged = log.observe(df, "scan", n=F.count(F.lit(1)),
                         n_k0=F.count_if(F.col("k") == 0))
    filtered = log.observe(staged.filter("k != 0"), "filtered")
    assert filtered.count() == 66  # the ONE action; metrics ride along
    snap = {r["stage"]: r for r in log.snapshot()}
    assert snap["scan"]["n"] == 100 and snap["scan"]["n_k0"] == 34
    assert snap["filtered"]["n"] == 66


def test_metrics_df_long_form(spark):
    log = MetricsLog(spark)
    out = log.observe(spark.range(10), "s1")
    out.write.mode("overwrite").format("noop").save()
    m = {(r.stage, r.metric): r.value for r in log.metrics_df().collect()}
    assert m[("s1", "n")] == 10.0


def test_observe_in_pipeline_stage(spark):
    # the realistic shape: metrics attached mid-pipeline, one action
    from geotrellis_server_spark.operators import tiling
    from geotrellis_server_spark.sources import synth

    log = MetricsLog(spark)
    d = log.observe(synth.extract_geometry(synth.docs(spark, 500)), "extract")
    counts = tiling.tile_counts(d, 4)
    total = counts.agg(F.sum("n_docs")).collect()[0][0]
    assert total == 500
    assert log.snapshot()[0]["n"] == 500
