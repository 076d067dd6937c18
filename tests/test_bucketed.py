"""Bucketed pre-keyed table: aggregation plans with ZERO Exchange and
matches the shuffle path's result."""

import pyspark.sql.functions as F
import pytest

from geotrellis_server_spark.operators import spatial_join, tiling
from geotrellis_server_spark.sources import bucketed, synth


def test_bucketed_agg_is_shuffle_free_and_correct(spark, tmp_path):
    # warehouse.dir is a static conf; the shared session default
    # (./spark-warehouse, gitignored) is used and the table dropped after
    docs = synth.extract_geometry(synth.docs(spark, 3000))
    bucketed.materialize_keyed_table(spark, docs, "t_keyed_test", zoom=8, n_buckets=8)
    try:
        q = bucketed.tile_counts_from_keyed(spark, "t_keyed_test")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing eliminates the shuffle

        exp = {
            (r.zone_id, r.tile_x, r.tile_y): r.n_docs
            for r in tiling.assign_tiles(spatial_join.pip_join_rect(docs, synth.zone_grid(spark)), 8)
            .groupBy("zone_id", "tile_x", "tile_y")
            .agg(F.count("*").alias("n_docs"))
            .collect()
        }
        got = {(r.zone_id, r.tile_x, r.tile_y): r.n_docs for r in q.collect()}
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS t_keyed_test")
