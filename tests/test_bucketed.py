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


def test_focal_from_bucketed_pyramid_cold_storage(spark):
    """Focal over a BUCKETED pyramid table: the join-back's tile-body
    side comes straight from the bucketed file scan — no Exchange
    between the join and the scan — and the result is identical to the
    cached-input path (both partitioning-reuse routes, one from cold
    storage)."""
    import re

    from geotrellis_server_spark.maml import ast as M
    from geotrellis_server_spark.maml.eval import eval_expr
    from geotrellis_server_spark.operators.focal import with_halo

    d = synth.extract_geometry(synth.docs(spark, 3000))
    tiles = tiling.rasterize_count(d, 3, tile_size=8)
    bucketed.materialize_tile_pyramid(tiles, "t_pyr_test", n_buckets=8)
    try:
        cold = spark.table("t_pyr_test")
        plan = with_halo(cold, 1)._jdf.queryExecution().executedPlan().toString()
        # body side of the join = the bucketed FileScan directly (the
        # strips side still has its one legitimate exchange)
        m = re.search(r"Join [^\n]*\n\s*:-(.*?)\n\s*\+-", plan, re.S)
        assert m is not None, plan[:3000]
        body_side = m.group(1)
        assert "Exchange" not in body_side, body_side
        assert "Bucketed: true" in plan, plan[:3000]
        want = {
            (r.tile_x, r.tile_y): r.cells
            for r in eval_expr(
                M.focal("fsum", M.var("d"), radius=1), {"d": tiles}
            ).collect()
        }
        got = {
            (r.tile_x, r.tile_y): r.cells
            for r in eval_expr(
                M.focal("fsum", M.var("d"), radius=1), {"d": cold}
            ).collect()
        }
        assert want.keys() == got.keys() and len(want) > 4
        for k in want:
            assert want[k] == got[k]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_pyr_test")
