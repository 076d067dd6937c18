"""Tile assignment + rasterization vs oracles (SURVEY.md R4; exact tile
assignments are a correctness gate per BASELINE.json)."""

import duckdb
import numpy as np
import pytest
import pyspark.sql.functions as F

from geotrellis_server_spark import sqlgen
from geotrellis_server_spark.grids.layout import tile_key_np
from geotrellis_server_spark.operators import tiling
from geotrellis_server_spark.sources import synth

N = 3000


def test_tile_counts_match_duckdb(spark):
    d = synth.extract_geometry(synth.docs(spark, N))
    tc = tiling.tile_counts(d, 8).toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    o = duckdb.connect().execute(
        f"""SELECT {sqlgen.tile_x_sql(sqlgen.lon_sql('id'), 8)} tile_x,
                  {sqlgen.tile_y_sql(sqlgen.lat_sql('id'), 8)} tile_y, count(*) n_docs
        FROM range({N}) t(id) GROUP BY 1, 2 ORDER BY tile_x, tile_y"""
    ).df()
    assert (tc.values == o.values).all()


def test_assign_tiles_matches_numpy(spark):
    d = synth.extract_geometry(synth.docs(spark, N))
    pdf = tiling.assign_tiles(d, 12).select("lon", "lat", "tile_x", "tile_y").toPandas()
    tx, ty = tile_key_np(pdf.lon.values, pdf.lat.values, 12)
    assert (tx == pdf.tile_x.values).all()
    assert (ty == pdf.tile_y.values).all()


def test_rasterize_count_conserves_mass_and_placement(spark):
    d = synth.extract_geometry(synth.docs(spark, N))
    r = tiling.rasterize_count(d, 3, tile_size=32)
    rows = r.collect()
    total = sum(sum(row.cells) for row in rows)
    assert total == N  # every doc lands in exactly one pixel
    # cross-check one tile against numpy bincount
    pdf = d.select("lon", "lat").toPandas()
    zoom, ts = 3, 32
    n_px = (1 << zoom) * ts
    gx, gy = tile_key_np(pdf.lon.values, pdf.lat.values, zoom)
    # global pixel indices via the same normalized-mercator math
    mx = (pdf.lon.values + 180.0) / 360.0
    lat = np.clip(pdf.lat.values, -sqlgen.MAX_LAT, sqlgen.MAX_LAT)
    my = 0.5 - np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) / (2 * np.pi)
    gpx = np.minimum(np.floor(mx * n_px), n_px - 1).astype(np.int64)
    gpy = np.minimum(np.floor(my * n_px), n_px - 1).astype(np.int64)
    row = max(rows, key=lambda r: sum(r.cells))
    m = (gx == row.tile_x) & (gy == row.tile_y)
    px = gpx[m] - row.tile_x * ts
    py = gpy[m] - row.tile_y * ts
    exp = np.bincount(py * ts + px, minlength=ts * ts).astype(float)
    assert (np.array(row.cells) == exp).all()


def test_rasterize_plan_shape(spark):
    d = synth.extract_geometry(synth.docs(spark, 100))
    plan = tiling.rasterize_count(d, 3, tile_size=16)._jdf.queryExecution().executedPlan().toString()
    # exactly one Arrow-vectorized stage (the dense-array scatter); never
    # row-at-a-time Python
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan  # partial+final pixel agg, skew-safe


def test_pyramid_up_sum_manual(spark):
    from geotrellis_server_spark.operators.tiling import pyramid_up

    # two children of parent (0,0): NW (0,0) and SE (1,1); 4x4 px
    def tile(tx, ty, base):
        return (3, tx, ty, 4, 4, [float(base + i) for i in range(16)])

    df = spark.createDataFrame(
        [tile(0, 0, 0), tile(1, 1, 100)],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    rows = pyramid_up(df, agg="sum").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.zoom, r.tile_x, r.tile_y, r.width, r.height) == (2, 0, 0, 4, 4)
    a = np.array(r.cells).reshape(4, 4)
    # NW quadrant: 2x2 sums of the base tile
    assert a[0, 0] == 0 + 1 + 4 + 5
    assert a[1, 1] == 10 + 11 + 14 + 15
    # NE and SW children missing -> fill 0
    assert a[0, 2] == 0.0 and a[2, 0] == 0.0
    # SE quadrant from the (1,1) child
    assert a[2, 2] == 100 + 101 + 104 + 105


def test_pyramid_up_mean_and_nan_fill(spark):
    from geotrellis_server_spark.operators.tiling import pyramid_up

    df = spark.createDataFrame(
        [(3, 0, 0, 2, 2, [1.0, 2.0, 3.0, 4.0])],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    r = pyramid_up(df, agg="mean", fill=float("nan")).collect()[0]
    a = np.array(r.cells, dtype=np.float64).reshape(2, 2)
    assert a[0, 0] == 2.5  # mean of 1..4
    assert np.isnan(a[0, 1]) and np.isnan(a[1, 0]) and np.isnan(a[1, 1])


def test_pyramid_up_equals_direct_rasterize(spark):
    """Rolling up the z4 count raster must equal rasterizing at z3
    directly — Pyramid.up's invariant for density layers."""
    from geotrellis_server_spark.operators.tiling import pyramid_up, rasterize_count
    from geotrellis_server_spark.sources import synth

    d = synth.extract_geometry(synth.docs(spark, 3000))
    up = pyramid_up(rasterize_count(d, 4, tile_size=8), agg="sum")
    direct = rasterize_count(d, 3, tile_size=8)
    a = {(r.tile_x, r.tile_y): tuple(r.cells) for r in up.collect()}
    b = {(r.tile_x, r.tile_y): tuple(r.cells) for r in direct.collect()}
    assert a == b


def test_pyramid_up_plan_shapes(spark):
    from geotrellis_server_spark.operators.tiling import pyramid_up

    df = spark.createDataFrame(
        [(3, 0, 0, 4, 4, [0.0] * 16)],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    # sql impl: pure JVM, no Python nodes
    plan = pyramid_up(df, impl="sql")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInArrow" not in plan
    # arrow impl (default): Arrow-batched kernels, never row-at-a-time
    plan_a = pyramid_up(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan_a
    assert "BatchEvalPython" not in plan_a


def test_pyramid_up_arrow_equals_sql(spark):
    """The Arrow kernels must be bit-identical to the SQL form on all
    aggs, including missing quadrants, NaN fill, and negative tile
    coordinates (the FP accumulation order is the same by design)."""
    import random

    from geotrellis_server_spark.operators.tiling import pyramid_up

    rng = random.Random(7)
    rows = []
    for tx in range(-3, 3):
        for ty in range(-3, 3):
            if rng.random() < 0.35:
                continue  # leave holes -> missing quadrants
            rows.append((5, tx, ty, 8, 8,
                         [rng.uniform(-100, 100) for _ in range(64)]))
    df = spark.createDataFrame(
        rows,
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    for agg, fill in (("sum", 0.0), ("mean", float("nan")), ("max", 0.0)):
        a = {(r.zoom, r.tile_x, r.tile_y):
             (r.width, r.height, tuple(r.cells))
             for r in pyramid_up(df, agg=agg, fill=fill,
                                 impl="arrow").collect()}
        b = {(r.zoom, r.tile_x, r.tile_y):
             (r.width, r.height, tuple(r.cells))
             for r in pyramid_up(df, agg=agg, fill=fill,
                                 impl="sql").collect()}
        # NaN != NaN: compare via repr which preserves bit-level doubles
        assert {k: repr(v) for k, v in a.items()} == \
               {k: repr(v) for k, v in b.items()}, agg


def test_pyramid_up_negative_tile_coords(spark):
    # custom-CRS layouts can key tiles at negative coordinates: children
    # (-2,-2) and (-1,-1) both belong to parent (-1,-1)
    from geotrellis_server_spark.operators.tiling import pyramid_up

    df = spark.createDataFrame(
        [(3, -2, -2, 2, 2, [1.0, 1.0, 1.0, 1.0]),
         (3, -1, -1, 2, 2, [2.0, 2.0, 2.0, 2.0])],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    rows = pyramid_up(df, agg="sum").collect()
    assert len(rows) == 1 and (rows[0].tile_x, rows[0].tile_y) == (-1, -1)
    a = np.array(rows[0].cells).reshape(2, 2)
    assert a[0, 0] == 4.0 and a[1, 1] == 8.0  # NW from (-2,-2), SE from (-1,-1)


def test_pyramid_up_rejects_odd_tile_size(spark):
    from geotrellis_server_spark.operators.tiling import pyramid_up

    df = spark.createDataFrame(
        [(3, 0, 0, 3, 3, [0.0] * 9)],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT, cells ARRAY<DOUBLE>",
    )
    with pytest.raises(Exception, match="even tile size"):
        pyramid_up(df).collect()


def test_write_pyramid_levels_and_pruning(spark, tmp_path):
    from geotrellis_server_spark.operators.tiling import (
        pyramid_up,
        rasterize_count,
        read_pyramid_level,
        write_pyramid,
    )

    d = synth.extract_geometry(synth.docs(spark, 2000))
    path = str(tmp_path / "pyr")
    write_pyramid(d, path, max_zoom=3, tile_size=8)
    # every level present; z2 equals direct rollup of z3
    all_levels = spark.read.parquet(path)
    assert {r.zoom for r in all_levels.select("zoom").distinct().collect()} == {0, 1, 2, 3}
    z2_direct = {(r.tile_x, r.tile_y): tuple(r.cells)
                 for r in pyramid_up(rasterize_count(d, 3, tile_size=8)).collect()}
    z2_read = {(r.tile_x, r.tile_y): tuple(r.cells)
               for r in read_pyramid_level(spark, path, 2).collect()}
    assert z2_read == z2_direct
    # zoom filter reaches the scan as a partition filter
    plan = read_pyramid_level(spark, path, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "zoom" in plan.split("PartitionFilters")[1][:120]
