"""Zonal statistics: per-zone aggregates with NoData exclusion vs a
driver-side numpy oracle."""

import math

import numpy as np

from geotrellis_server_spark.operators import zonal
from geotrellis_server_spark.operators.zonal import pixel_center_lonlat_sql
from geotrellis_server_spark.sources import synth
from geotrellis_server_spark import sqlgen


def test_zonal_stats_vs_numpy_oracle(spark):
    # two z2 8px tiles with a NaN hole; oracle assigns each pixel center
    # to its rect zone in plain python and aggregates with numpy
    z, ts = 2, 8
    rows = []
    vals = {}
    for i, (tx, ty) in enumerate([(1, 1), (2, 2)]):
        cells = [float(tx * 100 + k) for k in range(ts * ts)]
        cells[5] = float("nan")
        vals[(tx, ty)] = cells
        rows.append(("d", z, tx, ty, 0, ts, ts, 0.0, 0.0, 1.0, 1.0,
                     "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    got = {r.zone_id: r for r in zonal.zonal_stats_rect(tiles, z, ts).collect()}

    # oracle
    npx = (1 << z) * ts
    agg = {}
    for (tx, ty), cells in vals.items():
        for idx, v in enumerate(cells):
            if math.isnan(v):
                continue
            gx, gy = tx * ts + idx % ts, ty * ts + idx // ts
            lon = (gx + 0.5) / npx * 360.0 - 180.0
            lat = math.degrees(2 * math.atan(math.exp(math.pi * (1 - 2 * (gy + 0.5) / npx))) - math.pi / 2)
            col = min(max(int((lon - sqlgen.ZONE_LON0) // sqlgen.ZONE_LON_W), 0), 9)
            row = min(max(int((lat - sqlgen.ZONE_LAT0) // sqlgen.ZONE_LAT_H), 0), 9)
            agg.setdefault(row * 10 + col, []).append(v)
    assert set(got) == set(agg)
    for zid, vs in agg.items():
        r = got[zid]
        assert r.n_cells == len(vs)
        assert r.sum == sum(vs) and r.min == min(vs) and r.max == max(vs)
        assert abs(r.mean - sum(vs) / len(vs)) < 1e-12


def test_local_moran_vs_scalar_reference(spark):
    # two adjacent z2 8px tiles; values integer; queen contiguity with
    # absent-tile halo = out of domain (fewer neighbors at edges)
    z, ts = 2, 8
    rng = np.random.RandomState(7)
    tile_vals = {}
    rows = []
    for tx, ty in [(1, 1), (2, 1)]:
        cells = [float(x) for x in rng.randint(0, 50, ts * ts)]
        tile_vals[(tx, ty)] = cells
        rows.append(("d", z, tx, ty, 0, ts, ts, 0.0, 0.0, 1.0, 1.0,
                     "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    got = {(r.tile_x, r.tile_y, r.idx): r
           for r in zonal.local_moran(tiles).collect()}

    # scalar reference over the global grid
    grid = {}
    for (tx, ty), cells in tile_vals.items():
        for idx, v in enumerate(cells):
            gx, gy = tx * ts + idx % ts, ty * ts + idx // ts
            grid[(gx, gy)] = int(v)
    n = len(grid)
    s = sum(grid.values())
    for (tx, ty), cells in tile_vals.items():
        for idx in range(ts * ts):
            gx, gy = tx * ts + idx % ts, ty * ts + idx // ts
            nbrs = [grid[(x, y)] for x in (gx - 1, gx, gx + 1)
                    for y in (gy - 1, gy, gy + 1)
                    if (x, y) != (gx, gy) and (x, y) in grid]
            want = (n * grid[(gx, gy)] - s) * (n * sum(nbrs) - len(nbrs) * s)
            r = got[(tx, ty, idx)]
            assert r.nb_cnt == len(nbrs)
            assert r.moran_q == want, (tx, ty, idx)
    # structural signal: a constant raster has moran_q == 0 everywhere
    const = [("d", z, 1, 1, 0, ts, ts, 0.0, 0.0, 1.0, 1.0,
              "float64", float("nan"), [5.0] * (ts * ts))]
    cm = zonal.local_moran(
        spark.createDataFrame(const, synth.TILE_SCHEMA)).collect()
    assert all(r.moran_q == 0 for r in cm)
