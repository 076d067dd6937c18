"""Layout / SpatialKey goldens — FIXTURES.md F5 (WMTS GoogleMapsCompatible
parity, reference GeotrellisTileMatrix.scala:37-49) and extent fold
order-insensitivity (reference ExtentMergeStrategyTest.scala:33-98)."""

import itertools
import math

import numpy as np
import pytest

from geotrellis_server_spark.grids.layout import (
    Extent,
    ZoomedLayoutScheme,
    WEBMERCATOR_BOUND,
    lonlat_to_mercator,
    mercator_to_lonlat,
    tile_key_np,
)


def test_zoom0_single_tile():
    scheme = ZoomedLayoutScheme()
    layout = scheme.layout(0)
    assert layout.layout_cols == 1 and layout.layout_rows == 1
    assert layout.key_for(0.0, 0.0) == (0, 0)
    assert layout.key_for(-WEBMERCATOR_BOUND, WEBMERCATOR_BOUND) == (0, 0)


def test_key_extent_roundtrip_bench_tile():
    # the reference JMH bench tile (TmsReificationBench.scala:57-58)
    scheme = ZoomedLayoutScheme()
    layout = scheme.layout(9)
    e = layout.extent_for(454, 200)
    cx, cy = (e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2
    assert layout.key_for(cx, cy) == (454, 200)
    # any strictly-interior point maps back (boundary points are
    # ulp-sensitive by the floor convention; see test below with exact
    # binary coordinates)
    assert layout.key_for(e.xmin + e.width * 0.01, e.ymax - e.height * 0.01) == (454, 200)


def test_boundary_convention_exact_coords():
    # At z=1 the shared tile boundary is x=0 / y=0 — exactly representable,
    # so the convention is observable without FP noise: a point ON the
    # boundary belongs to the east/south tile (floor convention).
    layout = ZoomedLayoutScheme().layout(1)
    assert layout.key_for(0.0, 1.0) == (1, 0)   # x=0 → east tile
    assert layout.key_for(-1.0, 0.0) == (0, 1)  # y=0 → south tile
    assert layout.key_for(0.0, 0.0) == (1, 1)


def test_hand_computed_keys():
    scheme = ZoomedLayoutScheme()
    l1 = scheme.layout(1)
    # quadrants at z=1: (x>0, y>0) → (1, 0)
    assert l1.key_for(1.0, 1.0) == (1, 0)
    assert l1.key_for(-1.0, 1.0) == (0, 0)
    assert l1.key_for(-1.0, -1.0) == (0, 1)
    assert l1.key_for(1.0, -1.0) == (1, 1)
    # world edge clamps into last tile
    l2 = scheme.layout(2)
    assert l2.key_for(WEBMERCATOR_BOUND, -WEBMERCATOR_BOUND) == (3, 3)


def test_lonlat_tile_keys_match_layout():
    # tile_key_np (normalized lon/lat path) agrees with mercator layout math
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    for zoom in (1, 4, 9):
        tx, ty = tile_key_np(lon, lat, zoom)
        mx, my = lonlat_to_mercator(lon, lat)
        layout = ZoomedLayoutScheme().layout(zoom)
        tx2, ty2 = layout.keys_np(mx, my)
        assert (tx == tx2).all() and (ty == ty2).all()


def test_mercator_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-85, 85, 100)
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)


def test_extent_folds_order_insensitive():
    # reference ExtentMergeStrategyTest: intersect/union folds invariant
    # under permutation, three overlap regimes
    regimes = [
        [Extent(0, 0, 4, 4), Extent(2, 2, 6, 6), Extent(3, 1, 5, 5)],  # all overlap
        [Extent(0, 0, 2, 2), Extent(1, 1, 4, 4), Extent(6, 6, 9, 9)],  # partial
        [Extent(0, 0, 1, 1), Extent(2, 2, 3, 3), Extent(4, 4, 5, 5)],  # disjoint
    ]
    for exts in regimes:
        unions, inters = set(), set()
        for perm in itertools.permutations(exts):
            u = perm[0]
            for e in perm[1:]:
                u = u.combine(e)
            unions.add((u.xmin, u.ymin, u.xmax, u.ymax))
            i = perm[0]
            for e in perm[1:]:
                i = i.intersection(e) if i is not None else None
            inters.add(None if i is None else (i.xmin, i.ymin, i.xmax, i.ymax))
        assert len(unions) == 1
        assert len(inters) == 1


def test_keys_for_extent_pruning_bounds():
    scheme = ZoomedLayoutScheme()
    layout = scheme.layout(3)
    t = layout.extent_for(2, 5)
    # the exact tile extent prunes to exactly that tile
    assert layout.keys_for_extent(t) == (2, 5, 2, 5)
    # a window spanning 2x2 tiles
    e = Extent(t.xmin, t.ymin - 1.0, t.xmax + 1.0, t.ymax)
    tx0, ty0, tx1, ty1 = layout.keys_for_extent(e)
    assert (tx0, ty0, tx1, ty1) == (2, 5, 3, 6)


def test_zoom_for_cell_size():
    scheme = ZoomedLayoutScheme()
    # requesting exactly zoom-5 resolution picks zoom 5; anything finer → 6
    cs5 = scheme.cell_size(5)
    assert scheme.zoom_for_cell_size(cs5) == 5
    assert scheme.zoom_for_cell_size(cs5 * 0.99) == 6
    assert scheme.zoom_for_cell_size(cs5 * 2) == 4


# --- CrsLayoutScheme (non-WebMercator pyramids, r3) -------------------------


def test_crs_layout_scheme_grid_shape():
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 256)
    assert (s.cols0, s.rows0) == (1, 10)
    lay = s.layout(3)
    assert (lay.layout_cols, lay.layout_rows) == (8, 80)
    assert lay.tile_width == 125000.0 and lay.tile_height == 125000.0
    # key <-> extent roundtrip
    e = lay.extent_for(4, 40)
    tx, ty = lay.key_for((e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2)
    assert (tx, ty) == (4, 40)
    # wide extent flips the aspect
    s2 = CrsLayoutScheme(3035, Extent(0.0, 0.0, 4000000.0, 1000000.0), 256)
    assert (s2.cols0, s2.rows0) == (4, 1)


def test_crs_layout_scale_denominator():
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 256)
    # cell size at z0 = 1e6 / 256 m; WMTS pixel = 0.28 mm
    assert abs(s.scale_denominator(0) - (1000000.0 / 256) / 0.00028) < 1e-6
    # halves per level
    assert abs(s.scale_denominator(3) - s.scale_denominator(0) / 8) < 1e-6


def test_utm_native_tile_assignment_golden(spark):
    # 155-point independent golden: Snyder-series expected keys vs the
    # engine's Karney projection + SQL floor keying
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.operators import tiling
    from geotrellis_server_spark.sources.utm_goldens import (
        BASE_EXTENT, EPSG, GOLDEN_UTM33, ZOOM)

    lay = CrsLayoutScheme(EPSG, Extent(*BASE_EXTENT), 256).layout(ZOOM)
    df = spark.createDataFrame(
        [(pid, lon, lat) for pid, lon, lat, _, _ in GOLDEN_UTM33],
        "pid BIGINT, lon DOUBLE, lat DOUBLE",
    )
    got = {
        r.pid: (r.tile_x, r.tile_y)
        for r in tiling.assign_tiles_layout(
            tiling.project_to_epsg(df, EPSG), lay
        ).collect()
    }
    for pid, _, _, tx, ty in GOLDEN_UTM33:
        assert got[pid] == (tx, ty), pid


def test_engine_get_tile_on_utm_pyramid(spark):
    # engine surface over a UTM-native pyramid: get_tile is CRS-agnostic
    # (key equi-join); tile extents are UTM meters from the custom layout
    import pyspark.sql.functions as F

    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.sources import synth

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 8)
    lay = s.layout(2)
    rows = []
    for tx in range(2, 4):
        for ty in range(30, 32):
            e = lay.extent_for(tx, ty)
            cells = [float(tx * 1000 + ty)] * 64
            rows.append(("utm", 2, tx, ty, 0, 8, 8, e.xmin, e.ymin, e.xmax,
                         e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"utm": Layer("utm", tiles, scheme=s)})
    got = eng.get_tile("utm", 2, 3, 31).collect()
    assert len(got) == 1
    assert got[0].cells[0] == 3031.0
    assert got[0].xmin == lay.extent_for(3, 31).xmin


def test_engine_get_extent_on_utm_pyramid(spark):
    # GetCoverage over a UTM-native matrix set: zoom selection, key-range
    # pruning and crop all follow the layer's CrsLayoutScheme
    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.sources import synth

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 8)
    rows = []
    for z in (1, 2):
        lay = s.layout(z)
        for tx in range(lay.layout_cols):
            for ty in range(12 << (z - 1), 16 << (z - 1)):
                e = lay.extent_for(tx, ty)
                cells = [float(z * 100000 + tx * 1000 + ty)] * 64
                rows.append(("utm", z, tx, ty, 0, 8, 8, e.xmin, e.ymin,
                             e.xmax, e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"utm": Layer("utm", tiles, scheme=s)})

    # request a window at z2 resolution (cell = 1e6/(4*8)/8 m at z2)
    req = (300000.0, 3200000.0, 560000.0, 3450000.0)
    got = eng.get_extent("utm", req, s.cell_size(2)).collect()
    assert got, "window must hit tiles"
    assert {r.zoom for r in got} == {2}
    lay2 = s.layout(2)
    for r in got:
        e = lay2.extent_for(r.tile_x, r.tile_y)
        assert e.xmax > req[0] and e.xmin < req[2]
        assert e.ymax > req[1] and e.ymin < req[3]
    # zoom selection picks z1 for a coarse request
    coarse = eng.get_extent("utm", req, s.cell_size(1)).collect()
    assert coarse and {r.zoom for r in coarse} == {1}


def test_describe_exposes_matrix_set(spark):
    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.sources import synth

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 8)
    lay = s.layout(2)
    e = lay.extent_for(2, 24)
    tiles = spark.createDataFrame(
        [("utm", 2, 2, 24, 0, 8, 8, e.xmin, e.ymin, e.xmax, e.ymax,
          "float64", float("nan"), [1.0] * 64)], synth.TILE_SCHEMA)
    eng = Engine(spark, {"utm": Layer("utm", tiles, scheme=s)})
    (d,) = eng.describe()
    ms = d["matrix_set"]
    assert ms["crs_epsg"] == 32633
    assert ms["matrices"] == [{
        "zoom": 2, "cols": 4, "rows": 40,
        "scale_denominator": s.scale_denominator(2),
    }]


def test_rasterize_count_layout_utm_golden(spark):
    # density rasterization over the UTM matrix set: per-pixel counts
    # must match a numpy brute-force rasterization of the SAME projected
    # points (projection via the independent Snyder series)
    import numpy as np

    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.operators import tiling
    from geotrellis_server_spark.sources.utm_goldens import (
        BASE_EXTENT, EPSG, GOLDEN_UTM33)
    from scripts.gen_utm_goldens import snyder_tm_forward

    s = CrsLayoutScheme(EPSG, Extent(*BASE_EXTENT), 16)
    zoom = 3
    lay = s.layout(zoom)
    df = spark.createDataFrame(
        [(pid, lon, lat) for pid, lon, lat, _, _ in GOLDEN_UTM33],
        "pid BIGINT, lon DOUBLE, lat DOUBLE",
    )
    tiles = tiling.rasterize_count_layout(
        tiling.project_to_epsg(df, EPSG), s, zoom).collect()

    # brute force with Snyder coordinates (within ~1e-8 of Karney's --
    # goldens were filtered to sit clear of tile boundaries; pixel
    # boundaries are 16x finer, so re-filter points near pixel edges)
    exp = {}
    ts, gw, gh = 16, lay.layout_cols * 16, lay.layout_rows * 16
    cw, chh = lay.cell_width, lay.cell_height
    checked = 0
    for pid, lon, lat, _, _ in GOLDEN_UTM33:
        x, y = snyder_tm_forward(lon, lat)
        fx = (x - lay.extent.xmin) / cw
        fy = (lay.extent.ymax - y) / chh
        if min(abs(fx - round(fx)), abs(fy - round(fy))) < 1e-6:
            continue  # too close to a pixel boundary for cross-series cmp
        gx = min(max(int(np.floor(fx)), 0), gw - 1)
        gy = min(max(int(np.floor(fy)), 0), gh - 1)
        exp[(gx // ts, gy // ts, (gy % ts) * ts + gx % ts)] = (
            exp.get((gx // ts, gy // ts, (gy % ts) * ts + gx % ts), 0) + 1)
        checked += 1
    assert checked > 140
    got = {}
    for r in tiles:
        cells = np.asarray(r.cells)
        for pix in np.nonzero(cells)[0]:
            got[(r.tile_x, r.tile_y, int(pix))] = int(cells[pix])
    for k, v in exp.items():
        assert got.get(k) == v, k
    # total mass conserved
    assert sum(got.values()) == len(GOLDEN_UTM33)


def test_utm_native_layer_served_in_webmercator(spark):
    # a UTM-33N-stored pyramid answers a 3857 GetMap: request extent
    # back-projects to UTM, pyramid evaluates there, warp returns the
    # WebMercator grid. Cell values = easting of the pixel center, so the
    # warped output is checkable per-pixel against the inverse transform.
    import numpy as np

    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids import proj
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent
    from geotrellis_server_spark.sources import synth

    s = CrsLayoutScheme(32633, Extent(0.0, 0.0, 1000000.0, 10000000.0), 32)
    z = 3
    lay = s.layout(z)
    rows = []
    for tx in range(2, 6):
        for ty in range(40, 44):  # mid-latitudes band
            e = lay.extent_for(tx, ty)
            cells = []
            for r in range(32):
                for c in range(32):
                    ex = e.xmin + (c + 0.5) * (e.xmax - e.xmin) / 32
                    cells.append(float(ex))
            rows.append(("utm", z, tx, ty, 0, 32, 32, e.xmin, e.ymin, e.xmax,
                         e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"utm": Layer("utm", tiles, scheme=s)})

    # WebMercator window inside the patch (UTM northing 4.5-5.0M ~ lat
    # 40.6-45.1N; lon ~13-16.6E)
    merc_ext = (1450000.0, 5050000.0, 1850000.0, 5400000.0)
    arr, ext = eng.get_extent_reprojected("utm", merc_ext, 3857, 48, 48)
    assert arr.shape == (48, 48)
    cx = ext[0] + (np.arange(48) + 0.5) * (ext[2] - ext[0]) / 48
    cy = ext[3] - (np.arange(48) + 0.5) * (ext[3] - ext[1]) / 48
    CX, CY = np.meshgrid(cx, cy)
    exp_x, _ = proj.transform(CX.ravel(), CY.ravel(), 3857, 32633)
    exp = exp_x.reshape(48, 48)
    ok = ~np.isnan(arr)
    assert ok.mean() > 0.6
    # easting varies ~quadratically over a tile; bilinear tolerance in m
    assert np.abs(arr[ok] - exp[ok]).max() < 2000.0
