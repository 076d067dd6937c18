"""General CRS transforms (R2): Karney transverse-Mercator validated
against public invariants (meridian-quadrant constant, k0·arc on the
central meridian, symmetry, roundtrip), the generic transform router,
and the per-tile warp operator."""

import numpy as np
import pytest

from geotrellis_server_spark.grids import proj

UTM18N = 32618


def test_meridian_quadrant_public_constant():
    # WGS84 equator→pole meridian arc: 10,001,965.7293 m (public constant)
    q = proj.meridian_arc(np.array([90.0]))[0]
    assert abs(q - 10001965.7293) < 1e-3


def test_tm_roundtrip_submm():
    lons = np.array([-75.0, -74.9, -73.5, -72.01, -77.9, -69.0, -81.0])
    lats = np.array([0.01, 12.0, 40.5, 63.2, -3.0, 84.0, -55.5])
    e, n = proj.tm_forward(lons, lats, -75.0)
    lo, la = proj.tm_inverse(e, n, -75.0)
    # 1e-11 deg ≈ 1 micrometre
    assert np.abs(lo - lons).max() < 1e-11
    assert np.abs(la - lats).max() < 1e-11


def test_tm_central_meridian_scale():
    # on the central meridian: E = FE exactly, N = k0 * meridian arc
    e, n = proj.tm_forward(np.array([-75.0]), np.array([40.0]), -75.0)
    assert e[0] == 500000.0
    arc = proj.meridian_arc(np.array([40.0]))[0]
    assert abs(n[0] - 0.9996 * arc) < 1e-6


def test_tm_east_west_symmetry():
    ep, n1 = proj.tm_forward(np.array([-73.0]), np.array([40.0]), -75.0)
    em, n2 = proj.tm_forward(np.array([-77.0]), np.array([40.0]), -75.0)
    assert abs((ep[0] - 500000.0) + (em[0] - 500000.0)) < 1e-9
    assert abs(n1[0] - n2[0]) < 1e-9


def test_utm_zone_epsg():
    assert proj.utm_zone_epsg(-74.0, 40.5) == 32618
    assert proj.utm_zone_epsg(-74.0, -40.5) == 32718
    assert proj.utm_zone_epsg(0.5, 10.0) == 32631
    assert proj.utm_zone_epsg(-180.0, 1.0) == 32601
    assert proj.utm_zone_epsg(179.9, 1.0) == 32660


def test_transform_router_utm_mercator_lonlat():
    lon = np.array([-73.5])
    lat = np.array([40.5])
    e, n = proj.transform(lon, lat, 4326, UTM18N)
    # UTM south false northing differs by exactly 10,000,000 m
    e_s, n_s = proj.transform(lon, lat, 4326, 32718)
    assert abs(e[0] - e_s[0]) < 1e-9 and abs((n_s[0] - n[0]) - 10000000.0) < 1e-6
    # UTM -> 3857 chains through lonlat and matches the direct projection
    from geotrellis_server_spark.grids.layout import lonlat_to_mercator

    mx, my = proj.transform(e, n, UTM18N, 3857)
    ex, ey = lonlat_to_mercator(lon, lat)
    assert abs(mx[0] - ex[0]) < 1e-6 and abs(my[0] - ey[0]) < 1e-6


def test_reproject_extent_densifies():
    # a wide 4326 extent at high latitude: the top edge's max mercator y
    # is at the edge CENTER for a curved edge in UTM — envelope must
    # cover every densified point
    ext = (-78.0, 35.0, -72.0, 45.0)
    env = proj.reproject_extent(ext, 4326, UTM18N)
    lons = np.linspace(-78.0, -72.0, 200)
    for lat_edge in (35.0, 45.0):
        e, n = proj.transform(lons, np.full(200, lat_edge), 4326, UTM18N)
        assert (e >= env[0] - 1e-6).all() and (e <= env[2] + 1e-6).all()
        assert (n >= env[1] - 1e-6).all() and (n <= env[3] + 1e-6).all()


def test_warp_block_recovers_coordinate_field():
    # source raster value = lon of the cell center (4326) → after warp to
    # UTM, each target pixel's value must equal the lon of ITS center's
    # inverse transform (bilinear on a linear field is exact in interior)
    h = w = 32
    ext = (-78.0, 36.0, -72.0, 44.0)
    lon_centers = ext[0] + (np.arange(w) + 0.5) * (ext[2] - ext[0]) / w
    a = np.tile(lon_centers, (h, 1))
    dst_ext = proj.reproject_extent(ext, 4326, UTM18N)
    out = proj.warp_block(a, ext, 4326, dst_ext, UTM18N, 40, 40, "bilinear")
    cx = dst_ext[0] + (np.arange(40) + 0.5) * (dst_ext[2] - dst_ext[0]) / 40
    cy = dst_ext[3] - (np.arange(40) + 0.5) * (dst_ext[3] - dst_ext[1]) / 40
    CX, CY = np.meshgrid(cx, cy)
    exp_lon, _ = proj.transform(CX.ravel(), CY.ravel(), UTM18N, 4326)
    exp = exp_lon.reshape(40, 40)
    ok = ~np.isnan(out)
    assert ok.sum() > 600  # most of the target covers the source
    # interior only: edge pixels clamp-extend the source (half-pixel error
    # by design, same as GDAL edge behavior)
    interior = ok & (exp >= lon_centers[0]) & (exp <= lon_centers[-1])
    assert interior.sum() > 500
    assert np.abs(out[interior] - exp[interior]).max() < 1e-9  # linear field → exact


def test_reproject_tiles_dataframe(spark):
    from geotrellis_server_spark.operators.reproject import reproject_tiles
    from geotrellis_server_spark.sources import synth

    h = w = 16
    ext = (-78.0, 36.0, -72.0, 44.0)
    lat_centers = ext[3] - (np.arange(h) + 0.5) * (ext[3] - ext[1]) / h
    cells = np.tile(lat_centers[:, None], (1, w)).ravel()
    rows = [("src", 0, 0, 0, 0, w, h, ext[0], ext[1], ext[2], ext[3],
             "float64", float("nan"), [float(v) for v in cells])]
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    out = reproject_tiles(tiles, 4326, UTM18N).collect()[0]
    assert out.width == w and out.height == h
    env = proj.reproject_extent(ext, 4326, UTM18N)
    assert np.allclose([out.xmin, out.ymin, out.xmax, out.ymax], env)
    got = np.array([np.nan if v is None else v for v in out.cells]).reshape(h, w)
    # spot-check one interior pixel against the inverse transform
    i, j = 8, 8
    cx = env[0] + (j + 0.5) * (env[2] - env[0]) / w
    cy = env[3] - (i + 0.5) * (env[3] - env[1]) / h
    _, exp_lat = proj.transform(np.array([cx]), np.array([cy]), UTM18N, 4326)
    assert abs(got[i, j] - exp_lat[0]) < 0.05  # 16px grid → coarse bilinear


def test_engine_getmap_in_utm(spark):
    # full-service path: rasterize a lon-valued layer on the 3857 pyramid,
    # request a UTM-18N window, verify each output pixel's value equals
    # the lon of its own center (inverse-transformed) — proving extent
    # back-projection, pyramid pruning, and the final warp compose.
    import pyspark.sql.functions as F

    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import (
        ZoomedLayoutScheme, mercator_to_lonlat)
    from geotrellis_server_spark.sources import synth

    z, ts = 4, 32
    scheme = ZoomedLayoutScheme(ts)
    lay = scheme.layout(z)
    rows = []
    # build a z4 patch around the north-east US whose cell value = lon of
    # the pixel center
    for tx in range(4, 6):
        for ty in range(5, 7):
            e = lay.extent_for(tx, ty)
            cells = []
            for r in range(ts):
                my = e.ymax - (r + 0.5) * (e.ymax - e.ymin) / ts
                for c in range(ts):
                    mx = e.xmin + (c + 0.5) * (e.xmax - e.xmin) / ts
                    lon, _ = mercator_to_lonlat(np.array([mx]), np.array([my]))
                    cells.append(float(lon[0]))
            rows.append(("lonf", z, tx, ty, 0, ts, ts, e.xmin, e.ymin, e.xmax,
                         e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"lonf": Layer("lonf", tiles)})

    utm_ext = (400000.0, 4300000.0, 700000.0, 4600000.0)  # UTM 18N box
    arr, ext = eng.get_extent_reprojected("lonf", utm_ext, UTM18N, 64, 64)
    assert arr.shape == (64, 64)
    cx = ext[0] + (np.arange(64) + 0.5) * (ext[2] - ext[0]) / 64
    cy = ext[3] - (np.arange(64) + 0.5) * (ext[3] - ext[1]) / 64
    CX, CY = np.meshgrid(cx, cy)
    exp_lon, _ = proj.transform(CX.ravel(), CY.ravel(), UTM18N, 4326)
    exp = exp_lon.reshape(64, 64)
    ok = ~np.isnan(arr)
    assert ok.mean() > 0.5  # most of the window is covered by the patch
    # bilinear over a (nearly) linear-in-mercator-x field: small tolerance
    assert np.abs(arr[ok] - exp[ok]).max() < 0.02


# --- LAEA (EPSG:3035) + polar stereographic (3413/3031/3032) — r3 ----------


def test_laea_epsg_worked_example():
    # EPSG Guidance 7-2, method 9820 (ETRS89 / LAEA Europe): 50N 5E ->
    # E 3962799.45, N 2999718.85
    p = proj.CRS_REGISTRY[3035][1]
    x, y = proj.laea_forward(5.0, 50.0, p)
    assert abs(float(x) - 3962799.45) < 0.01
    assert abs(float(y) - 2999718.85) < 0.01
    lon, lat = proj.laea_inverse(x, y, p)
    assert abs(float(lon) - 5.0) < 1e-9 and abs(float(lat) - 50.0) < 1e-9


def test_polar_stereographic_epsg_worked_example():
    # EPSG Guidance 7-2, method 9829 variant B (WGS84 / Australian
    # Antarctic Polar Stereographic): 75S 120E -> E 7255380.79, N 7053389.56
    p = proj.CRS_REGISTRY[3032][1]
    x, y = proj.ps_forward(120.0, -75.0, p)
    assert abs(float(x) - 7255380.79) < 0.01
    assert abs(float(y) - 7053389.56) < 0.01
    lon, lat = proj.ps_inverse(x, y, p)
    assert abs(float(lon) - 120.0) < 1e-9 and abs(float(lat) + 75.0) < 1e-9


def test_laea_preserves_area_scale():
    # equal-area property: a small geodesic quad keeps its area under LAEA
    # (relative error < 1e-6 far from the projection edge)
    p = proj.CRS_REGISTRY[3035][1]
    lon, lat, d = 14.0, 47.0, 0.01
    corners = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
    xy = [proj.laea_forward(lo, la, p) for lo, la in corners]
    area = 0.0
    for i in range(4):
        x1, y1 = xy[i]; x2, y2 = xy[(i + 1) % 4]
        area += float(x1 * y2 - x2 * y1)
    area = abs(area) / 2.0
    # ellipsoidal authalic area of the quad
    e, e2 = float(np.sqrt(p["e2"])), p["e2"]
    import math
    def q(s): return (1-e2)*(s/(1-e2*s*s) - (1/(2*e))*math.log((1-e*s)/(1+e*s)))
    qp = q(1.0)
    rq2 = p["a"]**2 * qp / 2.0
    s1, s2 = math.sin(math.radians(lat)), math.sin(math.radians(lat + d))
    exact = rq2 * (q(s2) - q(s1)) / qp * math.radians(d)
    assert abs(area - exact) / exact < 1e-6


@pytest.mark.parametrize("epsg,lon_rng,lat_rng", [
    (3035, (-10.0, 40.0), (35.0, 70.0)),
    (3413, (-180.0, 180.0), (60.0, 89.9)),
    (3031, (-180.0, 180.0), (-89.9, -60.0)),
])
def test_registry_crs_roundtrip(epsg, lon_rng, lat_rng):
    rng = np.random.default_rng(11)
    lons = rng.uniform(*lon_rng, 500)
    lats = rng.uniform(*lat_rng, 500)
    x, y = proj.transform(lons, lats, 4326, epsg)
    lo, la = proj.transform(x, y, epsg, 4326)
    dl = (lo - lons + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_engine_getmap_in_epsg3035(spark):
    # the round-2 verdict's #1 missing item: a GetMap in EPSG:3035 must
    # work end-to-end (extent back-projection, pyramid eval, warp)
    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import (
        ZoomedLayoutScheme, mercator_to_lonlat)
    from geotrellis_server_spark.sources import synth

    z, ts = 4, 32
    scheme = ZoomedLayoutScheme(ts)
    lay = scheme.layout(z)
    rows = []
    # central-Europe z4 patch, cell value = lon of the pixel center
    for tx in range(8, 10):
        for ty in range(4, 6):
            e = lay.extent_for(tx, ty)
            cells = []
            for r in range(ts):
                my = e.ymax - (r + 0.5) * (e.ymax - e.ymin) / ts
                for c in range(ts):
                    mx = e.xmin + (c + 0.5) * (e.xmax - e.xmin) / ts
                    lon, _ = mercator_to_lonlat(np.array([mx]), np.array([my]))
                    cells.append(float(lon[0]))
            rows.append(("lonf", z, tx, ty, 0, ts, ts, e.xmin, e.ymin, e.xmax,
                         e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"lonf": Layer("lonf", tiles)})

    # a LAEA box around central Europe (meters in EPSG:3035)
    laea_ext = (4000000.0, 2600000.0, 4600000.0, 3200000.0)
    arr, ext = eng.get_extent_reprojected("lonf", laea_ext, 3035, 64, 64)
    assert arr.shape == (64, 64)
    cx = ext[0] + (np.arange(64) + 0.5) * (ext[2] - ext[0]) / 64
    cy = ext[3] - (np.arange(64) + 0.5) * (ext[3] - ext[1]) / 64
    CX, CY = np.meshgrid(cx, cy)
    exp_lon, _ = proj.transform(CX.ravel(), CY.ravel(), 3035, 4326)
    exp = exp_lon.reshape(64, 64)
    ok = ~np.isnan(arr)
    assert ok.mean() > 0.5
    assert np.abs(arr[ok] - exp[ok]).max() < 0.02


def test_lcc_epsg_worked_example():
    # EPSG Guidance 7-2, method 9802 (NAD27 / Texas South Central, Clarke
    # 1866, US survey feet): 28d30'N 96dW -> E 2963503.91, N 254759.80
    p = {"a": 20925832.16, "e2": 0.00676866, "lat1": 28 + 23 / 60,
         "lat2": 30 + 17 / 60, "lat_f": 27 + 50 / 60, "lon0": -99.0,
         "fe": 2000000.0, "fn": 0.0}
    x, y = proj.lcc_forward(-96.0, 28.5, p)
    assert abs(float(x) - 2963503.91) < 0.01
    assert abs(float(y) - 254759.80) < 0.01
    lon, lat = proj.lcc_inverse(x, y, p)
    assert abs(float(lon) + 96.0) < 1e-9 and abs(float(lat) - 28.5) < 1e-9


def test_lambert93_roundtrip_and_conformal_scale():
    rng = np.random.default_rng(5)
    lons = rng.uniform(-4.5, 8.0, 300)
    lats = rng.uniform(41.5, 51.0, 300)
    x, y = proj.transform(lons, lats, 4326, 2154)
    lo, la = proj.transform(x, y, 2154, 4326)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    # conformality: at a standard parallel the scale factor is 1 (check
    # east-west: 1 arcsec of lon maps to its true parallel-circle length)
    e2 = proj.E2_GRS80
    for lat0 in (44.0, 49.0):
        d = 1.0 / 3600.0
        (x1, y1) = proj.transform(3.0, lat0, 4326, 2154)
        (x2, y2) = proj.transform(3.0 + d, lat0, 4326, 2154)
        phi = np.radians(lat0)
        nu = proj.A_GRS80 / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        true_len = nu * np.cos(phi) * np.radians(d)
        got_len = float(np.hypot(x2 - x1, y2 - y1))
        assert abs(got_len - true_len) / true_len < 1e-7


def test_generic_tm_british_national_grid():
    # EPSG Guidance 7-2, method 9807 (OSGB36 / British National Grid,
    # Airy 1830): 50d30'N 00d30'E -> E 577274.99, N 69740.50. The guide's
    # coordinates are OSGB36 GEOGRAPHIC, so this exercises the
    # projection-only path (transform() from 4326 now also applies the
    # OSGB36<->WGS84 Helmert datum shift and would land ~100 m away).
    x, y = proj.project_geodetic(0.5, 50.5, 27700)
    assert abs(float(x) - 577274.99) < 0.015
    assert abs(float(y) - 69740.50) < 0.015
    lon, lat = proj.inverse_geodetic(x, y, 27700)
    assert abs(float(lon) - 0.5) < 1e-9 and abs(float(lat) - 50.5) < 1e-9
    # datum-aware roundtrip sweep over Great Britain. The Helmert inverse
    # is an exact matrix inverse, but a 2D datum transform drops the
    # ~50 m ellipsoidal-height offset between the datums, which leaks
    # ~2 mm laterally (normal directions of the two ellipsoids differ by
    # ~1e-5 rad) — so mm-level, not nm-level, roundtrip
    rng = np.random.default_rng(7)
    lons = rng.uniform(-7.5, 2.0, 300)
    lats = rng.uniform(50.0, 60.8, 300)
    xx, yy = proj.transform(lons, lats, 4326, 27700)
    lo, la = proj.transform(xx, yy, 27700, 4326)
    assert np.abs(lo - lons).max() < 5e-8
    assert np.abs(la - lats).max() < 5e-8


def test_geocentric_epsg_worked_example():
    # EPSG Guidance 7-2 §2.2.1 worked example (WGS 84): lat 53d48'33.82"N,
    # lon 2d07'46.38"E, h 73.0 m -> X 3771793.97, Y 140253.34, Z 5124304.35
    lat = 53.0 + 48.0 / 60.0 + 33.82 / 3600.0
    lon = 2.0 + 7.0 / 60.0 + 46.38 / 3600.0
    x, y, z = proj.geodetic_to_geocentric(lon, lat, proj.A_WGS84, proj.E2,
                                          h=73.0)
    assert abs(float(x) - 3771793.97) < 0.02
    assert abs(float(y) - 140253.34) < 0.02
    assert abs(float(z) - 5124304.35) < 0.02
    # inverse recovers the geodetic coordinates (height discarded, so
    # feed the h=0 cartesian back)
    x0, y0, z0 = proj.geodetic_to_geocentric(lon, lat, proj.A_WGS84, proj.E2)
    lo, la = proj.geocentric_to_geodetic(x0, y0, z0, proj.A_WGS84, proj.E2)
    assert abs(float(lo) - lon) < 1e-11 and abs(float(la) - lat) < 1e-11


def test_osgb36_datum_shift():
    # Independent physical check: OSGB36 longitude is DEFINED by the Airy
    # transit circle at Greenwich; in WGS84 that meridian sits ~5.3" W
    # (the famous ~102 m GPS offset at the Observatory). Transforming the
    # transit circle's WGS84 position into OSGB36 geographic must land
    # within ~10 m of longitude zero.
    e, n = proj.transform(-0.0014965, 51.4779356, 4326, 27700)
    lon_osgb, lat_osgb = proj.inverse_geodetic(e, n, 27700)
    assert abs(float(lon_osgb)) < 0.00015  # ~10 m at 51.5N
    # shift magnitude over GB: treating the same lat/lon as WGS84 vs
    # OSGB36 must differ by the published ~90-130 m
    for lon, lat in [(-0.1, 51.5), (-3.2, 55.95), (-4.25, 52.4)]:
        x_datum, y_datum = proj.transform(lon, lat, 4326, 27700)
        x_raw, y_raw = proj.project_geodetic(lon, lat, 27700)
        d = float(np.hypot(x_datum - x_raw, y_datum - y_raw))
        assert 80.0 < d < 140.0, d
    # Helmert inverse is exact (matrix inverse, not the sign-flip
    # approximation): geocentric roundtrip at machine precision
    t7 = proj.CRS_REGISTRY[27700][1]["towgs84"]
    gx, gy, gz = proj.helmert_apply(3980000.0, -100000.0, 4970000.0, t7)
    bx, by, bz = proj.helmert_apply(gx, gy, gz, t7, inverse=True)
    assert abs(float(bx) - 3980000.0) < 1e-6
    assert abs(float(by) + 100000.0) < 1e-6
    assert abs(float(bz) - 4970000.0) < 1e-6


def test_generic_tm_agrees_with_utm_path():
    # EPSG:25832 (generic-TM registry entry, GRS80) vs EPSG:32632 (the
    # UTM-constant Karney path, WGS84): same projection definition,
    # ellipsoids differ at the 0.1 mm level
    x1, y1 = proj.transform(10.0, 52.0, 4326, 25832)
    x2, y2 = proj.transform(10.0, 52.0, 4326, 32632)
    assert abs(float(x1 - x2)) < 1e-3
    assert abs(float(y1 - y2)) < 1e-3


# --- Albers equal-area conic (5070/3577) + equidistant cylindrical (4087) ---


def test_aea_snyder_worked_example():
    # Snyder 1987 §14 numerical example (Clarke 1866, NAD27 Albers):
    # lat1 29.5N lat2 45.5N lat0 23N lon0 96W; 35N 75W ->
    # x = 1,885,472.7 m, y = 1,535,925.0 m (Snyder p. 292)
    p = {"a": 6378206.4, "e2": 0.00676866, "lat1": 29.5, "lat2": 45.5,
         "lat0": 23.0, "lon0": -96.0, "fe": 0.0, "fn": 0.0}
    x, y = proj.aea_forward(-75.0, 35.0, p)
    assert abs(float(x) - 1885472.7) < 0.05
    assert abs(float(y) - 1535925.0) < 0.05
    lon, lat = proj.aea_inverse(x, y, p)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9


def test_aea_conus_origin_and_area_scale():
    p = proj.CRS_REGISTRY[5070][1]
    x, y = proj.aea_forward(-96.0, 23.0, p)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    # equal-area property at a CONUS point (same audit as the LAEA test)
    lon, lat, d = -100.0, 40.0, 0.01
    corners = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
    xy = [proj.aea_forward(lo, la, p) for lo, la in corners]
    area = 0.0
    for i in range(4):
        x1, y1 = xy[i]; x2, y2 = xy[(i + 1) % 4]
        area += float(x1 * y2 - x2 * y1)
    area = abs(area) / 2.0
    e, e2 = float(np.sqrt(p["e2"])), p["e2"]
    import math
    def q(s): return (1-e2)*(s/(1-e2*s*s) - (1/(2*e))*math.log((1-e*s)/(1+e*s)))
    qp = q(1.0)
    rq2 = p["a"]**2 * qp / 2.0
    s1, s2 = math.sin(math.radians(lat)), math.sin(math.radians(lat + d))
    exact = rq2 * (q(s2) - q(s1)) / qp * math.radians(d)
    assert abs(area - exact) / exact < 1e-6


def test_aea_unit_scale_on_standard_parallels():
    # k along a standard parallel = n*rho/(a*m) = 1 by construction
    p = proj.CRS_REGISTRY[5070][1]
    for lat in (29.5, 45.5):
        d = 1e-5
        (x1, y1), (x2, y2) = (proj.aea_forward(-96.0, lat, p),
                              proj.aea_forward(-96.0 + d, lat, p))
        ground = np.hypot(float(x2 - x1), float(y2 - y1))
        e2 = p["e2"]
        s = np.sin(np.radians(lat))
        nu_cos = p["a"] / np.sqrt(1 - e2 * s * s) * np.cos(np.radians(lat))
        assert abs(ground / (nu_cos * np.radians(d)) - 1.0) < 1e-6


def test_eqc_matches_meridian_arc():
    # EPSG:4087 (lat1 = 0): x = a*lam exactly; y = ellipsoidal meridian
    # arc — must agree with the independently-anchored Krüger series
    lats = np.array([-80.0, -45.0, 0.0, 30.0, 45.0, 89.0])
    x, y = proj.transform(np.full_like(lats, 90.0), lats, 4326, 4087)
    np.testing.assert_allclose(x, proj.A_WGS84 * np.radians(90.0), rtol=1e-12)
    np.testing.assert_allclose(y, proj.meridian_arc(lats), atol=1e-6)


@pytest.mark.parametrize("epsg,lon_rng,lat_rng", [
    (5070, (-125.0, -66.0), (24.0, 49.0)),
    (3577, (112.0, 154.0), (-44.0, -10.0)),
    (4087, (-179.0, 179.0), (-85.0, 85.0)),
])
def test_new_registry_crs_roundtrip(epsg, lon_rng, lat_rng):
    rng = np.random.default_rng(12)
    lons = rng.uniform(*lon_rng, 500)
    lats = rng.uniform(*lat_rng, 500)
    x, y = proj.transform(lons, lats, 4326, epsg)
    lo, la = proj.transform(x, y, epsg, 4326)
    dl = (lo - lons + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_engine_getmap_in_epsg5070(spark):
    # GetMap in the new Albers CONUS CRS: same end-to-end path as the
    # EPSG:3035 test (extent back-projection, pyramid eval, warp)
    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.grids.layout import (
        ZoomedLayoutScheme, mercator_to_lonlat)
    from geotrellis_server_spark.sources import synth

    z, ts = 4, 32
    scheme = ZoomedLayoutScheme(ts)
    lay = scheme.layout(z)
    rows = []
    # CONUS z4 patch (tx 2..4, ty 5..6), cell value = lon of pixel center
    for tx in range(2, 5):
        for ty in range(5, 7):
            e = lay.extent_for(tx, ty)
            cells = []
            for r in range(ts):
                my = e.ymax - (r + 0.5) * (e.ymax - e.ymin) / ts
                for c in range(ts):
                    mx = e.xmin + (c + 0.5) * (e.xmax - e.xmin) / ts
                    lon, _ = mercator_to_lonlat(np.array([mx]), np.array([my]))
                    cells.append(float(lon[0]))
            rows.append(("lonf", z, tx, ty, 0, ts, ts, e.xmin, e.ymin, e.xmax,
                         e.ymax, "float64", float("nan"), cells))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    eng = Engine(spark, {"lonf": Layer("lonf", tiles)})

    # central-US box in EPSG:5070 meters
    aea_ext = (-500000.0, 1500000.0, 500000.0, 2500000.0)
    arr, ext = eng.get_extent_reprojected("lonf", aea_ext, 5070, 48, 48)
    assert arr.shape == (48, 48)
    cx = ext[0] + (np.arange(48) + 0.5) * (ext[2] - ext[0]) / 48
    cy = ext[3] - (np.arange(48) + 0.5) * (ext[3] - ext[1]) / 48
    CX, CY = np.meshgrid(cx, cy)
    exp_lon, _ = proj.transform(CX.ravel(), CY.ravel(), 5070, 4326)
    exp = exp_lon.reshape(48, 48)
    ok = ~np.isnan(arr)
    assert ok.mean() > 0.5
    assert np.abs(arr[ok] - exp[ok]).max() < 0.02


def test_laea_polar_roundtrip_and_area():
    # EPSG:3573/3574 (north-pole LAEA): roundtrip + equal-area audit
    rng = np.random.default_rng(17)
    lons = rng.uniform(-180.0, 180.0, 400)
    # include EXTREME near-pole latitudes: the old Newton iteration
    # diverged past ~89.9 deg (hundreds of metres); the series must hold
    lats = np.concatenate([rng.uniform(45.0, 89.5, 396),
                           [89.9, 89.99, 89.999, 89.9999]])
    near_pole = lats > 89.9
    for epsg in (3573, 3574):
        x, y = proj.transform(lons, lats, 4326, epsg)
        lo, la = proj.transform(x, y, epsg, 4326)
        dl = (lo - lons + 180.0) % 360.0 - 180.0
        assert np.abs(dl).max() < 1e-9
        err = np.abs(la - lats)
        assert err[~near_pole].max() < 1e-9
        # inside 0.1 deg of the pole: series-only zone, ~1e-8 deg (~1 mm)
        assert err[near_pole].max() < 1e-7
    # pole maps to origin; due-south of lon0 gives +y... (north: -rho*cos)
    p = proj.CRS_REGISTRY[3573][1]
    x0, y0 = proj.laea_polar_forward(123.0, 90.0, p)
    assert abs(float(x0)) < 1e-6 and abs(float(y0)) < 1e-6
    # equal-area property at 75N (same audit as LAEA/AEA)
    import math
    lon, lat, d = -100.0, 75.0, 0.01
    corners = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
    xy = [proj.laea_polar_forward(lo_, la_, p) for lo_, la_ in corners]
    area = 0.0
    for i in range(4):
        x1, y1 = xy[i]; x2, y2 = xy[(i + 1) % 4]
        area += float(x1 * y2 - x2 * y1)
    area = abs(area) / 2.0
    e, e2 = float(np.sqrt(p["e2"])), p["e2"]
    def q(sv): return (1-e2)*(sv/(1-e2*sv*sv) - (1/(2*e))*math.log((1-e*sv)/(1+e*sv)))
    qp = q(1.0)
    rq2 = p["a"]**2 * qp / 2.0
    s1, s2 = math.sin(math.radians(lat)), math.sin(math.radians(lat + d))
    exact = rq2 * (q(s2) - q(s1)) / qp * math.radians(d)
    assert abs(area - exact) / exact < 1e-6


def test_mollweide_known_points_and_roundtrip():
    p = proj.CRS_REGISTRY[54009][1]
    a = p["a"]
    # origin and poles (Snyder §31 closed values)
    x, y = proj.mollweide_forward(0.0, 0.0, p)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    x, y = proj.mollweide_forward(0.0, 90.0, p)
    assert abs(float(x)) < 1e-6
    assert abs(float(y) - np.sqrt(2.0) * a) < 1e-6
    # equator scale: x(λ=90°, φ=0) = √2·a·(π/2)·(2/π) = √2·a... via formula
    x, y = proj.mollweide_forward(90.0, 0.0, p)
    assert abs(float(x) - np.sqrt(2.0) * a) < 1e-6
    # roundtrip over the globe (skip the exact poles)
    rng = np.random.default_rng(29)
    lons = rng.uniform(-179.0, 179.0, 500)
    lats = rng.uniform(-89.5, 89.5, 500)
    x, y = proj.transform(lons, lats, 4326, 54009)
    lo, la = proj.transform(x, y, 54009, 4326)
    dl = (lo - lons + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-8
    assert np.abs(la - lats).max() < 1e-8


def test_mollweide_equal_area_on_sphere():
    # the defining property: a quad's projected area equals its area on
    # the sphere of radius a
    import math

    p = proj.CRS_REGISTRY[54009][1]
    lon, lat, d = 30.0, 40.0, 0.01
    corners = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
    xy = [proj.mollweide_forward(lo, la, p) for lo, la in corners]
    area = 0.0
    for i in range(4):
        x1, y1 = xy[i]; x2, y2 = xy[(i + 1) % 4]
        area += float(x1 * y2 - x2 * y1)
    area = abs(area) / 2.0
    exact = p["a"]**2 * math.radians(d) * (
        math.sin(math.radians(lat + d)) - math.sin(math.radians(lat))
    )
    assert abs(area - exact) / exact < 1e-6


@pytest.mark.parametrize("epsg,lon_rng,lat_rng", [
    (2193, (166.0, 179.0), (-47.5, -34.0)),   # NZTM2000
    (3978, (-140.0, -50.0), (41.0, 84.0)),    # Canada Atlas LCC
    (3995, (-180.0, 180.0), (60.0, 89.9)),    # Arctic PS
])
def test_registry_additions_roundtrip(epsg, lon_rng, lat_rng):
    rng = np.random.default_rng(31)
    lons = rng.uniform(*lon_rng, 300)
    lats = rng.uniform(*lat_rng, 300)
    x, y = proj.transform(lons, lats, 4326, epsg)
    lo, la = proj.transform(x, y, epsg, 4326)
    dl = (lo - lons + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_oblique_stereographic_epsg_worked_example():
    # EPSG Guidance 7-2 method 9809 worked example (Amersfoort / RD
    # New): native-datum 53N 6E -> 196105.283 E, 557057.739 N
    x, y = proj.project_geodetic(6.0, 53.0, 28992)
    assert abs(float(x) - 196105.283) < 1e-2
    assert abs(float(y) - 557057.739) < 1e-2
    lon, lat = proj.inverse_geodetic(x, y, 28992)
    assert abs(float(lon) - 6.0) < 1e-12 and abs(float(lat) - 53.0) < 1e-12


def test_rd_new_datum_aware_roundtrip_and_plausibility():
    # datum-aware: WGS84 Amsterdam lands inside the RD New bounds
    # (x 0-290km, y 290-630km) and round-trips through the Helmert
    x, y = proj.transform(4.9, 52.37, 4326, 28992)
    assert 0 < float(x) < 290000 and 290000 < float(y) < 630000
    lo, la = proj.transform(x, y, 28992, 4326)
    assert abs(float(lo) - 4.9) < 5e-8 and abs(float(la) - 52.37) < 5e-8
    rng = np.random.default_rng(7)
    lons = rng.uniform(3.3, 7.2, 200)
    lats = rng.uniform(50.7, 53.6, 200)
    xs, ys = proj.transform(lons, lats, 4326, 28992)
    lo2, la2 = proj.transform(xs, ys, 28992, 4326)
    assert np.abs(lo2 - lons).max() < 5e-8
    assert np.abs(la2 - lats).max() < 5e-8
