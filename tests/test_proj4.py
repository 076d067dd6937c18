"""Arbitrary-CRS front-end (grids/proj4.py): proj4 strings / parameter
dicts mint usable registry codes. Reference parity: the reference
accepts any CRS per request (WmsParams/WcsParams proj4 parsing)."""

import numpy as np
import pytest

from geotrellis_server_spark.grids import proj, proj4


def test_utm_zone_via_proj4_matches_builtin():
    # EPSG:32754 (WGS84 / UTM 54S) is NOT in CRS_REGISTRY — it resolves
    # arithmetically. The proj4 front-end must mint an equivalent code.
    code = proj4.crs_from_proj4(
        "+proj=utm +zone=54 +south +datum=WGS84 +units=m +no_defs")
    lons = np.array([140.0, 141.5, 138.7])
    lats = np.array([-33.9, -37.8, -35.0])
    x1, y1 = proj.transform(lons, lats, 4326, code)
    x2, y2 = proj.transform(lons, lats, 4326, 32754)
    assert np.abs(x1 - x2).max() < 1e-9
    assert np.abs(y1 - y2).max() < 1e-9


def test_lcc_snyder_worked_example_via_params():
    # Snyder 1987 (USGS PP 1395) numerical example for the ellipsoidal
    # Lambert conformal conic, p. 296/304: Clarke 1866, standard
    # parallels 33N/45N, origin (23N, 96W); the point 35N 75W maps to
    # x = 1,894,410.9 m, y = 1,564,649.5 m. A state-plane-style zone
    # that was never registered anywhere in the engine.
    code = proj4.crs_from_params("lcc", {
        "a": 6378206.4, "e2": 0.00676866,  # Snyder's Clarke 1866 e^2
        "lat1": 33.0, "lat2": 45.0, "lat_f": 23.0, "lon0": -96.0,
        "fe": 0.0, "fn": 0.0})
    x, y = proj.transform(-75.0, 35.0, 4326, code)
    assert abs(float(x) - 1894410.9) < 0.5
    assert abs(float(y) - 1564649.5) < 0.5
    lon, lat = proj.transform(x, y, code, 4326)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9


def test_proj4_registration_idempotent_and_distinct():
    s = "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 " \
        "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m"
    c1 = proj4.crs_from_proj4(s)
    c2 = proj4.crs_from_proj4(s)
    assert c1 == c2 >= 910000
    c3 = proj4.crs_from_proj4(s.replace("+lon_0=3", "+lon_0=4"))
    assert c3 != c1
    # the minted Lambert-93 equals the hand-registered EPSG:2154
    x1, y1 = proj.transform(2.35, 48.85, 4326, c1)
    x2, y2 = proj.transform(2.35, 48.85, 4326, 2154)
    assert abs(float(x1 - x2)) < 1e-9 and abs(float(y1 - y2)) < 1e-9


def test_proj4_datum_shift_matches_bng():
    code = proj4.crs_from_proj4(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +datum=OSGB36")
    x1, y1 = proj.transform(-0.12, 51.5, 4326, code)
    x2, y2 = proj.transform(-0.12, 51.5, 4326, 27700)
    assert abs(float(x1 - x2)) < 1e-9 and abs(float(y1 - y2)) < 1e-9
    # explicit +towgs84 spells the same datum
    code2 = proj4.crs_from_proj4(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    x3, y3 = proj.transform(-0.12, 51.5, 4326, code2)
    assert abs(float(x3 - x1)) < 1e-6 and abs(float(y3 - y1)) < 1e-6


def test_proj4_polar_and_cylindrical_families():
    # polar stereographic south vs registry 3031
    c = proj4.crs_from_proj4(
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84")
    x1, y1 = proj.transform(45.0, -75.0, 4326, c)
    x2, y2 = proj.transform(45.0, -75.0, 4326, 3031)
    assert abs(float(x1 - x2)) < 1e-9 and abs(float(y1 - y2)) < 1e-9
    # polar LAEA vs registry 3573
    c = proj4.crs_from_proj4(
        "+proj=laea +lat_0=90 +lon_0=-100 +ellps=WGS84")
    x1, y1 = proj.transform(-110.0, 65.0, 4326, c)
    x2, y2 = proj.transform(-110.0, 65.0, 4326, 3573)
    assert abs(float(x1 - x2)) < 1e-9 and abs(float(y1 - y2)) < 1e-9
    # equidistant cylindrical vs registry 4087
    c = proj4.crs_from_proj4("+proj=eqc +lat_ts=0 +lon_0=0 +ellps=WGS84")
    x1, y1 = proj.transform(12.5, -33.0, 4326, c)
    x2, y2 = proj.transform(12.5, -33.0, 4326, 4087)
    assert abs(float(x1 - x2)) < 1e-9 and abs(float(y1 - y2)) < 1e-9
    # longlat / spherical mercator passthrough
    assert proj4.crs_from_proj4("+proj=longlat +datum=WGS84") == 4326
    assert proj4.crs_from_proj4(
        "+proj=merc +a=6378137 +b=6378137 +lon_0=0") == 3857


def test_proj4_rejections():
    # oblique/equatorial +proj=stere is SUPPORTED since round 5
    # (conformal-latitude kernel) — including the PROJ default lat_0=0
    assert proj4.crs_from_proj4(
        "+proj=stere +lat_0=52 +lon_0=5 +k_0=0.9999")
    assert proj4.crs_from_proj4("+proj=stere +lon_0=10 +ellps=WGS84")
    with pytest.raises(NotImplementedError):
        # two-point omerc (no +alpha) is the unsupported variant
        proj4.crs_from_proj4("+proj=omerc +lat_0=4 +lonc=102")
    with pytest.raises(NotImplementedError):
        # linear units outside PROJ's catalog reject (known ones work)
        proj4.crs_from_proj4("+proj=utm +zone=15 +units=smoot")
    with pytest.raises(FileNotFoundError):
        # +nadgrids is SUPPORTED since round 5 (grids/ntv2.py) and
        # fails fast when the grid file is absent
        proj4.crs_from_proj4("+proj=tmerc +lat_0=0 +lon_0=9 "
                             "+nadgrids=@BETA2007.gsb")
    with pytest.raises(ValueError):
        proj4.crs_from_proj4("+proj=lcc +lon_0=3")  # lat_1 required


def test_engine_describe_advertises_proj4():
    from geotrellis_server_spark.engine import _supported_epsg

    crs = _supported_epsg()
    assert any(str(c).startswith("proj4:") for c in crs)
    # dynamically minted codes stay out of the advertised list
    assert all(not (isinstance(c, int) and c >= 910000) for c in crs)


def test_lcc_1sp_jamaica_worked_example():
    # EPSG Guidance 7-2, method 9801 (Lambert conic conformal 1SP),
    # Jamaica 1969 national grid zone: Clarke 1866, lat_0 = lat_1 = 18N,
    # lon_0 = 77W, k_0 = 1, FE 250000, FN 150000. Point
    # 17d55'55.80"N 76d56'37.26"W -> E 255966.58, N 142493.51.
    # (Projection-only: the Jamaica 1969 datum shift is out of scope.)
    code = proj4.crs_from_proj4(
        "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1.0 "
        "+x_0=250000 +y_0=150000 +ellps=clrk66")
    lat = 17.0 + 55.0 / 60.0 + 55.80 / 3600.0
    lon = -(76.0 + 56.0 / 60.0 + 37.26 / 3600.0)
    x, y = proj.project_geodetic(lon, lat, code)
    assert abs(float(x) - 255966.58) < 0.02
    assert abs(float(y) - 142493.51) < 0.02
    lo, la = proj.inverse_geodetic(x, y, code)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9


def test_lcc_1sp_limit_and_k0_scaling():
    base = {"a": proj.A_GRS80, "e2": proj.E2_GRS80, "lat_f": 40.0,
            "lon0": -100.0, "fe": 0.0, "fn": 0.0}
    one_sp = proj4.crs_from_params("lcc", {**base, "lat1": 40.0,
                                           "lat2": 40.0})
    two_sp = proj4.crs_from_params("lcc", {**base, "lat1": 39.999,
                                           "lat2": 40.001})
    # 1SP = the 2SP limit as the parallels merge (sub-mm at eps=0.001 deg)
    x1, y1 = proj.transform(-96.5, 42.25, 4326, one_sp)
    x2, y2 = proj.transform(-96.5, 42.25, 4326, two_sp)
    assert abs(float(x1 - x2)) < 2e-3 and abs(float(y1 - y2)) < 2e-3
    # k0 scales offsets from the false origin EXACTLY (rho = a k0 F t^n)
    scaled = proj4.crs_from_params("lcc", {**base, "lat1": 40.0,
                                           "lat2": 40.0, "k0": 0.9995})
    x3, y3 = proj.transform(-96.5, 42.25, 4326, scaled)
    x0, y0 = proj.transform(-100.0, 40.0, 4326, one_sp)  # false origin
    assert abs(float(x3) - 0.9995 * float(x1)) < 1e-6
    assert abs(float(y3 - y0 * 0.9995) - 0.9995 * float(y1 - y0)) < 1e-6


def test_ups_worked_example_and_proj4():
    # EPSG Guidance 7-2, method 9810 variant A (scale at the pole):
    # WGS84 / UPS North (EPSG:32661), k_0 = 0.994, FE = FN = 2000000.
    # Point 73N 44E -> E 3320416.75, N 632668.43.
    x, y = proj.transform(44.0, 73.0, 4326, 32661)
    assert abs(float(x) - 3320416.75) < 0.02
    assert abs(float(y) - 632668.43) < 0.02
    lon, lat = proj.transform(x, y, 32661, 4326)
    assert abs(float(lon) - 44.0) < 1e-9 and abs(float(lat) - 73.0) < 1e-9
    # the proj4 spelling (no +lat_ts -> variant A) mints an equal CRS
    code = proj4.crs_from_proj4(
        "+proj=stere +lat_0=90 +k_0=0.994 +x_0=2000000 +y_0=2000000 "
        "+datum=WGS84")
    x2, y2 = proj.transform(44.0, 73.0, 4326, code)
    assert abs(float(x2 - x)) < 1e-9 and abs(float(y2 - y)) < 1e-9
    # south aspect roundtrips
    xs, ys = proj.transform(-63.0, -75.0, 4326, 32761)
    lo, la = proj.transform(xs, ys, 32761, 4326)
    assert abs(float(lo) + 63.0) < 1e-9 and abs(float(la) + 75.0) < 1e-9


def test_proj4_fuzz_roundtrip():
    """Property: any syntactically-valid supported proj4 definition
    mints a CRS whose forward/inverse round-trips interior points to
    1e-8 degrees (hypothesis-style deterministic sweep — fixed seed,
    many parameter combos)."""
    rng = np.random.default_rng(42)
    kinds = ["tmerc", "lcc", "laea", "aea", "stere", "eqc"]
    for trial in range(60):
        kind = kinds[trial % len(kinds)]
        lon0 = float(rng.uniform(-170, 170))
        lat0 = float(rng.uniform(-60, 60))
        fe = float(rng.choice([0.0, 100000.0, 500000.0]))
        fn = float(rng.choice([0.0, 100000.0]))
        ellps = ["WGS84", "GRS80", "intl", "krass"][trial % 4]
        if kind == "tmerc":
            s = (f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k_0=0.9996 "
                 f"+x_0={fe} +y_0={fn} +ellps={ellps}")
        elif kind == "lcc":
            l1, l2 = sorted(rng.uniform(15, 65, 2))
            if abs(l2 - l1) < 0.5:
                l2 = l1 + 0.5
            s = (f"+proj=lcc +lat_1={l1} +lat_2={l2} +lat_0={(l1+l2)/2} "
                 f"+lon_0={lon0} +x_0={fe} +y_0={fn} +ellps={ellps}")
        elif kind == "laea":
            s = (f"+proj=laea +lat_0={lat0} +lon_0={lon0} "
                 f"+x_0={fe} +y_0={fn} +ellps={ellps}")
        elif kind == "aea":
            l1, l2 = sorted(rng.uniform(-60, -10, 2))
            if abs(l2 - l1) < 0.5:
                l2 = l1 - 0.5
            s = (f"+proj=aea +lat_1={l1} +lat_2={l2} +lat_0={lat0} "
                 f"+lon_0={lon0} +x_0={fe} +y_0={fn} +ellps={ellps}")
        elif kind == "stere":
            pole = 90.0 if trial % 2 else -90.0
            s = (f"+proj=stere +lat_0={pole} +lat_ts={pole * 0.8} "
                 f"+lon_0={lon0} +x_0={fe} +y_0={fn} +ellps={ellps}")
        else:
            s = (f"+proj=eqc +lat_ts={abs(lat0) / 2} +lon_0={lon0} "
                 f"+x_0={fe} +y_0={fn} +ellps={ellps}")
        code = proj4.crs_from_proj4(s)
        # interior probe points near the projection origin
        if kind == "stere":
            pole = 90.0 if trial % 2 else -90.0
            lats = np.clip(pole * rng.uniform(0.75, 0.95, 5), -89.5, 89.5)
            lons = rng.uniform(-180, 180, 5)
        elif kind == "lcc":
            lats = rng.uniform(20, 60, 5)
            lons = lon0 + rng.uniform(-15, 15, 5)
        elif kind == "aea":
            lats = rng.uniform(-55, -15, 5)
            lons = lon0 + rng.uniform(-15, 15, 5)
        else:
            lats = np.clip(lat0 + rng.uniform(-10, 10, 5), -75, 75)
            lons = lon0 + rng.uniform(-6, 6, 5)
        x, y = proj.transform(lons, lats, 4326, code)
        lo, la = proj.transform(x, y, code, 4326)
        lo = (lo - lons + 180.0) % 360.0 - 180.0
        assert np.abs(lo).max() < 1e-8, (s, np.abs(lo).max())
        assert np.abs(la - lats).max() < 1e-8, (s, np.abs(la - lats).max())


def test_reproject_tiles_through_minted_crs(spark):
    """The warp operator's pandas UDF runs on executor worker processes
    that re-import proj fresh — reproject through a proj4-MINTED code
    proves the registry_snapshot closure replay end-to-end."""
    from geotrellis_server_spark.operators.reproject import reproject_tiles
    from geotrellis_server_spark.sources import synth

    code = proj4.crs_from_proj4(
        "+proj=lcc +lat_1=38 +lat_2=42 +lat_0=40 +lon_0=-75 "
        "+x_0=0 +y_0=0 +ellps=GRS80")
    h = w = 16
    ext = (-78.0, 36.0, -72.0, 44.0)
    lat_centers = ext[3] - (np.arange(h) + 0.5) * (ext[3] - ext[1]) / h
    cells = np.tile(lat_centers[:, None], (1, w)).ravel()
    rows = [("src", 0, 0, 0, 0, w, h, ext[0], ext[1], ext[2], ext[3],
             "float64", float("nan"), [float(v) for v in cells])]
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    out = reproject_tiles(tiles, 4326, code).collect()[0]
    env = proj.reproject_extent(ext, 4326, code)
    assert np.allclose([out.xmin, out.ymin, out.xmax, out.ymax], env)
    got = np.array([np.nan if v is None else v
                    for v in out.cells]).reshape(h, w)
    cx = env[0] + 8.5 * (env[2] - env[0]) / w
    cy = env[3] - 8.5 * (env[3] - env[1]) / h
    _, exp_lat = proj.transform(np.array([cx]), np.array([cy]), code, 4326)
    assert abs(got[8, 8] - exp_lat[0]) < 0.05
    # the distributed point projector over the same minted code
    pts = spark.range(50).selectExpr(
        "CAST(-78 + (id % 10) * 0.6 AS DOUBLE) AS lon",
        "CAST(36 + (id DIV 10) * 1.6 AS DOUBLE) AS lat")
    from geotrellis_server_spark.operators.tiling import project_to_epsg

    prj = project_to_epsg(pts.repartition(4), code).collect()
    lons = np.array([r.lon for r in prj]); lats = np.array([r.lat for r in prj])
    xs = np.array([r.x for r in prj]); ys = np.array([r.y for r in prj])
    ex, ey = proj.transform(lons, lats, 4326, code)
    assert np.abs(xs - ex).max() < 1e-9 and np.abs(ys - ey).max() < 1e-9


def test_engine_getmap_in_minted_crs(spark):
    """Full service surface in a proj4-minted CRS: GetMap
    (get_extent_reprojected) warps onto a request grid whose CRS exists
    nowhere in the static registry."""
    from geotrellis_server_spark.engine import Engine, Layer
    from geotrellis_server_spark.operators import tiling
    from geotrellis_server_spark.sources import synth

    code = proj4.crs_from_proj4(
        "+proj=aea +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=0 +ellps=GRS80")
    docs = synth.extract_geometry(synth.docs(spark, 2000))
    tiles = tiling.rasterize_count(docs, 3, tile_size=16)
    eng = Engine(spark, {"density": Layer("density", tiles)})
    # a mid-latitude window in the minted CRS
    x0, y0 = proj.transform(-10.0, 35.0, 4326, code)
    x1, y1 = proj.transform(10.0, 50.0, 4326, code)
    arr, ext = eng.get_extent_reprojected(
        "density", (float(x0), float(y0), float(x1), float(y1)), code,
        out_w=32, out_h=32)
    assert arr.shape == (32, 32)
    assert np.isfinite(arr).any()  # real densities landed in the window
    assert ext == (float(x0), float(y0), float(x1), float(y1))


def test_towgs84_explicit_zero_overrides_datum_default():
    # '+datum=OSGB36 +towgs84=0,0,0' = airy ellipsoid, NO datum shift
    # (the user explicitly zeroed the transform); it must differ from
    # the +datum default (which applies the OSGB36 Helmert) and agree
    # with the bare-ellipsoid spelling
    base = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
            "+x_0=400000 +y_0=-100000 ")
    zeroed = proj4.crs_from_proj4(base + "+datum=OSGB36 +towgs84=0,0,0")
    shifted = proj4.crs_from_proj4(base + "+datum=OSGB36")
    bare = proj4.crs_from_proj4(base + "+ellps=airy")
    xz, yz = proj.transform(-0.12, 51.5, 4326, zeroed)
    xs, ys = proj.transform(-0.12, 51.5, 4326, shifted)
    xb, yb = proj.transform(-0.12, 51.5, 4326, bare)
    assert abs(float(xz - xb)) < 1e-9 and abs(float(yz - yb)) < 1e-9
    assert abs(float(xz - xs)) > 10  # the Helmert shift is ~100 m here


def test_longlat_non_wgs84_ellipsoid_rejected():
    # +proj=longlat on bessel/airy is a NATIVE-datum geographic CRS,
    # not WGS84 lon/lat — mapping it to 4326 would hide ~100 m error
    for bad in ("+proj=longlat +ellps=bessel", "+proj=longlat +ellps=airy",
                "+proj=longlat +a=6377397.155 +rf=299.1528128"):
        with pytest.raises(NotImplementedError):
            proj4.crs_from_proj4(bad)
    # GRS80 is WGS84-equivalent (sub-mm flattening difference): allowed
    assert proj4.crs_from_proj4("+proj=longlat +ellps=GRS80") == 4326
    assert proj4.crs_from_proj4(
        "+proj=longlat +datum=WGS84 +towgs84=0,0,0") == 4326


def test_sterea_matches_rd_new_registry():
    code = proj4.crs_from_proj4(
        "+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 "
        "+k_0=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    x1, y1 = proj.project_geodetic(6.0, 53.0, code)
    x2, y2 = proj.project_geodetic(6.0, 53.0, 28992)
    assert abs(float(x1 - x2)) < 1e-4 and abs(float(y1 - y2)) < 1e-4
    # oblique +proj=stere mints the conformal-latitude kernel (round 5)
    # and is a DIFFERENT projection from sterea (same origin scale,
    # third-order divergence — see test_stere_oblique_*)
    assert proj4.crs_from_proj4(
        "+proj=stere +lat_0=52.15 +lon_0=5.38") != code


def test_units_and_to_meter_scaling():
    base = ("+proj=lcc +lat_1=34.0333333333333 +lat_2=35.4666666666667 "
            "+lat_0=33.5 +lon_0=-118 +x_0=2000000 +y_0=500000 +ellps=GRS80")
    m = proj4.crs_from_proj4(base)
    ft = proj4.crs_from_proj4(base + " +units=us-ft")
    xm, ym = proj.transform(-117.0, 34.5, 4326, m)
    xf, yf = proj.transform(-117.0, 34.5, 4326, ft)
    usft = 1200.0 / 3937.0
    assert abs(float(xm / xf) - usft) < 1e-12
    assert abs(float(ym / yf) - usft) < 1e-12
    # +to_meter spells the same unit, wins over +units, round-trips
    tm = proj4.crs_from_proj4(
        base + f" +to_meter={usft!r} +units=km")
    xt, yt = proj.transform(-117.0, 34.5, 4326, tm)
    assert abs(float(xt - xf)) < 1e-9
    lo, la = proj.transform(xt, yt, tm, 4326)
    assert abs(float(lo) + 117.0) < 1e-10 and abs(float(la) - 34.5) < 1e-10
    # unknown unit name rejects
    with pytest.raises(NotImplementedError):
        proj4.crs_from_proj4(base + " +units=parsec")


def test_stere_oblique_conformal_latitude_formulation():
    """PROJ-style oblique +proj=stere (Snyder §21 conformal-latitude
    formulation). No EPSG worked example exists for this variant (EPSG
    blesses only 9809/sterea for oblique), so the battery is:
    (a) origin maps to the false origin exactly, (b) agreement with the
    independently-derived sterea kernel to THIRD order near the origin
    (two conformal maps sharing k0 at the same origin), (c) machine-
    precision roundtrip, (d) numeric scale factor at the origin == k0."""
    import math

    import numpy as np

    from geotrellis_server_spark.grids import proj, proj4

    s = ("+lat_0=52.15 +lon_0=5.38 +k_0=0.9999079 +x_0=155000 "
         "+y_0=463000 +ellps=bessel")
    c_st = proj4.crs_from_proj4("+proj=stere " + s)
    c_sa = proj4.crs_from_proj4("+proj=sterea " + s)

    x, y = proj.transform(np.array([5.38]), np.array([52.15]), 4326, c_st)
    assert abs(x[0] - 155000.0) < 1e-6 and abs(y[0] - 463000.0) < 1e-6

    # third-order divergence: ~0.4 mm at 0.01 deg, ~2 cm at 0.1 deg
    for d, tol in [(0.01, 0.002), (0.1, 0.05)]:
        lon, lat = np.array([5.38 + d]), np.array([52.15 + d / 2])
        xa, ya = proj.transform(lon, lat, 4326, c_st)
        xb, yb = proj.transform(lon, lat, 4326, c_sa)
        assert abs(xa[0] - xb[0]) < tol and abs(ya[0] - yb[0]) < tol

    lons = np.array([-10.0, 5.38, 20.0, 5.0])
    lats = np.array([40.0, 52.15, 60.0, 45.0])
    xx, yy = proj.transform(lons, lats, 4326, c_st)
    lo, la = proj.transform(xx, yy, c_st, 4326)
    assert np.max(np.abs(lo - lons)) < 1e-9
    assert np.max(np.abs(la - lats)) < 1e-9

    eps = 1e-7
    y1 = proj.transform(np.array([5.38]), np.array([52.15 + eps]),
                        4326, c_st)[1][0]
    a, e2, phi = 6377397.155, 0.006674372230614, math.radians(52.15)
    m = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    k = (y1 - y[0]) / (math.radians(eps) * m)
    assert abs(k - 0.9999079) < 1e-4


def test_stere_equatorial_aspect():
    """lat_0=0 equatorial stereographic: symmetric about the equator,
    roundtrips, and scale at the tangent point is k0=1."""
    import numpy as np

    from geotrellis_server_spark.grids import proj, proj4

    c = proj4.crs_from_proj4("+proj=stere +lat_0=0 +lon_0=0 +ellps=WGS84")
    xn, yn = proj.transform(np.array([10.0]), np.array([20.0]), 4326, c)
    xs, ys = proj.transform(np.array([10.0]), np.array([-20.0]), 4326, c)
    assert abs(xn[0] - xs[0]) < 1e-6 and abs(yn[0] + ys[0]) < 1e-6
    lo, la = proj.transform(xn, yn, c, 4326)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 20.0) < 1e-9


def test_omerc_hotine_timbalai_worked_example():
    """Hotine oblique Mercator variant B (EPSG 9815): the EPSG
    Guidance 7-2 §1.3.6 Timbalai 1948 / RSO Borneo worked example —
    the from-scratch implementation agrees with the published E/N to
    2 mm (mutual confirmation of formulas and constants). Variant B's
    defining anchor: the projection CENTRE maps exactly to (FE, FN)."""
    import numpy as np

    from geotrellis_server_spark.grids import proj, proj4

    code = proj4.crs_from_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047 "
        "+gamma=53.13010236 +k_0=0.99984 +x_0=590476.87 "
        "+y_0=442857.65 +a=6377298.556 +rf=300.8017")
    # centre -> false grid coordinates (variant B anchor)
    x, y = proj.transform(np.array([115.0]), np.array([4.0]), 4326, code)
    assert abs(x[0] - 590476.87) < 1e-5 and abs(y[0] - 442857.65) < 1e-5
    # EPSG worked example point
    lon = 115 + 48 / 60 + 19.8196 / 3600
    lat = 5 + 23 / 60 + 14.1129 / 3600
    x, y = proj.transform(np.array([lon]), np.array([lat]), 4326, code)
    assert abs(x[0] - 679245.73) < 0.01 and abs(y[0] - 596562.78) < 0.01
    # roundtrip across the zone
    lons = np.array([114.0, 115.0, 116.5, 117.0])
    lats = np.array([3.0, 4.0, 5.5, 6.0])
    xx, yy = proj.transform(lons, lats, 4326, code)
    lo, la = proj.transform(xx, yy, code, 4326)
    assert np.max(np.abs(lo - lons)) < 1e-9
    assert np.max(np.abs(la - lats)) < 1e-9


def test_omerc_variant_a_offset_relationship():
    """+no_off (variant A): the centre sits u_c along the initial line
    from the natural origin, so E/N at the centre have ratio tan(gamma)
    and variant B == variant A minus that offset, rotated."""
    import math

    import numpy as np

    from geotrellis_server_spark.grids import proj, proj4

    base = ("+lat_0=4 +lonc=115 +alpha=53.31582047 +k_0=0.99984 "
            "+a=6377298.556 +rf=300.8017")
    ca = proj4.crs_from_proj4("+proj=omerc +no_off " + base)
    xa, ya = proj.transform(np.array([115.0]), np.array([4.0]), 4326, ca)
    assert abs(xa[0] / ya[0]
               - math.tan(math.radians(53.31582047))) < 1e-3
    lo, la = proj.transform(xa, ya, ca, 4326)
    assert abs(lo[0] - 115.0) < 1e-9 and abs(la[0] - 4.0) < 1e-9
