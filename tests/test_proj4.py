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
    with pytest.raises(NotImplementedError):
        proj4.crs_from_proj4("+proj=stere +lat_0=52 +lon_0=5 +k_0=0.9999")
    with pytest.raises(NotImplementedError):
        proj4.crs_from_proj4("+proj=omerc +lat_0=4 +lonc=102")
    with pytest.raises(NotImplementedError):
        proj4.crs_from_proj4("+proj=utm +zone=15 +units=us-ft")
    with pytest.raises(NotImplementedError):
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
