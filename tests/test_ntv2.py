"""NTv2 grid-shift (.gsb) — writer/reader round-trip, bilinear
exactness on a linear shift field, sign conventions, inverse
iteration, multi-subgrid priority, and proj4 +nadgrids integration."""

import numpy as np
import pytest

from geotrellis_server_spark.grids import ntv2
from geotrellis_server_spark.grids.ntv2 import SubGrid


def _linear_grid(name="LINEAR", s_lat=35 * 3600.0, e_long=70 * 3600.0,
                 nrows=5, ncols=7, inc=1800.0):
    """Shift field linear in (lat, lon): bilinear interpolation must
    reproduce it EXACTLY anywhere inside."""
    sg = SubGrid(name=name, s_lat=s_lat, n_lat=s_lat + (nrows - 1) * inc,
                 e_long=e_long, w_long=e_long + (ncols - 1) * inc,
                 lat_inc=inc, long_inc=inc,
                 shifts=np.zeros((nrows, ncols, 2)))
    for r in range(nrows):
        for c in range(ncols):
            sg.shifts[r, c, 0] = 1.0 + 0.25 * r + 0.5 * c   # dlat sec
            sg.shifts[r, c, 1] = -2.0 + 0.125 * r - 0.25 * c  # dlon-west sec
    return sg


def _expected(sg, lon_deg, lat_deg):
    fy = (lat_deg * 3600.0 - sg.s_lat) / sg.lat_inc
    fx = (-lon_deg * 3600.0 - sg.e_long) / sg.long_inc
    dlat = 1.0 + 0.25 * fy + 0.5 * fx
    dlon_w = -2.0 + 0.125 * fy - 0.25 * fx
    return dlat / 3600.0, -dlon_w / 3600.0


def test_write_parse_roundtrip(tmp_path):
    sg = _linear_grid()
    path = str(tmp_path / "t.gsb")
    ntv2.write_gsb(path, [sg])
    g = ntv2.parse_gsb(open(path, "rb").read())
    assert len(g.subgrids) == 1
    got = g.subgrids[0]
    assert got.nrows == 5 and got.ncols == 7
    assert np.allclose(got.shifts, sg.shifts, atol=1e-6)
    assert got.s_lat == sg.s_lat and got.w_long == sg.w_long


def test_non_seconds_gs_type_rejected(tmp_path):
    # shifts are interpreted as arcseconds; any other declared unit must
    # raise rather than silently mis-scale the grid
    sg = _linear_grid()
    path = str(tmp_path / "t.gsb")
    ntv2.write_gsb(path, [sg], gs_type="MINUTES")
    with pytest.raises(ValueError, match="GS_TYPE"):
        ntv2.parse_gsb(open(path, "rb").read())


def test_bilinear_exact_on_linear_field(tmp_path):
    sg = _linear_grid()
    g = ntv2.Ntv2Grid([sg])
    rng = np.random.default_rng(7)
    # interior points (east-positive degrees; grid lon is positive WEST
    # 70..73 → east lon -73..-70)
    lon = -rng.uniform(70.05, 72.95, 50)
    lat = rng.uniform(35.05, 36.95, 50)
    dlat, dlon_e = g.shift(lon, lat)
    want_dlat, want_dlon_e = _expected(sg, lon, lat)
    assert np.allclose(dlat, want_dlat, atol=1e-7 / 3600)
    assert np.allclose(dlon_e, want_dlon_e, atol=1e-7 / 3600)


def test_sign_conventions():
    """positive lon-shift (west) moves an east-positive longitude WEST
    (more negative); positive lat-shift moves north."""
    sg = _linear_grid()
    sg.shifts[..., 0] = 3600.0 * 0.001   # +1e-3 deg north
    sg.shifts[..., 1] = 3600.0 * 0.002   # 2e-3 deg WEST
    g = ntv2.Ntv2Grid([sg])
    lon2, lat2 = g.to_target(np.array([-71.0]), np.array([36.0]))
    assert lat2[0] == pytest.approx(36.001, abs=1e-9)
    assert lon2[0] == pytest.approx(-71.002, abs=1e-9)


def test_inverse_roundtrip():
    g = ntv2.Ntv2Grid([_linear_grid()])
    lon = np.array([-70.3, -71.5, -72.9])
    lat = np.array([35.2, 36.0, 36.9])
    lon_t, lat_t = g.to_target(lon, lat)
    lon_b, lat_b = g.from_target(lon_t, lat_t)
    assert np.allclose(lon_b, lon, atol=1e-12)
    assert np.allclose(lat_b, lat, atol=1e-12)


def test_outside_grid_passthrough():
    g = ntv2.Ntv2Grid([_linear_grid()])
    lon2, lat2 = g.to_target(np.array([10.0]), np.array([0.0]))
    assert lon2[0] == 10.0 and lat2[0] == 0.0


def test_child_subgrid_wins():
    parent = _linear_grid()
    child = _linear_grid(name="CHILD", s_lat=35.5 * 3600, e_long=70.5 * 3600,
                         nrows=3, ncols=3, inc=900.0)
    child.shifts[...] = 0.0
    child.shifts[..., 0] = 36.0  # 0.01 deg flat
    g = ntv2.Ntv2Grid([parent, child])
    # inside the child: flat child value, not the parent's linear field
    dlat, _ = g.shift(np.array([-70.6]), np.array([35.6]))
    assert dlat[0] == pytest.approx(0.01, abs=1e-12)
    # outside child, inside parent: parent field
    dlat_p, dlon_p = g.shift(np.array([-72.5]), np.array([36.8]))
    want = _expected(parent, np.array([-72.5]), np.array([36.8]))
    assert dlat_p[0] == pytest.approx(want[0][0], abs=1e-9)


def test_proj4_nadgrids_integration(tmp_path):
    """+nadgrids on a projected CRS: transform() composes inverse
    projection + grid shift; verified against the manual composition."""
    from geotrellis_server_spark.grids import proj
    from geotrellis_server_spark.grids.proj4 import crs_from_proj4

    sg = _linear_grid()
    path = str(tmp_path / "shift.gsb")
    ntv2.write_gsb(path, [sg])
    code = crs_from_proj4(
        f"+proj=tmerc +lat_0=0 +lon_0=-71 +k=0.9996 +x_0=500000 +y_0=0"
        f" +ellps=WGS84 +nadgrids={path}")
    lon = np.array([-70.4, -71.8])
    lat = np.array([35.3, 36.6])
    # engine: WGS84 lon/lat -> native datum (inverse grid) -> tmerc
    x, y = proj.transform(lon, lat, 4326, code)
    g = ntv2.load_gsb(path)
    lon_n, lat_n = g.from_target(lon, lat)
    kind, p = proj.CRS_REGISTRY[code]
    x_want, y_want = proj._kernel_fwd(lon_n, lat_n, kind, p)
    assert np.allclose(x, x_want, atol=1e-9)
    assert np.allclose(y, y_want, atol=1e-9)
    # and the full round trip comes home
    lon_b, lat_b = proj.transform(x, y, code, 4326)
    assert np.allclose(lon_b, lon, atol=1e-10)
    assert np.allclose(lat_b, lat, atol=1e-10)


def test_nadgrids_longlat_rejected(tmp_path):
    from geotrellis_server_spark.grids.proj4 import crs_from_proj4

    sg = _linear_grid()
    path = str(tmp_path / "s.gsb")
    ntv2.write_gsb(path, [sg])
    with pytest.raises(NotImplementedError):
        crs_from_proj4(f"+proj=longlat +ellps=WGS84 +nadgrids={path}")


def test_nadgrids_null_drops_datum_shift():
    from geotrellis_server_spark.grids import proj
    from geotrellis_server_spark.grids.proj4 import crs_from_proj4

    code = crs_from_proj4(
        "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=0 +y_0=0"
        " +datum=OSGB36 +nadgrids=@null")
    kind, p = proj.CRS_REGISTRY[code]
    assert "towgs84" not in p and "nadgrids" not in p
