"""NTv2 datum-shift grids (.gsb) — reader, writer, and the bilinear
shift kernel, implementing the public NTv2 format specification
(Natural Resources Canada, "National Transformation version 2";
the same format PROJ consumes via ``+nadgrids``).

The reference accepts any proj4 CRS through proj4j, including
grid-shifted datums; this module closes that tail for the pure-numpy
CRS stack (grids/proj.py): a registry entry carrying ``nadgrids``
shifts geographic coordinates through the grid instead of a Helmert
``towgs84`` (grid wins when both are present, matching PROJ).

Format notes (all public):
- 11 overview records then, per subgrid, 11 subgrid records; every
  record is 8 bytes of ASCII name + 8 bytes of value (int32+pad,
  float64, or char8).
- Longitudes are positive WEST; shifts are arcseconds with
  latitude-shift positive north and longitude-shift positive WEST.
- GS_COUNT nodes of 4×float32 (lat shift, lon shift, lat acc, lon acc)
  run row-major from (S_LAT, E_LONG): longitude varies fastest,
  increasing in positive-west steps of LONG_INC; rows step north.
- Forward (source datum → target datum, east-positive caller coords):
  lat' = lat + dlat/3600 ;  lon' = lon − dlon/3600.
- Inverse is the standard fixed-point iteration (shifts are tiny
  relative to grid spacing, so 4 iterations reach float64 noise).

Executor safety: ``load_gsb`` caches per path; registry snapshots ship
only the path string, and workers (sharing the local filesystem in
local[N]; a cluster ships grids alongside the job) load on first use.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_INT_NAMES = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
_DBL_NAMES = {
    "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T",
    "S_LAT", "N_LAT", "E_LONG", "W_LONG", "LAT_INC", "LONG_INC",
}


@dataclass
class SubGrid:
    name: str
    s_lat: float     # seconds
    n_lat: float
    e_long: float    # seconds, positive WEST
    w_long: float
    lat_inc: float
    long_inc: float
    # (nrows, ncols): [..., 0] = lat shift, [..., 1] = lon shift (sec, +west)
    shifts: np.ndarray

    @property
    def ncols(self) -> int:
        return int(round((self.w_long - self.e_long) / self.long_inc)) + 1

    @property
    def nrows(self) -> int:
        return int(round((self.n_lat - self.s_lat) / self.lat_inc)) + 1

    def contains(self, lon_w_sec, lat_sec) -> np.ndarray:
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (lon_w_sec >= self.e_long) & (lon_w_sec <= self.w_long))

    def interpolate(self, lon_w_sec, lat_sec):
        """Bilinear (dlat_sec, dlon_w_sec) at positive-west/second
        coords; caller guarantees containment (values are clamped to
        the edge cell, PROJ's border behavior)."""
        fx = (lon_w_sec - self.e_long) / self.long_inc
        fy = (lat_sec - self.s_lat) / self.lat_inc
        ix = np.clip(np.floor(fx).astype(np.int64), 0, self.ncols - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.nrows - 2)
        tx = np.clip(fx - ix, 0.0, 1.0)
        ty = np.clip(fy - iy, 0.0, 1.0)
        g = self.shifts
        out = (
            g[iy, ix] * ((1 - ty) * (1 - tx))[..., None]
            + g[iy, ix + 1] * ((1 - ty) * tx)[..., None]
            + g[iy + 1, ix] * (ty * (1 - tx))[..., None]
            + g[iy + 1, ix + 1] * (ty * tx)[..., None]
        )
        return out[..., 0], out[..., 1]


class Ntv2Grid:
    def __init__(self, subgrids: list[SubGrid]):
        if not subgrids:
            raise ValueError("NTv2 file carries no subgrids")
        self.subgrids = subgrids

    def _pick(self, lon_w_sec, lat_sec):
        """Finest covering subgrid per point: later (child) grids win,
        matching NTv2's parent-before-child file order."""
        idx = np.full(np.shape(lat_sec), -1, dtype=np.int64)
        for i, sg in enumerate(self.subgrids):
            idx = np.where(sg.contains(lon_w_sec, lat_sec), i, idx)
        return idx

    def shift(self, lon_deg, lat_deg):
        """(dlat_deg, dlon_east_deg) at east-positive degree coords;
        NaN outside every subgrid (caller decides the fallback)."""
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        lon_w = -lon * 3600.0
        lat_s = lat * 3600.0
        idx = self._pick(lon_w, lat_s)
        dlat = np.full(lon.shape, np.nan)
        dlon_w = np.full(lon.shape, np.nan)
        for i, sg in enumerate(self.subgrids):
            m = idx == i
            if np.any(m):
                a, b = sg.interpolate(lon_w[m], lat_s[m])
                dlat[m], dlon_w[m] = a, b
        return dlat / 3600.0, -dlon_w / 3600.0

    def to_target(self, lon_deg, lat_deg):
        """Source-datum → target-datum geographic coordinates; points
        outside the grid pass through unshifted (PROJ behavior)."""
        dlat, dlon_e = self.shift(lon_deg, lat_deg)
        dlat = np.where(np.isnan(dlat), 0.0, dlat)
        dlon_e = np.where(np.isnan(dlon_e), 0.0, dlon_e)
        return np.asarray(lon_deg) + dlon_e, np.asarray(lat_deg) + dlat

    def from_target(self, lon_deg, lat_deg, iterations: int = 4):
        """Target-datum → source-datum by fixed-point iteration."""
        lon_t = np.asarray(lon_deg, dtype=np.float64)
        lat_t = np.asarray(lat_deg, dtype=np.float64)
        lon_s, lat_s = lon_t.copy(), lat_t.copy()
        for _ in range(iterations):
            dlat, dlon_e = self.shift(lon_s, lat_s)
            dlat = np.where(np.isnan(dlat), 0.0, dlat)
            dlon_e = np.where(np.isnan(dlon_e), 0.0, dlon_e)
            lon_s = lon_t - dlon_e
            lat_s = lat_t - dlat
        return lon_s, lat_s


def _rec(name: str, value) -> bytes:
    n = name.ljust(8).encode("ascii")
    if name in _INT_NAMES:
        return n + struct.pack("<i4x", int(value))
    if name in _DBL_NAMES:
        return n + struct.pack("<d", float(value))
    return n + str(value).ljust(8)[:8].encode("ascii")


def write_gsb(path: str, subgrids: list[SubGrid],
              gs_type: str = "SECONDS") -> None:
    """Serialize subgrids to a spec-conformant little-endian .gsb."""
    out = [
        _rec("NUM_OREC", 11), _rec("NUM_SREC", 11),
        _rec("NUM_FILE", len(subgrids)), _rec("GS_TYPE", gs_type),
        _rec("VERSION", "NTv2.0"), _rec("SYSTEM_F", "SOURCE"),
        _rec("SYSTEM_T", "TARGET"),
        _rec("MAJOR_F", 6378137.0), _rec("MINOR_F", 6356752.314),
        _rec("MAJOR_T", 6378137.0), _rec("MINOR_T", 6356752.314),
    ]
    for k, sg in enumerate(subgrids):
        n = sg.nrows * sg.ncols
        out += [
            _rec("SUB_NAME", sg.name), _rec("PARENT", "NONE"),
            _rec("CREATED", "now"), _rec("UPDATED", "now"),
            _rec("S_LAT", sg.s_lat), _rec("N_LAT", sg.n_lat),
            _rec("E_LONG", sg.e_long), _rec("W_LONG", sg.w_long),
            _rec("LAT_INC", sg.lat_inc), _rec("LONG_INC", sg.long_inc),
            _rec("GS_COUNT", n),
        ]
        flat = np.zeros((n, 4), dtype="<f4")
        flat[:, 0] = sg.shifts[..., 0].reshape(-1)
        flat[:, 1] = sg.shifts[..., 1].reshape(-1)
        out.append(flat.tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(out))


def parse_gsb(data: bytes) -> Ntv2Grid:
    # endianness: NUM_OREC must equal 11
    le = struct.unpack_from("<i", data, 8)[0] == 11
    fmt_i, fmt_d, f4 = ("<i", "<d", "<f4") if le else (">i", ">d", ">f4")

    def rd(pos: int):
        name = data[pos:pos + 8].decode("ascii", "replace").strip()
        if name in _INT_NAMES:
            return name, struct.unpack_from(fmt_i, data, pos + 8)[0]
        if name in _DBL_NAMES:
            return name, struct.unpack_from(fmt_d, data, pos + 8)[0]
        return name, data[pos + 8:pos + 16].decode("ascii", "replace").strip()

    hdr = dict(rd(i * 16) for i in range(11))
    if hdr.get("NUM_OREC") != 11 or hdr.get("NUM_SREC") != 11:
        raise ValueError("not an NTv2 .gsb file (bad overview header)")
    # node shifts are interpreted as arcseconds below; a spec-conformant
    # file declaring another unit would be silently mis-scaled — reject.
    gs_type = str(hdr.get("GS_TYPE", "")).upper()
    if gs_type != "SECONDS":
        raise ValueError(
            f"NTv2: unsupported GS_TYPE {gs_type!r} (only SECONDS shift "
            "units are implemented)")
    n_file = int(hdr["NUM_FILE"])
    pos = 11 * 16
    grids: list[SubGrid] = []
    for _ in range(n_file):
        sh = dict(rd(pos + i * 16) for i in range(11))
        pos += 11 * 16
        count = int(sh["GS_COUNT"])
        nodes = np.frombuffer(data, dtype=f4, count=count * 4,
                              offset=pos).reshape(count, 2, 2)[:, 0, :]
        pos += count * 16
        sg = SubGrid(
            name=str(sh.get("SUB_NAME", "")),
            s_lat=sh["S_LAT"], n_lat=sh["N_LAT"],
            e_long=sh["E_LONG"], w_long=sh["W_LONG"],
            lat_inc=sh["LAT_INC"], long_inc=sh["LONG_INC"],
            shifts=np.zeros(0),
        )
        sg.shifts = nodes.astype(np.float64).reshape(sg.nrows, sg.ncols, 2)
        grids.append(sg)
    return Ntv2Grid(grids)


_CACHE: dict[str, Ntv2Grid] = {}


def load_gsb(path: str) -> Ntv2Grid:
    if path not in _CACHE:
        with open(path, "rb") as f:
            _CACHE[path] = parse_gsb(f.read())
    return _CACHE[path]
