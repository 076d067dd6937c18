"""Arbitrary-CRS front-end: proj4 strings / parameter dicts -> registry.

The reference accepts ANY CRS on every request (proj4 strings via
GeoTrellis ``CRS``: ogc/src/main/scala/geotrellis/server/ogc/wms/
WmsParams.scala:90-103, wcs/WcsParams.scala:85-111). The engine's
projection kernels (grids/proj.py — EPSG methods 9807 tmerc, 9802 lcc,
9820/polar laea, 9822 aea, 9829 stere, 1028 eqc, Mollweide) are already
parameterized over arbitrary ellipsoids and origins; this module is the
missing front-end that maps a ``+proj=...`` string or an explicit
parameter dict onto them, so an unregistered CRS becomes DATA (a
registry entry minted at request time), not code.

``crs_from_proj4("+proj=lcc +lat_1=49 ... +ellps=GRS80")`` returns a
synthetic EPSG-like code usable with every ``proj.transform`` /
layout / reproject path; registration is idempotent (the same
definition always yields the same code). ``+towgs84`` datum shifts ride
the same Helmert hub as EPSG:27700.
"""

from __future__ import annotations

from . import proj

# Public ellipsoid table (proj's ellps registry values — Snyder App. A /
# EPSG). (a meters, 1/f); 1/f = 0 marks a sphere.
ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80ign": (6378249.2, 293.4660213),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "sphere": (6370997.0, 0.0),
}

# +datum= shorthand: ellipsoid + (optional) towgs84 to WGS84
DATUMS: dict[str, tuple[str, tuple | None]] = {
    "WGS84": ("WGS84", None),
    "NAD83": ("GRS80", None),  # NAD83~WGS84 at the metre level
    "OSGB36": ("airy", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
}

# synthetic code allocation for dynamically-registered CRSs
_CUSTOM_BASE = 910000
_custom_codes: dict[tuple, int] = {}


def _parse_tokens(proj4: str) -> dict[str, str | bool]:
    toks: dict[str, str | bool] = {}
    for raw in proj4.split():
        if not raw.startswith("+"):
            continue
        body = raw[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            toks[k] = v
        else:
            toks[body] = True
    return toks


def _ellipsoid_of(toks: dict) -> tuple[float, float, tuple | None]:
    """(a, f, towgs84|None) from +datum / +ellps / +a +b|+rf / +R."""
    towgs84 = None
    towgs84_present = "towgs84" in toks
    if towgs84_present:
        parts = [float(v) for v in str(toks["towgs84"]).split(",")]
        if len(parts) == 3:
            parts += [0.0, 0.0, 0.0, 0.0]
        if len(parts) != 7:
            raise ValueError(f"towgs84 needs 3 or 7 values: {toks['towgs84']}")
        if any(parts):  # all-zero shift = WGS84-equivalent identity
            towgs84 = tuple(parts)
    if "datum" in toks:
        name = str(toks["datum"])
        if name not in DATUMS:
            raise NotImplementedError(f"unknown +datum={name}")
        ellps, datum_shift = DATUMS[name]
        a, rf = ELLIPSOIDS[ellps]
        # an EXPLICIT +towgs84 (even all-zero) overrides the +datum
        # default shift — '+datum=OSGB36 +towgs84=0,0,0' means "no
        # transform", not "apply the OSGB36 Helmert anyway"
        return a, (1.0 / rf if rf else 0.0), (
            towgs84 if towgs84_present else datum_shift)
    if "a" in toks:
        a = float(toks["a"])
        if "b" in toks:
            b = float(toks["b"])
            f = (a - b) / a
        elif "rf" in toks:
            f = 1.0 / float(toks["rf"])
        else:
            f = 0.0  # sphere
        return a, f, towgs84
    if "R" in toks:
        return float(toks["R"]), 0.0, towgs84
    name = str(toks.get("ellps", "WGS84"))
    if name not in ELLIPSOIDS:
        raise NotImplementedError(f"unknown +ellps={name}")
    a, rf = ELLIPSOIDS[name]
    return a, (1.0 / rf if rf else 0.0), towgs84


# PROJ's standard linear-unit catalog (proj -lu), metres per unit
UNITS_TO_M = {
    "m": 1.0, "km": 1000.0, "dm": 0.1, "cm": 0.01, "mm": 0.001,
    "ft": 0.3048, "us-ft": 1200.0 / 3937.0, "ind-ft": 0.30479841,
    "yd": 0.9144, "us-yd": 3600.0 / 3937.0, "mi": 1609.344,
    "us-mi": 6336000.0 / 3937.0, "kmi": 1852.0, "fath": 1.8288,
    "ch": 20.1168, "us-ch": 79200.0 / 3937.0, "link": 0.201168,
}


def _unit_to_m(toks: dict) -> float:
    """Metres per projected-coordinate unit from +to_meter / +units
    (+to_meter wins when both are present, matching PROJ)."""
    if "to_meter" in toks:
        return float(toks["to_meter"])
    if "units" in toks:
        name = str(toks["units"])
        if name not in UNITS_TO_M:
            raise NotImplementedError(f"+units={name} (known: "
                                      f"{sorted(UNITS_TO_M)})")
        return UNITS_TO_M[name]
    return 1.0


def _fl(toks: dict, key: str, default: float | None = None) -> float:
    if key in toks:
        return float(toks[key])
    if default is None:
        raise ValueError(f"+{key}= is required for +proj={toks.get('proj')}")
    return default


def params_from_proj4(proj4: str) -> tuple[str, dict]:
    """Parse a proj4 string into a (kernel kind, parameter dict) pair —
    the same shape as a ``proj.CRS_REGISTRY`` entry. Raises
    NotImplementedError for projections/options outside the kernel set
    (non-polar ``+proj=stere`` — the EPSG 9809 double stereographic is
    ``+proj=sterea``, which IS supported). ``+nadgrids=<file.gsb>``
    NTv2 grid-shift datums ARE supported (grids/ntv2.py)."""
    toks = _parse_tokens(proj4)
    to_m = _unit_to_m(toks)
    kind_in = str(toks.get("proj", ""))
    a, f, towgs84 = _ellipsoid_of(toks)
    e2 = f * (2.0 - f)
    fe = _fl(toks, "x_0", 0.0)
    fn = _fl(toks, "y_0", 0.0)
    lon0 = _fl(toks, "lon_0", 0.0)

    if kind_in == "utm":
        zone = int(toks["zone"])
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone out of range: {zone}")
        kind, p = "tm", {"a": a, "f": f, "k0": 0.9996,
                         "lat0": 0.0, "lon0": zone * 6.0 - 183.0,
                         "fe": 500000.0,
                         "fn": 10000000.0 if toks.get("south") else 0.0}
    elif kind_in == "tmerc":
        kind, p = "tm", {"a": a, "f": f, "k0": _fl(toks, "k_0", 1.0),
                         "lat0": _fl(toks, "lat_0", 0.0), "lon0": lon0,
                         "fe": fe, "fn": fn}
    elif kind_in == "lcc":
        lat1 = _fl(toks, "lat_1")
        lat2 = _fl(toks, "lat_2", lat1)
        kind, p = "lcc", {"a": a, "e2": e2, "lat1": lat1, "lat2": lat2,
                          "lat_f": _fl(toks, "lat_0", lat1), "lon0": lon0,
                          "fe": fe, "fn": fn}
        if lat1 == lat2:  # 1SP (method 9801): k_0 scales every radius
            p["k0"] = _fl(toks, "k_0", 1.0)
        elif _fl(toks, "k_0", 1.0) != 1.0:
            raise NotImplementedError("LCC 2SP with k_0 != 1")
    elif kind_in == "laea":
        lat0 = _fl(toks, "lat_0", 0.0)
        if abs(lat0) == 90.0:
            kind, p = "laea_polar", {"a": a, "e2": e2, "lat0": lat0,
                                     "lon0": lon0, "fe": fe, "fn": fn}
        else:
            kind, p = "laea", {"a": a, "e2": e2, "lat0": lat0,
                               "lon0": lon0, "fe": fe, "fn": fn}
    elif kind_in == "aea":
        kind, p = "aea", {"a": a, "e2": e2, "lat1": _fl(toks, "lat_1"),
                          "lat2": _fl(toks, "lat_2"),
                          "lat0": _fl(toks, "lat_0", 0.0), "lon0": lon0,
                          "fe": fe, "fn": fn}
    elif kind_in == "sterea":
        # Oblique ("double") stereographic, EPSG method 9809 — the RD
        # New / Dutch family. PROJ distinguishes sterea (Roussilhe, via
        # a conformal sphere at the origin) from stere's oblique aspect
        # (conformal-latitude mapping); only the former is EPSG 9809.
        kind, p = "sto", {"a": a, "e2": e2, "lat0": _fl(toks, "lat_0", 0.0),
                          "lon0": lon0, "k0": _fl(toks, "k_0", 1.0),
                          "fe": fe, "fn": fn}
    elif kind_in == "stere":
        # PROJ's default lat_0 is 0 (EQUATORIAL stereographic) — an
        # omitted lat_0 must reach the oblique rejection below, not be
        # silently minted as polar
        lat0 = _fl(toks, "lat_0", 0.0)
        if abs(lat0) != 90.0:
            # oblique/equatorial aspect: PROJ's conformal-latitude
            # formulation (Snyder §21 — proj.py stere_obl_*), distinct
            # from EPSG 9809 / +proj=sterea (Roussilhe)
            kind, p = "stere_obl", {
                "a": a, "e2": e2, "lat0": lat0, "lon0": lon0,
                "k0": _fl(toks, "k_0", 1.0), "fe": fe, "fn": fn}
        elif "lat_ts" not in toks:
            # variant A (method 9810: scale defined AT the pole, e.g. UPS)
            lat_ts = lat0
            kind, p = "ps", {"a": a, "e2": e2, "lat_ts": lat_ts,
                             "k0": _fl(toks, "k_0", 1.0),
                             "lon0": lon0, "fe": fe, "fn": fn}
        else:
            lat_ts = _fl(toks, "lat_ts")
            # kernel encodes the aspect in lat_ts's sign
            kind, p = "ps", {"a": a, "e2": e2,
                             "lat_ts": abs(lat_ts) if lat0 > 0 else -abs(lat_ts),
                             "lon0": lon0, "fe": fe, "fn": fn}
    elif kind_in == "eqc":
        kind, p = "eqc", {"a": a, "e2": e2,
                          "lat1": _fl(toks, "lat_ts", _fl(toks, "lat_1", 0.0)),
                          "lon0": lon0, "fe": fe, "fn": fn}
    elif kind_in == "moll":
        kind, p = "moll", {"a": a, "lon0": lon0, "fe": fe, "fn": fn}
    elif kind_in == "omerc":
        # Hotine oblique Mercator (EPSG 9815 variant B by default; PROJ
        # +no_off selects variant A's natural-origin offsets). PROJ
        # spells the centre longitude +lonc; +gamma defaults to +alpha.
        if "alpha" not in toks:
            raise NotImplementedError(
                "+proj=omerc needs +alpha (two-point variant "
                "+lat_1/+lon_1/+lat_2/+lon_2 unsupported)")
        alpha = _fl(toks, "alpha")
        kind, p = "omerc", {
            "a": a, "e2": e2, "lat0": _fl(toks, "lat_0", 0.0),
            "lon0": _fl(toks, "lonc", _fl(toks, "lon_0", 0.0)),
            "alpha": alpha, "gamma": _fl(toks, "gamma", alpha),
            "k0": _fl(toks, "k_0", 1.0), "fe": fe, "fn": fn,
            "no_off": bool(toks.get("no_off", False))}
    else:
        raise NotImplementedError(f"+proj={kind_in!r} has no kernel "
                                  "(supported: utm tmerc lcc laea aea "
                                  "stere eqc moll)")
    if towgs84 is not None:
        p["towgs84"] = towgs84
    if "nadgrids" in toks:
        # NTv2 grid-shift datum (grids/ntv2.py); the shift applies in
        # the geographic domain and WINS over towgs84 (PROJ semantics).
        # @null (the explicit no-op grid) drops the datum shift.
        path = str(toks["nadgrids"]).lstrip("@")
        if path != "null":
            from . import ntv2

            ntv2.load_gsb(path)  # fail fast on a bad path/file
            p["nadgrids"] = path
        else:
            p.pop("towgs84", None)
    if to_m != 1.0:
        # PROJ semantics: +x_0/+y_0 are metres; the unit conversion
        # applies to the FULL projected output (E_unit = E_m / to_meter)
        p["to_m"] = to_m
    return kind, p


def crs_from_params(kind: str, params: dict) -> int:
    """Register a (kernel kind, parameter dict) as a synthetic CRS code
    usable everywhere an EPSG int is (proj.transform, layouts,
    reproject). Idempotent: identical definitions share a code."""
    if kind not in proj._KIND_FWD:
        raise ValueError(f"unknown projection kind {kind!r}; "
                         f"one of {sorted(proj._KIND_FWD)}")
    key = (kind,) + tuple(sorted(params.items()))
    if key in _custom_codes:
        return _custom_codes[key]
    code = _CUSTOM_BASE + len(_custom_codes)
    while code in proj.CRS_REGISTRY:
        code += 1
    proj.CRS_REGISTRY[code] = (kind, dict(params))
    _custom_codes[key] = code
    return code


def crs_from_proj4(proj4: str) -> int:
    """proj4 string -> usable CRS code. ``+proj=longlat +datum=WGS84``
    maps to 4326 and spherical ``+proj=merc`` on a=b=6378137 to 3857;
    everything else registers a custom kernel entry."""
    toks = _parse_tokens(proj4)
    kind_in = str(toks.get("proj", ""))
    if kind_in == "longlat":
        a, f, towgs84 = _ellipsoid_of(toks)
        if towgs84 is not None or "nadgrids" in toks:
            raise NotImplementedError("datum-shifted geographic CRS "
                                      "(only WGS84 longlat)")
        # the 4326 shortcut is only valid on a WGS84/GRS80-equivalent
        # ellipsoid — '+proj=longlat +ellps=bessel' is a DIFFERENT
        # geographic CRS (native-datum lon/lat), and silently treating
        # it as WGS84 would hide a ~100 m datum error
        if abs(a - proj.A_WGS84) > 1e-3 or not (
                f and abs(1.0 / f - 298.2572) < 0.01):
            raise NotImplementedError(
                "non-WGS84-ellipsoid geographic CRS (add +towgs84 or "
                "use a WGS84/GRS80 ellipsoid)")
        return 4326
    if kind_in == "merc":
        a, f, _ = _ellipsoid_of(toks)
        if f == 0.0 and a == proj.A_WGS84:
            return 3857
        raise NotImplementedError("non-web-mercator +proj=merc")
    return crs_from_params(*params_from_proj4(proj4))
