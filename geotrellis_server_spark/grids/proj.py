"""General CRS transforms (SURVEY.md R2 — reference ``reproject(crs)`` /
``reprojectToRegion`` accept arbitrary EPSG codes,
ogc/.../OgcLayer.scala:82-91, TiledOgcLayer.scala:77-87; round 1 only
shipped the internal 4326↔3857 pair).

pyproj is not available in this container, so the engine implements the
projections a geospatial user actually hits, in pure numpy, from public
formulas:

- EPSG:4326 (WGS84 lon/lat degrees) — the hub CRS,
- EPSG:3857 (spherical Web Mercator — same math as grids.layout),
- EPSG:326xx / 327xx (WGS84 UTM north/south, all 60 zones) via the
  Karney–Krüger series to n^6 (Karney 2011, "Transverse Mercator with an
  accuracy of a few nanometers"): forward+inverse accurate to sub-mm
  within ~±40° of the central meridian,
- EPSG:3035 (ETRS89-extended / LAEA Europe — the standard European
  request CRS) via the ellipsoidal Lambert azimuthal equal-area
  (Snyder 1987 §24, EPSG method 9820),
- EPSG:3413 / 3031 / 3032 (polar stereographic north/south, EPSG
  method 9829 variant B — Snyder §21 ellipsoidal),
- EPSG:2154 / 3347 (Lambert conformal conic 2SP — Snyder §15, EPSG
  method 9802; the conic family behind Lambert-93 and most US state
  plane zones — new zones are one registry entry),
- EPSG:27700 / 25832 (generic transverse Mercator — any ellipsoid, k0,
  origin; method 9807: British National Grid, Gauss-Krüger and TM state
  plane zones are parameter dicts over the same Karney series),
- EPSG:5070 / 3577 (Albers equal-area conic — Snyder §14, EPSG method
  9822; the standard US/Australian continental analysis CRS),
- EPSG:4087 (equidistant cylindrical, EPSG method 1028 — ellipsoidal
  Plate Carrée via the Krüger rectifying series),
- EPSG:3573 / 3574 (North Pole LAEA Canada/Atlantic — the polar aspect,
  Snyder §24 eq. 24-23/24; the Arctic analysis CRS family),
- ESRI:54009 (World Mollweide — Snyder §31 spherical Newton iteration;
  the standard global equal-area map CRS).

All transforms route src → lonlat → dst, vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2 = F_WGS84 * (2.0 - F_WGS84)
E = np.sqrt(E2)
N3 = F_WGS84 / (2.0 - F_WGS84)  # third flattening n


def _krueger_coeffs(n: float) -> tuple[list[float], list[float], float]:
    """Krüger series coefficients to n^6 (Karney 2011, eqs. 35-36) and
    the rectifying-radius factor A/a, for ANY ellipsoid's third
    flattening n — the UTM constants below are the WGS84 instance."""
    alpha = [
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ]
    a_factor = (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0) / (1.0 + n)
    return alpha, beta, a_factor


_ALPHA, _BETA, _AF_WGS84 = _krueger_coeffs(N3)

# rectifying radius A (Krüger)
_A_RECT = A_WGS84 * _AF_WGS84

K0_UTM = 0.9996
FE_UTM = 500000.0
FN_SOUTH = 10000000.0


def utm_zone_epsg(lon: float, lat: float) -> int:
    """EPSG code of the UTM zone containing a point (no Norway/Svalbard
    exceptions — plain 6° zones, like pyproj's query default)."""
    zone = int(np.clip((lon + 180.0) // 6.0 + 1, 1, 60))
    return (32600 if lat >= 0 else 32700) + zone


def _utm_params(epsg: int) -> tuple[float, float]:
    """(central meridian degrees, false northing)."""
    if 32601 <= epsg <= 32660:
        return (epsg - 32600) * 6.0 - 183.0, 0.0
    if 32701 <= epsg <= 32760:
        return (epsg - 32700) * 6.0 - 183.0, FN_SOUTH
    raise ValueError(f"not a UTM EPSG code: {epsg}")


def _tm_core_fwd(lon, lat, lon0_deg: float, e: float, alpha: list[float]):
    """Krüger forward core → (xi, eta) in rectifying-radius units."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude tangent (±90° → ±inf → atan2 handles the pole)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(alpha, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return xi, eta


def _tm_core_inv(xi, eta, lon0_deg: float, e: float, beta: list[float]):
    """Krüger inverse core: (xi, eta) → lon/lat degrees."""
    e2 = e * e
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    t_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton-solve tau from tau' (conformal → geographic), Karney eq. 19-21
    tau = t_p / np.sqrt(1.0 - e2)  # first guess
    for _ in range(5):
        sig = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau * tau)))
        f_tau = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau) - t_p
        d_tau = (np.sqrt((1.0 + sig * sig) * (1.0 + tau * tau)) - sig * tau) * (
            1.0 - e2
        ) * np.sqrt(1.0 + tau * tau) / (1.0 + (1.0 - e2) * tau * tau)
        tau = tau - f_tau / d_tau
    return lon0_deg + np.degrees(lam), np.degrees(np.arctan(tau))


def tm_forward(lon, lat, lon0_deg: float, fn: float = 0.0):
    """Karney–Krüger forward (UTM/WGS84 constants): lon/lat degrees →
    (easting, northing) m."""
    xi, eta = _tm_core_fwd(lon, lat, lon0_deg, E, _ALPHA)
    return FE_UTM + K0_UTM * _A_RECT * eta, fn + K0_UTM * _A_RECT * xi


def tm_inverse(easting, northing, lon0_deg: float, fn: float = 0.0):
    """Karney–Krüger inverse (UTM/WGS84 constants)."""
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (K0_UTM * _A_RECT)
    eta = (np.asarray(easting, dtype=np.float64) - FE_UTM) / (K0_UTM * _A_RECT)
    return _tm_core_inv(xi, eta, lon0_deg, E, _BETA)


_TM_CACHE: dict[tuple, tuple] = {}


def _tm_consts(p: dict) -> tuple[float, float, float, list[float], list[float]]:
    """(e, A_rect, M0, alpha, beta) for a generic-TM parameter dict
    {a, f, k0, lat0, lon0, fe, fn} — any ellipsoid, any origin."""
    key = (p["a"], p["f"], p.get("lat0", 0.0))
    if key not in _TM_CACHE:
        n = p["f"] / (2.0 - p["f"])
        alpha, beta, af = _krueger_coeffs(n)
        e = float(np.sqrt(p["f"] * (2.0 - p["f"])))
        a_rect = p["a"] * af
        # meridian arc of the latitude of origin (xi at lam = 0)
        xi0, _ = _tm_core_fwd(p.get("lat0", 0.0) * 0.0, p.get("lat0", 0.0),
                              0.0, e, alpha)
        _TM_CACHE[key] = (e, a_rect, a_rect * float(xi0), alpha, beta)
    return _TM_CACHE[key]


def tm_forward_generic(lon, lat, p: dict):
    """Transverse Mercator with arbitrary (ellipsoid, k0, origin) —
    EPSG method 9807 (British National Grid, Gauss-Krüger zones, state
    plane TM zones are all parameter dicts)."""
    e, a_rect, m0, alpha, _ = _tm_consts(p)
    xi, eta = _tm_core_fwd(lon, lat, p["lon0"], e, alpha)
    x = p["fe"] + p["k0"] * a_rect * eta
    y = p["fn"] + p["k0"] * (a_rect * xi - m0)
    return x, y


def tm_inverse_generic(x, y, p: dict):
    e, a_rect, m0, _, beta = _tm_consts(p)
    xi = ((np.asarray(y, dtype=np.float64) - p["fn"]) / p["k0"] + m0) / a_rect
    eta = (np.asarray(x, dtype=np.float64) - p["fe"]) / (p["k0"] * a_rect)
    return _tm_core_inv(xi, eta, p["lon0"], e, beta)


def meridian_arc(lat_deg) -> np.ndarray:
    """Rectifying meridian arc length from the equator (used by tests as
    an independent check: N on the central meridian = k0 * arc)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    # arc = A * (rectified xi of the conformal latitude at lam = 0)
    sphi = np.sin(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.sinh(np.arctanh(sphi) - E * np.arctanh(E * sphi))
    xi_p = np.arctan(t)  # lam = 0 → atan2(t, cos 0) = atan(t)
    xi = xi_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p)
    return _A_RECT * xi


# --- Lambert azimuthal equal-area (ellipsoidal, Snyder 1987 §24) -----------

# GRS80 (ETRS89's ellipsoid — e² differs from WGS84 in the 11th decimal)
A_GRS80 = 6378137.0
F_GRS80 = 1.0 / 298.257222101
E2_GRS80 = F_GRS80 * (2.0 - F_GRS80)


def _q_auth(sphi, e: float, e2: float):
    """Authalic-latitude q function (Snyder eq. 3-12)."""
    return (1.0 - e2) * (
        sphi / (1.0 - e2 * sphi * sphi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sphi) / (1.0 + e * sphi))
    )


def _laea_consts(p: dict) -> tuple[float, float, float, float, float]:
    """(qp, beta1, Rq, D, e) for a LAEA parameter dict."""
    a, e2 = p["a"], p["e2"]
    e = float(np.sqrt(e2))
    qp = float(_q_auth(1.0, e, e2))
    phi1 = np.radians(p["lat0"])
    q1 = float(_q_auth(np.sin(phi1), e, e2))
    beta1 = float(np.arcsin(q1 / qp))
    rq = a * float(np.sqrt(qp / 2.0))
    m1 = float(np.cos(phi1) / np.sqrt(1.0 - e2 * np.sin(phi1) ** 2))
    d = a * m1 / (rq * np.cos(beta1))
    return qp, beta1, rq, d, e


def laea_forward(lon, lat, p: dict):
    """Snyder eqs. 24-2..24-19 (oblique ellipsoidal case)."""
    qp, beta1, rq, d, e = _laea_consts(p)
    e2 = p["e2"]
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _q_auth(np.sin(phi), e, e2)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    b = rq * np.sqrt(
        2.0 / (1.0 + np.sin(beta1) * np.sin(beta) + np.cos(beta1) * np.cos(beta) * np.cos(lam))
    )
    x = p["fe"] + b * d * np.cos(beta) * np.sin(lam)
    y = p["fn"] + (b / d) * (
        np.cos(beta1) * np.sin(beta) - np.sin(beta1) * np.cos(beta) * np.cos(lam)
    )
    return x, y


def laea_inverse(x, y, p: dict):
    qp, beta1, rq, d, e = _laea_consts(p)
    e2 = p["e2"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    rho = np.sqrt((xp / d) ** 2 + (d * yp) ** 2)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    at_centre = rho == 0.0
    rho_safe = np.where(at_centre, 1.0, rho)
    q = qp * (
        np.cos(ce) * np.sin(beta1) + d * yp * np.sin(ce) * np.cos(beta1) / rho_safe
    )
    q = np.where(at_centre, qp * np.sin(beta1), q)
    lam = np.arctan2(
        xp * np.sin(ce),
        d * rho_safe * np.cos(beta1) * np.cos(ce) - d * d * yp * np.sin(beta1) * np.sin(ce),
    )
    lam = np.where(at_centre, 0.0, lam)
    # latitude from authalic q (Snyder eq. 3-16 iteration)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(6):
        s = np.sin(phi)
        phi = phi + (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2)
            - s / (1.0 - e2 * s * s)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    return p["lon0"] + np.degrees(lam), np.degrees(phi)


# --- Lambert azimuthal equal-area, POLAR aspect (Snyder §24, eq. 24-23/24) --


def laea_polar_forward(lon, lat, p: dict):
    """North/south polar aspect (lat0 = ±90): rho = a·sqrt(qp - q) about
    the pole — the oblique formulas above degenerate (D = 0/0) at the
    pole, so the polar case is its own closed form."""
    e2 = p["e2"]
    e = float(np.sqrt(e2))
    qp = float(_q_auth(1.0, e, e2))
    north = p["lat0"] > 0
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _q_auth(np.sin(phi), e, e2)
    rho = p["a"] * np.sqrt(np.maximum(qp - q if north else qp + q, 0.0))
    x = p["fe"] + rho * np.sin(lam)
    y = p["fn"] + (-rho * np.cos(lam) if north else rho * np.cos(lam))
    return x, y


def laea_polar_inverse(x, y, p: dict):
    e2 = p["e2"]
    e = float(np.sqrt(e2))
    qp = float(_q_auth(1.0, e, e2))
    north = p["lat0"] > 0
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    rho = np.hypot(xp, yp)
    q = qp - (rho / p["a"]) ** 2 if north else (rho / p["a"]) ** 2 - qp
    lam = np.arctan2(xp, -yp) if north else np.arctan2(xp, yp)
    # authalic -> geodetic via the CLOSED SERIES (Snyder eq. 3-18), not
    # the Newton iteration the oblique case uses: the iteration divides
    # by cos(phi) and diverges near the pole (hundreds of metres of
    # error at 89.99 deg) — exactly where a polar CRS operates. The
    # series converges uniformly including the pole.
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        beta
        + (e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0) * np.sin(2.0 * beta)
        + (23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0) * np.sin(4.0 * beta)
        + (761.0 * e6 / 45360.0) * np.sin(6.0 * beta)
    )
    # two Newton polish steps where they are stable (cos phi not tiny):
    # brings truncation below 1e-12 deg; inside ~0.06 deg of the pole the
    # series alone is already ~1e-8 deg (~1 mm) and Newton would divide
    # by cos(phi) -> 0
    safe = np.cos(phi) > 1e-3
    for _ in range(2):
        sph = np.sin(phi)
        upd = phi + (1.0 - e2 * sph * sph) ** 2 / (
            2.0 * np.where(safe, np.cos(phi), 1.0)
        ) * (
            q / (1.0 - e2)
            - sph / (1.0 - e2 * sph * sph)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * sph) / (1.0 + e * sph))
        )
        phi = np.where(safe, upd, phi)
    at_pole = rho == 0.0
    phi = np.where(at_pole, np.pi / 2.0 if north else -np.pi / 2.0, phi)
    lam = np.where(at_pole, 0.0, lam)
    return p["lon0"] + np.degrees(lam), np.degrees(phi)


# --- Mollweide (Snyder §31 — spherical, the ESRI:54009 world map CRS) -------


def mollweide_forward(lon, lat, p: dict):
    """x = (2√2/π)·R·λ·cosθ, y = √2·R·sinθ with 2θ + sin2θ = π·sinφ
    (Newton; Snyder eqs. 31-1..31-5). Spherical formulas on R = a —
    how ESRI:54009 is applied in practice (proj's moll +R=a)."""
    r = p["a"]
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rhs = np.pi * np.sin(phi)
    theta = phi.copy()
    for _ in range(20):
        f = 2.0 * theta + np.sin(2.0 * theta) - rhs
        d = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(np.abs(d) > 1e-12, f / np.where(d == 0, 1.0, d), 0.0)
        theta = theta - step
    x = p["fe"] + (2.0 * np.sqrt(2.0) / np.pi) * r * lam * np.cos(theta)
    y = p["fn"] + np.sqrt(2.0) * r * np.sin(theta)
    return x, y


def mollweide_inverse(x, y, p: dict):
    r = p["a"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    theta = np.arcsin(np.clip(yp / (np.sqrt(2.0) * r), -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi, -1.0, 1.0))
    cos_t = np.cos(theta)
    at_pole = np.abs(cos_t) < 1e-12
    lam = np.where(
        at_pole, 0.0,
        np.pi * xp / (2.0 * r * np.sqrt(2.0) * np.where(at_pole, 1.0, cos_t)),
    )
    return p["lon0"] + np.degrees(lam), np.degrees(phi)


# --- Polar stereographic, variant B (Snyder §21 / EPSG method 9829) ---------


def _ps_tf_mf(p: dict) -> tuple[float, float, float]:
    """(tF, mF, e) at the standard parallel (north-aspect values —
    south aspects negate the latitude before calling). With ``k0`` in
    the dict (EPSG method 9810 variant A — scale defined AT the pole,
    e.g. UPS), returns (1, factor) with
    factor = 2 k0 / sqrt((1+e)^(1+e) (1-e)^(1-e)) so rho = a·factor·t."""
    e2 = p["e2"]
    e = float(np.sqrt(e2))
    if "k0" in p:
        factor = 2.0 * float(p["k0"]) / float(
            np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)))
        return 1.0, factor, e
    phif = np.radians(abs(p["lat_ts"]))
    sf = np.sin(phif)
    tf = float(
        np.tan(np.pi / 4.0 - phif / 2.0)
        * ((1.0 + e * sf) / (1.0 - e * sf)) ** (e / 2.0)
    )
    mf = float(np.cos(phif) / np.sqrt(1.0 - e2 * sf * sf))
    return tf, mf, e


def ps_forward(lon, lat, p: dict):
    """Polar stereographic forward; ``p['lat_ts'] < 0`` = south aspect
    (computed as the north aspect of the mirrored point, y negated)."""
    south = p["lat_ts"] < 0
    tf, mf, e = _ps_tf_mf(p)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if south:
        phi = -phi
    sphi = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + e * sphi) / (1.0 - e * sphi)
    ) ** (e / 2.0)
    rho = p["a"] * mf * t / tf
    x = p["fe"] + rho * np.sin(lam)
    y = p["fn"] + (rho * np.cos(lam) if south else -rho * np.cos(lam))
    return x, y


def ps_inverse(x, y, p: dict):
    south = p["lat_ts"] < 0
    tf, mf, e = _ps_tf_mf(p)
    e2 = p["e2"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    if not south:
        yp = -yp  # fold both aspects onto the south-style (+y toward pole)
    rho = np.hypot(xp, yp)
    t = rho * tf / (p["a"] * mf)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)  # conformal first guess
    for _ in range(6):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    lam = np.arctan2(xp, yp)
    lon = p["lon0"] + np.degrees(lam)
    lat = np.degrees(-phi if south else phi)
    return lon, lat


# --- Lambert conformal conic, 2SP (Snyder §15 / EPSG method 9802) ----------


def _lcc_m_t(phi, e: float, e2: float):
    s = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)
    return m, t


def _lcc_consts(p: dict) -> tuple[float, float, float, float]:
    """(n, F, rho_F, e) for an LCC-2SP parameter dict (lat1/lat2 standard
    parallels, lat_f/lon0 false origin)."""
    e2 = p["e2"]
    e = float(np.sqrt(e2))
    m1, t1 = _lcc_m_t(np.radians(p["lat1"]), e, e2)
    _, tf = _lcc_m_t(np.radians(p["lat_f"]), e, e2)
    if p["lat1"] == p["lat2"]:
        # 1SP limit (EPSG method 9801): n = sin(lat1); optional k0
        # scales every radius (rho = a k0 F t^n)
        n = float(np.sin(np.radians(p["lat1"])))
    else:
        m2, t2 = _lcc_m_t(np.radians(p["lat2"]), e, e2)
        n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
    f = float(m1 / (n * t1**n)) * float(p.get("k0", 1.0))
    rho_f = float(p["a"] * f * tf**n)
    return n, f, rho_f, e


def lcc_forward(lon, lat, p: dict):
    n, f, rho_f, e = _lcc_consts(p)
    e2 = p["e2"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    _, t = _lcc_m_t(phi, e, e2)
    rho = p["a"] * f * t**n
    x = p["fe"] + rho * np.sin(theta)
    y = p["fn"] + rho_f - rho * np.cos(theta)
    return x, y


def lcc_inverse(x, y, p: dict):
    n, f, rho_f, e = _lcc_consts(p)
    e2 = p["e2"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = rho_f - (np.asarray(y, dtype=np.float64) - p["fn"])
    rho = np.sign(n) * np.hypot(xp, yp)
    t = (rho / (p["a"] * f)) ** (1.0 / n)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)  # conformal first guess
    for _ in range(6):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    return p["lon0"] + np.degrees(theta / n), np.degrees(phi)


# --- Albers equal-area conic (Snyder §14 / EPSG method 9822) ----------------


def _aea_consts(p: dict) -> tuple[float, float, float, float]:
    """(n, C, rho0, e) for an Albers parameter dict (lat1/lat2 standard
    parallels, lat0/lon0 origin). Reuses the LAEA authalic-q function
    (Snyder eq. 3-12)."""
    e2 = p["e2"]
    e = float(np.sqrt(e2))
    s1, s2 = np.sin(np.radians(p["lat1"])), np.sin(np.radians(p["lat2"]))
    m1 = float(np.cos(np.radians(p["lat1"])) / np.sqrt(1.0 - e2 * s1 * s1))
    m2 = float(np.cos(np.radians(p["lat2"])) / np.sqrt(1.0 - e2 * s2 * s2))
    q1, q2 = float(_q_auth(s1, e, e2)), float(_q_auth(s2, e, e2))
    q0 = float(_q_auth(np.sin(np.radians(p["lat0"])), e, e2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = p["a"] * np.sqrt(c - n * q0) / n
    return n, c, float(rho0), e


def aea_forward(lon, lat, p: dict):
    n, c, rho0, e = _aea_consts(p)
    e2 = p["e2"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    q = _q_auth(np.sin(phi), e, e2)
    rho = p["a"] * np.sqrt(np.maximum(c - n * q, 0.0)) / n
    x = p["fe"] + rho * np.sin(theta)
    y = p["fn"] + rho0 - rho * np.cos(theta)
    return x, y


def aea_inverse(x, y, p: dict):
    n, c, rho0, e = _aea_consts(p)
    e2 = p["e2"]
    a = p["a"]
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = rho0 - (np.asarray(y, dtype=np.float64) - p["fn"])
    rho = np.sign(n) * np.hypot(xp, yp)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    q = (c - rho * rho * n * n / (a * a)) / n
    # latitude from authalic q — same Snyder eq. 3-16 iteration as LAEA
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(6):
        s = np.sin(phi)
        phi = phi + (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2)
            - s / (1.0 - e2 * s * s)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    return p["lon0"] + np.degrees(theta / n), np.degrees(phi)


# --- Equidistant cylindrical (EPSG method 1028 / Snyder §12) ----------------


def eqc_forward(lon, lat, p: dict):
    """x = fe + nu1·cos(lat1)·lam, y = fn + M(lat) — the ellipsoidal
    Plate Carrée family. M comes from the same Krüger rectifying series
    as the TM code (meridian arc = A_rect · xi at lam = 0)."""
    e2 = p["e2"]
    f = 1.0 - np.sqrt(1.0 - e2)  # flattening from e² (exact inverse)
    n3 = f / (2.0 - f)
    alpha, _, af = _krueger_coeffs(n3)
    e = float(np.sqrt(e2))
    s1 = np.sin(np.radians(p["lat1"]))
    nu1_cos = p["a"] / np.sqrt(1.0 - e2 * s1 * s1) * np.cos(np.radians(p["lat1"]))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    lat_arr = np.asarray(lat, dtype=np.float64)
    xi, _ = _tm_core_fwd(np.zeros_like(lat_arr), lat_arr, 0.0, e, alpha)
    return p["fe"] + nu1_cos * lam, p["fn"] + p["a"] * af * xi


def eqc_inverse(x, y, p: dict):
    e2 = p["e2"]
    f = 1.0 - np.sqrt(1.0 - e2)
    n3 = f / (2.0 - f)
    _, beta, af = _krueger_coeffs(n3)
    e = float(np.sqrt(e2))
    s1 = np.sin(np.radians(p["lat1"]))
    nu1_cos = p["a"] / np.sqrt(1.0 - e2 * s1 * s1) * np.cos(np.radians(p["lat1"]))
    lam = (np.asarray(x, dtype=np.float64) - p["fe"]) / nu1_cos
    xi = (np.asarray(y, dtype=np.float64) - p["fn"]) / (p["a"] * af)
    _, lat = _tm_core_inv(xi, np.zeros_like(xi), 0.0, e, beta)
    return p["lon0"] + np.degrees(lam), lat


# --- oblique stereographic (EPSG method 9809, "double" stereographic) ------
#
# The Roussilhe formulation EPSG Guidance 7-2 §1.3.7.1 specifies: ellipsoid
# -> conformal sphere of radius R = sqrt(rho0*nu0), then the spherical
# stereographic projection about the conformal origin. The RD New
# (Amersfoort, 28992) family uses this method; the registry entry below is
# validated against the EPSG worked example (phi=53N lam=6E ->
# 196105.283 E, 557057.739 N).


def _sto_constants(p: dict):
    a, e2 = p["a"], p["e2"]
    e = np.sqrt(e2)
    phi0 = np.radians(p["lat0"])
    s0 = np.sin(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
    big_r = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + e2 * np.cos(phi0) ** 4 / (1.0 - e2))
    s1 = (1.0 + s0) / (1.0 - s0)
    s2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (s1 * s2**e) ** n
    sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + s0) * (1.0 - sin_chi0) / ((n - s0) * (1.0 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
    lam0 = np.radians(p["lon0"])
    return e, big_r, n, c, chi0, lam0


def _sto_conformal(lat, e: float, n: float, c: float):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    sa = (1.0 + sphi) / (1.0 - sphi)
    sb = (1.0 - e * sphi) / (1.0 + e * sphi)
    w = c * (sa * sb**e) ** n
    return np.arcsin((w - 1.0) / (w + 1.0))


def stere_oblique_forward(lon, lat, p: dict):
    """Oblique/equatorial stereographic forward (EPSG 9809)."""
    e, big_r, n, c, chi0, lam0 = _sto_constants(p)
    k0 = p.get("k0", 1.0)
    lam = n * (np.radians(np.asarray(lon, dtype=np.float64)) - lam0) + lam0
    chi = _sto_conformal(lat, e, n, c)
    dlam = lam - lam0
    b = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(dlam)
    x = p["fe"] + 2.0 * big_r * k0 * np.cos(chi) * np.sin(dlam) / b
    y = p["fn"] + 2.0 * big_r * k0 * (
        np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(dlam)) / b
    return x, y


def stere_oblique_inverse(x, y, p: dict):
    """Oblique stereographic inverse: spherical de-projection to the
    conformal (chi, Lambda), then Newton-free fixed-point recovery of
    the geodetic latitude via the isometric latitude (EPSG 7-2 §1.3.7.1
    reverse formulas)."""
    e, big_r, n, c, chi0, lam0 = _sto_constants(p)
    k0 = p.get("k0", 1.0)
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    g = 2.0 * big_r * k0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
    h = 4.0 * big_r * k0 * np.tan(chi0) + g
    i = np.arctan2(xp, h + yp)
    j = np.arctan2(xp, g - yp) - i
    chi = chi0 + 2.0 * np.arctan((yp - xp * np.tan(j / 2.0)) / (2.0 * big_r * k0))
    lam = j + 2.0 * i + lam0
    lon = np.degrees((lam - lam0) / n + lam0)
    # isometric latitude of the conformal sphere -> geodetic latitude
    psi = 0.5 * np.log((1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))) / n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(8):
        sphi = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0)
                       * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
        dphi = (psi - psi_i) * np.cos(phi) * (1.0 - e * e * sphi * sphi) / (1.0 - e * e)
        phi = phi + dphi
        if np.all(np.abs(dphi) < 1e-14):
            break
    return lon, np.degrees(phi)


# --- datum shift (7-parameter Helmert, EPSG method 1033) --------------------
#
# The hub CRS is WGS84 lon/lat. Registry entries on a datum that is NOT
# WGS84/GRS80-equivalent (GRS80 and WGS84 agree to ~0.1 mm) carry a
# ``towgs84`` tuple (dx, dy, dz [m], rx, ry, rz [arcsec], ds [ppm]) in the
# position-vector convention: native geodetic -> geocentric cartesian ->
# Helmert -> WGS84 geodetic. Reference parity: proj4j applies the same
# towgs84 shift for these codes (ogc/.../WmsParams.scala CRS parsing).


def geodetic_to_geocentric(lon, lat, a: float, e2: float, h=0.0):
    """Geodetic (degrees, ellipsoidal height m) -> geocentric cartesian
    (EPSG Guidance 7-2 §2.2.1)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi, cphi = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
    x = (nu + h) * cphi * np.cos(lam)
    y = (nu + h) * cphi * np.sin(lam)
    z = (nu * (1.0 - e2) + h) * sphi
    return x, y, z


def geocentric_to_geodetic(x, y, z, a: float, e2: float):
    """Geocentric cartesian -> geodetic (degrees; height discarded).
    Bowring's initial guess polished by fixed-point iteration to <1e-14
    rad — exact roundtrip partner of :func:`geodetic_to_geocentric`."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.hypot(x, y)
    b = a * np.sqrt(1.0 - e2)
    # Bowring 1976 start
    theta = np.arctan2(z * a, p * b)
    ep2 = e2 / (1.0 - e2)
    phi = np.arctan2(z + ep2 * b * np.sin(theta) ** 3,
                     p - e2 * a * np.cos(theta) ** 3)
    for _ in range(6):
        sphi = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi_new = np.arctan2(z + e2 * nu * sphi, p)
        if np.all(np.abs(phi_new - phi) < 1e-15):
            phi = phi_new
            break
        phi = phi_new
    return np.degrees(np.arctan2(y, x)), np.degrees(phi)


_AS2RAD = np.pi / (180.0 * 3600.0)


def _helmert_matrix(t7: tuple) -> tuple[np.ndarray, np.ndarray]:
    """(M, T) with X2 = M @ X1 + T for the position-vector 7-parameter
    transformation; rotations arcsec, scale ppm."""
    dx, dy, dz, rx, ry, rz, ds = t7
    rx, ry, rz = rx * _AS2RAD, ry * _AS2RAD, rz * _AS2RAD
    s = 1.0 + ds * 1e-6
    m = s * np.array([[1.0, -rz, ry],
                      [rz, 1.0, -rx],
                      [-ry, rx, 1.0]])
    return m, np.array([dx, dy, dz])


def helmert_apply(x, y, z, t7: tuple, inverse: bool = False):
    """Apply (or exactly invert — matrix inverse, not sign-flip
    approximation) the position-vector Helmert transformation."""
    m, t = _helmert_matrix(t7)
    v = np.stack([np.asarray(x, dtype=np.float64).ravel(),
                  np.asarray(y, dtype=np.float64).ravel(),
                  np.asarray(z, dtype=np.float64).ravel()])
    if inverse:
        out = np.linalg.inv(m) @ (v - t[:, None])
    else:
        out = m @ v + t[:, None]
    shape = np.asarray(x, dtype=np.float64).shape
    return out[0].reshape(shape), out[1].reshape(shape), out[2].reshape(shape)


def _entry_ellipsoid(kind: str, p: dict) -> tuple[float, float]:
    """(a, e2) of a registry entry's ellipsoid ('tm' dicts carry f)."""
    if "e2" in p:
        return p["a"], p["e2"]
    f = p["f"]
    return p["a"], f * (2.0 - f)


def _datum_to_wgs84(lon, lat, kind: str, p: dict):
    if "nadgrids" in p:
        # NTv2 grid shift (grids/ntv2.py) operates directly in the
        # geographic domain; wins over towgs84 when both are present
        # (PROJ semantics)
        from .ntv2 import load_gsb

        return load_gsb(p["nadgrids"]).to_target(lon, lat)
    a, e2 = _entry_ellipsoid(kind, p)
    gx, gy, gz = geodetic_to_geocentric(lon, lat, a, e2)
    gx, gy, gz = helmert_apply(gx, gy, gz, p["towgs84"])
    return geocentric_to_geodetic(gx, gy, gz, A_WGS84, E2)


def _datum_from_wgs84(lon, lat, kind: str, p: dict):
    if "nadgrids" in p:
        from .ntv2 import load_gsb

        return load_gsb(p["nadgrids"]).from_target(lon, lat)
    a, e2 = _entry_ellipsoid(kind, p)
    gx, gy, gz = geodetic_to_geocentric(lon, lat, A_WGS84, E2)
    gx, gy, gz = helmert_apply(gx, gy, gz, p["towgs84"], inverse=True)
    return geocentric_to_geodetic(gx, gy, gz, a, e2)


# EPSG registry for the closed-form projections above. UTM zones resolve
# arithmetically in _utm_params; everything else is a parameter dict here.
CRS_REGISTRY: dict[int, tuple[str, dict]] = {
    # ETRS89-extended / LAEA Europe (the standard European request CRS)
    3035: ("laea", {"a": A_GRS80, "e2": E2_GRS80, "lat0": 52.0, "lon0": 10.0,
                    "fe": 4321000.0, "fn": 3210000.0}),
    # NSIDC Sea Ice Polar Stereographic North
    3413: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": 70.0, "lon0": -45.0,
                  "fe": 0.0, "fn": 0.0}),
    # Antarctic Polar Stereographic
    3031: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": -71.0, "lon0": 0.0,
                  "fe": 0.0, "fn": 0.0}),
    # WGS 84 / Australian Antarctic Polar Stereographic (EPSG 7-2 example)
    3032: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": -71.0, "lon0": 70.0,
                  "fe": 6000000.0, "fn": 6000000.0}),
    # RGF93 / Lambert-93 (the standard French national CRS) — LCC 2SP
    2154: ("lcc", {"a": A_GRS80, "e2": E2_GRS80, "lat1": 49.0, "lat2": 44.0,
                   "lat_f": 46.5, "lon0": 3.0, "fe": 700000.0, "fn": 6600000.0}),
    # NAD83 / Statistics Canada Lambert
    3347: ("lcc", {"a": A_GRS80, "e2": E2_GRS80, "lat1": 49.0, "lat2": 77.0,
                   "lat_f": 63.390675, "lon0": -91.866667,
                   "fe": 6200000.0, "fn": 3000000.0}),
    # OSGB36 / British National Grid (Airy 1830 — generic TM, method 9807;
    # OSGB36<->WGS84 via the official 7-param Helmert, OSGB "A guide to
    # coordinate systems in Great Britain" §6.6 / EPSG:1314 — ~3.5 m vs
    # the OSTN grid, same parameters proj4j applies for towgs84)
    27700: ("tm", {"a": 6377563.396, "f": 1.0 / 299.3249646,
                   "k0": 0.9996012717, "lat0": 49.0, "lon0": -2.0,
                   "fe": 400000.0, "fn": -100000.0,
                   "towgs84": (446.448, -125.157, 542.060,
                               0.1502, 0.2470, 0.8421, -20.4894)}),
    # ETRS89 / Gauss-Krüger zone 4 style (DHDN-free modern variant):
    # EPSG:25832 = ETRS89 / UTM 32N on GRS80 (generic-TM path, k0 0.9996)
    25832: ("tm", {"a": A_GRS80, "f": F_GRS80, "k0": 0.9996, "lat0": 0.0,
                   "lon0": 9.0, "fe": 500000.0, "fn": 0.0}),
    # NAD83 / Conus Albers (the standard US continental analysis CRS)
    5070: ("aea", {"a": A_GRS80, "e2": E2_GRS80, "lat1": 29.5, "lat2": 45.5,
                   "lat0": 23.0, "lon0": -96.0, "fe": 0.0, "fn": 0.0}),
    # GDA94 / Australian Albers
    3577: ("aea", {"a": A_GRS80, "e2": E2_GRS80, "lat1": -18.0, "lat2": -36.0,
                   "lat0": 0.0, "lon0": 132.0, "fe": 0.0, "fn": 0.0}),
    # WGS 84 / World Equidistant Cylindrical (EPSG method 1028, lat1 = 0)
    4087: ("eqc", {"a": A_WGS84, "e2": E2, "lat1": 0.0, "lon0": 0.0,
                   "fe": 0.0, "fn": 0.0}),
    # WGS 84 / North Pole LAEA Canada / Atlantic (Arctic analysis CRS)
    3573: ("laea_polar", {"a": A_WGS84, "e2": E2, "lat0": 90.0,
                          "lon0": -100.0, "fe": 0.0, "fn": 0.0}),
    3574: ("laea_polar", {"a": A_WGS84, "e2": E2, "lat0": 90.0,
                          "lon0": -40.0, "fe": 0.0, "fn": 0.0}),
    # World Mollweide (ESRI:54009 — no EPSG number; registered under the
    # conventional ESRI code, spherical formulas on R = a)
    54009: ("moll", {"a": A_WGS84, "lon0": 0.0, "fe": 0.0, "fn": 0.0}),
    # NZGD2000 / New Zealand Transverse Mercator (NZTM2000)
    2193: ("tm", {"a": A_GRS80, "f": F_GRS80, "k0": 0.9996, "lat0": 0.0,
                  "lon0": 173.0, "fe": 1600000.0, "fn": 10000000.0}),
    # NAD83 / Canada Atlas Lambert
    3978: ("lcc", {"a": A_GRS80, "e2": E2_GRS80, "lat1": 49.0, "lat2": 77.0,
                   "lat_f": 49.0, "lon0": -95.0, "fe": 0.0, "fn": 0.0}),
    # WGS 84 / Arctic Polar Stereographic
    3995: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": 71.0, "lon0": 0.0,
                  "fe": 0.0, "fn": 0.0}),
    # WGS 84 / UPS North + South (EPSG method 9810 variant A: scale
    # 0.994 defined AT the pole; EPSG 7-2 worked example exact)
    32661: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": 90.0, "k0": 0.994,
                   "lon0": 0.0, "fe": 2000000.0, "fn": 2000000.0}),
    32761: ("ps", {"a": A_WGS84, "e2": E2, "lat_ts": -90.0, "k0": 0.994,
                   "lon0": 0.0, "fe": 2000000.0, "fn": 2000000.0}),
    # Amersfoort / RD New — oblique ("double") stereographic on Bessel
    # 1841, EPSG method 9809; towgs84 per EPSG tfm 15934 (Amersfoort ->
    # WGS84 ~0.5 m). Worked example EPSG 7-2: 53N 6E (Amersfoort
    # geographic) -> 196105.283 E, 557057.739 N.
    28992: ("sto", {"a": 6377397.155, "e2": None, "lat0": 52.0 + 9.0 / 60 + 22.178 / 3600,
                    "lon0": 5.0 + 23.0 / 60 + 15.5 / 3600, "k0": 0.9999079,
                    "fe": 155000.0, "fn": 463000.0,
                    "towgs84": (565.417, 50.3319, 465.552,
                                -0.398957, 0.343988, -1.87740, 4.0725)}),
}
# Bessel 1841 e2 from 1/f = 299.1528128 (kept exact in one place)
_BESSEL_F = 1.0 / 299.1528128
CRS_REGISTRY[28992][1]["e2"] = _BESSEL_F * (2.0 - _BESSEL_F)

# --- oblique stereographic, conformal-latitude formulation ------------------
#
# PROJ's ``+proj=stere`` oblique aspect (Snyder 1987 §21, eqs. 3-1,
# 21-27..21-29 forward and 21-38..21-40 + iterated 3-4 inverse): the
# ellipsoid maps to the conformal SPHERE BY LATITUDE (chi), then the
# spherical oblique stereographic about (chi1, lam0) with radius scale
# a*m1/cos(chi1). This is DISTINCT from EPSG 9809 (Roussilhe / "double"
# stereographic, ``sterea`` above): both are conformal with scale k0 at
# the origin, so they agree to third order near it — the consistency
# test in tests/test_proj4.py exploits exactly that.


def _conformal_lat(lat, e: float):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    return 2.0 * np.arctan(
        np.tan(np.pi / 4.0 + phi / 2.0)
        * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0)) - np.pi / 2.0


def _stere_obl_constants(p: dict):
    e = float(np.sqrt(p["e2"]))
    phi1 = np.radians(p["lat0"])
    chi1 = float(_conformal_lat(p["lat0"], e))
    m1 = np.cos(phi1) / np.sqrt(1.0 - p["e2"] * np.sin(phi1) ** 2)
    akm1 = 2.0 * p["a"] * p.get("k0", 1.0) * m1  # 2*a*k0*m1
    return e, chi1, akm1, np.radians(p["lon0"])


def stere_obl_forward(lon, lat, p: dict):
    """Oblique/equatorial stereographic forward, conformal-latitude
    formulation (Snyder 21-27..21-29; PROJ stere oblique)."""
    e, chi1, akm1, lam0 = _stere_obl_constants(p)
    chi = _conformal_lat(lat, e)
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    b = np.cos(chi1) * (1.0 + np.sin(chi1) * np.sin(chi)
                        + np.cos(chi1) * np.cos(chi) * np.cos(dlam))
    a_fac = akm1 / b
    x = p["fe"] + a_fac * np.cos(chi) * np.sin(dlam)
    y = p["fn"] + a_fac * (np.cos(chi1) * np.sin(chi)
                           - np.sin(chi1) * np.cos(chi) * np.cos(dlam))
    return x, y


def stere_obl_inverse(x, y, p: dict):
    """Oblique stereographic inverse (Snyder 21-38..21-40; geodetic
    latitude recovered from chi by iterating the isometric latitude)."""
    e, chi1, akm1, lam0 = _stere_obl_constants(p)
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    rho = np.hypot(xp, yp)
    ce = 2.0 * np.arctan(rho * np.cos(chi1) / akm1)
    safe = np.where(rho == 0.0, 1.0, rho)
    chi = np.where(
        rho == 0.0, chi1,
        np.arcsin(np.clip(np.cos(ce) * np.sin(chi1)
                          + yp * np.sin(ce) * np.cos(chi1) / safe,
                          -1.0, 1.0)))
    lam = lam0 + np.arctan2(
        xp * np.sin(ce),
        rho * np.cos(chi1) * np.cos(ce) - yp * np.sin(chi1) * np.sin(ce))
    # chi -> phi: iterate the isometric latitude (same scheme as sto)
    psi = np.log(np.tan(np.pi / 4.0 + chi / 2.0))
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(8):
        sphi = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0)
                       * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
        dphi = ((psi - psi_i) * np.cos(phi)
                * (1.0 - e * e * sphi * sphi) / (1.0 - e * e))
        phi = phi + dphi
        if np.all(np.abs(dphi) < 1e-14):
            break
    return np.degrees(lam), np.degrees(phi)


_KIND_FWD = {"laea": laea_forward, "ps": ps_forward, "lcc": lcc_forward,
             "tm": tm_forward_generic, "aea": aea_forward, "eqc": eqc_forward,
             "laea_polar": laea_polar_forward, "moll": mollweide_forward,
             "sto": stere_oblique_forward, "stere_obl": stere_obl_forward}
_KIND_INV = {"laea": laea_inverse, "ps": ps_inverse, "lcc": lcc_inverse,
             "tm": tm_inverse_generic, "aea": aea_inverse, "eqc": eqc_inverse,
             "laea_polar": laea_polar_inverse, "moll": mollweide_inverse,
             "sto": stere_oblique_inverse, "stere_obl": stere_obl_inverse}


# --- CRS registry / generic transform --------------------------------------


def _kernel_fwd(lon, lat, kind: str, p: dict):
    """Forward kernel dispatch + the optional non-metre unit scaling
    (proj4 +units / +to_meter: E_unit = E_m / to_m, PROJ semantics —
    false easting is metres, the conversion applies to the output)."""
    x, y = _KIND_FWD[kind](lon, lat, p)
    to_m = p.get("to_m")
    if to_m:
        return np.asarray(x, dtype=np.float64) / to_m, \
            np.asarray(y, dtype=np.float64) / to_m
    return x, y


def _kernel_inv(x, y, kind: str, p: dict):
    to_m = p.get("to_m")
    if to_m:
        x = np.asarray(x, dtype=np.float64) * to_m
        y = np.asarray(y, dtype=np.float64) * to_m
    return _KIND_INV[kind](x, y, p)


def _to_lonlat(x, y, epsg: int):
    from .layout import mercator_to_lonlat

    if epsg == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if epsg == 3857:
        return mercator_to_lonlat(x, y)
    if epsg in CRS_REGISTRY:
        kind, p = CRS_REGISTRY[epsg]
        lon, lat = _kernel_inv(x, y, kind, p)
        if "towgs84" in p or "nadgrids" in p:
            lon, lat = _datum_to_wgs84(lon, lat, kind, p)
        return lon, lat
    lon0, fn = _utm_params(epsg)
    return tm_inverse(x, y, lon0, fn)


def _from_lonlat(lon, lat, epsg: int):
    from .layout import lonlat_to_mercator

    if epsg == 4326:
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if epsg == 3857:
        return lonlat_to_mercator(lon, lat)
    if epsg in CRS_REGISTRY:
        kind, p = CRS_REGISTRY[epsg]
        if "towgs84" in p or "nadgrids" in p:
            lon, lat = _datum_from_wgs84(lon, lat, kind, p)
        return _kernel_fwd(lon, lat, kind, p)
    lon0, fn = _utm_params(epsg)
    return tm_forward(lon, lat, lon0, fn)


def registry_snapshot(*epsgs: int) -> dict:
    """Pickle-able snapshot of the registry entries for the given codes
    (empty for built-ins). Operators whose transforms run INSIDE
    executor UDFs must capture this in the closure and replay it with
    :func:`ensure_entries` — dynamically-minted CRSs (grids/proj4.py)
    live in the driver's registry only; executor worker processes
    re-import this module fresh."""
    return {e: CRS_REGISTRY[e] for e in epsgs if e in CRS_REGISTRY}


def ensure_entries(snapshot: dict) -> None:
    """Replay a :func:`registry_snapshot` into this process's registry
    (no-op for already-known codes). Safe to call per Arrow batch."""
    for code, entry in snapshot.items():
        if code not in CRS_REGISTRY:
            CRS_REGISTRY[code] = entry


def project_geodetic(lon, lat, epsg: int):
    """Projection-only forward: NATIVE-datum geographic coordinates
    (e.g. OSGB36 lat/lon for 27700) -> projected E/N, skipping the datum
    shift. :func:`transform` from 4326 is the datum-aware path."""
    if epsg in CRS_REGISTRY:
        kind, p = CRS_REGISTRY[epsg]
        return _kernel_fwd(lon, lat, kind, p)
    return _from_lonlat(lon, lat, epsg)


def inverse_geodetic(x, y, epsg: int):
    """Projection-only inverse: projected E/N -> NATIVE-datum geographic
    coordinates (no datum shift)."""
    if epsg in CRS_REGISTRY:
        kind, p = CRS_REGISTRY[epsg]
        return _kernel_inv(x, y, kind, p)
    return _to_lonlat(x, y, epsg)


def transform(x, y, src_epsg: int, dst_epsg: int):
    """Vectorized coordinate transform between any two supported CRS
    (4326, 3857, UTM 326xx/327xx), routed through lon/lat."""
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_lonlat(x, y, src_epsg)
    return _from_lonlat(lon, lat, dst_epsg)


def reproject_extent(
    extent: tuple[float, float, float, float], src_epsg: int, dst_epsg: int,
    densify: int = 21,
):
    """Extent → envelope of the densified boundary in the target CRS (the
    GDAL-style edge-sampling rule — corners alone under-cover curved
    edges)."""
    xmin, ymin, xmax, ymax = extent
    s = np.linspace(0.0, 1.0, densify)
    xs = np.concatenate([
        xmin + s * (xmax - xmin), np.full(densify, xmax),
        xmax - s * (xmax - xmin), np.full(densify, xmin),
    ])
    ys = np.concatenate([
        np.full(densify, ymin), ymin + s * (ymax - ymin),
        np.full(densify, ymax), ymax - s * (ymax - ymin),
    ])
    tx, ty = transform(xs, ys, src_epsg, dst_epsg)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


def warp_block(
    a: np.ndarray,
    src_extent: tuple[float, float, float, float],
    src_epsg: int,
    dst_extent: tuple[float, float, float, float],
    dst_epsg: int,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
) -> np.ndarray:
    """Inverse-mapping warp of one raster block (the per-tile kernel of
    ``operators.reproject``): each target pixel center transforms back to
    source coordinates and samples nearest/bilinear; outside the source
    grid → NaN."""
    h, w = a.shape
    sx0, sy0, sx1, sy1 = src_extent
    dx0, dy0, dx1, dy1 = dst_extent
    cx = dx0 + (np.arange(out_w, dtype=np.float64) + 0.5) * (dx1 - dx0) / out_w
    cy = dy1 - (np.arange(out_h, dtype=np.float64) + 0.5) * (dy1 - dy0) / out_h
    CX, CY = np.meshgrid(cx, cy)
    sxx, syy = transform(CX.ravel(), CY.ravel(), dst_epsg, src_epsg)
    # fractional source pixel coords (cell-center convention)
    fx = (sxx - sx0) / (sx1 - sx0) * w - 0.5
    fy = (sy1 - syy) / (sy1 - sy0) * h - 0.5
    out = np.full(out_h * out_w, np.nan)
    if method == "nearest":
        ix = np.round(fx).astype(np.int64)
        iy = np.round(fy).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out[ok] = a[iy[ok], ix[ok]]
    else:  # bilinear
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        ok = (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
        x0c = np.clip(x0, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        wx = np.clip(fx - x0, 0.0, 1.0)
        wy = np.clip(fy - y0, 0.0, 1.0)
        v = (
            a[y0c, x0c] * (1 - wy) * (1 - wx)
            + a[y0c, x1c] * (1 - wy) * wx
            + a[y1c, x0c] * wy * (1 - wx)
            + a[y1c, x1c] * wy * wx
        )
        out[ok] = v[ok]
    return out.reshape(out_h, out_w)


# --- Hotine oblique Mercator, variant B (EPSG method 9815) ------------------
#
# EPSG Guidance 7-2 §1.3.6 (also Snyder 1987 §9): the aposphere-based
# oblique Mercator about an initial line through the projection centre
# (phi_c, lam_c) at azimuth alpha_c, scale k_c on the line; variant B
# places the false grid coordinates AT THE PROJECTION CENTRE (the
# Timbalai / RSO family; PROJ +proj=omerc without +no_off). Validated
# structurally (centre -> (Ec, Nc) exactly, initial-line direction,
# k = k_c on the centre, roundtrip) in tests/test_proj4.py.


def _omerc_constants(p: dict):
    a, e2 = p["a"], p["e2"]
    e = np.sqrt(e2)
    phic = np.radians(p["lat0"])
    alc = np.radians(p["alpha"])
    gmc = np.radians(p.get("gamma", p["alpha"]))
    kc = p.get("k0", 1.0)
    s, c = np.sin(phic), np.cos(phic)
    B = np.sqrt(1.0 + e2 * c ** 4 / (1.0 - e2))
    A = a * B * kc * np.sqrt(1.0 - e2) / (1.0 - e2 * s * s)
    t0 = (np.tan(np.pi / 4.0 - phic / 2.0)
          / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
    D = B * np.sqrt(1.0 - e2) / (c * np.sqrt(1.0 - e2 * s * s))
    D2 = max(D * D, 1.0)
    sign = 1.0 if p["lat0"] >= 0 else -1.0
    Fc = D + np.sqrt(D2 - 1.0) * sign
    H = Fc * t0 ** B
    G = (Fc - 1.0 / Fc) / 2.0
    g0 = np.arcsin(np.sin(alc) / D)
    lam0 = np.radians(p["lon0"]) - np.arcsin(G * np.tan(g0)) / B
    uc = ((A / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(alc)) * sign)
    return e, B, A, H, g0, lam0, gmc, uc


def omerc_forward(lon, lat, p: dict):
    e, B, A, H, g0, lam0, gmc, uc = _omerc_constants(p)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    t = (np.tan(np.pi / 4.0 - phi / 2.0)
         / ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
    Q = H / t ** B
    S = (Q - 1.0 / Q) / 2.0
    Tq = (Q + 1.0 / Q) / 2.0
    dl = B * (np.radians(np.asarray(lon, dtype=np.float64)) - lam0)
    V = np.sin(dl)
    U = (-V * np.cos(g0) + S * np.sin(g0)) / Tq
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(S * np.cos(g0) + V * np.sin(g0), np.cos(dl)) / B
    if not p.get("no_off"):  # variant B: natural origin at the centre
        u = u - np.abs(uc) * (1.0 if p["lat0"] >= 0 else -1.0)
    x = p["fe"] + v * np.cos(gmc) + u * np.sin(gmc)
    y = p["fn"] + u * np.cos(gmc) - v * np.sin(gmc)
    return x, y


def omerc_inverse(x, y, p: dict):
    e, B, A, H, g0, lam0, gmc, uc = _omerc_constants(p)
    xp = np.asarray(x, dtype=np.float64) - p["fe"]
    yp = np.asarray(y, dtype=np.float64) - p["fn"]
    v = xp * np.cos(gmc) - yp * np.sin(gmc)
    u = yp * np.cos(gmc) + xp * np.sin(gmc)
    if not p.get("no_off"):
        u = u + np.abs(uc) * (1.0 if p["lat0"] >= 0 else -1.0)
    Qp = np.exp(-B * v / A)
    Sp = (Qp - 1.0 / Qp) / 2.0
    Tp = (Qp + 1.0 / Qp) / 2.0
    Vp = np.sin(B * u / A)
    Up = (Vp * np.cos(g0) + Sp * np.sin(g0)) / Tp
    tp = (H / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / B)
    chi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    # chi -> phi by iterating the isometric latitude (shared scheme)
    psi = np.log(np.tan(np.pi / 4.0 + chi / 2.0))
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(8):
        sphi = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0)
                       * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
        dphi = ((psi - psi_i) * np.cos(phi)
                * (1.0 - e * e * sphi * sphi) / (1.0 - e * e))
        phi = phi + dphi
        if np.all(np.abs(dphi) < 1e-14):
            break
    lam = lam0 - np.arctan2(Sp * np.cos(g0) - Vp * np.sin(g0),
                            np.cos(B * u / A)) / B
    return np.degrees(lam), np.degrees(phi)


_KIND_FWD["omerc"] = omerc_forward
_KIND_INV["omerc"] = omerc_inverse
