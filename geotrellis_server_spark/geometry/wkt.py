"""Minimal WKT parsing for zone/geometry inputs — the reference accepts
arbitrary WKT/GeoJSON geometries in queries (QueryF Intersects/Contains
take geotrellis vector Geometry; ogc/.../wcs params parse them from
request strings). This engine's join/mask operators take rings as
``array<array<double>>``; these helpers bridge user-facing WKT to that
shape without shapely (absent in this container).

Supported: POINT, POLYGON (single outer ring; holes rejected loudly),
MULTIPOLYGON parsed as a list of outer rings. Parsing happens driver-side
on zone tables, which are broadcast-small BY CONTRACT (pip_join_poly
collects them anyway); document streams never pass through here.
"""

from __future__ import annotations

import re

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"
_POINT_RE = re.compile(rf"^\s*POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*$", re.I)


def parse_wkt_point(wkt: str) -> tuple[float, float]:
    m = _POINT_RE.match(wkt)
    if not m:
        raise ValueError(f"not a WKT POINT: {wkt!r}")
    return float(m.group(1)), float(m.group(2))


def _parse_ring(body: str) -> list[tuple[float, float]]:
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate pair: {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]  # engine rings are NOT closed (synth.POLY_ZONES convention)
    if len(pts) < 3:
        raise ValueError("polygon ring needs >= 3 distinct points")
    return pts


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """POLYGON ((x y, ...)) → un-closed outer ring. Interior rings are
    rejected (the ray-cast kernel treats one ring per zone; model holes
    as separate negative zones if needed)."""
    s = wkt.strip()
    if not s.upper().startswith("POLYGON"):
        raise ValueError(f"not a WKT POLYGON: {wkt!r}")
    body = s[len("POLYGON"):].strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"malformed WKT POLYGON: {wkt!r}")
    rings = re.findall(r"\(([^()]*)\)", body)
    if not rings:
        raise ValueError(f"malformed WKT POLYGON: {wkt!r}")
    if len(rings) > 1:
        raise ValueError("interior rings (holes) not supported — one ring per zone")
    return _parse_ring(rings[0])


def parse_wkt_multipolygon(wkt: str) -> list[list[tuple[float, float]]]:
    """Every component polygon is parsed (and validated) — a component
    with interior rings raises like parse_wkt_polygon does, instead of
    being silently dropped."""
    s = wkt.strip()
    if not s.upper().startswith("MULTIPOLYGON"):
        raise ValueError(f"not a WKT MULTIPOLYGON: {wkt!r}")
    body = s[len("MULTIPOLYGON"):].strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"malformed WKT MULTIPOLYGON: {wkt!r}")
    # split depth-1 groups (the component polygons) by paren scanning
    inner = body[1:-1]
    comps, depth, start = [], 0, None
    for i, ch in enumerate(inner):
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                comps.append(inner[start : i + 1])
    if depth != 0 or not comps:
        raise ValueError(f"malformed WKT MULTIPOLYGON: {wkt!r}")
    out = []
    for comp in comps:
        rings = re.findall(r"\(([^()]*)\)", comp)
        if not rings:
            raise ValueError(f"malformed WKT MULTIPOLYGON component: {comp!r}")
        if len(rings) > 1:
            raise ValueError("interior rings (holes) not supported — one ring per zone")
        out.append(_parse_ring(rings[0]))
    return out


def zones_from_wkt(spark, rows: list[tuple[int, str]]):
    """[(zone_id, wkt_polygon)] → the poly-zone DataFrame shape
    pip_join_poly consumes (zone_id, ring, xmin..ymax). Driver-side by
    design: zone tables are the broadcast-small side."""
    from pyspark.sql import types as T

    out = []
    for zid, wkt in rows:
        ring = parse_wkt_polygon(wkt)
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        out.append((int(zid), [list(p) for p in ring],
                    min(xs), min(ys), max(xs), max(ys)))
    schema = T.StructType(
        [
            T.StructField("zone_id", T.LongType()),
            T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def polygon_stats(
    df, wkt_col: str = "wkt", id_col: str = "zone_id"
):
    """Vector analytics over a WKT polygon column: planar shoelace area
    (absolute), signed area (CCW positive), vertex count, and area
    centroid — (id, n_vertices, area, signed_area, cx, cy).

    The WKT parse (this module) + the shoelace run vectorized per Arrow
    batch via mapInPandas — a row-local map, no shuffle at any scale.
    Reference analog: geotrellis vector's Polygon.area/centroid (JTS);
    here re-derived from the public shoelace/centroid formulas."""
    import numpy as np
    import pandas as pd

    def mapper(batches):
        for pdf in batches:
            out = {id_col: pdf[id_col], "n_vertices": [], "area": [],
                   "signed_area": [], "cx": [], "cy": []}
            for w in pdf[wkt_col]:
                ring = parse_wkt_polygon(w)
                x = np.array([p[0] for p in ring], dtype=np.float64)
                y = np.array([p[1] for p in ring], dtype=np.float64)
                x2, y2 = np.roll(x, -1), np.roll(y, -1)
                cross = x * y2 - x2 * y
                s2 = cross.sum()  # 2 * signed area
                a = s2 / 2.0
                denom = 3.0 * s2 if s2 != 0.0 else 1.0
                out["n_vertices"].append(len(ring))
                out["signed_area"].append(a)
                out["area"].append(abs(a))
                out["cx"].append(((x + x2) * cross).sum() / denom)
                out["cy"].append(((y + y2) * cross).sum() / denom)
            yield pd.DataFrame(out)

    return df.select(id_col, wkt_col).mapInPandas(
        mapper,
        f"{id_col} BIGINT, n_vertices INT, area DOUBLE, signed_area DOUBLE, "
        "cx DOUBLE, cy DOUBLE",
    )
