"""OGC capabilities XML rendering — WMS 1.3.0 + WMTS 1.0.0 documents
built from ``Engine.describe()``.

Reference parity: ogc/src/main/scala/geotrellis/server/ogc/wms/
CapabilitiesView.scala:50-137 (WMS_Capabilities via scalaxb) and
wmts/CapabilitiesView.scala (tile matrix sets). SURVEY §2.1 S11 chose
``describe()`` dicts as the primary metadata surface; this module is
the XML SERIALIZATION of that same data for clients that speak the OGC
protocols (QGIS, Leaflet WMS plugins, anything pointing at
GetCapabilities), built with stdlib ElementTree — schema-shaped per the
public OGC specs (WMS 1.3.0 ch. 7.2.4, WMTS 1.0 ch. 7.1.1), no JVM XML
stack."""

from __future__ import annotations

import xml.etree.ElementTree as ET

WMS_NS = "http://www.opengis.net/wms"
XLINK_NS = "http://www.w3.org/1999/xlink"
OWS_NS = "http://www.opengis.net/ows/1.1"
WMTS_NS = "http://www.opengis.net/wmts/1.0"


def _sub(parent, tag, text=None, **attrs):
    el = ET.SubElement(parent, tag, attrs)
    if text is not None:
        el.text = str(text)
    return el


def _geographic_extent(e: dict) -> tuple:
    """Layer extent (in the layer's native CRS — describe()'s
    ``crs_epsg``: 3857 for standard pyramids, a GeoTIFF source's file
    CRS, or the matrix set's) -> lon/lat for the WGS84/geographic
    bounding-box elements all three services require."""
    from .grids.proj import reproject_extent

    epsg = e.get("crs_epsg") or (e.get("matrix_set") or {}).get(
        "crs_epsg", 3857)
    if epsg == 4326:
        return tuple(e["extent"])
    return reproject_extent(tuple(e["extent"]), epsg, 4326)


def _crs_strings(request_crs: list) -> list[str]:
    out = []
    for c in request_crs:
        if isinstance(c, int):
            out.append(f"EPSG:{c}")
        elif str(c).startswith("utm:"):
            # WMS 1.3.0 requires one CRS identifier per <CRS> element —
            # enumerate every UTM zone the engine serves (range strings
            # are not matchable by real clients)
            out.extend(f"EPSG:{z}" for z in range(32601, 32661))
            out.extend(f"EPSG:{z}" for z in range(32701, 32761))
    return out


def wms_capabilities(
    describe_entries: list[dict], service_url: str = "http://localhost/wms",
    title: str = "geotrellis_server_spark",
) -> str:
    """WMS 1.3.0 GetCapabilities XML from Engine.describe() output."""
    ET.register_namespace("", WMS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.Element(f"{{{WMS_NS}}}WMS_Capabilities", {"version": "1.3.0"})

    svc = _sub(root, f"{{{WMS_NS}}}Service")
    _sub(svc, f"{{{WMS_NS}}}Name", "WMS")
    _sub(svc, f"{{{WMS_NS}}}Title", title)
    _sub(svc, f"{{{WMS_NS}}}OnlineResource",
         **{f"{{{XLINK_NS}}}href": service_url})

    cap = _sub(root, f"{{{WMS_NS}}}Capability")
    req = _sub(cap, f"{{{WMS_NS}}}Request")
    for op, formats in (
        ("GetCapabilities", ["text/xml"]),
        ("GetMap", ["image/png", "image/jpeg", "image/geotiff"]),
        ("GetFeatureInfo", ["application/json", "text/xml"]),
    ):
        o = _sub(req, f"{{{WMS_NS}}}{op}")
        for f in formats:
            _sub(o, f"{{{WMS_NS}}}Format", f)
        dcp = _sub(_sub(_sub(o, f"{{{WMS_NS}}}DCPType"),
                        f"{{{WMS_NS}}}HTTP"), f"{{{WMS_NS}}}Get")
        _sub(dcp, f"{{{WMS_NS}}}OnlineResource",
             **{f"{{{XLINK_NS}}}href": service_url})
    exc = _sub(cap, f"{{{WMS_NS}}}Exception")
    for code in ("XML", "INIMAGE", "BLANK", "JSON"):
        _sub(exc, f"{{{WMS_NS}}}Format", code)

    parent = _sub(cap, f"{{{WMS_NS}}}Layer")
    _sub(parent, f"{{{WMS_NS}}}Title", title)
    for e in describe_entries:
        lay = _sub(parent, f"{{{WMS_NS}}}Layer", queryable="1")
        _sub(lay, f"{{{WMS_NS}}}Name", e["name"])
        _sub(lay, f"{{{WMS_NS}}}Title", e["name"])
        for crs in _crs_strings(e.get("request_crs", [])):
            _sub(lay, f"{{{WMS_NS}}}CRS", crs)
        xmin, ymin, xmax, ymax = _geographic_extent(e)
        bb = _sub(lay, f"{{{WMS_NS}}}EX_GeographicBoundingBox")
        _sub(bb, f"{{{WMS_NS}}}westBoundLongitude", xmin)
        _sub(bb, f"{{{WMS_NS}}}eastBoundLongitude", xmax)
        _sub(bb, f"{{{WMS_NS}}}southBoundLatitude", ymin)
        _sub(bb, f"{{{WMS_NS}}}northBoundLatitude", ymax)
        # WMS 1.3.0 7.2.4.6.12: Style requires Name AND Title children
        # (reference wms/CapabilitiesView.scala:173 emits both)
        st = _sub(lay, f"{{{WMS_NS}}}Style")
        _sub(st, f"{{{WMS_NS}}}Name", "default")
        _sub(st, f"{{{WMS_NS}}}Title", "default")
        if e.get("legend"):
            leg = e["legend"]
            lg = _sub(st, f"{{{WMS_NS}}}LegendURL",
                      width=str(leg["width"]), height=str(leg["height"]))
            _sub(lg, f"{{{WMS_NS}}}Format", leg["format"])
            _sub(lg, f"{{{WMS_NS}}}OnlineResource",
                 **{f"{{{XLINK_NS}}}href": leg["online_resource"]})
    return ET.tostring(root, encoding="unicode", xml_declaration=True)


def wmts_capabilities(
    describe_entries: list[dict], service_url: str = "http://localhost/wmts",
    title: str = "geotrellis_server_spark",
) -> str:
    """WMTS 1.0.0 GetCapabilities XML: layers + TileMatrixSet blocks
    from the ``matrix_set`` metadata (GeotrellisTileMatrix analog)."""
    ET.register_namespace("", WMTS_NS)
    ET.register_namespace("ows", OWS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.Element(f"{{{WMTS_NS}}}Capabilities", {"version": "1.0.0"})
    ident = _sub(root, f"{{{OWS_NS}}}ServiceIdentification")
    _sub(ident, f"{{{OWS_NS}}}Title", title)
    _sub(ident, f"{{{OWS_NS}}}ServiceType", "OGC WMTS")

    contents = _sub(root, f"{{{WMTS_NS}}}Contents")
    matrix_sets = {}
    for e in describe_entries:
        lay = _sub(contents, f"{{{WMTS_NS}}}Layer")
        _sub(lay, f"{{{OWS_NS}}}Title", e["name"])
        # wmtsGetCapabilities_response.xsd DatasetDescriptionSummary
        # ordering: WGS84BoundingBox BEFORE Identifier; a Style element
        # is mandatory (reference wmts/CapabilitiesView.scala:208-214)
        xmin, ymin, xmax, ymax = _geographic_extent(e)
        bb = _sub(lay, f"{{{OWS_NS}}}WGS84BoundingBox")
        _sub(bb, f"{{{OWS_NS}}}LowerCorner", f"{xmin} {ymin}")
        _sub(bb, f"{{{OWS_NS}}}UpperCorner", f"{xmax} {ymax}")
        _sub(lay, f"{{{OWS_NS}}}Identifier", e["name"])
        st = _sub(lay, f"{{{WMTS_NS}}}Style", isDefault="true")
        _sub(st, f"{{{OWS_NS}}}Identifier", "default")
        for fmt in e.get("formats", ["image/png"]):
            if fmt.startswith("image/"):
                _sub(lay, f"{{{WMTS_NS}}}Format", fmt)
        ms = e.get("matrix_set")
        ms_id = (f"custom_{ms['crs_epsg']}" if ms
                 else "GoogleMapsCompatible")
        _sub(_sub(lay, f"{{{WMTS_NS}}}TileMatrixSetLink"),
             f"{{{WMTS_NS}}}TileMatrixSet", ms_id)
        if ms and ms_id not in matrix_sets:
            matrix_sets[ms_id] = ms
    for ms_id, ms in matrix_sets.items():
        tms = _sub(contents, f"{{{WMTS_NS}}}TileMatrixSet")
        _sub(tms, f"{{{OWS_NS}}}Identifier", ms_id)
        _sub(tms, f"{{{OWS_NS}}}SupportedCRS",
             f"urn:ogc:def:crs:EPSG::{ms['crs_epsg']}")
        for lvl in ms.get("matrices", []):
            tm = _sub(tms, f"{{{WMTS_NS}}}TileMatrix")
            _sub(tm, f"{{{OWS_NS}}}Identifier", lvl["zoom"])
            _sub(tm, f"{{{WMTS_NS}}}ScaleDenominator",
                 lvl["scale_denominator"])
            _sub(tm, f"{{{WMTS_NS}}}TopLeftCorner",
                 f"{ms['extent'][0]} {ms['extent'][3]}")
            _sub(tm, f"{{{WMTS_NS}}}TileWidth", ms["tile_size"])
            _sub(tm, f"{{{WMTS_NS}}}TileHeight", ms["tile_size"])
            _sub(tm, f"{{{WMTS_NS}}}MatrixWidth", lvl["cols"])
            _sub(tm, f"{{{WMTS_NS}}}MatrixHeight", lvl["rows"])
    return ET.tostring(root, encoding="unicode", xml_declaration=True)


WCS_NS = "http://www.opengis.net/wcs/1.1.1"


def wcs_capabilities(
    describe_entries: list[dict], service_url: str = "http://localhost/wcs",
    title: str = "geotrellis_server_spark",
) -> str:
    """WCS 1.1.1 GetCapabilities XML (reference wcs/CapabilitiesView
    .scala: OperationsMetadata for GetCapabilities / DescribeCoverage /
    GetCoverage + a CoverageSummary per layer)."""
    ET.register_namespace("", WCS_NS)
    ET.register_namespace("ows", OWS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.Element(f"{{{WCS_NS}}}Capabilities", {"version": "1.1.1"})
    ident = _sub(root, f"{{{OWS_NS}}}ServiceIdentification")
    _sub(ident, f"{{{OWS_NS}}}Title", title)
    _sub(ident, f"{{{OWS_NS}}}ServiceType", "OGC WCS")
    ops = _sub(root, f"{{{OWS_NS}}}OperationsMetadata")
    for op in ("GetCapabilities", "DescribeCoverage", "GetCoverage"):
        o = _sub(ops, f"{{{OWS_NS}}}Operation", name=op)
        get = _sub(_sub(_sub(o, f"{{{OWS_NS}}}DCP"), f"{{{OWS_NS}}}HTTP"),
                   f"{{{OWS_NS}}}Get")
        get.set(f"{{{XLINK_NS}}}href", service_url)
    contents = _sub(root, f"{{{WCS_NS}}}Contents")
    for e in describe_entries:
        cov = _sub(contents, f"{{{WCS_NS}}}CoverageSummary")
        _sub(cov, f"{{{OWS_NS}}}Title", e["name"])
        _sub(cov, f"{{{WCS_NS}}}Identifier", e["name"])
        xmin, ymin, xmax, ymax = _geographic_extent(e)
        bb = _sub(cov, f"{{{OWS_NS}}}WGS84BoundingBox")
        _sub(bb, f"{{{OWS_NS}}}LowerCorner", f"{xmin} {ymin}")
        _sub(bb, f"{{{OWS_NS}}}UpperCorner", f"{xmax} {ymax}")
    return ET.tostring(root, encoding="unicode", xml_declaration=True)


def wcs_describe_coverage(
    describe_entries: list[dict], identifiers: list[str] | None = None,
) -> str:
    """WCS 1.1.1 DescribeCoverage XML (reference wcs/CoverageView.scala:
    per-coverage domain + supported CRS/format blocks)."""
    ET.register_namespace("", WCS_NS)
    ET.register_namespace("ows", OWS_NS)
    root = ET.Element(f"{{{WCS_NS}}}CoverageDescriptions",
                      {"version": "1.1.1"})
    wanted = set(identifiers) if identifiers else None
    for e in describe_entries:
        if wanted is not None and e["name"] not in wanted:
            continue
        cd = _sub(root, f"{{{WCS_NS}}}CoverageDescription")
        _sub(cd, f"{{{OWS_NS}}}Title", e["name"])
        _sub(cd, f"{{{WCS_NS}}}Identifier", e["name"])
        dom = _sub(cd, f"{{{WCS_NS}}}Domain")
        sp = _sub(dom, f"{{{WCS_NS}}}SpatialDomain")
        xmin, ymin, xmax, ymax = _geographic_extent(e)
        bb = _sub(sp, f"{{{OWS_NS}}}BoundingBox",
                  crs="urn:ogc:def:crs:EPSG::4326")
        _sub(bb, f"{{{OWS_NS}}}LowerCorner", f"{ymin} {xmin}")
        _sub(bb, f"{{{OWS_NS}}}UpperCorner", f"{ymax} {xmax}")
        for crs in _crs_strings(e.get("request_crs", [])):
            _sub(cd, f"{{{WCS_NS}}}SupportedCRS", crs)
        for fmt in e.get("formats", []):
            if fmt.startswith("image/"):
                _sub(cd, f"{{{WCS_NS}}}SupportedFormat", fmt)
    return ET.tostring(root, encoding="unicode", xml_declaration=True)


# -- WFS FeatureCollection / GetFeatureInfo XML InfoFormat -------------------

WFS_NS = "http://www.opengis.net/wfs"
GML_NS = "http://www.opengis.net/gml"


def _coords_text(ring: list[tuple]) -> str:
    """GML <coordinates> payload: cs="," between x,y, ts=" " between
    points (the attribute values the reference emits,
    ogc/.../wfs/WfsFeatureCollection.scala:121-139)."""
    return " ".join(f"{float(x):g},{float(y):g}" for x, y in ring)


def _feature_polygons(geom, cell_w: float, cell_h: float) -> list[list[tuple]]:
    """Normalize a feature geometry to exterior rings.

    Accepts ``{"point": (x, y)}`` (expanded to a cell-size rectangle, the
    reference's GetFeatureInfo pixel footprint), ``{"polygon": ring}`` or
    ``{"multipolygon": [ring, ...]}`` — reference
    WfsFeatureCollection.scala:82-97 (Point/Polygon/MultiPolygon cases)."""
    if "point" in geom:
        x, y = (float(v) for v in geom["point"])
        w, h = cell_w, cell_h
        return [[(x - w, y - h), (x + w, y - h), (x + w, y + h),
                 (x - w, y + h), (x - w, y - h)]]
    if "polygon" in geom:
        return [list(geom["polygon"])]
    if "multipolygon" in geom:
        return [list(r) for r in geom["multipolygon"]]
    return []


def wfs_feature_collection(
    features: list[dict], crs_epsg: int,
    cell_size: tuple[float, float] = (0.0, 0.0),
) -> str:
    """WFS 1.1 FeatureCollection XML (reference
    ogc/.../wfs/WfsFeatureCollection.scala:46-153).

    Each feature is ``{"geom": {...}, "properties": {...}}``; every
    geometry is wrapped in a gml:MultiPolygon whose srsName is the EPSG
    URN, points expanded by ``cell_size`` — matching the reference's
    PixelPerBandFeature shape. Property values render as
    ``<key>value</key>`` children (the reference's jsonXML flattening);
    nested dicts flatten recursively."""
    ET.register_namespace("", WFS_NS)
    ET.register_namespace("gml", GML_NS)
    ET.register_namespace("ows", OWS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    root = ET.Element(f"{{{WFS_NS}}}FeatureCollection")
    cw, ch = cell_size

    def _props(parent, data: dict):
        for k, v in data.items():
            if isinstance(v, dict):
                _props(parent, v)
            else:
                _sub(parent, str(k), "" if v is None else v)

    for f in features:
        member = _sub(root, f"{{{GML_NS}}}featureMember")
        feat = _sub(member, "PixelPerBandFeature")
        geo = _sub(feat, "Geometry")
        mp = _sub(geo, f"{{{GML_NS}}}MultiPolygon",
                  srsName=f"urn:ogc:def:crs:EPSG::{crs_epsg}")
        for ring in _feature_polygons(f.get("geom", {}), cw, ch):
            pm = _sub(mp, f"{{{GML_NS}}}polygonMember")
            poly = _sub(pm, f"{{{GML_NS}}}Polygon")
            ext = _sub(poly, f"{{{GML_NS}}}exterior")
            lr = _sub(ext, f"{{{GML_NS}}}LinearRing")
            _sub(lr, f"{{{GML_NS}}}coordinates", _coords_text(ring),
                 decimal=".", cs=",", ts=" ")
        _props(feat, f.get("properties", {}))
    return ET.tostring(root, encoding="unicode", xml_declaration=True)


def get_feature_info_xml(rows: list, zoom: int, tile_size: int = 256) -> str:
    """GetFeatureInfo InfoFormat=text/xml: Engine.get_values() rows →
    WFS FeatureCollection (reference InfoFormat.scala XML case routed
    through WfsFeatureCollection, wms/package.scala:97-100). The pixel
    footprint half-width is the cell size at this zoom on the lon/lat
    grid the sampler answers in."""
    cell = 360.0 / ((1 << zoom) * tile_size)
    feats = [
        {"geom": {"point": (r["lon"], r["lat"])},
         "properties": {"point_id": r["point_id"], "value": r["value"]}}
        for r in rows
    ]
    return wfs_feature_collection(feats, 4326, (cell, cell))
