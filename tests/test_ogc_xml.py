"""OGC capabilities XML (ogc_xml.py): WMS 1.3.0 / WMTS 1.0.0 documents
rendered from Engine.describe(), parsed back with ElementTree."""

import xml.etree.ElementTree as ET

from geotrellis_server_spark import ogc_xml
from geotrellis_server_spark.engine import Engine, Layer
from geotrellis_server_spark.operators import tiling
from geotrellis_server_spark.sources import synth

WMS = "{http://www.opengis.net/wms}"
WMTS = "{http://www.opengis.net/wmts/1.0}"
OWS = "{http://www.opengis.net/ows/1.1}"
XLINK = "{http://www.w3.org/1999/xlink}"


def _engine(spark):
    docs = synth.extract_geometry(synth.docs(spark, 500))
    tiles = tiling.rasterize_count(docs, 2, tile_size=8)
    poles = {0.0: (0, 0, 255, 255), 9.0: (255, 0, 0, 255)}
    return Engine(spark, {
        "density": Layer("density", tiles),
        "styled": Layer("styled", tiles, style={"poles": poles}),
    })


def test_wms_capabilities_round_trips(spark):
    xml = ogc_xml.wms_capabilities(_engine(spark).describe(),
                                   service_url="http://example/wms")
    root = ET.fromstring(xml)
    assert root.tag == f"{WMS}WMS_Capabilities"
    assert root.get("version") == "1.3.0"
    # the three operations with GET endpoints (CapabilitiesView parity)
    req = root.find(f"{WMS}Capability/{WMS}Request")
    for op in ("GetCapabilities", "GetMap", "GetFeatureInfo"):
        node = req.find(f"{WMS}{op}")
        href = node.find(
            f"{WMS}DCPType/{WMS}HTTP/{WMS}Get/{WMS}OnlineResource"
        ).get(f"{XLINK}href")
        assert href == "http://example/wms"
    layers = root.findall(f"{WMS}Capability/{WMS}Layer/{WMS}Layer")
    by_name = {l.find(f"{WMS}Name").text: l for l in layers}
    assert set(by_name) == {"density", "styled"}
    # CRS list carries the registry (spot-check hub + a registry code)
    crs = {c.text for c in by_name["density"].findall(f"{WMS}CRS")}
    assert {"EPSG:4326", "EPSG:3857", "EPSG:3035"} <= crs
    # geographic bbox is the layer extent REPROJECTED to lon/lat
    bb = by_name["density"].find(f"{WMS}EX_GeographicBoundingBox")
    w = float(bb.find(f"{WMS}westBoundLongitude").text)
    e = float(bb.find(f"{WMS}eastBoundLongitude").text)
    assert -180.001 <= w < e <= 180.001
    # styled layer advertises its LegendURL; unstyled does not
    assert by_name["density"].find(f"{WMS}Style") is None
    leg = by_name["styled"].find(f"{WMS}Style/{WMS}LegendURL")
    assert leg.get("width") == "20"
    assert leg.find(f"{WMS}Format").text == "image/png"


def test_wmts_capabilities_matrix_set(spark):
    from geotrellis_server_spark.grids.layout import CrsLayoutScheme, Extent

    docs = synth.extract_geometry(synth.docs(spark, 500))
    scheme = CrsLayoutScheme(
        32633, Extent(166021.44, 0.0, 833978.56, 9329005.18), 64)
    pts = tiling.project_to_epsg(docs, 32633)
    tiles = tiling.rasterize_count_layout(pts, scheme, 2)
    eng = Engine(spark, {"utm": Layer("utm", tiles, scheme=scheme)})
    xml = ogc_xml.wmts_capabilities(eng.describe())
    root = ET.fromstring(xml)
    lay = root.find(f"{WMTS}Contents/{WMTS}Layer")
    assert lay.find(f"{OWS}Identifier").text == "utm"
    link = lay.find(f"{WMTS}TileMatrixSetLink/{WMTS}TileMatrixSet").text
    tms = root.find(f"{WMTS}Contents/{WMTS}TileMatrixSet")
    assert tms.find(f"{OWS}Identifier").text == link == "custom_32633"
    assert tms.find(f"{OWS}SupportedCRS").text.endswith("32633")
    tm = tms.findall(f"{WMTS}TileMatrix")
    assert len(tm) >= 1
    one = tm[0]
    assert one.find(f"{WMTS}TileWidth").text == "64"
    assert float(one.find(f"{WMTS}ScaleDenominator").text) > 0
    # matrix dims are positive ints
    assert int(one.find(f"{WMTS}MatrixWidth").text) >= 1
    assert int(one.find(f"{WMTS}MatrixHeight").text) >= 1


def test_wcs_capabilities_and_describe_coverage(spark):
    xml = ogc_xml.wcs_capabilities(_engine(spark).describe())
    WCS = "{http://www.opengis.net/wcs/1.1.1}"
    root = ET.fromstring(xml)
    ops = {o.get("name") for o in root.findall(
        f"{OWS}OperationsMetadata/{OWS}Operation")}
    assert ops == {"GetCapabilities", "DescribeCoverage", "GetCoverage"}
    ids = {c.find(f"{WCS}Identifier").text for c in root.findall(
        f"{WCS}Contents/{WCS}CoverageSummary")}
    assert ids == {"density", "styled"}

    desc = ET.fromstring(ogc_xml.wcs_describe_coverage(
        _engine(spark).describe(), identifiers=["density"]))
    cds = desc.findall(f"{WCS}CoverageDescription")
    assert len(cds) == 1 and cds[0].find(f"{WCS}Identifier").text == "density"
    # axis order: WCS 1.1 EPSG:4326 bbox is lat/lon
    low = cds[0].find(
        f"{WCS}Domain/{WCS}SpatialDomain/{OWS}BoundingBox/{OWS}LowerCorner")
    lat, lon = (float(v) for v in low.text.split())
    assert -90 <= lat <= 90 and -180 <= lon <= 180
    crs = {c.text for c in cds[0].findall(f"{WCS}SupportedCRS")}
    assert "EPSG:4326" in crs and "EPSG:32633" in crs  # enumerated UTM
