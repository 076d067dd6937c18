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
    # every layer carries a Style with the mandatory Name + Title pair
    # (WMS 1.3.0 7.2.4.6.12); only the styled layer adds a LegendURL
    for lay in by_name.values():
        st = lay.find(f"{WMS}Style")
        assert st.find(f"{WMS}Name").text == "default"
        assert st.find(f"{WMS}Title").text == "default"
    assert by_name["density"].find(f"{WMS}Style/{WMS}LegendURL") is None
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
    # xsd ordering: Title, WGS84BoundingBox, THEN Identifier; and the
    # mandatory default Style element is present
    tags = [c.tag for c in lay]
    assert tags.index(f"{OWS}WGS84BoundingBox") < tags.index(f"{OWS}Identifier")
    st = lay.find(f"{WMTS}Style")
    assert st.get("isDefault") == "true"
    assert st.find(f"{OWS}Identifier").text == "default"
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


GML = "{http://www.opengis.net/gml}"
WFS = "{http://www.opengis.net/wfs}"


def test_wfs_feature_collection_polygon_and_point():
    ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    xml = ogc_xml.wfs_feature_collection(
        [
            {"geom": {"polygon": ring}, "properties": {"zone": "a", "n": 3}},
            {"geom": {"point": (10.0, 20.0)},
             "properties": {"value": 7.5, "meta": {"band": 0}}},
        ],
        crs_epsg=4326, cell_size=(0.5, 0.25),
    )
    root = ET.fromstring(xml)
    assert root.tag == f"{WFS}FeatureCollection"
    members = root.findall(f"{GML}featureMember")
    assert len(members) == 2

    # feature 1: polygon passes through verbatim
    f1 = members[0].find(f"{WFS}PixelPerBandFeature")
    mp = f1.find(f"{WFS}Geometry/{GML}MultiPolygon")
    assert mp.get("srsName") == "urn:ogc:def:crs:EPSG::4326"
    coords = mp.find(f"{GML}polygonMember/{GML}Polygon/{GML}exterior/"
                     f"{GML}LinearRing/{GML}coordinates")
    assert coords.get("cs") == "," and coords.get("ts") == " "
    pts = [tuple(float(v) for v in p.split(","))
           for p in coords.text.split(" ")]
    assert pts == ring
    assert f1.find(f"{WFS}zone").text == "a"
    assert f1.find(f"{WFS}n").text == "3"

    # feature 2: point expands to the cell-size rectangle (closed ring,
    # the reference's +-w/+-h pixel footprint); nested dicts flatten
    f2 = members[1].find(f"{WFS}PixelPerBandFeature")
    c2 = f2.find(f"{WFS}Geometry/{GML}MultiPolygon/{GML}polygonMember/"
                 f"{GML}Polygon/{GML}exterior/{GML}LinearRing/"
                 f"{GML}coordinates")
    pts2 = [tuple(float(v) for v in p.split(","))
            for p in c2.text.split(" ")]
    assert pts2[0] == pts2[-1] == (9.5, 19.75)
    assert (10.5, 20.25) in pts2
    assert f2.find(f"{WFS}value").text == "7.5"
    assert f2.find(f"{WFS}band").text == "0"


def test_get_feature_info_xml_infoformat(spark):
    eng = _engine(spark)
    # application/json InfoFormat: a GeoJSON FeatureCollection string
    import json

    js = json.loads(eng.get_feature_info(
        "density", [(0.0, 0.0)], zoom=2, info_format="application/json"))
    assert js["type"] == "FeatureCollection"
    assert js["features"][0]["geometry"]["coordinates"] == [0.0, 0.0]

    # text/xml InfoFormat: WFS FeatureCollection with the sampled value
    xml = eng.get_feature_info(
        "density", [(0.0, 0.0)], zoom=2, info_format="text/xml")
    root = ET.fromstring(xml)
    feat = root.find(f"{GML}featureMember/{WFS}PixelPerBandFeature")
    assert feat.find(f"{WFS}point_id").text == "0"
    assert feat.find(f"{WFS}value") is not None
    # the pixel footprint is a closed 5-point ring around the point
    coords = feat.find(
        f"{WFS}Geometry/{GML}MultiPolygon/{GML}polygonMember/{GML}Polygon/"
        f"{GML}exterior/{GML}LinearRing/{GML}coordinates")
    assert len(coords.text.split(" ")) == 5

    import pytest

    with pytest.raises(ValueError):
        eng.get_feature_info("density", [(0.0, 0.0)], 2,
                             info_format="text/html")
