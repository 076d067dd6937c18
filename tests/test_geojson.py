"""GeoJSON source: FeatureCollection + ndjson reads, WKT assembly
round-trips through the engine's own WKT parser."""

import json

from geotrellis_server_spark.sources.geojson import read_geojson


def _fc():
    return {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point",
                          "coordinates": [12.5, -33.25]},
             "properties": {"name": "p1"}},
            {"type": "Feature",
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]]]},
             "properties": {"zone": 7}},
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
             "properties": {}},
            {"type": "Feature",
             "geometry": {"type": "GeometryCollection",
                          "geometries": []},
             "properties": {}},
        ],
    }


def test_read_feature_collection(spark, tmp_path):
    p = tmp_path / "a.geojson"
    p.write_text(json.dumps(_fc()))
    rows = {r.geom_type: r for r in read_geojson(spark, str(p)).collect()}
    assert rows["Point"].wkt == "POINT (12.5000000000 -33.2500000000)"
    assert rows["Polygon"].wkt == (
        "POLYGON ((0.0000000000 0.0000000000, 4.0000000000 0.0000000000,"
        " 4.0000000000 3.0000000000, 0.0000000000 0.0000000000))")
    assert rows["LineString"].wkt.startswith("LINESTRING (0.0000000000")
    assert rows["GeometryCollection"].wkt is None  # honest unsupported
    assert json.loads(rows["Polygon"].properties_json) == {"zone": 7}


def test_ndjson_features_and_wkt_roundtrip(spark, tmp_path):
    feats = _fc()["features"][:2]
    p = tmp_path / "b.ndjson"
    p.write_text("\n".join(json.dumps(f) for f in feats))
    out = read_geojson(spark, str(p)).collect()
    assert len(out) == 2
    # the polygon round-trips through the engine's own WKT parser and
    # shoelace area: right triangle 4 x 3 -> area 6
    from geotrellis_server_spark.geometry.wkt import parse_wkt_polygon

    poly = [r for r in out if r.geom_type == "Polygon"][0]
    ring = parse_wkt_polygon(poly.wkt)
    import numpy as np

    xs, ys = (np.array([pt[0] for pt in ring]),
              np.array([pt[1] for pt in ring]))
    area = 0.5 * abs(np.dot(xs, np.roll(ys, -1))
                     - np.dot(ys, np.roll(xs, -1)))
    assert abs(area - 6.0) < 1e-9
