"""Declarative engine config (conf.py — ogc-example Conf analog)."""

import json

import numpy as np
import pytest

from geotrellis_server_spark.conf import engine_from_config
from geotrellis_server_spark.operators import tiling
from geotrellis_server_spark.sources import synth


def test_engine_from_config_end_to_end(spark, tmp_path):
    docs = synth.extract_geometry(synth.docs(spark, 1500))
    tiles_path = str(tmp_path / "tiles")
    tiling.rasterize_count(docs, 3, tile_size=8).write.parquet(tiles_path)
    cat_path = str(tmp_path / "cat")
    spark.createDataFrame(
        [("density", -180.0, -85.0, 180.0, 85.0, None, None, None)],
        "name STRING, xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE,"
        " times ARRAY<TIMESTAMP>, t_start TIMESTAMP, t_end TIMESTAMP",
    ).write.parquet(cat_path)

    config = {
        "layers": [
            {"name": "density",
             "source": {"type": "parquet", "path": tiles_path},
             "style": {"poles": {"0.0": [0, 0, 255, 255],
                                 "50.0": [255, 0, 0, 255]}}},
            {"name": "double",
             "algebra": {"symbol": "*", "args": [
                 {"symbol": "rasterV", "name": "d"},
                 {"symbol": "dbl", "value": 2.0}]},
             "parameters": {"d": "density"}},
        ],
        "catalog": {"type": "parquet", "path": cat_path},
    }
    # JSON-string input path (the on-disk config file case)
    eng = engine_from_config(spark, json.dumps(config))
    assert set(eng.layers) == {"density", "double"}

    base = eng.get_tile("density", 3, 4, 3).collect()
    dbl = eng.get_tile("double", 3, 4, 3).collect()
    assert base and dbl
    b = np.array(base[0].cells, dtype=np.float64)
    d = np.array(dbl[0].cells, dtype=np.float64)
    np.testing.assert_allclose(d, b * 2.0)

    # style survived the JSON round-trip (string pole keys -> floats)
    png = eng.get_legend_png("density", width=4, height=16)
    assert png is not None and png[:8] == b"\x89PNG\r\n\x1a\n"
    # catalog bound
    from geotrellis_server_spark.query import ast as Q

    assert eng.find_layers(Q.intersects((0, 0, 1, 1))) == ["density"]


def test_engine_from_config_rejects_bad_refs(spark, tmp_path):
    with pytest.raises(ValueError, match="undefined layer"):
        engine_from_config(spark, {
            "layers": [{"name": "a",
                        "algebra": {"symbol": "rasterV", "name": "x"},
                        "parameters": {"x": "nope"}}]})
    with pytest.raises(ValueError, match="missing from"):
        engine_from_config(spark, {
            "layers": [{"name": "a",
                        "algebra": {"symbol": "rasterV", "name": "x"},
                        "parameters": {}}]})
    with pytest.raises(ValueError, match="unknown source type"):
        engine_from_config(spark, {
            "layers": [{"name": "a", "source": {"type": "wat"}}]})


def test_algebra_layer_composition(spark, tmp_path):
    """A map-algebra layer referencing ANOTHER algebra layer composes
    the expression trees (review r4b finding: binding raw tiles
    silently dropped the referenced math)."""
    docs = synth.extract_geometry(synth.docs(spark, 1000))
    tiles_path = str(tmp_path / "t")
    tiling.rasterize_count(docs, 3, tile_size=8).write.parquet(tiles_path)
    eng = engine_from_config(spark, {
        "layers": [
            {"name": "density",
             "source": {"type": "parquet", "path": tiles_path}},
            {"name": "double",
             "algebra": {"symbol": "*", "args": [
                 {"symbol": "rasterV", "name": "d"},
                 {"symbol": "dbl", "value": 2.0}]},
             "parameters": {"d": "density"}},
            {"name": "quad",
             "algebra": {"symbol": "*", "args": [
                 {"symbol": "rasterV", "name": "q"},
                 {"symbol": "dbl", "value": 2.0}]},
             "parameters": {"q": "double"}},
        ]})
    base = eng.get_tile("density", 3, 4, 3).collect()
    quad = eng.get_tile("quad", 3, 4, 3).collect()
    assert base and quad
    b = np.array(base[0].cells, dtype=np.float64)
    q = np.array(quad[0].cells, dtype=np.float64)
    np.testing.assert_allclose(q, b * 4.0)  # x4, not x2


def test_constant_algebra_layer_rejected(spark):
    with pytest.raises(ValueError, match="at least one raster"):
        engine_from_config(spark, {
            "layers": [{"name": "two",
                        "algebra": {"symbol": "dbl", "value": 2.0}}]})


def test_geotiff_layer_capabilities_keep_file_crs(spark, tmp_path):
    """A 4326 GeoTIFF layer's capabilities bbox must NOT be reprojected
    as if its degree extents were web-mercator metres."""
    import xml.etree.ElementTree as ET

    from geotrellis_server_spark import ogc_xml
    from geotrellis_server_spark.sources.gtiff import encode_geotiff

    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    p = tmp_path / "deg.tif"
    p.write_bytes(encode_geotiff(arr, (-120.0, 30.0, -100.0, 45.0),
                                 epsg=4326))
    eng = engine_from_config(spark, {
        "layers": [{"name": "deg",
                    "source": {"type": "geotiff", "path": str(p)}}]})
    entry = eng.describe()[0]
    assert entry["crs_epsg"] == 4326
    WMS = "{http://www.opengis.net/wms}"
    root = ET.fromstring(ogc_xml.wms_capabilities(eng.describe()))
    bb = root.find(f"{WMS}Capability/{WMS}Layer/{WMS}Layer"
                   f"/{WMS}EX_GeographicBoundingBox")
    assert float(bb.find(f"{WMS}westBoundLongitude").text) == -120.0
    assert float(bb.find(f"{WMS}northBoundLatitude").text) == 45.0
