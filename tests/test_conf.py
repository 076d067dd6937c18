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
