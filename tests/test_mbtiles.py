"""MBTiles sink/source: spec round-trip (TMS row flip, metadata),
engine pyramid export readable as real PNGs."""

import pytest
from pyspark.sql import functions as F

from geotrellis_server_spark.engine import Engine, Layer
from geotrellis_server_spark.operators import tiling
from geotrellis_server_spark.sources import synth
from geotrellis_server_spark.sources.mbtiles import (
    export_rendered_pyramid,
    mbtiles_metadata,
    read_mbtiles,
    write_mbtiles,
)


def test_mbtiles_roundtrip_and_tms_flip(spark, tmp_path):
    path = str(tmp_path / "t.mbtiles")
    tiles = [(2, 1, 0, b"\x89A"), (2, 3, 3, b"\x89B"), (1, 0, 1, b"\x89C")]
    write_mbtiles(tiles, path, name="demo", fmt="png")
    meta = mbtiles_metadata(path)
    assert meta["format"] == "png" and meta["name"] == "demo"
    assert meta["minzoom"] == "1" and meta["maxzoom"] == "2"
    got = {(r.zoom, r.tile_x, r.tile_y): bytes(r.payload)
           for r in read_mbtiles(spark, path).collect()}
    assert got == {(z, x, y): p for z, x, y, p in tiles}
    # the FILE stores TMS rows: (z=2, y=0) must be tile_row 3
    import sqlite3

    con = sqlite3.connect(path)
    rows = dict(((z, x), r) for z, x, r, in con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles"))
    con.close()
    assert rows[(2, 1)] == 3 and rows[(2, 3)] == 0 and rows[(1, 0)] == 0


def test_export_rendered_pyramid(spark, tmp_path):
    docs = synth.extract_geometry(synth.docs(spark, 1500))
    tiles = (tiling.rasterize_count(docs, 2, tile_size=16)
             .union(tiling.rasterize_count(docs, 1, tile_size=16))
             .withColumn("band", F.lit(0)).cache())
    eng = Engine(spark, {"density": Layer("density", tiles)})
    path = str(tmp_path / "density.mbtiles")
    n = export_rendered_pyramid(eng, "density", path, range(1, 3))
    assert n > 0
    back = read_mbtiles(spark, path)
    assert back.count() == n
    # every payload is a real PNG the engine's own decoder accepts
    from geotrellis_server_spark.styles.png import decode_png

    first = bytes(back.orderBy("zoom", "tile_x", "tile_y")
                  .first().payload)
    assert first[:8] == b"\x89PNG\r\n\x1a\n"
    img = decode_png(first)
    assert img.ndim == 3 and img.shape[0] == 16 and img.shape[1] == 16
    assert mbtiles_metadata(path)["maxzoom"] == "2"
