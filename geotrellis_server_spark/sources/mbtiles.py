"""MBTiles 1.3 sink/source — the classic sqlite tile container every
slippy-map client reads (spec: github.com/mapbox/mbtiles-spec, public).

Reference parity note: geotrellis-server serves tiles from layer
backends; MBTiles is the standard OFFLINE interchange for exactly those
tiles. Here the engine's rendered PNG/JPEG tiles (engine.render_png /
get_tile_jpg) land in a `.mbtiles` file any viewer opens, and an
existing MBTiles becomes a tile DataFrame.

Implementation is pure stdlib sqlite3. MBTiles quirk handled here: the
spec stores rows in TMS scheme (tile_row = 2^z - 1 - y of the XYZ/
GeoTrellis convention) — both directions flip accordingly.

Scale note: one sqlite file is inherently single-writer, so the sink
COLLECTS the rendered tiles it writes — use it for request-sized
exports (a bbox/pyramid slice, the reference's serving granularity),
not corpus dumps; the 100-TB path stays parquet/bucketed. The source
side reads metadata + tile bytes driver-side for the same reason and
parallelizes downstream via createDataFrame.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession


def write_mbtiles(
    tiles: list[tuple[int, int, int, bytes]],
    path: str,
    name: str = "layer",
    fmt: str = "png",
    bounds: tuple[float, float, float, float] = (-180.0, -85.0,
                                                 180.0, 85.0),
) -> None:
    """Write (zoom, x, y, payload) tiles (XYZ convention) to a new
    MBTiles file with the spec-required metadata table."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("CREATE TABLE metadata (name text, value text)")
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, "
            "tile_column integer, tile_row integer, tile_data blob)")
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)")
        zs = sorted({z for z, _, _, _ in tiles})
        meta = {
            "name": name,
            "format": fmt,
            "bounds": ",".join(str(v) for v in bounds),
            "minzoom": str(zs[0] if zs else 0),
            "maxzoom": str(zs[-1] if zs else 0),
            "type": "baselayer",
            "version": "1.3",
        }
        cur.executemany("INSERT INTO metadata VALUES (?, ?)",
                        sorted(meta.items()))
        cur.executemany(
            "INSERT INTO tiles VALUES (?, ?, ?, ?)",
            [(z, x, (1 << z) - 1 - y, sqlite3.Binary(p))
             for z, x, y, p in tiles])
        con.commit()
    finally:
        con.close()


def read_mbtiles(spark: SparkSession, path: str) -> DataFrame:
    """MBTiles -> DataFrame (zoom, tile_x, tile_y, payload) in the
    engine's XYZ convention, plus the metadata dict via
    :func:`mbtiles_metadata`."""
    con = sqlite3.connect(path)
    try:
        rows = [
            (int(z), int(x), (1 << int(z)) - 1 - int(r), bytes(b))
            for z, x, r, b in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data "
                "FROM tiles")
        ]
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "zoom int, tile_x int, tile_y int, payload binary")


def mbtiles_metadata(path: str) -> dict:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def export_rendered_pyramid(
    engine,
    layer_name: str,
    path: str,
    zooms: range,
    fmt: str = "png",
) -> int:
    """Render every tile of ``layer_name`` the layer's pyramid has at
    the given zooms through the engine's PNG/JPEG surface and pack them
    into an MBTiles file. Returns the tile count. Request-sized by
    design (see module scale note)."""
    layer = engine.layers[layer_name]
    keys = [(int(r["zoom"]), int(r["tile_x"]), int(r["tile_y"]))
            for r in layer.tiles.select("zoom", "tile_x", "tile_y")
            .distinct().collect() if int(r["zoom"]) in zooms]
    out: list[tuple[int, int, int, bytes]] = []
    for z, tx, ty in sorted(keys):
        if fmt == "png":
            payload = engine.get_tile_png(layer_name, z, tx, ty)
        else:
            payload = engine.get_tile_jpg(layer_name, z, tx, ty)
        if payload is not None:
            out.append((z, tx, ty, payload))
    write_mbtiles(out, path, name=layer_name, fmt=fmt)
    return len(out)
