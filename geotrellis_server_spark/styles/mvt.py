"""Mapbox Vector Tile (MVT) sink — pure-python encoder/decoder for the
public vector-tile spec 2.1 (protobuf wire format hand-rolled like
styles/png.py and styles/jpeg.py do for their specs; no protobuf lib in
the container and none needed — the message set is tiny).

Reference parity: the reference serves raster tiles (PNG/JPEG) from the
same layer model; MVT is the vector twin every slippy-map stack also
speaks, so the engine's point layers become directly consumable by
MapLibre/Mapbox clients. Deterministic output: features sort by
(pixel y, x), keys/values are emitted in first-use order, so the same
tile always encodes to the same bytes (golden-testable).

Wire format (spec 2.1 §4):
  Tile      { repeated Layer layers = 3; }
  Layer     { version=2 (15), name (1), repeated Feature (2),
              repeated keys (3), repeated Value (4), extent (5) }
  Value     { string (1) | float (2) | double (3) | int64 (4) |
              uint64 (5) | sint64 (6) | bool (7) }
  Feature   { id (1), packed tags (2), type (3), packed geometry (4) }
Geometry commands: (id & 7) | (count << 3); id 1=MoveTo 2=LineTo
7=ClosePath; parameters are zigzag deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint is unsigned; zigzag first")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _field(tag: int, wire: int) -> bytes:
    return _varint((tag << 3) | wire)


def _len_delim(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + _varint(len(payload)) + payload


def _value_msg(v) -> bytes:
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct

        return _field(3, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode("utf-8"))


def encode_point_layer(
    name: str,
    features: list[tuple[int, int, dict]],
    extent: int = 4096,
) -> bytes:
    """One MVT layer of point features: (x, y, properties) with x/y in
    tile-local extent coordinates. Features are sorted by (y, x) and
    properties keys by first use — deterministic bytes."""
    keys: list[str] = []
    vals: list = []

    def tag_of(k, v):
        if k not in keys:
            keys.append(k)
        ki = keys.index(k)
        for i, w in enumerate(vals):
            if type(w) is type(v) and w == v:
                return ki, i
        vals.append(v)
        return ki, len(vals) - 1

    feats = b""
    for x, y, props in sorted(features, key=lambda f: (f[1], f[0])):
        tags = bytearray()
        for k in props:
            ki, vi = tag_of(k, props[k])
            tags += _varint(ki) + _varint(vi)
        geom = (_varint((1 & 7) | (1 << 3))  # MoveTo, count 1
                + _varint(_zigzag(int(x))) + _varint(_zigzag(int(y))))
        body = (_len_delim(2, bytes(tags))
                + _field(3, 0) + _varint(GEOM_POINT)
                + _len_delim(4, geom))
        feats += _len_delim(2, body)
    layer = (
        _field(15, 0) + _varint(2)
        + _len_delim(1, name.encode("utf-8"))
        + feats
        + b"".join(_len_delim(3, k.encode("utf-8")) for k in keys)
        + b"".join(_len_delim(4, _value_msg(v)) for v in vals)
        + _field(5, 0) + _varint(extent)
    )
    return layer


def encode_tile(layers: list[bytes]) -> bytes:
    return b"".join(_len_delim(3, l) for l in layers)


# --- decoder (for tests and round-trips) ------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = data[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        tag, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            v = data[pos:pos + n]
            pos += n
        elif wire == 1:
            v = data[pos:pos + 8]
            pos += 8
        elif wire == 5:
            v = data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield tag, wire, v


def decode_tile(data: bytes) -> list[dict]:
    """Parse an MVT byte stream back into layer dicts — independent
    walk of the wire format (used by tests to round-trip the sink)."""
    import struct

    layers = []
    for tag, _w, payload in _fields(data):
        if tag != 3:
            continue
        lay = {"name": None, "version": None, "extent": 4096,
               "keys": [], "values": [], "features": []}
        for t, w, v in _fields(payload):
            if t == 15:
                lay["version"] = v
            elif t == 1:
                lay["name"] = v.decode("utf-8")
            elif t == 5:
                lay["extent"] = v
            elif t == 3:
                lay["keys"].append(v.decode("utf-8"))
            elif t == 4:
                for vt, vw, vv in _fields(v):
                    if vt == 1:
                        lay["values"].append(vv.decode("utf-8"))
                    elif vt == 3:
                        lay["values"].append(struct.unpack("<d", vv)[0])
                    elif vt == 6:
                        lay["values"].append(_unzigzag(vv))
                    elif vt == 7:
                        lay["values"].append(bool(vv))
                    else:
                        lay["values"].append(vv)
            elif t == 2:
                feat = {"tags": [], "type": None, "geometry": []}
                for ft, fw, fv in _fields(v):
                    if ft == 3:
                        feat["type"] = fv
                    elif ft == 2:
                        p = 0
                        while p < len(fv):
                            x, p = _read_varint(fv, p)
                            feat["tags"].append(x)
                    elif ft == 4:
                        p = 0
                        cmds = []
                        while p < len(fv):
                            x, p = _read_varint(fv, p)
                            cmds.append(x)
                        feat["geometry"] = cmds
                lay["features"].append(feat)
        layers.append(lay)
    return layers


def decode_points(layer: dict) -> list[tuple[int, int, dict]]:
    """Layer dict → [(x, y, props)] for point layers."""
    out = []
    for f in layer["features"]:
        g = f["geometry"]
        assert f["type"] == GEOM_POINT and (g[0] & 7) == 1
        x, y = _unzigzag(g[1]), _unzigzag(g[2])
        props = {}
        for i in range(0, len(f["tags"]), 2):
            props[layer["keys"][f["tags"][i]]] = \
                layer["values"][f["tags"][i + 1]]
        out.append((x, y, props))
    return out


# --- Spark sink --------------------------------------------------------------


MVT_SCHEMA = T.StructType([
    T.StructField("zoom", T.IntegerType()),
    T.StructField("tile_x", T.LongType()),
    T.StructField("tile_y", T.LongType()),
    T.StructField("n_features", T.LongType()),
    T.StructField("mvt", T.BinaryType()),
])


def mvt_point_tiles(
    points: DataFrame,
    zoom: int,
    layer_name: str = "points",
    extent: int = 4096,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Slippy-map MVT point tiles at ``zoom``: one row per non-empty
    tile with the encoded vector tile. Duplicate extent-pixels collapse
    to one feature carrying ``n`` (count) — the same two-phase
    pre-aggregation as the raster sink (tiling.rasterize_count), so the
    per-tile feature list is bounded by extent², not point count, and
    the shuffle carries pre-combined counts."""
    import pandas as pd

    from ..operators.tiling import pixel_index_sql

    tx, ty, px, py = pixel_index_sql(lon, lat, zoom, extent)
    per_px = (
        points.select(
            F.expr(tx).alias("tile_x"), F.expr(ty).alias("tile_y"),
            F.expr(px).alias("px"), F.expr(py).alias("py"),
        )
        .groupBy("tile_x", "tile_y", "px", "py")
        .agg(F.count("*").alias("n"))
    )

    def encode(key, pdf):
        tx_, ty_ = int(key[0]), int(key[1])
        feats = [(int(r.px), int(r.py), {"n": int(r.n)})
                 for r in pdf.itertuples()]
        tile = encode_tile([encode_point_layer(layer_name, feats, extent)])
        return pd.DataFrame(
            [(zoom, tx_, ty_, len(feats), tile)],
            columns=["zoom", "tile_x", "tile_y", "n_features", "mvt"])

    # applyInPandas: a whole tile per call (an Arrow-batch-sliced
    # mapInPandas could split one tile into two partial encodes)
    return per_px.groupBy("tile_x", "tile_y").applyInPandas(
        encode, MVT_SCHEMA)


def tilejson(
    name: str,
    tiles_url_template: str,
    bounds: tuple[float, float, float, float] = (-180.0, -85.051129, 180.0, 85.051129),
    minzoom: int = 0,
    maxzoom: int = 14,
    layer_fields: dict[str, dict[str, str]] | None = None,
    attribution: str | None = None,
) -> dict:
    """TileJSON 3.0.0 descriptor (public Mapbox spec — the discovery
    document every MVT-serving endpoint publishes; the vector twin of
    the WMTS capabilities the engine already renders in ogc_xml.py).
    ``layer_fields`` maps layer id → {field: type} into the
    ``vector_layers`` section. Deterministic key order (sorted) so the
    document is golden-testable."""
    if minzoom > maxzoom:
        raise ValueError("minzoom must be <= maxzoom")
    w, s, e, n = bounds
    doc = {
        "tilejson": "3.0.0",
        "name": name,
        "tiles": [tiles_url_template],
        "bounds": [w, s, e, n],
        "center": [(w + e) / 2.0, (s + n) / 2.0, minzoom],
        "minzoom": minzoom,
        "maxzoom": maxzoom,
        "scheme": "xyz",
        "vector_layers": [
            {"id": lid, "fields": dict(sorted(fields.items())),
             "minzoom": minzoom, "maxzoom": maxzoom}
            for lid, fields in sorted((layer_fields or
                                       {name: {"n": "Number"}}).items())
        ],
    }
    if attribution is not None:
        doc["attribution"] = attribution
    return doc
