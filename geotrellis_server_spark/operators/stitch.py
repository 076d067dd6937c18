"""Stitch (SURVEY.md R7): assemble the keyed tiles of a bounded request
window into one numpy raster — reference
core/.../gtlayer/GTLayerNode.scala:150-157 (collection stitch). The
collect is bounded by the request size (a GetMap window), never the
dataset: the caller prunes to a key range first.

Also: GeoJSON feature sink (S12 — pixel values as features,
ogc/.../wms/GetFeatureInfo.scala:87-102) and axis-swap normalization
(R11 — WMS 1.3 geographic-CRS axis order, ogc/.../package.scala:32-36).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grids.layout import Extent, ZoomedLayoutScheme


def stitch(tiles: DataFrame, zoom: int | None = None,
           scheme=None) -> tuple[np.ndarray, Extent]:
    """Collect the (pruned) tile set and mosaic into one array. NaN where
    no tile covers. Returns (array[h, w], extent in the tiles' CRS).

    The mosaic extent comes from the tiles' OWN extent columns (exact
    stored values from boundary tiles — no scheme assumption, so custom
    CrsLayoutScheme pyramids stitch correctly); tiles without extent
    columns (e.g. MAML-evaluated layers, which project them away) use
    ``scheme`` when given, else the default WebMercator layout math —
    pass the layer's scheme for custom-CRS layers or the extent is
    meaningless."""
    rows = tiles.collect()
    if not rows:
        raise ValueError("stitch of empty tile set")
    z = zoom if zoom is not None else rows[0].zoom
    rows = [r for r in rows if r.zoom == z]
    txs = [r.tile_x for r in rows]
    tys = [r.tile_y for r in rows]
    tx0, tx1, ty0, ty1 = min(txs), max(txs), min(tys), max(tys)
    tw, th = rows[0].width, rows[0].height
    out = np.full(((ty1 - ty0 + 1) * th, (tx1 - tx0 + 1) * tw), np.nan)
    for r in rows:
        a = np.array([np.nan if v is None else v for v in r.cells], dtype=np.float64).reshape(
            r.height, r.width
        )
        y0 = (r.tile_y - ty0) * th
        x0 = (r.tile_x - tx0) * tw
        out[y0 : y0 + th, x0 : x0 + tw] = a
    fields = set(rows[0].__fields__)
    if {"xmin", "ymin", "xmax", "ymax"} <= fields and rows[0].xmin is not None:
        xmin = min(r.xmin for r in rows if r.tile_x == tx0)
        xmax = max(r.xmax for r in rows if r.tile_x == tx1)
        ymax = max(r.ymax for r in rows if r.tile_y == ty0)
        ymin = min(r.ymin for r in rows if r.tile_y == ty1)
        return out, Extent(xmin, ymin, xmax, ymax)
    layout = (scheme or ZoomedLayoutScheme(tw)).layout(z)
    nw = layout.extent_for(tx0, ty0)
    se = layout.extent_for(tx1, ty1)
    return out, Extent(nw.xmin, se.ymin, se.xmax, nw.ymax)


def to_geojson_features(df: DataFrame, lon: str = "lon", lat: str = "lat",
                        props: list[str] | None = None) -> DataFrame:
    """Rows → GeoJSON Feature strings (JVM-side to_json)."""
    props = props or [c for c in df.columns if c not in (lon, lat)]
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"), F.array(F.col(lon), F.col(lat)).alias("coordinates")
            ).alias("geometry"),
            F.struct(*[F.col(p) for p in props]).alias("properties"),
        )
    )
    return df.select(feature.alias("feature"))


def swap_xy_extent(e: tuple[float, float, float, float]) -> tuple[float, float, float, float]:
    """R11: (xmin,ymin,xmax,ymax) with axes swapped — WMS 1.3 / WCS 1.1
    axis order for geographic CRS, applied at request boundaries only."""
    xmin, ymin, xmax, ymax = e
    return (ymin, xmin, ymax, xmax)


def repositories_union(*catalogs: DataFrame) -> DataFrame:
    """Q6 repository monoid: find results concatenate (<+>,
    core/.../query/RepositoryM.scala:42-50)."""
    out = catalogs[0]
    for c in catalogs[1:]:
        out = out.unionByName(c, allowMissingColumns=True)
    return out


try:  # pragma: no cover - optional dependency, absent in this container
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def render_jpg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """S9 JPEG sink (reference Render.scala:35,46,63). Pillow/libjpeg is
    used when installed; otherwise the pure-numpy baseline JFIF encoder
    (styles/jpeg.py — standard Annex-K tables, 4:4:4, decodable by any
    JPEG reader) makes ``format=image/jpeg`` work with NO dependencies."""
    if HAS_PIL:  # pragma: no cover - Pillow absent in this container
        import io

        buf = io.BytesIO()
        _PILImage.fromarray(np.asarray(rgb, dtype=np.uint8)).save(
            buf, format="JPEG", quality=quality
        )
        return buf.getvalue()
    from ..styles.jpeg import encode_jpeg

    return encode_jpeg(np.asarray(rgb, dtype=np.uint8), quality)


def render_geotiff(
    tiles: DataFrame,
    zoom: int | None = None,
    nodata: float | None = None,
    compression: str = "none",
) -> bytes:
    """S10 GeoTIFF sink (reference Render.scala:36,47,64): stitch the
    (request-pruned) tile window and encode one float64 GeoTIFF in
    EPSG:3857 via the pure-stdlib encoder (sources/gtiff.py); pass
    ``compression="deflate"|"lzw"|"packbits"`` for compressed strips.
    The collect is request-bounded exactly like ``stitch``."""
    from ..sources.gtiff import encode_geotiff

    arr, ext = stitch(tiles, zoom)
    return encode_geotiff(
        arr, (ext.xmin, ext.ymin, ext.xmax, ext.ymax), epsg=3857,
        nodata=nodata, compression=compression,
    )
