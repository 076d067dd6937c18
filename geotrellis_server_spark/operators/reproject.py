"""Raster reprojection operator (SURVEY.md R2 — reference
``OgcLayer.reproject(crs)`` / ``reprojectToRegion(crs, rasterExtent,
method, strategy)``, ogc/.../OgcLayer.scala:82-91,
TiledOgcLayer.scala:77-87).

Each tile row warps independently (per-row inverse mapping — no shuffle,
one Arrow batch per partition): target extent = densified-boundary
envelope of the source extent in the destination CRS; every target pixel
center back-transforms and samples nearest/bilinear. CRS support comes
from grids.proj (4326, 3857, all UTM zones — Karney series).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..grids.proj import reproject_extent, warp_block


def reproject_tiles(
    tiles: DataFrame,
    src_epsg: int,
    dst_epsg: int,
    out_w: int | None = None,
    out_h: int | None = None,
    method: str = "bilinear",
) -> DataFrame:
    """tiles: TILE_SCHEMA-like rows whose xmin/ymin/xmax/ymax are in
    ``src_epsg``. Returns rows with warped cells and the new extent in
    ``dst_epsg`` (pixel dims default to the source's)."""

    out_schema = T.StructType(
        [
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("cells", T.ArrayType(T.DoubleType())),
        ]
    )

    from ..grids import proj

    # proj4-minted CRSs live in the driver registry only — replay the
    # entries inside the executor UDF (see proj.registry_snapshot)
    snap = proj.registry_snapshot(src_epsg, dst_epsg)

    @F.pandas_udf(out_schema)
    def warp(cells: pd.Series, w_s: pd.Series, h_s: pd.Series,
             xmin: pd.Series, ymin: pd.Series, xmax: pd.Series,
             ymax: pd.Series) -> pd.DataFrame:
        proj.ensure_entries(snap)
        rows = []
        for c, w, h, x0, y0, x1, y1 in zip(cells, w_s, h_s, xmin, ymin, xmax, ymax):
            w, h = int(w), int(h)
            ow = out_w or w
            oh = out_h or h
            a = np.array([np.nan if v is None else v for v in c],
                         dtype=np.float64).reshape(h, w)
            src_ext = (float(x0), float(y0), float(x1), float(y1))
            dst_ext = reproject_extent(src_ext, src_epsg, dst_epsg)
            warped = warp_block(a, src_ext, src_epsg, dst_ext, dst_epsg, oh, ow, method)
            rows.append(dst_ext + (ow, oh, warped.ravel()))
        return pd.DataFrame(
            rows, columns=["xmin", "ymin", "xmax", "ymax", "width", "height", "cells"]
        )

    keep = [c for c in tiles.columns
            if c not in ("xmin", "ymin", "xmax", "ymax", "width", "height", "cells")]
    out = tiles.withColumn(
        "_w", warp("cells", "width", "height", "xmin", "ymin", "xmax", "ymax")
    )
    return out.select(
        *keep,
        F.col("_w.xmin").alias("xmin"), F.col("_w.ymin").alias("ymin"),
        F.col("_w.xmax").alias("xmax"), F.col("_w.ymax").alias("ymax"),
        F.col("_w.width").alias("width"), F.col("_w.height").alias("height"),
        F.col("_w.cells").alias("cells"),
    )
