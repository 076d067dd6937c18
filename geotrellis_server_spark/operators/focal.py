"""Halo exchange for focal ops (SURVEY.md J3/O9) — the distributed
equivalent of the reference's 3×3 neighborhood read + buffer
(core/.../gtlayer/GTLayerNode.scala:88-124: GridBounds(x±1, y±1) →
NeighboringTiles → TileWithNeighbors.withBuffer).

Shape: each tile row emits up to 9 (target_key, dx, dy, cells) copies —
one per neighbor it contributes to — then a groupBy(target key) assembles
the (h+2r, w+2r) padded block in one Arrow batch. Missing neighbors pad
with NaN (world edge / sparse layer).

Scale notes: the 9× explosion is shuffle volume, but each group is
bounded (≤9 rows), so there is NO skew regardless of data distribution;
the shuffle key is the tile key, so a tiles table range-partitioned by
(zoom, tile_x, tile_y) colocates neighbors and AQE coalesces the small
partitions. Expressions without focal ops never enter this path
(Vars.varsWithBuffer gating, LayerTms.scala:66).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY = ["zoom", "tile_x", "tile_y"]


def with_halo(tiles: DataFrame, radius: int) -> DataFrame:
    """tiles(zoom, tile_x, tile_y[, band], width, height, cells) →
    (key..., width, height, cells_padded) where cells_padded is the
    (h+2r)*(w+2r) row-major block (NaN outside contributing neighbors).
    Band-aware when a ``band`` column is present (each band exchanges its
    own halo). Only tile keys present in the input appear in the output
    (neighbor copies alone don't materialize a tile — matches the
    reference reading neighbors *of* an existing tile)."""
    r = int(radius)
    key = KEY + (["band"] if "band" in tiles.columns else [])
    if r <= 0:
        return tiles.select(*key, "width", "height", F.col("cells").alias("cells_padded"))

    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> "
        "named_struct('dx', CAST(i % 3 AS INT) - 1, 'dy', CAST(i DIV 3 AS INT) - 1)))"
    )
    contrib = tiles.select(*key, "width", "height", "cells", offsets.alias("o")).select(
        "zoom",
        (F.col("tile_x") + F.col("o.dx")).alias("tile_x"),
        (F.col("tile_y") + F.col("o.dy")).alias("tile_y"),
        *([F.col("band")] if "band" in tiles.columns else []),
        F.col("o.dx").alias("dx"),
        F.col("o.dy").alias("dy"),
        "width",
        "height",
        "cells",
    )
    has_band = "band" in tiles.columns
    fields = [
        T.StructField("zoom", T.IntegerType()),
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
    ]
    if has_band:
        fields.append(T.StructField("band", T.IntegerType()))
    fields += [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("cells_padded", T.ArrayType(T.DoubleType())),
    ]
    out_schema = T.StructType(fields)

    def assemble(keyvals, pdf: pd.DataFrame) -> pd.DataFrame:
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if centre.empty:
            # target key exists only as someone's halo → not a real tile
            # (avoids a tiles⨝tiles semi-join; groups are ≤9 rows)
            empty = {"zoom": pd.Series(dtype="int32"),
                     "tile_x": pd.Series(dtype="int64"),
                     "tile_y": pd.Series(dtype="int64")}
            if has_band:
                empty["band"] = pd.Series(dtype="int32")
            empty["width"] = pd.Series(dtype="int32")
            empty["height"] = pd.Series(dtype="int32")
            empty["cells_padded"] = pd.Series(dtype="object")
            return pd.DataFrame(empty)
        h = int(centre["height"].iloc[0])
        w = int(centre["width"].iloc[0])
        block = np.full((h + 2 * r, w + 2 * r), np.nan)
        for row in pdf.itertuples(index=False):
            dx, dy = int(row.dx), int(row.dy)
            nb = np.asarray(row.cells, dtype=np.float64).reshape(int(row.height), int(row.width))
            # neighbor at offset (dx, dy) relative to target: it occupies
            # the block region shifted by (-dx, -dy) tiles
            x0 = r - dx * w
            y0 = r - dy * h
            sx0, sx1 = max(0, x0), min(w + 2 * r, x0 + w)
            sy0, sy1 = max(0, y0), min(h + 2 * r, y0 + h)
            if sx0 >= sx1 or sy0 >= sy1:
                continue
            nx0, ny0 = sx0 - x0, sy0 - y0
            block[sy0:sy1, sx0:sx1] = nb[ny0 : ny0 + (sy1 - sy0), nx0 : nx0 + (sx1 - sx0)]
        out = {"zoom": [int(keyvals[0])], "tile_x": [int(keyvals[1])], "tile_y": [int(keyvals[2])]}
        if has_band:
            out["band"] = [int(keyvals[3])]
        out["width"] = [w]
        out["height"] = [h]
        out["cells_padded"] = [block.ravel()]
        return pd.DataFrame(out)

    return contrib.groupBy(*key).applyInPandas(assemble, out_schema)
