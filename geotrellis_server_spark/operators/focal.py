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
    """tiles(zoom, tile_x, tile_y, width, height, cells) →
    (zoom, tile_x, tile_y, width, height, cells_padded) where cells_padded
    is the (h+2r)*(w+2r) row-major block (NaN outside contributing
    neighbors). Only tile keys present in the input appear in the output
    (neighbor copies alone don't materialize a tile — matches the
    reference reading neighbors *of* an existing tile)."""
    r = int(radius)
    if r <= 0:
        return tiles.withColumn("cells_padded", F.col("cells"))

    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> "
        "named_struct('dx', CAST(i % 3 AS INT) - 1, 'dy', CAST(i DIV 3 AS INT) - 1)))"
    )
    contrib = tiles.select(
        "zoom",
        "tile_x",
        "tile_y",
        "width",
        "height",
        "cells",
        offsets.alias("o"),
    ).select(
        "zoom",
        (F.col("tile_x") + F.col("o.dx")).alias("tile_x"),
        (F.col("tile_y") + F.col("o.dy")).alias("tile_y"),
        F.col("o.dx").alias("dx"),
        F.col("o.dy").alias("dy"),
        "width",
        "height",
        "cells",
    )
    out_schema = T.StructType(
        [
            T.StructField("zoom", T.IntegerType()),
            T.StructField("tile_x", T.LongType()),
            T.StructField("tile_y", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("cells_padded", T.ArrayType(T.DoubleType())),
        ]
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        zoom, tx, ty = key
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if centre.empty:
            # target key exists only as someone's halo → not a real tile
            # (avoids a tiles⨝tiles semi-join; groups are ≤9 rows)
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in
                 [("zoom", "int32"), ("tile_x", "int64"), ("tile_y", "int64"),
                  ("width", "int32"), ("height", "int32"), ("cells_padded", "object")]}
            )
        h = int(centre["height"].iloc[0])
        w = int(centre["width"].iloc[0])
        block = np.full((h + 2 * r, w + 2 * r), np.nan)
        for row in pdf.itertuples(index=False):
            dx, dy = int(row.dx), int(row.dy)
            nb = np.asarray(row.cells, dtype=np.float64).reshape(int(row.height), int(row.width))
            # neighbor at offset (dx, dy) relative to target: it occupies
            # the block region shifted by (-dx, -dy) tiles
            # target pixel range covered by this neighbor:
            x0 = r - dx * w
            y0 = r - dy * h
            sx0, sx1 = max(0, x0), min(w + 2 * r, x0 + w)
            sy0, sy1 = max(0, y0), min(h + 2 * r, y0 + h)
            if sx0 >= sx1 or sy0 >= sy1:
                continue
            nx0, ny0 = sx0 - x0, sy0 - y0
            block[sy0:sy1, sx0:sx1] = nb[ny0 : ny0 + (sy1 - sy0), nx0 : nx0 + (sx1 - sx0)]
        return pd.DataFrame(
            {
                "zoom": [int(zoom)],
                "tile_x": [int(tx)],
                "tile_y": [int(ty)],
                "width": [w],
                "height": [h],
                "cells_padded": [block.ravel()],
            }
        )

    return contrib.groupBy(*KEY).applyInPandas(assemble, out_schema)
