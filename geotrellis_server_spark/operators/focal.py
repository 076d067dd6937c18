"""Halo exchange for focal ops (SURVEY.md J3/O9) — the distributed
equivalent of the reference's 3×3 neighborhood read + buffer
(core/.../gtlayer/GTLayerNode.scala:88-124: GridBounds(x±1, y±1) →
NeighboringTiles → TileWithNeighbors.withBuffer).

Shape: each tile row emits its full cells to ITSELF plus eight edge
STRIPS (r rows/cols/corners, sliced JVM-side with slice()/flatten()
BEFORE the shuffle) to its neighbors; a groupBy(target key) assembles the
(h+2r, w+2r) padded block in one Arrow batch. Missing neighbors pad with
NaN (world edge / sparse layer).

Scale notes: shuffle volume per tile is w·h + 2r(w+h) + 4r² — about
w·h·(1 + 4r/s) for square s-px tiles — versus 9·w·h for the naive
full-copy exchange (≈8.5× less at 64 px, r=1; ≈8.9× at 256 px). Groups
stay bounded (≤9 rows) so there is NO skew regardless of data
distribution; the shuffle key is the tile key, so a tiles table
range-partitioned by (zoom, tile_x, tile_y) colocates neighbors and AQE
coalesces the small partitions. Requires radius ≤ min(width, height)
(same single-ring assumption as the reference's 3×3 read). Expressions
without focal ops never enter this path (Vars.varsWithBuffer gating,
LayerTms.scala:66).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY = ["zoom", "tile_x", "tile_y"]


def _strip_sql(r: int) -> str:
    """Per-offset pre-shuffle slice: the sub-block of THIS tile that lands
    in the (dx, dy) neighbor's padded halo. dx=+1 → east edge cols
    [w-r, w); dx=-1 → west edge cols [0, r); dx=0 → all cols (rows
    likewise with dy and h). Emitted as 9 structs then exploded — one
    scan, sliced before the exchange."""
    x0 = f"IF(o.dx = 1, width - {r}, 0)"
    y0 = f"IF(o.dy = 1, height - {r}, 0)"
    ylen = f"IF(o.dy = 0, height, {r})"
    # three cost tiers: center = zero-copy reference; row strips (dx=0) =
    # ONE contiguous slice; column strips = per-row r-element slices (the
    # only per-row work, and it is r wide)
    if r == 1:  # common case: column strip = one element per row, no flatten
        col = (
            f"transform(sequence({y0}, {y0} + {ylen} - 1), "
            f"row -> cells[row * width + ({x0})])"
        )
    else:
        col = (
            f"flatten(transform(sequence({y0}, {y0} + {ylen} - 1), "
            f"row -> slice(cells, row * width + ({x0}) + 1, {r})))"
        )
    return (
        "CASE "
        "WHEN o.dx = 0 AND o.dy = 0 THEN cells "
        f"WHEN o.dx = 0 THEN slice(cells, ({y0}) * width + 1, ({ylen}) * width) "
        f"ELSE {col} END"
    )


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
    contrib = (
        tiles.select(*key, "width", "height", "cells", offsets.alias("o"))
        .select(
            "zoom",
            (F.col("tile_x") + F.col("o.dx")).alias("tile_x"),
            (F.col("tile_y") + F.col("o.dy")).alias("tile_y"),
            *([F.col("band")] if "band" in tiles.columns else []),
            F.col("o.dx").alias("dx"),
            F.col("o.dy").alias("dy"),
            "width",
            "height",
            F.expr(_strip_sql(r)).alias("strip"),
        )
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
            # strip dims mirror _strip_sql; placement: the contributor sits
            # at (-dx, -dy) relative to the target, so its east edge
            # (dx=+1) fills the target's WEST pad columns [0, r), etc.
            sw = w if dx == 0 else r
            sh = h if dy == 0 else r
            bx0 = 0 if dx == 1 else (r if dx == 0 else w + r)
            by0 = 0 if dy == 1 else (r if dy == 0 else h + r)
            strip = np.asarray(row.strip, dtype=np.float64).reshape(sh, sw)
            block[by0 : by0 + sh, bx0 : bx0 + sw] = strip
        out = {"zoom": [int(keyvals[0])], "tile_x": [int(keyvals[1])], "tile_y": [int(keyvals[2])]}
        if has_band:
            out["band"] = [int(keyvals[3])]
        out["width"] = [w]
        out["height"] = [h]
        out["cells_padded"] = [block.ravel()]
        return pd.DataFrame(out)

    return contrib.groupBy(*key).applyInPandas(assemble, out_schema)
