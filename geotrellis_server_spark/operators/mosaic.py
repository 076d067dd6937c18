"""Mosaic / merge + temporal slicing (SURVEY.md S6/R8/Q5).

- ``mosaic_merge``: N tile sources → one, per-CELL left-biased merge:
  first non-NoData in source-rank order wins (reference semigroup resamples
  to the combined grid then ``merge``, effects/.../MosaicRasterSourceF.scala
  :155-175 — here sources already share a layout, so merge is a
  groupBy(tile key) + ordered zip_with fold, fully JVM-side).
- ``mosaic_metadata``: union extent + finest cell size + celltype union
  (MosaicRasterSourceF.scala:197-206, :62-65).
- ``time_slice``: keep only the default-time item per layer for
  non-temporal bounded queries (stac-example/.../stac/package.scala:101-134
  + OgcTimeDefault oldest/newest/fixed, OgcTimeDefault.scala:45-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["zoom", "tile_x", "tile_y", "band"]


def mosaic_merge(tiles: DataFrame, rank_col: str = "src_rank") -> DataFrame:
    """tiles(KEY…, cells, src_rank int — lower wins) → one row per key.

    Per-cell fold in source order: acc[i] stays unless it is NoData
    (NULL/NaN), then the next source's cell fills it. aggregate+zip_with
    keeps this in whole-stage codegen — no Python, no window shuffle
    beyond the single groupBy."""
    per_key = tiles.groupBy(*KEY).agg(
        F.expr(f"array_sort(collect_list(struct({rank_col} AS r, cells AS c)))").alias("srcs"),
        F.first("width").alias("width"),
        F.first("height").alias("height"),
    )
    merged = (
        "aggregate(slice(srcs, 2, size(srcs)), srcs[0].c, "
        "(acc, s) -> zip_with(acc, s.c, (a, b) -> "
        "CASE WHEN a IS NULL OR isnan(a) THEN b ELSE a END))"
    )
    return per_key.select(*KEY, "width", "height", F.expr(merged).alias("cells"))


def mosaic_metadata(catalog: DataFrame) -> DataFrame:
    """catalog(xmin…ymax, cell_size, celltype) → union extent + finest
    (smallest) cell size; celltype union = widest (float64 wins)."""
    return catalog.agg(
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
        F.min("cell_size").alias("cell_size"),
        F.max(F.when(F.col("celltype").startswith("float"), 1).otherwise(0)).alias("_f"),
    ).select(
        "xmin", "ymin", "xmax", "ymax", "cell_size",
        F.when(F.col("_f") == 1, "float64").otherwise("int32").alias("celltype"),
    )


def time_slice(items: DataFrame, layer_col: str = "layer", time_col: str = "time",
               default: str = "newest", fixed_time=None) -> DataFrame:
    """Q5: rank items per layer by time and keep rank 1 according to the
    default-time rule: oldest / newest / fixed timestamp."""
    if default == "fixed":
        if fixed_time is None:
            raise ValueError("fixed default-time requires fixed_time")
        order = F.abs(F.col(time_col).cast("long") - F.lit(fixed_time).cast("timestamp").cast("long"))
        w = Window.partitionBy(layer_col).orderBy(order.asc(), F.col(time_col).asc())
    elif default == "oldest":
        w = Window.partitionBy(layer_col).orderBy(F.col(time_col).asc())
    else:
        w = Window.partitionBy(layer_col).orderBy(F.col(time_col).desc())
    return (
        items.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1).drop("_rk")
    )


def source_for_time(catalog: DataFrame, t, layer_col: str = "layer",
                    time_col: str = "time") -> DataFrame:
    """OgcSource.sourceForTime analog (OgcSource.scala:177-196): the item
    whose time is the latest <= t, else the earliest item."""
    le = (
        catalog.filter(F.col(time_col) <= F.lit(t).cast("timestamp"))
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy(layer_col).orderBy(F.col(time_col).desc())))
        .filter("_rk = 1").drop("_rk")
    )
    earliest = (
        catalog.join(le.select(layer_col).distinct(), layer_col, "left_anti")
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy(layer_col).orderBy(F.col(time_col).asc())))
        .filter("_rk = 1").drop("_rk")
    )
    return le.unionByName(earliest)


def temporal_aggregate(
    tiles: DataFrame, agg: str = "mean", time_col: str = "time"
) -> DataFrame:
    """Per-pixel temporal composite over a time-stacked tile table — the
    EO reduction behind "mean/max/min composite over a season" (the
    reference serves one time slice per request, OgcTime.scala; batch
    engines fold the whole stack). Input: TILE-keyed rows, several times
    per key. Output: one row per key, cells aggregated element-wise.

    Pure SQL shape: ``aggregate(collect_list(cells), ...)`` folds the
    stack JVM-side — per-key work is bounded by (n_times × tile px) and
    the single shuffle is the groupBy on the tile key, which is the
    partitioning the pyramid is stored in anyway (map-side partial
    collect, no skew: every key has the same n_times)."""
    ops = {
        "sum": ("zip_with(acc, x, (a, b) -> a + b)", "acc"),
        "max": ("zip_with(acc, x, (a, b) -> greatest(a, b))", "acc"),
        "min": ("zip_with(acc, x, (a, b) -> least(a, b))", "acc"),
        "mean": (
            "zip_with(acc, x, (a, b) -> a + b)",
            "transform(acc, a -> a / CAST(n AS DOUBLE))",
        ),
    }
    if agg not in ops:
        raise ValueError(f"agg must be one of {sorted(ops)}")
    merge, finish = ops[agg]
    key = [c for c in KEY if c in tiles.columns]
    # fold in TIME order, not collect_list's partition-dependent order:
    # float addition is non-associative, so an unordered fold would make
    # mean/sum bit-unstable across runs (the repo's determinism rule)
    if time_col in tiles.columns:
        stack = F.expr(
            f"transform(array_sort(collect_list(struct({time_col} AS t, "
            "cells AS c))), s -> s.c)"
        ).alias("_stack")
    else:
        stack = F.expr(
            "array_sort(collect_list(cells))"  # no time column: content order
        ).alias("_stack")
    per_key = tiles.groupBy(*key).agg(
        stack,
        F.count("*").alias("n"),
        F.any_value(F.col("width"), True).alias("width"),
        F.any_value(F.col("height"), True).alias("height"),
    )
    folded = (
        f"aggregate(slice(_stack, 2, size(_stack) - 1), _stack[0], "
        f"(acc, x) -> {merge}, acc -> {finish})"
    )
    return per_key.selectExpr(
        *key, "width", "height", f"{folded} AS cells"
    )
