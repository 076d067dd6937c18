"""Aggregations — SURVEY.md §2.5 (A1–A7).

- ``layer_histogram``: the reference's cost-capped histogram
  (core/.../LayerHistogram.scala:46-94): evaluate at the LARGEST cell size
  (coarsest zoom) whose cell count still meets the budget — a
  partition-pruning filter on the pyramid, never a full-resolution scan —
  then per-band fixed-bin counts (StreamingHistogram.fromTile analog via
  width_bucket math, all JVM-side).
- ``choose_coarsest_zoom``: SampleUtils.chooseLargestCellSize analog.
- ``corner_sample_extents``: 4-corner sampling strategy
  (SampleUtils.scala:29-48).
- ``minmax`` / ``time_positions``: A4/A6 folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grids.layout import Extent


def choose_coarsest_zoom(zoom_cells: dict[int, int], max_cells: int) -> int:
    """zoom → total cell count; pick the coarsest (smallest) zoom whose
    count satisfies the budget as closely as possible: the largest cell
    size with >= min(max_cells, available) cells. Matches
    LayerHistogramTest: budget 64 on a 64-cell source → that source; a
    budget larger than the source clamps to the source (:35-57)."""
    zooms = sorted(zoom_cells)
    best = zooms[-1]
    for z in zooms:  # coarsest first
        if zoom_cells[z] >= max_cells:
            return z
    return best  # budget exceeds everything → finest available


def layer_histogram(
    tiles: DataFrame,
    n_bins: int = 80,
    max_cells: int = 512,
    value_range: tuple[float, float] | None = None,
) -> DataFrame:
    """tiles at mixed zooms → (band, bucket, bucket_lo, bucket_hi, count)
    computed at the budget-chosen zoom. NoData (NULL/NaN) excluded."""
    zoom_cells = {
        r["zoom"]: r["cells"]
        for r in tiles.groupBy("zoom").agg(F.sum(F.expr("width * height")).alias("cells")).collect()
    }
    if not zoom_cells:
        return tiles.sparkSession.createDataFrame(
            [], "band INT, bucket INT, bucket_lo DOUBLE, bucket_hi DOUBLE, count BIGINT"
        )
    z = choose_coarsest_zoom(zoom_cells, max_cells)
    vals = (
        tiles.filter(F.col("zoom") == z)
        .select("band", F.explode("cells").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
    )
    if value_range is None:
        mm = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
        lo, hi = float(mm["lo"]), float(mm["hi"])
    else:
        lo, hi = value_range
    span = (hi - lo) or 1.0
    bucket = F.least(
        F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    w = span / n_bins
    return (
        vals.withColumn("bucket", F.greatest(bucket, F.lit(0)))
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("count"))
        .withColumn("bucket_lo", F.lit(lo) + F.col("bucket") * F.lit(w))
        .withColumn("bucket_hi", F.lit(lo) + (F.col("bucket") + 1) * F.lit(w))
        .select("band", "bucket", "bucket_lo", "bucket_hi", "count")
    )


def column_histogram(df: DataFrame, col: str, n_bins: int = 10,
                     value_range: tuple[float, float] | None = None) -> DataFrame:
    """Fixed-bin histogram of a plain numeric column (same width_bucket
    math as layer_histogram; used for non-raster metrics)."""
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    if value_range is None:
        mm = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
        lo, hi = float(mm["lo"]), float(mm["hi"])
    else:
        lo, hi = value_range
    span = (hi - lo) or 1.0
    bucket = F.least(
        F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        vals.withColumn("bucket", F.greatest(bucket, F.lit(0)))
        .groupBy("bucket")
        .agg(F.count("*").alias("count"))
    )


def minmax(tiles: DataFrame) -> DataFrame:
    """A4: per-band min/max driving color-ramp breaks."""
    return (
        tiles.select("band", F.explode("cells").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
        .groupBy("band")
        .agg(F.min("v").alias("min_value"), F.max("v").alias("max_value"))
    )


def approx_percentiles(tiles: DataFrame, percentiles: list[float]) -> DataFrame:
    return (
        tiles.select("band", F.explode("cells").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
        .groupBy("band")
        .agg(F.percentile_approx("v", percentiles).alias("percentiles"))
    )


def corner_sample_extents(uber: Extent, cell_size: float, sample_cells: int) -> list[Extent]:
    """4 corner sample extents within a cell budget, each no larger than a
    quarter of the uber extent (SampleUtils.sampleRasterExtent:29-48).
    Order: NW, NE, SW, SE."""
    import math

    side = math.sqrt(sample_cells / 4.0) * cell_size
    half_w = min(side, uber.width / 2.0)
    half_h = min(side, uber.height / 2.0)
    return [
        Extent(uber.xmin, uber.ymax - half_h, uber.xmin + half_w, uber.ymax),  # NW
        Extent(uber.xmax - half_w, uber.ymax - half_h, uber.xmax, uber.ymax),  # NE
        Extent(uber.xmin, uber.ymin, uber.xmin + half_w, uber.ymin + half_h),  # SW
        Extent(uber.xmax - half_w, uber.ymin, uber.xmax, uber.ymin + half_h),  # SE
    ]


def extent_union(catalog: DataFrame) -> DataFrame:
    """A3 union fold over extent struct columns."""
    return catalog.agg(
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
    )


def extent_intersection(catalog: DataFrame) -> DataFrame:
    """A3 intersection fold: greatest of mins / least of maxes; empty →
    all-null row (caller raises RequireIntersectingSources analog)."""
    agg = catalog.agg(
        F.max("xmin").alias("xmin"),
        F.max("ymin").alias("ymin"),
        F.min("xmax").alias("xmax"),
        F.min("ymax").alias("ymax"),
    )
    valid = (F.col("xmin") <= F.col("xmax")) & (F.col("ymin") <= F.col("ymax"))
    return agg.select(
        *[F.when(valid, F.col(c)).alias(c) for c in ("xmin", "ymin", "xmax", "ymax")]
    )


def time_positions(catalog: DataFrame, time_col: str = "time") -> DataFrame:
    """A6 time monoid: dedup + sort positions (OgcTimePositions semigroup,
    OgcTime.scala:135-137)."""
    return catalog.agg(F.array_sort(F.collect_set(time_col)).alias("positions"))


def time_interval_hull(catalog: DataFrame, time_col: str = "time") -> DataFrame:
    return catalog.agg(F.min(time_col).alias("start"), F.max(time_col).alias("end"))


def interval_to_positions(
    df: DataFrame, start_col: str = "start", end_col: str = "end", step: str = "1 day"
) -> DataFrame:
    """OgcTimeInterval.toTimePositions (ogc/.../OgcTime.scala:168-178):
    positions = start, start+step, … while ≤ end (inclusive stepping).
    ``step`` is a Spark interval body ("7 days") or an ISO-8601 period
    ("P7D", "P1MT12H", …) parsed by query.ogc_time. Adds a ``positions:
    array<timestamp>`` column via SQL sequence()."""
    if step.strip().upper().startswith("P"):
        from ..query.ogc_time import period_to_spark_interval

        step = period_to_spark_interval(step)
    return df.withColumn(
        "positions", F.expr(f"sequence({start_col}, {end_col}, interval {step})")
    )
