"""Zonal statistics (classic map-algebra companion to the reference's
polygonal summary path — geotrellis polygonal summaries over raster
sources; SURVEY.md A-group aggregations generalized per zone).

Per-zone aggregates of a tile table's cells: each pixel's CENTER is
assigned to a zone, then one hash aggregation per zone. The pixel→zone
assignment for the rectangular zone grid is pure SQL floor arithmetic
(whole-stage codegen; identical fragment drives the DuckDB oracle);
arbitrary polygon zones compose via geometry.rasterize masks instead.

Scale shape: posexplode(cells) is a narrow generate (no shuffle); the
only exchange is the final per-zone aggregation with map-side partials —
the same skew story as tile counts (hot zones collapse before shuffling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen


def pixel_center_lonlat_sql(zoom: int, tile_size: int) -> tuple[str, str]:
    """(lon, lat) SQL for the center of pixel ``idx`` of tile
    (tile_x, tile_y) at ``zoom`` — inverse of tiling.pixel_index_sql's
    floor mapping (columns tile_x, tile_y, idx must be in scope)."""
    npx = (1 << zoom) * tile_size
    gx = f"(tile_x * {tile_size} + idx % {tile_size})"
    gy = f"(tile_y * {tile_size} + CAST(idx / {tile_size} AS INT))"
    lon = f"((CAST({gx} AS DOUBLE) + 0.5) / {npx} * 360.0 - 180.0)"
    lat = (
        f"degrees(2.0 * atan(exp(pi() * (1.0 - 2.0 * "
        f"((CAST({gy} AS DOUBLE) + 0.5) / {npx})))) - pi() / 2.0)"
    )
    return lon, lat


def zonal_stats_rect(tiles: DataFrame, zoom: int, tile_size: int) -> DataFrame:
    """Zonal count/sum/min/max/mean of ``tiles``' cells over the
    rectangular zone grid (sqlgen zone arithmetic — F2 fixture). NoData
    (NULL/NaN) cells are excluded. For integer-valued rasters the sum
    (and hence the mean) is exact — double sums of integers < 2^53 are
    order-independent, so the DuckDB oracle hashes identically."""
    lon, lat = pixel_center_lonlat_sql(zoom, tile_size)
    px = tiles.selectExpr(
        "tile_x", "tile_y", "posexplode(cells) AS (idx, value)"
    ).filter("value IS NOT NULL AND NOT isnan(value)")
    zoned = px.selectExpr(
        f"{sqlgen.zone_id_for_point_sql(lon, lat)} AS zone_id", "value"
    )
    return zoned.groupBy("zone_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("value").alias("sum"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        (F.sum("value") / F.count("*")).alias("mean"),
    )


def zonal_histogram_rect(
    tiles: DataFrame, zoom: int, tile_size: int, bin_width: float = 1.0,
) -> DataFrame:
    """Per-zone HISTOGRAM of cell values (A1 × zonal: the polygonal
    histogram summary the reference's wcs/wms stats path exposes per
    request, computed for every zone at once). Bins are fixed-width
    floor buckets (bin = floor(value / width)); NoData excluded.
    Returns (zone_id, bin, count) — the long-form histogram table.

    Shape: same narrow posexplode + one (zone, bin) aggregation with
    map-side partials; hot zones collapse before the exchange."""
    lon, lat = pixel_center_lonlat_sql(zoom, tile_size)
    px = tiles.selectExpr(
        "tile_x", "tile_y", "posexplode(cells) AS (idx, value)"
    ).filter("value IS NOT NULL AND NOT isnan(value)")
    zoned = px.selectExpr(
        f"{sqlgen.zone_id_for_point_sql(lon, lat)} AS zone_id",
        f"CAST(floor(value / CAST({bin_width!r} AS DOUBLE)) AS BIGINT) AS bin",
    )
    return zoned.groupBy("zone_id", "bin").agg(F.count("*").alias("count"))


def local_moran(tiles: DataFrame) -> DataFrame:
    """Local Moran's I components per pixel (Anselin 1995 LISA — the
    classic spatial-autocorrelation statistic; queen contiguity,
    binary weights) over a dense tile table, cross-multiplied into
    EXACT BIGINT arithmetic so the output is partition- and
    engine-invariant:

        moran_q = (N·x_i − S) · (N·Σ_{j∈nbr(i)} x_j − n_i·S)
                = N² (x_i − μ) Σ_j (x_j − μ),   μ = S/N

    Positive moran_q ⇒ the pixel sits in a like-valued cluster
    (hot/cold spot); negative ⇒ a spatial outlier. The global Moran's I
    numerator is Σ moran_q / N² — callers can aggregate this table.

    Plan shape: two focal-fsum passes through the gated halo machinery
    (one over the values, one over a constant-1 raster to count each
    pixel's in-domain neighbors — edge pixels have fewer), a tile-key
    equi-join between them (same partitioning, AQE-coalesced), and one
    2-scalar global aggregate broadcast back. Bodies never shuffle;
    only the focal edge strips move, exactly as in the gated focal
    queries. Works on integer-valued rasters (doc-count densities);
    values are cast to BIGINT."""
    from ..maml import ast as M
    from ..maml.eval import eval_expr

    fs_v = eval_expr(M.focal("fsum", M.var("d"), radius=1), {"d": tiles}) \
        .selectExpr("tile_x", "tile_y",
                    "posexplode(cells) AS (idx, fsum_v)")
    ones = tiles.withColumn("cells", F.expr("transform(cells, x -> 1.0D)"))
    fs_1 = eval_expr(M.focal("fsum", M.var("d"), radius=1), {"d": ones}) \
        .selectExpr("tile_x", "tile_y",
                    "posexplode(cells) AS (idx, fsum_1)")
    v = tiles.selectExpr("tile_x", "tile_y",
                         "posexplode(cells) AS (idx, value)") \
        .selectExpr("tile_x", "tile_y", "idx",
                    "CAST(coalesce(value, 0.0D) AS BIGINT) AS v")
    key = ["tile_x", "tile_y", "idx"]
    joined = (v.join(fs_v, key).join(fs_1, key)
              .selectExpr("tile_x", "tile_y", "idx", "v",
                          "CAST(fsum_v AS BIGINT) - v AS nb_sum",
                          "CAST(fsum_1 AS BIGINT) - 1 AS nb_cnt"))
    stats = v.agg(F.count("*").cast("long").alias("n_pix"),
                  F.sum("v").cast("long").alias("s_sum"))
    return (joined.crossJoin(F.broadcast(stats))
            .selectExpr(
                "tile_x", "tile_y", "idx", "v", "nb_cnt",
                "(n_pix * v - s_sum) * (n_pix * nb_sum - nb_cnt * s_sum) "
                "AS moran_q"))
