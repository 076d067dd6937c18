"""Trajectory analytics over event streams — origin/destination flow
matrices on the engine's cell grid.

Reference parity note: the reference engine (geotrellis-server) serves
rasters and has no movement analytics; this belongs to the spatial-
analytics family the brief adds (OD matrices on a discrete global grid
are the standard mobility/log-analytics aggregate, cf. Uber's H3
hexbin OD work — here on the engine's quadtree cell keys,
grids/cells.py / sqlgen.cell_key_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotrellis_server_spark import sqlgen


def od_flows(
    events: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    res: int = 4,
) -> DataFrame:
    """Origin→destination flow counts: for every user's time-ordered
    event sequence, each consecutive event pair contributes one trip
    from the cell of the earlier event to the cell of the later one.
    Returns (src_cell, dst_cell, n_trips). Cell ids are the engine's
    packed quadtree keys (cx * 2^res + cy — the SpatialKey mapping).

    Ordering is total — (ts, tiebreak) — so lag() is deterministic
    under any partitioning and any engine; all arithmetic is integer.

    Scale shape: ONE exchange keyed by user (the window partition;
    free when the event log is already stored partitioned by user, the
    natural layout for per-user logs), then a groupBy(src, dst) count
    with map-side partials onto at most 4^res * 4^res rows. A hot cell
    pair is absorbed by the partial aggregation, not a shuffle skew."""
    cell = sqlgen.cell_key_sql(lon_col, lat_col, res)
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(tiebreak_col))
    return (events
            .select(F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
                    F.expr(cell).alias("dst_cell"))
            .withColumn("src_cell", F.lag("dst_cell").over(w))
            .where(F.col("src_cell").isNotNull())
            .groupBy("src_cell", "dst_cell")
            .agg(F.count("*").alias("n_trips")))


def _haversine_q_expr(lon1: str, lat1: str, lon2: str, lat2: str,
                      scale: int = 1 << 10) -> str:
    """Great-circle metres, floor-quantized to 1/scale m — the identical
    IEEE expression tree in Spark and DuckDB (x*x, never pow; a 1-ULP
    trig divergence only flips the floor within 2^-42 of a quantum
    boundary — the dsir/ln doctrine applied to trig)."""
    dlat = f"sin(radians(({lat2}) - ({lat1})) / 2)"
    dlon = f"sin(radians(({lon2}) - ({lon1})) / 2)"
    a = (f"({dlat}) * ({dlat}) + cos(radians({lat1})) * "
         f"cos(radians({lat2})) * ({dlon}) * ({dlon})")
    return (f"CAST(floor(2.0 * 6371000.0 * asin(sqrt({a})) * "
            f"{float(scale)!r}) AS BIGINT)")


def trajectory_stats(
    events: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user movement statistics over the time-ordered event
    sequence: (user_id, n_trips, total_dist_q, max_hop_q) with each
    hop's haversine metres floor-quantized to 2^-10 m BEFORE the
    sum/max, so the aggregates are exact integers — partition- and
    engine-invariant.

    Scale shape: one exchange keyed by user for the lag window (free on
    a user-partitioned event log), then a map-side-combined user-keyed
    aggregate. The quantized-hop stream never widens."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(tiebreak_col))
    hops = (events
            .select(F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
                    F.col(lon_col).alias("_lon"),
                    F.col(lat_col).alias("_lat"))
            .withColumn("_plon", F.lag("_lon").over(w))
            .withColumn("_plat", F.lag("_lat").over(w))
            .where(F.col("_plon").isNotNull())
            .select(F.col(user_col), F.expr(_haversine_q_expr(
                "_plon", "_plat", "_lon", "_lat")).alias("hop_q")))
    return hops.groupBy(user_col).agg(
        F.count("*").cast("long").alias("n_trips"),
        F.sum("hop_q").alias("total_dist_q"),
        F.max("hop_q").alias("max_hop_q"))
