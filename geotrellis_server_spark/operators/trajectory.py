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
