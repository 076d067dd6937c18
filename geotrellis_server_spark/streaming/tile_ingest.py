"""Streaming tile ingest — incremental density-pyramid maintenance.

New point batches (doc events with lon/lat) are keyed to (tile, pixel)
and their per-pixel COUNT DELTAS appended to a delta table partitioned
by zoom; serving reads merge deltas with a SUM — the classic
hypertable-rollup shape (append cheap deltas, compact lazily) applied
to the raster pyramid. Parity target: the reference serves precomputed
layers only; this is the ingest path a live deployment needs on top.
(streaming/incremental.py maintains per-TILE totals; this module
maintains the per-PIXEL raster itself — its serving view is
row-for-row ``rasterize_count`` output, ready for focal/style/pyramid
ops.)

Scale shape:
- each micro-batch aggregates map-side to ≤ touched-pixel rows before
  any write (partial aggregation; a batch touching 1M pixels appends
  1M delta rows no matter how many input events),
- the delta table is PARTITIONED BY zoom: tile serving prunes to one
  zoom directory, then groupBy(tile, pixel) SUM merges batch deltas —
  the same narrow schema ``rasterize_count``'s per-pixel stage uses,
- idempotent retries: each batch overwrites its own
  ``batch_id=N/zoom=Z`` subtree (foreachBatch replay-safe recipe shared
  with the other streaming sinks),
- ``compact_tile_deltas`` rolls all deltas into one densified tile
  table (``_densify_tiles``) — run offline; ingest never blocks on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.tiling import _densify_tiles, pixel_index_sql

POINT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def _pixel_deltas(batch: DataFrame, zoom: int, tile_size: int) -> DataFrame:
    tx, ty, px, py = pixel_index_sql("lon", "lat", zoom, tile_size)
    return (
        batch.select(
            F.expr(tx).alias("tile_x"),
            F.expr(ty).alias("tile_y"),
            (F.expr(py) * tile_size + F.expr(px)).alias("pixel"),
        )
        .groupBy("tile_x", "tile_y", "pixel")
        .agg(F.count("*").alias("cnt"))
        .withColumn("zoom", F.lit(zoom))
    )


def start_tile_ingest(
    spark: SparkSession,
    source_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    zoom: int,
    tile_size: int = 64,
    max_files_per_trigger: int | None = None,
):
    """AvailableNow stream: new point parquet files → per-pixel count
    deltas appended under ``batch_id=N/zoom=Z``. Returns the query."""
    reader = spark.readStream.schema(POINT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        deltas = _pixel_deltas(batch_df, zoom, tile_size)
        # the batch segment carries the zoom so two ingest streams
        # sharing one delta_dir (one per zoom, each with its own
        # checkpoint and thus its own batch_id=0) can never clobber
        # each other's subtree
        deltas.write.mode("overwrite").partitionBy("zoom").parquet(
            os.path.join(delta_dir, f"batch_id=z{zoom}_{batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_tile_counts(
    spark: SparkSession, delta_dir: str, zoom: int
) -> DataFrame:
    """Merged per-pixel counts at one zoom: partition-pruned scan of the
    delta table + SUM across batches."""
    return (
        spark.read.option("basePath", delta_dir).parquet(delta_dir)
        .where(F.col("zoom") == zoom)
        .groupBy("tile_x", "tile_y", "pixel")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_tiles(
    spark: SparkSession, delta_dir: str, zoom: int, tile_size: int = 64
) -> DataFrame:
    """Serving view: merged deltas densified to TILE_SCHEMA-core rows —
    identical to ``rasterize_count`` over the full point history."""
    return _densify_tiles(read_tile_counts(spark, delta_dir, zoom),
                          zoom, tile_size)


def compact_tile_deltas(
    spark: SparkSession, delta_dir: str, compacted_dir: str, zoom: int,
    tile_size: int = 64,
) -> None:
    """Offline rollup: fold every batch's deltas into one dense tile
    table partitioned by zoom (the read path over compacted output is
    a plain scan, no merge)."""
    read_tiles(spark, delta_dir, zoom, tile_size).write.mode(
        "overwrite"
    ).partitionBy("zoom").parquet(compacted_dir)
