"""Bucketed pre-keyed tables — the amortized-ingest path for repeated
tile/zone analytics (SURVEY.md O6 "materialized tiles table = explicit
cache" + north-rule range-partitioned shuffles).

At 10^12-doc scale the winning layout is: extract geometry + keys ONCE at
ingest, store bucketed by the aggregation/join keys (Spark bucketing =
Iceberg bucket transform equivalent). Every later groupBy/join on those
keys runs with NO Exchange — the bucketing proof is in the physical plan
and asserted by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spatial_join, tiling
from . import synth


def materialize_keyed_table(
    spark: SparkSession,
    docs_with_geom: DataFrame,
    table: str,
    zoom: int = 12,
    n_buckets: int = 64,
) -> None:
    """docs → (doc_id, zone_id, tile_x, tile_y) stored bucketed+sorted by
    the aggregation keys."""
    zones = synth.zone_grid(spark)
    zc = spatial_join.build_rect_zone_cells(zones)
    keyed = tiling.assign_tiles(
        spatial_join.pip_join_rect(docs_with_geom, zones, zone_cells=zc), zoom
    ).select("doc_id", "zone_id", "tile_x", "tile_y")
    (
        keyed.write.mode("overwrite")
        .bucketBy(n_buckets, "zone_id", "tile_x", "tile_y")
        .sortBy("zone_id", "tile_x", "tile_y")
        .format("parquet")
        .saveAsTable(table)
    )


def tile_counts_from_keyed(spark: SparkSession, table: str) -> DataFrame:
    """The q1 aggregation over the bucketed table — shuffle-free: Spark
    recognizes the bucketing and plans HashAggregate without Exchange."""
    return (
        spark.table(table)
        .groupBy("zone_id", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_docs"))
    )


def materialize_tile_pyramid(
    tiles: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Store a tile table (zoom, tile_x, tile_y[, band], width, height,
    cells) bucketed+sorted by the HALO KEY. A focal/zonal/rollup pass
    over ``spark.table(table)`` then reuses the bucketing for its
    join-back: tile BODIES are read pre-partitioned from cold storage
    and never enter an exchange — only edge strips shuffle. This is the
    serve-from-disk analog of the ``repartition(key).cache()`` recipe
    (VERDICT r3 item 9): at 100 TB the pyramid lives in object storage,
    not executor memory, so the partitioning must come from the LAYOUT."""
    (
        tiles.write.mode("overwrite")
        .bucketBy(n_buckets, "zoom", "tile_x", "tile_y")
        .sortBy("zoom", "tile_x", "tile_y")
        .format("parquet")
        .saveAsTable(table)
    )
