"""Incremental tiling over a growing docs table (SURVEY.md §2.10: the
reference is strictly request/response; Structured Streaming with
Trigger.AvailableNow gives incremental pyramid maintenance "for free" —
optional coverage, not reference parity).

Shape: ``readStream`` over the docs directory → span geometry extraction
→ tile keys → per-micro-batch tile-count DELTAS appended via
``foreachBatch`` (exactly-once per batch id); the serving view is
``SUM(delta) GROUP BY tile`` — a standard streaming-rollup compaction
pattern that avoids update-mode state for unbounded key spaces (z12 keys
≈ doc count; watermark-less counts would hold all keys in state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import tiling
from ..sources import synth

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def incremental_tile_counts(
    spark: SparkSession, docs_dir: str, out_dir: str, zoom: int, checkpoint_dir: str
):
    """Start an AvailableNow stream: new docs parquet files → per-batch
    tile-count deltas appended to ``out_dir``. Returns the StreamingQuery
    (caller awaits termination). Restart-safe via the checkpoint."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    keyed = tiling.assign_tiles(synth.extract_geometry(stream), zoom)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent per batch id: a retried micro-batch OVERWRITES its own
        # directory instead of appending a second copy of the deltas
        (
            batch_df.groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("delta"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return (
        keyed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def serve_tile_counts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Compacted serving view over the delta log."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("tile_x", "tile_y")
        .agg(F.sum("delta").alias("n_docs"))
    )
