"""Streaming ANN index maintenance — incremental IVF ingest.

New embedding batches are assigned to their coarse-quantizer cell
(Arrow-batched matmul, operators/similarity.ivf_assign) and appended to
the cells-as-partition-directories layout that ``ivf_read_probe`` scans
with planning-time pruning. The codebook is trained ONCE (on a backfill
or the first wave) and held fixed during ingest — the standard serving
recipe; retraining is an offline rebuild.

Idempotence: each micro-batch writes under ``batch_id=N`` and OVERWRITES
its own directory on retry (same recipe as the other streaming sinks);
the probe path reads the whole layout, where ``ivf_cell`` remains a
partition column (second level), so nprobe pruning still skips every
unprobed cell's files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import similarity as S

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def start_ivf_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids,
    max_files_per_trigger: int | None = None,
):
    """AvailableNow stream: new embedding parquet files → cell-assigned
    rows appended to the partitioned index. Returns the StreamingQuery."""
    reader = spark.readStream.schema(EMB_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        assigned = S.ivf_assign(batch_df, centroids, cell_col="ivf_cell")
        assigned.write.mode("overwrite").partitionBy("ivf_cell").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def probe_topk(
    spark: SparkSession, index_dir: str, centroids, query_vec: list[float],
    k: int, nprobe: int = 4,
) -> DataFrame:
    """Query the ingested index: prune to the nprobe nearest cells
    (partition pruning over ivf_cell) and exact top-k within them."""
    _, probes = S._probe_cells(centroids, query_vec, nprobe)
    scanned = spark.read.parquet(index_dir).filter(
        F.col("ivf_cell").isin(probes)
    )
    return S.cosine_topk(scanned.drop("ivf_cell", "batch_id"), query_vec, k)
