"""Streaming MinHash-LSH index maintenance — near-dup detection at
ingest time (north-rule surface; the reference is request/response).

Each micro-batch of new documents:

1. computes MinHash band buckets for the batch (the same narrow
   ``array_min(transform(...))`` signatures as the batch pipeline in
   operators/dedup.py — no shuffle to build),
2. joins the batch's bucket rows against the PERSISTED bucket index to
   find new-vs-corpus candidates, plus a within-batch self-join for
   new-vs-new candidates,
3. verifies candidates with exact array_intersect Jaccard (token arrays
   come from the persisted doc-token table + the batch),
4. appends verified pairs, then appends the batch's bucket rows and
   token arrays to the index — so the NEXT batch sees this one.

Equivalence contract (tested): after draining a source with
Trigger.AvailableNow, the accumulated pairs equal the one-shot batch
``minhash_dedup_pairs`` over the full corpus — incremental maintenance
changes WHEN pairs are found, never WHICH.

Scale shape: the index is two narrow parquet tables — (doc_id, band,
bucket) and (doc_id, toks) — both append-only; the per-batch join
touches only the batch's buckets (equi-join on band+bucket, broadcast
when the batch is small). State lives in the tables, not the state
store, so index size is unbounded by executor memory. Per-batch
idempotence: every append partitions by batch_id and OVERWRITES its own
directory, so a retried micro-batch never double-writes (same recipe as
streaming/incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import dedup

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def band_bucket_rows(
    docs: DataFrame, k: int = 8, bands: int = 4, rows_per_band: int = 2,
    id_col: str = "doc_id", tok_arrays: DataFrame | None = None,
) -> DataFrame:
    """(id, band, bucket) rows — the long form of the per-band bucket
    keys lsh_candidate_pairs builds internally (dedup.py:65).
    ``tok_arrays``: pre-tokenized (id, toks) to avoid re-splitting the
    text when the caller already has them."""
    if tok_arrays is None:
        tok_arrays = dedup.doc_token_arrays(docs, id_col=id_col)
    sigs = dedup.minhash_signatures_arrays(tok_arrays, k, id_col)
    parts = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        parts.append(
            sigs.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[F.col(c) for c in cols])).alias("bucket"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _read_if_exists(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # explicit existence check — a blanket except would silently treat a
    # CORRUPT index (crashed batch attempt) as empty and drop pairs
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


def start_lsh_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
):
    """Start the AvailableNow ingest stream; returns the StreamingQuery.
    ``index_dir`` accumulates buckets/ + toks/; ``pairs_dir`` accumulates
    verified (a, b, jaccard) rows. ``max_files_per_trigger`` caps batch
    size (tests use 1 to force true multi-batch incremental behavior)."""
    buckets_dir = os.path.join(index_dir, "buckets")
    toks_dir = os.path.join(index_dir, "toks")
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        new_toks = dedup.doc_token_arrays(batch_df).cache()
        new_buckets = band_bucket_rows(
            batch_df, k, bands, rows_per_band, tok_arrays=new_toks
        ).cache()

        old_buckets = _read_if_exists(
            spark, buckets_dir, "doc_id BIGINT, band INT, bucket STRING"
        ).select("doc_id", "band", "bucket")
        old_toks = _read_if_exists(
            spark, toks_dir, "doc_id BIGINT, toks ARRAY<STRING>"
        ).select("doc_id", "toks")

        # new-vs-corpus: equi-join on (band, bucket); orient a < b
        nvs = (
            new_buckets.alias("n")
            .join(old_buckets.alias("o"), ["band", "bucket"])
            .select(
                F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("a"),
                F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
        )
        # new-vs-new: within-batch self-join
        other = new_buckets.select(
            F.col("doc_id").alias("_b"), "band", "bucket"
        )
        nvn = (
            new_buckets.join(other, ["band", "bucket"])
            .filter(F.col("doc_id") < F.col("_b"))
            .select(F.col("doc_id").alias("a"), F.col("_b").alias("b"))
        )
        cand = nvs.union(nvn).distinct()
        all_toks = old_toks.union(new_toks)
        pairs = dedup.jaccard_verify_arrays(cand, all_toks, threshold)

        # idempotent per batch id (see module docstring)
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch_id={batch_id}")
        )
        new_buckets.write.mode("overwrite").parquet(
            os.path.join(buckets_dir, f"batch_id={batch_id}")
        )
        new_toks.write.mode("overwrite").parquet(
            os.path.join(toks_dir, f"batch_id={batch_id}")
        )
        batch_df.unpersist()
        new_toks.unpersist()
        new_buckets.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All near-dup pairs found so far (a, b, jaccard)."""
    return spark.read.parquet(pairs_dir).select("a", "b", "jaccard")
