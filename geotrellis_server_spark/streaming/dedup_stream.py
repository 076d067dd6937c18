"""Streaming ingest dedup — drop exact duplicates ACROSS micro-batches
(the dedup-at-ingest step of a training pipeline: the corpus stream is
filtered before it ever lands, instead of a full-corpus batch dedup
later).

``applyInPandasWithState`` keyed by content hash: the state holds one
tiny marker row per distinct hash (the survivor id); the FIRST document
carrying a hash is emitted, every later arrival — same batch or any
later batch — is dropped. Restart-safe via the checkpoint (the state
store replays), so exactly one survivor per hash across crashes too.

Scale shape: state size = number of DISTINCT documents seen, one ~50-byte
row each, hash-partitioned across executors by the groupBy key — the
standard RocksDB-state-store deployment handles 10^9+ keys; production
would add a TTL or move ancient keys to a bloom-filter tier, noted here
because this sandbox only exercises the semantics.

Reference note: the reference is strictly request/response (SURVEY.md
§2.10 — streaming is north-rule surface, not reference parity).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_STATE = T.StructType([T.StructField("survivor", T.LongType())])
_OUT = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:  # hash already emitted in an earlier batch → drop all
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        best = m if best is None else min(best, m)
    state.update((best,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """docs stream → (content_hash, doc_id) of each hash's FIRST document
    only (min id inside a batch; arrival order across batches)."""
    hashed = stream.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("doc_id")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_wave(spark: SparkSession, src_dir: str, out_dir: str,
                   checkpoint_dir: str):
    """One AvailableNow wave: read new files under ``src_dir``, emit
    first-seen docs to ``out_dir``. Re-invoke per wave; the checkpoint
    carries the seen-hash state forward."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    return (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
