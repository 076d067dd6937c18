"""Watermarked windowed streaming aggregation + custom stateful operator
(SURVEY.md §2.10 optional coverage; north-rule streaming checklist:
``readStream → transforms → writeStream``, watermark + windowed aggs for
late data, ``applyInPandasWithState`` for custom stateful operators).

Two operators over a geo event stream (event_id, lon, lat, ts):

- ``windowed_tile_counts``: tumbling event-time windows × tile key, with
  a watermark — late events beyond the watermark are DROPPED and closed
  windows are emitted exactly once (append mode). State is bounded by
  (open windows × active tiles), not by stream length.
- ``stateful_tile_totals``: running per-tile cumulative totals via
  ``applyInPandasWithState`` (GroupState) — the custom-stateful-operator
  escape hatch for semantics windows can't express (here: monotone
  running totals emitted per micro-batch, state = one row per tile).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import sqlgen

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def windowed_tile_counts(
    stream: DataFrame,
    zoom: int,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """events → (window, tile_x, tile_y, n_events); append-mode-ready
    (emit once per closed window; events later than the watermark are
    dropped by the engine)."""
    keyed = stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.expr(sqlgen.tile_x_sql("lon", zoom)).alias("tile_x"),
        F.expr(sqlgen.tile_y_sql("lat", zoom)).alias("tile_y"),
    )
    return keyed.groupBy(
        F.window(ts_col, window).alias("window"), "tile_x", "tile_y"
    ).agg(F.count("*").alias("n_events"))


STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("total", T.LongType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + n
    state.update((total,))
    yield pd.DataFrame({"tile_x": [key[0]], "tile_y": [key[1]], "total": [total]})


def stateful_tile_totals(stream: DataFrame, zoom: int, ts_col: str = "ts") -> DataFrame:
    """Running per-tile event totals across micro-batches — GroupState
    holds one counter per tile (state size = active tile count, restart-
    safe via the checkpoint). Output mode: update (each batch emits the
    new totals of the tiles it touched)."""
    keyed = stream.select(
        F.expr(sqlgen.tile_x_sql("lon", zoom)).alias("tile_x"),
        F.expr(sqlgen.tile_y_sql("lat", zoom)).alias("tile_y"),
    )
    return keyed.groupBy("tile_x", "tile_y").applyInPandasWithState(
        _update_totals,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
