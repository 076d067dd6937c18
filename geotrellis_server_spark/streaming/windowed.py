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



SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# pending sessions as parallel arrays: applyInPandasWithState state rows
# are fixed-schema, so variable-length pending lists live in ArrayType
# columns (bounded by sessions-per-user still open within the watermark)
SESSION_PENDING_STATE = T.StructType(
    [
        T.StructField("starts_ms", T.ArrayType(T.LongType())),
        T.StructField("lasts_ms", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def streaming_session_counts(
    stream: DataFrame,
    gap_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time sessionization the declarative way:
    ``F.session_window`` — the engine merges overlapping event windows
    per user, holds only open sessions in state, and emits each closed
    session exactly once after the watermark passes (append mode). This
    is the 100-TB path: session merging happens inside the streaming
    aggregation operator (codegen, RocksDB-spillable state), no Python.

    Output: (user_id, session_start, session_end, n_events) — the same
    shape as the batch twin operators/asof.py:sessionize, which the
    equivalence test compares against."""
    gap = f"{gap_minutes} minutes"
    return (
        stream.withWatermark(ts_col, gap)
        .groupBy(F.col(user_col).alias("user_id"),
                 F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            # session_window.end = last event + gap; report the LAST
            # EVENT time like the batch operator does
            (F.col("sw.end") - F.expr(f"INTERVAL {gap_minutes} MINUTES")
             ).alias("session_end"),
            "n_events",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    gap_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessionization via ``applyInPandasWithState`` — the custom
    stateful escape hatch, for when the emitted record needs computation
    ``session_window`` can't express (per-session features, first/last
    event payloads, ...). Semantics match :func:`streaming_session_counts`:

    - state per user = the PENDING sessions (start, last, count arrays)
      still inside the watermark — not raw events, so state stays O(open
      sessions), and a within-batch gap splits sessions exactly like the
      batch operator (events are gap-coalesced, not blindly merged);
    - a pending session is emitted once the watermark passes
      last + gap (checked on every invocation, plus an event-time
      timeout wake-up for users with no new events).
    """
    gap_ms = gap_minutes * 60_000

    def _update(key: tuple, pdfs: Any, state: GroupState) -> Any:
        pending: list[list[int]] = []  # [start_ms, last_ms, n]
        if state.exists:
            starts, lasts, counts = state.get
            pending = [[int(s), int(e), int(n)]
                       for s, e, n in zip(starts, lasts, counts)]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = (pdf[ts_col].astype("int64") // 1_000_000).sort_values()
            for t in ms:
                t = int(t)
                if pending and t - pending[-1][1] <= gap_ms and t >= pending[-1][0]:
                    pending[-1][1] = max(pending[-1][1], t)
                    pending[-1][2] += 1
                elif pending and t < pending[-1][0]:
                    # out-of-order across batches: merge into whichever
                    # pending session covers it, else open one in place
                    placed = False
                    for sess in pending:
                        if sess[0] - gap_ms <= t <= sess[1] + gap_ms:
                            sess[0] = min(sess[0], t)
                            sess[1] = max(sess[1], t)
                            sess[2] += 1
                            placed = True
                            break
                    if not placed:
                        pending.append([t, t, 1])
                        pending.sort()
                else:
                    pending.append([t, t, 1])
        # coalesce adjacent pending sessions a late event may have bridged
        pending.sort()
        merged: list[list[int]] = []
        for sess in pending:
            if merged and sess[0] - merged[-1][1] <= gap_ms:
                merged[-1][1] = max(merged[-1][1], sess[1])
                merged[-1][2] += sess[2]
            else:
                merged.append(sess)
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in merged if s[1] + gap_ms <= wm]
        still = [s for s in merged if s[1] + gap_ms > wm]
        if still:
            state.update((
                [s[0] for s in still],
                [s[1] for s in still],
                [s[2] for s in still],
            ))
            state.setTimeoutTimestamp(min(s[1] for s in still) + gap_ms)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s[0], unit="ms") for s in closed],
                    "session_end": [pd.Timestamp(s[1], unit="ms") for s in closed],
                    "n_events": [s[2] for s in closed],
                }
            )

    keyed = stream.withWatermark(ts_col, f"{gap_minutes} minutes").select(
        F.col(user_col).alias("user_id"), F.col(ts_col)
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_PENDING_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- streaming OD flows: watermark-exact trajectory pairs -------------------

OD_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("src_cell", T.LongType()),
    T.StructField("dst_cell", T.LongType()),
])
# per-user state: the latest FINALIZED event + the pending (> watermark)
# events as parallel arrays
OD_STATE = T.StructType([
    T.StructField("last_ts", T.LongType()),      # -1 = none yet
    T.StructField("last_tb", T.LongType()),
    T.StructField("last_cell", T.LongType()),
    T.StructField("p_ts", T.ArrayType(T.LongType())),
    T.StructField("p_tb", T.ArrayType(T.LongType())),
    T.StructField("p_cell", T.ArrayType(T.LongType())),
])


def streaming_od_flows(
    stream: DataFrame,
    res: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lateness_minutes: int = 60,
) -> DataFrame:
    """Streaming twin of operators/trajectory.od_flows: one trip row per
    consecutive (by event time, tiebreak) event pair per user. EXACT
    under out-of-order arrival within the watermark: an event pair is
    emitted only once BOTH sides are <= the watermark — no later event
    can land between two finalized ones, so the emitted trips are
    precisely the batch operator's pairs (asserted batch-equivalent in
    tests). State per user = the latest finalized event + the pending
    (still-reorderable) events: O(events inside the lateness window),
    not O(history). Expects lon/lat already resolved to ``cell``
    upstream (row-local — sqlgen.cell_key_sql)."""

    def _update(key: tuple, pdfs: Any, state: GroupState) -> Any:
        last = (-1, -1, -1)
        pend: list[tuple[int, int, int]] = []
        if state.exists:
            lt, lb, lc, pts, ptb, pcell = state.get
            last = (int(lt), int(lb), int(lc))
            pend = [(int(a), int(b), int(c))
                    for a, b, c in zip(pts, ptb, pcell)]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = (pdf[ts_col].astype("int64") // 1_000_000)
            for t, tb, c in zip(ms, pdf[tiebreak_col], pdf["cell"]):
                pend.append((int(t), int(tb), int(c)))
        pend.sort()
        wm = state.getCurrentWatermarkMs()
        final = [e for e in pend if e[0] <= wm]
        pend = [e for e in pend if e[0] > wm]
        out = []
        for e in final:
            if last[0] >= 0:
                out.append((last[2], e[2]))
            last = e
        if pend or last[0] >= 0:
            state.update((last[0], last[1], last[2],
                          [e[0] for e in pend], [e[1] for e in pend],
                          [e[2] for e in pend]))
            if pend:
                state.setTimeoutTimestamp(min(e[0] for e in pend) + 1)
        if out:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(out),
                "src_cell": [s for s, _ in out],
                "dst_cell": [d for _, d in out],
            })

    keyed = stream.withWatermark(ts_col, f"{lateness_minutes} minutes") \
        .select(F.col(user_col).alias("user_id"), F.col(ts_col),
                F.col(tiebreak_col), F.col("cell"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OD_SCHEMA,
        stateStructType=OD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
