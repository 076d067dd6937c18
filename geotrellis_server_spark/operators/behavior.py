"""Behavioral event analytics — ordered conversion funnels and
retention cohorts, the two standard product/log aggregates.

Reference parity note: outside geotrellis-server's raster scope; part
of the brief's large-scale log-analytics family (the events table is
the interleaved corpus' activity stream). Both operators are exact
integer/timestamp arithmetic — engine-reproducible."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage k when an event
    of ``stages[k]`` occurs AT OR AFTER their stage-(k-1) time (the
    strictly-ordered funnel; simultaneous timestamps count — ties are
    inclusive like the as-of join). Returns (stage_idx, stage, n_users)
    with stage_idx 1-based; n_users is monotonically non-increasing.

    Scale shape: ONE pass per stage — a conditional-min aggregate keyed
    by user (map-side combined) joined back broadcast-free on the user
    key; k stages = k cheap aggregates over the already-keyed frame,
    never a self-join of the raw log."""
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = events.select(F.col(user_col).alias("u"),
                        F.col(ts_col).alias("t"),
                        F.col(type_col).alias("e"))
    reached = None  # (u, t_k) for users at stage k
    counts = []
    for k, s in enumerate(stages):
        if reached is None:
            reached = (cur.where(F.col("e") == s)
                       .groupBy("u").agg(F.min("t").alias("tk")))
        else:
            reached = (cur.where(F.col("e") == s)
                       .join(reached, "u")
                       .where(F.col("t") >= F.col("tk"))
                       .groupBy("u").agg(F.min("t").alias("tk")))
        counts.append(reached.agg(
            F.count("*").cast("long").alias("n")).collect()[0]["n"])
    spark = events.sparkSession
    return spark.createDataFrame(
        [(i + 1, s, int(n)) for i, (s, n) in enumerate(zip(stages,
                                                           counts))],
        "stage_idx int, stage string, n_users long")


def retention_cohorts(
    events: DataFrame,
    period_s: int = 7 * 24 * 3600,
    user_col: str = "user_id",
    ts_col: str = "s",
) -> DataFrame:
    """Retention cohort matrix: users grouped by their FIRST-ACTIVITY
    period (cohort), counted in every later period they act in.
    Returns (cohort, period_offset, n_users) — offset 0 is the cohort
    size itself. ``ts_col`` is epoch seconds (BIGINT); periods are
    floor(ts / period_s) — exact integers.

    Scale shape: first-activity is a user-keyed min aggregate; the
    activity matrix is a distinct over (user, period) then one
    map-side-combined count keyed by (cohort, offset) — bounded by
    users x active periods, never the raw event count."""
    p = int(period_s)
    if p <= 0:
        raise ValueError("period_s must be > 0")
    ev = events.select(F.col(user_col).alias("u"),
                       F.expr(f"CAST(floor({ts_col} / {p}) AS BIGINT)")
                       .alias("per"))
    first = ev.groupBy("u").agg(F.min("per").alias("cohort"))
    active = ev.distinct()
    return (active.join(first, "u")
            .groupBy("cohort",
                     (F.col("per") - F.col("cohort"))
                     .alias("period_offset"))
            .agg(F.count("*").cast("long").alias("n_users")))


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's time-
    ordered event-type sequence: (from_type, to_type, n_transitions) —
    the user-journey model behind path analysis. Total (ts, tiebreak)
    ordering makes lag() deterministic.

    Scale shape: one user-keyed window exchange (free on user-
    partitioned logs), then a map-side-combined count onto at most
    |types|^2 rows — the od_flows shape with types for cells."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(tiebreak_col))
    return (events
            .select(F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
                    F.col(type_col).alias("to_type"))
            .withColumn("from_type", F.lag("to_type").over(w))
            .where(F.col("from_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count("*").alias("n_transitions")))
