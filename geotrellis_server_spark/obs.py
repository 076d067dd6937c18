"""Passive per-query metrics via Spark's Observation API (north rule:
"per-partition lineage and metrics tables" — lineage.py holds the
per-bucket/job tables; this module adds ZERO-COST per-query observability).

``df.observe(Observation, ...aggs)`` piggy-backs metric aggregates on the
query's own action — no second pass over the data, unlike a separate
``.count()``/``.agg()`` which would re-run the whole plan. At 100 TB a
"row counts per stage" debug pass that re-scans the input is its own
outage; observed metrics are free.

Usage::

    log = MetricsLog(spark)
    df = log.observe(stage_df, "pip_join", n=F.count(F.lit(1)),
                     n_null_zone=F.count_if(F.col("zone_id").isNull()))
    df.write...           # the action that populates the metrics
    log.snapshot()        # -> list of dicts (one per observed stage)
    log.metrics_df()      # -> DataFrame(stage, metric, value) table
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class MetricsLog:
    """Collects named Observations across a pipeline run and exposes the
    results as rows / a metrics DataFrame once the actions have run."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._obs: list[tuple[str, Observation, float]] = []

    def observe(self, df: DataFrame, stage: str, **metrics: Column) -> DataFrame:
        """Attach metric aggregates to ``df``; returns the same-shaped
        DataFrame (rows pass through untouched). Metrics materialize when
        the caller's action runs. Default metric when none given: row
        count ``n``."""
        if not metrics:
            metrics = {"n": F.count(F.lit(1))}
        ob = Observation(stage)
        out = df.observe(ob, *[c.alias(k) for k, c in metrics.items()])
        self._obs.append((stage, ob, time.time()))
        return out

    def snapshot(self, timeout: float | None = 30.0) -> list[dict]:
        """One dict per observed stage: {stage, ts, **metric_values}.
        ``Observation.get`` blocks until the owning action finished — a
        stage whose action never ran (error path skipped it) would hang
        forever, so each get runs under ``timeout`` seconds and
        unfinished stages are reported as {"_pending": True} instead of
        stalling the stages that DID materialize. ``timeout=None``
        blocks indefinitely (only safe when all actions are known to
        have run)."""
        import queue
        import threading

        rows = []
        for stage, ob, ts in self._obs:
            if timeout is None:
                rows.append({"stage": stage, "ts": ts, **ob.get})
                continue
            # daemon thread, NOT a ThreadPoolExecutor: the pool's context
            # exit joins its worker, which would re-block on the stuck get
            q: queue.Queue = queue.Queue(1)
            t = threading.Thread(target=lambda o=ob: q.put(o.get), daemon=True)
            t.start()
            try:
                rows.append({"stage": stage, "ts": ts, **q.get(timeout=timeout)})
            except queue.Empty:
                rows.append({"stage": stage, "ts": ts, "_pending": True})
        return rows

    def metrics_df(self, timeout: float | None = 30.0) -> DataFrame:
        """Long-form metrics table (stage, metric, value, value_str) —
        the shape that appends cleanly to a per-run metrics
        parquet/Iceberg table next to lineage.py's per-bucket rows.
        Non-numeric observed metrics (strings, timestamps) land in
        ``value_str`` with a NULL ``value`` instead of aborting the
        table."""
        long_rows = []
        for r in self.snapshot(timeout):
            stage, ts = r.pop("stage"), r.pop("ts")
            for k, v in r.items():
                try:
                    num, txt = (float(v) if v is not None else 0.0), None
                except (TypeError, ValueError):
                    num, txt = None, str(v)
                long_rows.append((stage, k, num, txt, ts))
        return self.spark.createDataFrame(
            long_rows,
            "stage STRING, metric STRING, value DOUBLE, value_str STRING, ts DOUBLE",
        )
