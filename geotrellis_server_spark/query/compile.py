"""Query AST → Spark execution, two interpreters like the reference:

- ``raster_source_predicate``: RasterSourceRepository.algebra semantics
  (core/.../query/RasterSourceRepository.scala:37-65): At = exact equality,
  Between = half-open [t1, t2), missing time → no match,
  Contains evaluates covers (:60 — replicated quirk).
- ``ogc_layer_predicate``: OgcSourceRepository.algebra semantics
  (ogc/.../OgcSourceRepository.scala:31-67): At matches any position or
  start<=t<=end inclusive, EMPTY TIME MATCHES EVERYTHING, Between is the
  endpoint-overlap test on [t1, t2].

Both compile to a single Spark ``Column`` — Catalyst pushes the resulting
conjunctions into the catalog scan (the reference's pluggable
predicate-pushdown design, SURVEY.md §2.2/O1). ``eval_df`` additionally
provides the exact list-algebra multiset semantics (And = left-then-
intersect, Or = concat possibly duplicating) for parity testing.

Catalog DataFrame contract: columns ``name`` (string), ``xmin ymin xmax
ymax`` (double, the source's native extent), and temporal columns —
``time`` (timestamp, nullable) for raster-source catalogs, or
``times`` (array<timestamp>, nullable) / ``t_start``+``t_end``
(timestamps, nullable) for OGC-layer catalogs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ast as Q


def _lit_ts(t: dt.datetime) -> Column:
    return F.lit(t.astimezone(dt.timezone.utc).replace(tzinfo=None)).cast("timestamp")


def _spatial(node: Q.Query) -> Column:
    xmin, ymin, xmax, ymax = node.extent
    if isinstance(node, Q.Intersects):
        return (
            (F.col("xmax") >= F.lit(xmin))
            & (F.col("xmin") <= F.lit(xmax))
            & (F.col("ymax") >= F.lit(ymin))
            & (F.col("ymin") <= F.lit(ymax))
        )
    # Covers — and Contains, which the reference evaluates as covers
    return (
        (F.col("xmin") <= F.lit(xmin))
        & (F.col("ymin") <= F.lit(ymin))
        & (F.col("xmax") >= F.lit(xmax))
        & (F.col("ymax") >= F.lit(ymax))
    )


def raster_source_predicate(node: Q.Query) -> Column:
    if isinstance(node, Q.Nothing):
        return F.lit(False)
    if isinstance(node, Q.All):
        return F.lit(True)
    if isinstance(node, Q.WithName):
        return F.col("name") == node.name
    if isinstance(node, Q.WithNames):
        return F.col("name").isin(list(node.names))
    if isinstance(node, Q.At):
        return F.col(node.field_name) == _lit_ts(node.time)  # null → false
    if isinstance(node, Q.Between):
        c = F.col(node.field_name)
        return (c >= _lit_ts(node.t_from)) & (c < _lit_ts(node.t_to))  # half-open
    if isinstance(node, (Q.Intersects, Q.Covers, Q.Contains)):
        return _spatial(node)
    if isinstance(node, Q.And):
        return raster_source_predicate(node.left) & raster_source_predicate(node.right)
    if isinstance(node, Q.Or):
        return raster_source_predicate(node.left) | raster_source_predicate(node.right)
    raise TypeError(type(node))


def _ogc_temporal_at(node: Q.At) -> Column:
    t = _lit_ts(node.time)
    pos = F.exists(F.col("times"), lambda x: x == t)
    interval = (F.col("t_start") <= t) & (t <= F.col("t_end"))
    empty = F.col("times").isNull() & F.col("t_start").isNull()
    return empty | F.coalesce(pos, F.lit(False)) | F.coalesce(interval, F.lit(False))


def _ogc_temporal_between(node: Q.Between) -> Column:
    t1, t2 = _lit_ts(node.t_from), _lit_ts(node.t_to)
    start = F.coalesce(F.array_min("times"), F.col("t_start"))
    end = F.coalesce(F.array_max("times"), F.col("t_end"))
    overlap = ((t1 <= start) & (start <= t2)) | ((t1 <= end) & (end <= t2))
    empty = F.col("times").isNull() & F.col("t_start").isNull()
    return empty | F.coalesce(overlap, F.lit(False))


def ogc_layer_predicate(node: Q.Query) -> Column:
    if isinstance(node, Q.At):
        return _ogc_temporal_at(node)
    if isinstance(node, Q.Between):
        return _ogc_temporal_between(node)
    if isinstance(node, Q.And):
        return ogc_layer_predicate(node.left) & ogc_layer_predicate(node.right)
    if isinstance(node, Q.Or):
        return ogc_layer_predicate(node.left) | ogc_layer_predicate(node.right)
    return raster_source_predicate(node)


def eval_df(node: Q.Query, df: DataFrame, semantics: str = "raster_source") -> DataFrame:
    """Faithful list-algebra evaluation: And = left-then-intersect-right
    (right side evaluated over the left's output), Or = concat (may
    duplicate rows) — RasterSourceRepository.scala:61-64."""
    pred = raster_source_predicate if semantics == "raster_source" else ogc_layer_predicate
    if isinstance(node, Q.And):
        left = eval_df(node.left, df, semantics)
        return eval_df(node.right, left, semantics)
    if isinstance(node, Q.Or):
        return eval_df(node.left, df, semantics).union(eval_df(node.right, df, semantics))
    return df.filter(pred(node))
