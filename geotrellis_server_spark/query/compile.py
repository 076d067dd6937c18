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


# ---------------------------------------------------------------------------
# Q3: explicit remote-index pushdown compiler (reference
# stac-example/.../SearchFiltersQuery.scala:50-120 — And/Or compile to
# bbox/datetime intersection/union semigroups for a REMOTE search, not
# just a row predicate). compile_scan_region produces the prunable
# (bbox × time-interval) over-approximation of a query tree; the exact
# row predicate is applied as a residual after the pruned scan.
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class ScanRegion:
    """Conservative scan bounds: ``bbox``/``time`` of None = unbounded
    (universe); ``empty`` = provably no results (prune everything).
    And = dimension-wise INTERSECTION; Or = dimension-wise hull UNION —
    exactly the SearchFilters semigroup pair (``&`` / TemporalExtent
    union), over-approximating Or so pruning never drops a result."""

    bbox: tuple[float, float, float, float] | None = None
    time: tuple[dt.datetime, dt.datetime] | None = None
    empty: bool = False


def _bbox_and(a, b):
    if a is None:
        return b, False
    if b is None:
        return a, False
    xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
    xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
    if xmin > xmax or ymin > ymax:
        return None, True
    return (xmin, ymin, xmax, ymax), False


def _bbox_or(a, b):
    if a is None or b is None:
        return None
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def _time_and(a, b):
    if a is None:
        return b, False
    if b is None:
        return a, False
    lo, hi = max(a[0], b[0]), min(a[1], b[1])
    if lo > hi:
        return None, True
    return (lo, hi), False


def _time_or(a, b):
    if a is None or b is None:
        return None
    return (min(a[0], b[0]), max(a[1], b[1]))


def compile_scan_region(node: Q.Query) -> ScanRegion:
    if isinstance(node, Q.Nothing):
        return ScanRegion(empty=True)
    if isinstance(node, (Q.All, Q.WithName, Q.WithNames)):
        return ScanRegion()  # name prefilter is not a layout dimension
    if isinstance(node, Q.At):
        return ScanRegion(time=(node.time, node.time))
    if isinstance(node, Q.Between):
        return ScanRegion(time=(node.t_from, node.t_to))
    if isinstance(node, (Q.Intersects, Q.Covers, Q.Contains)):
        return ScanRegion(bbox=tuple(node.extent))
    if isinstance(node, Q.And):
        left, right = compile_scan_region(node.left), compile_scan_region(node.right)
        if left.empty or right.empty:
            return ScanRegion(empty=True)
        bbox, e1 = _bbox_and(left.bbox, right.bbox)
        time, e2 = _time_and(left.time, right.time)
        if e1 or e2:
            return ScanRegion(empty=True)
        return ScanRegion(bbox=bbox, time=time)
    if isinstance(node, Q.Or):
        left, right = compile_scan_region(node.left), compile_scan_region(node.right)
        if left.empty:
            return right
        if right.empty:
            return left
        return ScanRegion(bbox=_bbox_or(left.bbox, right.bbox),
                          time=_time_or(left.time, right.time))
    raise TypeError(type(node))


def point_record_predicate(
    node: Q.Query, lon: str = "lon", lat: str = "lat", time_col: str = "ts"
) -> Column:
    """Exact residual predicate over POINT-record tables (lon/lat/ts
    columns) — the row-level filter applied after the pruned scan.
    Spatial nodes test point containment in the query extent; temporal
    nodes follow raster-source semantics (Between half-open)."""
    if isinstance(node, Q.Nothing):
        return F.lit(False)
    if isinstance(node, (Q.All, Q.WithName, Q.WithNames)):
        return F.lit(True)
    if isinstance(node, Q.At):
        return F.col(time_col) == _lit_ts(node.time)
    if isinstance(node, Q.Between):
        c = F.col(time_col)
        return (c >= _lit_ts(node.t_from)) & (c < _lit_ts(node.t_to))
    if isinstance(node, (Q.Intersects, Q.Covers, Q.Contains)):
        xmin, ymin, xmax, ymax = node.extent
        return (
            (F.col(lon) >= F.lit(xmin)) & (F.col(lon) <= F.lit(xmax))
            & (F.col(lat) >= F.lit(ymin)) & (F.col(lat) <= F.lit(ymax))
        )
    if isinstance(node, Q.And):
        return point_record_predicate(node.left, lon, lat, time_col) & point_record_predicate(
            node.right, lon, lat, time_col
        )
    if isinstance(node, Q.Or):
        return point_record_predicate(node.left, lon, lat, time_col) | point_record_predicate(
            node.right, lon, lat, time_col
        )
    raise TypeError(type(node))


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
