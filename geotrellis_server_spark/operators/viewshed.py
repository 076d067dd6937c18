"""Viewshed / line-of-sight over an elevation raster (GeoTrellis
parity: ``geotrellis.raster.viewshed.R2Viewshed`` — the visibility op
of the terrain family; like costdistance.py this is a build-side
library op underneath the reference's served layers).

R2-style semantics re-expressed for set-at-a-time execution: a target
cell C is visible from source S iff no cell strictly between them on
the rounded-DDA sight line subtends a LARGER elevation angle than C
does. With the line parameterized by Chebyshev step t of n, horizontal
distance is proportional to t, so the comparison

    blocked(C) ⟺ ∃ t ∈ (0, n):  (z_t − z_s) · n  >  (z_c − z_s) · t

is exact BIGINT arithmetic (the true distance cancels) — engine- and
partitioning-invariant, no trigonometry anywhere. Grazing incidence
(equal angles) counts visible, matching R2Viewshed's ≥-running-max
rule. The sequential implementation walks rays outward reusing a
running max; the data-parallel re-expression trades that O(w²) total
work for O(w³) fully-independent row-local work — the right trade on
an engine whose bottleneck is coordination, with w bounded by the
practical viewshed radius.

Scale shape: intermediate-sample generation is a row-local explode
(≤ n per target); elevations attach by ONE equi-join on the cell key
(co-located when the raster is stored keyed); the verdict is ONE
map-side-combined max per target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .trajectory import _dda_coord_sql


def viewshed(
    elevation: DataFrame,
    source: tuple[int, int],
    cx: str = "cx",
    cy: str = "cy",
    z: str = "z",
) -> DataFrame:
    """``(cx, cy, visible)`` for every cell of the dense elevation
    window, line-of-sight from ``source`` (which must be a window cell).
    """
    sx, sy = (int(v) for v in source)
    cells = elevation.select(
        F.col(cx).alias("cx"), F.col(cy).alias("cy"),
        F.col(z).cast("long").alias("z"),
    ).localCheckpoint(eager=True)
    src = cells.where(f"cx = {sx} AND cy = {sy}").collect()
    if not src:
        raise ValueError(f"source {source} is not a window cell")
    zs = int(src[0].z)

    targets = cells.select(
        "cx", "cy", "z",
        F.expr(f"greatest(abs(cx - ({sx})), abs(cy - ({sy})))").alias("n"),
    )
    ix = _dda_coord_sql(str(sx), "cx", "n", "t")
    iy = _dda_coord_sql(str(sy), "cy", "n", "t")
    steps = (
        targets.where("n >= 2")
        .select(
            "cx", "cy", "z", "n",
            F.expr("explode(sequence(1, n - 1))").alias("t"),
        )
        .select(
            "cx", "cy", "z", "n", "t",
            F.expr(ix).alias("ix"), F.expr(iy).alias("iy"),
        )
    )
    mid = cells.select(F.col("cx").alias("ix"), F.col("cy").alias("iy"),
                       F.col("z").alias("zt"))
    blocked = (
        steps.join(mid, ["ix", "iy"])
        .groupBy("cx", "cy")
        .agg(F.max(
            F.expr(f"(zt - {zs}) * n - (z - {zs}) * t")).alias("worst"))
        .select("cx", "cy", (F.col("worst") > 0).alias("blocked"))
    )
    return (
        targets.join(blocked, ["cx", "cy"], "left")
        .select("cx", "cy",
                F.expr("NOT coalesce(blocked, false)").alias("visible"))
    )


def viewshed_oracle_sql(dom_sql: str, source: tuple[int, int]) -> str:
    """DuckDB oracle over a cell-domain subquery exposing ``cx, cy, z``
    — the same exact-integer blocking rule via a correlated NOT EXISTS
    spelled as a range unnest + anti-style aggregation."""
    sx, sy = (int(v) for v in source)
    ix = _dda_coord_sql(str(sx), "t2.cx", "t2.n", "t2.t")
    iy = _dda_coord_sql(str(sy), "t2.cy", "t2.n", "t2.t")
    return f"""
    WITH dom AS MATERIALIZED (SELECT cx, cy, z FROM ({dom_sql}) q),
    zsrc AS (SELECT z AS zs FROM dom WHERE cx = {sx} AND cy = {sy}),
    tgt AS (
      SELECT cx, cy, z,
             greatest(abs(cx - ({sx})), abs(cy - ({sy}))) AS n
      FROM dom),
    steps AS (
      SELECT t2.cx, t2.cy, t2.z, t2.n, t2.t,
             {ix} AS ix, {iy} AS iy
      FROM (SELECT cx, cy, z, n, unnest(range(1, n)) AS t
            FROM tgt WHERE n >= 2) t2),
    blk AS (
      SELECT s.cx, s.cy,
             max((m.z - zsrc.zs) * s.n - (s.z - zsrc.zs) * s.t) AS worst
      FROM steps s
      JOIN dom m ON m.cx = s.ix AND m.cy = s.iy
      CROSS JOIN zsrc
      GROUP BY s.cx, s.cy)
    SELECT t.cx, t.cy,
           NOT coalesce(b.worst > 0, false) AS visible
    FROM tgt t LEFT JOIN blk b ON b.cx = t.cx AND b.cy = t.cy
    """
