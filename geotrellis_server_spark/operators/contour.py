"""Contour (isoline) extraction by marching squares — GeoTrellis/GDAL
``contour`` parity for the level-set segments (the vectorize direction
of the raster family; the reference's stack delegates to GDAL, which
implements the same public algorithm).

Midpoint variant: segment endpoints sit at EDGE MIDPOINTS of the 2×2
cell block, so in doubled coordinates (2·cell) every endpoint is an
exact integer — the whole operator is integer comparisons plus a
16-way case table, engine- and partitioning-exact, and therefore
DuckDB-gateable (linear interpolation along edges is the rendering
refinement; the TOPOLOGY — which blocks emit which segments — is
identical and is what this operator contracts).

Case table bits: TL=8, TR=4, BR=2, BL=1 with bit set ⟺ value ≥ level.
The two saddle cases (5, 10) use the fixed convention {T-L, B-R} and
{T-R, B-L} respectively (the GDAL default without center sampling).
Segment endpoints are emitted canonically ordered (lexicographic), so
output rows are orientation-free.

Scale shape: every cell replicates row-locally to the ≤4 blocks it
corners (a literal 4-way explode); blocks assemble by ONE map-side-
combinable groupBy(block) max-pivot (same idiom as the focal halo
assembly); segment emission is a row-local CASE + explode. One
exchange total, keyed by block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# edge midpoints in doubled coords relative to (2bx, 2by)
_EDGES = {"T": (1, 0), "R": (2, 1), "B": (1, 2), "L": (0, 1)}

# case index -> list of (edge, edge) segments (midpoint marching squares)
_CASES = {
    1: [("L", "B")], 2: [("B", "R")], 3: [("L", "R")], 4: [("T", "R")],
    5: [("T", "L"), ("B", "R")], 6: [("T", "B")], 7: [("T", "L")],
    8: [("T", "L")], 9: [("T", "B")], 10: [("T", "R"), ("B", "L")],
    11: [("T", "R")], 12: [("L", "R")], 13: [("B", "R")],
    14: [("L", "B")], 15: [], 0: [],
}


def segments_of_case(case: int, bx: int, by: int) -> list[tuple]:
    """Python reference: canonical segments of one block (doubled
    coords) — used by tests."""
    out = []
    for e1, e2 in _CASES[case]:
        (x1, y1), (x2, y2) = _EDGES[e1], _EDGES[e2]
        p = (2 * bx + x1, 2 * by + y1)
        q = (2 * bx + x2, 2 * by + y2)
        out.append((p, q) if p <= q else (q, p))
    return out


def _segment_case_sql(case_col: str, bx: str, by: str) -> str:
    """One engine-portable CASE producing the segment list as a
    'x1:y1:x2:y2;x1:y1:x2:y2' string (both engines concatenate
    integers identically; the caller splits) — generated from the SAME
    python case table as the reference."""
    whens = []
    for c in range(16):
        segs = []
        for e1, e2 in _CASES[c]:
            (ax, ay), (bx2, by2) = _EDGES[e1], _EDGES[e2]
            # canonical order is decided per-edge-pair at GENERATION
            # time on the relative offsets, which is the same order the
            # absolute doubled coords have (adding 2bx/2by preserves it)
            if (ax, ay) > (bx2, by2):
                (ax, ay), (bx2, by2) = (bx2, by2), (ax, ay)
            segs.append(
                f"(2*({bx})+{ax}) || ':' || (2*({by})+{ay}) || ':' || "
                f"(2*({bx})+{bx2}) || ':' || (2*({by})+{by2})")
        if segs:
            joined = " || ';' || ".join(segs)
            whens.append(f"WHEN ({case_col}) = {c} THEN {joined}")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def contour_segments(
    cells: DataFrame,
    level: int,
    cx: str = "cx",
    cy: str = "cy",
    v: str = "v",
) -> DataFrame:
    """Marching-squares segments of the ``v ≥ level`` isoline over a
    dense integer cell window: one row per segment,
    ``(bx, by, case, x1, y1, x2, y2)`` with endpoints in DOUBLED grid
    coordinates (exact integers at edge midpoints). Blocks whose 4
    corners aren't all present (window border) emit nothing."""
    base = cells.select(
        F.col(cx).alias("_x"), F.col(cy).alias("_y"),
        F.expr(f"CASE WHEN {v} >= {int(level)} THEN 1 ELSE 0 END")
        .alias("_b"),
    )
    # cell (x, y) is corner (dx, dy) of block (x-dx, y-dy):
    # TL=(0,0) bit 8, TR=(1,0) bit 4, BR=(1,1) bit 2, BL=(0,1) bit 1
    memb = F.expr(
        "explode(array("
        "struct(_x  AS bx, _y   AS by, 8 AS w),"
        "struct(_x-1 AS bx, _y  AS by, 4 AS w),"
        "struct(_x-1 AS bx, _y-1 AS by, 2 AS w),"
        "struct(_x  AS bx, _y-1 AS by, 1 AS w)))")
    blocks = (
        base.select("_b", memb.alias("m"))
        .select(F.col("m.bx").alias("bx"), F.col("m.by").alias("by"),
                (F.col("m.w") * F.col("_b")).alias("wb"), F.col("m.w"))
        .groupBy("bx", "by")
        .agg(F.sum("wb").alias("cse"), F.sum("w").alias("_cov"))
        .where("_cov = 15")  # all four corners present
    )
    seg_str = _segment_case_sql("cse", "bx", "by")
    return (
        blocks.select("bx", "by", F.col("cse").alias("case"),
                      F.expr(seg_str).alias("_s"))
        .where("_s IS NOT NULL")
        .select("bx", "by", "case",
                F.expr("explode(split(_s, ';'))").alias("_seg"))
        .selectExpr(
            "bx", "by", "case",
            "CAST(split_part(_seg, ':', 1) AS BIGINT) AS x1",
            "CAST(split_part(_seg, ':', 2) AS BIGINT) AS y1",
            "CAST(split_part(_seg, ':', 3) AS BIGINT) AS x2",
            "CAST(split_part(_seg, ':', 4) AS BIGINT) AS y2",
        )
    )


def contour_oracle_sql(dom_sql: str, level: int) -> str:
    """DuckDB oracle over ``dom_sql`` exposing ``cx, cy, v`` —
    independent formulation: 4-way self-JOIN corner gathering (vs the
    engine's explode/pivot), same generated case table."""
    seg_str = _segment_case_sql("cse", "b.cx", "b.cy")
    return f"""
    WITH dom AS MATERIALIZED (
      SELECT cx, cy, CASE WHEN v >= {int(level)} THEN 1 ELSE 0 END AS b
      FROM ({dom_sql}) q),
    blk AS (
      SELECT b.cx, b.cy,
             8 * b.b + 4 * tr.b + 2 * br.b + 1 * bl.b AS cse
      FROM dom b
      JOIN dom tr ON tr.cx = b.cx + 1 AND tr.cy = b.cy
      JOIN dom br ON br.cx = b.cx + 1 AND br.cy = b.cy + 1
      JOIN dom bl ON bl.cx = b.cx     AND bl.cy = b.cy + 1),
    segs AS (
      SELECT b.cx AS bx, b.cy AS by, b.cse AS "case",
             unnest(string_split({seg_str}, ';')) AS seg
      FROM blk b WHERE ({seg_str}) IS NOT NULL)
    SELECT bx, by, "case",
           CAST(string_split(seg, ':')[1] AS BIGINT) AS x1,
           CAST(string_split(seg, ':')[2] AS BIGINT) AS y1,
           CAST(string_split(seg, ':')[3] AS BIGINT) AS x2,
           CAST(string_split(seg, ':')[4] AS BIGINT) AS y2
    FROM segs
    """
