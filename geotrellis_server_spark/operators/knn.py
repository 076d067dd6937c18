"""kNN via cell-ring expansion (SURVEY.md J6 — the kNN extension of the
reference's multipoint GetFeatureInfoExtended bulk sampling,
ogc/.../wms/GetFeatureInfoExtended.scala:57-105).

Exact k nearest documents for a small broadcastable set of query points:

1. Each query covers grid_disk(q_cell, ring) candidate cells at res R;
   the (cell → query) table is exploded driver-side and broadcast.
2. BroadcastHashJoin docs.cell == cand.cell → distance → per-query top-k
   via window row_number (ties broken by doc_id — deterministic).
3. Exactness guarantee: the kth distance must not exceed the distance from
   the query to the unexplored boundary of its disk (in lon/lat degrees,
   computed from cell bounds). Queries that fail expand their ring
   (driver loop, geometrically growing) — the reference's early-exit ring
   expansion, distribution-friendly because every pass is one broadcast
   join over the (never-shuffled) docs table.

Distance metric: squared euclidean in degrees (documented engine
convention; the oracle uses the same expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..grids import cells as C
from ..grids.layout import mercator_to_lonlat, WEBMERCATOR_BOUND

DEFAULT_RES = 4


def _disk_bounds_deg(cell: int, res: int, ring: int) -> tuple[float, float, float, float]:
    """lon/lat bounds of grid_disk(cell, ring), clipped at world edges."""
    import numpy as np

    n = 1 << res
    cx, cy = C.cell_xy(cell, res)
    x0, x1 = max(cx - ring, 0), min(cx + ring, n - 1)
    y0, y1 = max(cy - ring, 0), min(cy + ring, n - 1)
    w = 2.0 * WEBMERCATOR_BOUND / n
    mx0, mx1 = -WEBMERCATOR_BOUND + x0 * w, -WEBMERCATOR_BOUND + (x1 + 1) * w
    my1, my0 = WEBMERCATOR_BOUND - y0 * w, WEBMERCATOR_BOUND - (y1 + 1) * w
    lon0, lat0 = mercator_to_lonlat(np.array([mx0]), np.array([my0]))
    lon1, lat1 = mercator_to_lonlat(np.array([mx1]), np.array([my1]))
    return float(lon0[0]), float(lat0[0]), float(lon1[0]), float(lat1[0])


def _guarantee_radius_sq(qlon: float, qlat: float, cell: int, res: int, ring: int) -> float:
    """Squared degree distance from q to the nearest edge of its explored
    disk; any doc outside the disk is at least this far away. At world
    edges (clipped disk) the clipped side is exhausted → treat as inf."""
    n = 1 << res
    cx, cy = C.cell_xy(cell, res)
    lon0, lat0, lon1, lat1 = _disk_bounds_deg(cell, res, ring)
    cands = []
    if cx - ring > 0:
        cands.append(qlon - lon0)
    if cx + ring < n - 1:
        cands.append(lon1 - qlon)
    if cy + ring < n - 1:
        cands.append(qlat - lat0)
    if cy - ring > 0:
        cands.append(lat1 - qlat)
    if not cands:
        return float("inf")
    d = max(min(cands), 0.0)
    return d * d


def knn_join(
    docs: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    res: int = DEFAULT_RES,
    initial_ring: int = 1,
    max_ring: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "doc_id",
) -> DataFrame:
    """queries: [(query_id, lon, lat)]. Returns (query_id, doc_id, dist_sq,
    rank) with exactly min(k, |docs in world|) rows per query."""
    import numpy as np

    spark = docs.sparkSession
    n = 1 << res
    max_ring = max_ring or n  # full world fallback
    docs_c = docs.withColumn("_cell", C.cell_key_col(lon, lat, res))

    pending = {
        int(qid): (float(qlon), float(qlat), int(C.cell_key_np(np.array([qlon]), np.array([qlat]), res)[0]))
        for qid, qlon, qlat in queries
    }
    rings = {qid: initial_ring for qid in pending}
    results = []

    while pending:
        rows = []
        for qid, (qlon, qlat, qcell) in pending.items():
            for c in C.grid_disk(qcell, res, rings[qid]):
                rows.append((qid, int(c), qlon, qlat))
        cand_cells = spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("query_id", T.LongType()),
                    T.StructField("_cell", T.LongType()),
                    T.StructField("qlon", T.DoubleType()),
                    T.StructField("qlat", T.DoubleType()),
                ]
            ),
        )
        joined = docs_c.join(F.broadcast(cand_cells), "_cell", "inner")
        # explicit multiply (not **2 → pow()) so dist is bit-identical to
        # the oracle's (a-b)*(a-b) arithmetic
        dx = F.col(lon) - F.col("qlon")
        dy = F.col(lat) - F.col("qlat")
        dist = dx * dx + dy * dy
        w = Window.partitionBy("query_id").orderBy(F.asc("dist_sq"), F.asc(id_col))
        topk = (
            joined.withColumn("dist_sq", dist)
            .select("query_id", id_col, "dist_sq")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        # ONE action per ring iteration: collect the (≤ k × |pending|) topk
        # rows and derive counts / kth distances driver-side — a separate
        # aggregate job would re-execute the join + window a second time
        topk_rows = topk.collect()
        by_q: dict[int, list] = {}
        for r in topk_rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid in list(pending):
            qlon, qlat, qcell = pending[qid]
            ring = rings[qid]
            rows = by_q.get(qid, [])
            kth = max((r["dist_sq"] for r in rows), default=None)
            guarantee = _guarantee_radius_sq(qlon, qlat, qcell, res, ring)
            if (len(rows) >= k and kth is not None and kth <= guarantee) or ring >= max_ring:
                results.extend(rows)
                del pending[qid]
            else:
                rings[qid] = min(ring * 2, max_ring)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, dict(zip(docs.schema.names, docs.schema.fields))[id_col].dataType),
            T.StructField("dist_sq", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in results] or [], schema)
