"""Cost-distance surface over a friction raster (GeoTrellis parity:
``geotrellis.raster.costdistance.CostDistance`` — the accumulated-cost
op underneath the reference server's terrain/accessibility layers;
reference layers serve whatever the build pipeline computed, so this is
a build-side op like density.py).

Semantics re-expressed for synchronous data-parallel execution: the
classic implementation is a sequential Dijkstra over one in-memory tile;
at 100 TB the surface is a distributed table, so we run ``rounds``
synchronized Bellman-Ford relaxations of the 4-connected min-plus
recurrence

    d'[c] = min(d[c],  min over 4-neighbors n with d[n] finite of
                       d[n] + fric[n] + fric[c])

(the GeoTrellis edge cost is (fric[n]+fric[c])/2 × cell-span; we keep
the ×2 integer form so every distance is an exact BIGINT — divide by 2
at presentation). After k rounds the table holds the exact ≤k-hop
constrained cost distance — a deterministic, engine-reproducible object
(the round count is part of the contract, mirroring graph.pagerank /
kcore), converging to the true cost distance once k ≥ the longest
shortest path in hops.

Scale shape: each round is ONE map-side-combined groupBy(cell) min over
a row-local 4-way explode, plus an equi-join back to the friction table
on the cell key — reusing the friction table's partitioning every round
(co-located when the raster is stored bucketed by cell block).
localCheckpoint per round keeps the lineage flat (graph.py doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF = 1 << 40  # unreached marker; fric sums can never reach it


def cost_distance(
    friction: DataFrame,
    sources: list[tuple[int, int]],
    rounds: int,
    cx: str = "cx",
    cy: str = "cy",
    fric: str = "fric",
) -> DataFrame:
    """``(cx, cy, dist)`` exact ≤``rounds``-hop cost distances from
    ``sources`` over the dense friction cells; unreached cells carry
    dist = INF (kept, so the output domain equals the input domain).

    ``friction`` must be one row per cell with positive BIGINT friction;
    cells absent from it are outside the surface (moves into them are
    dropped — window-edge semantics).
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    if not sources:
        raise ValueError("at least one source cell required")
    base = friction.select(
        F.col(cx).alias("cx"), F.col(cy).alias("cy"),
        F.col(fric).cast("long").alias("fric"),
    ).localCheckpoint(eager=True)
    src_pred = " OR ".join(
        f"(cx = {int(x)} AND cy = {int(y)})" for x, y in sources)
    dist = base.select(
        "cx", "cy", "fric",
        F.expr(f"CASE WHEN {src_pred} THEN CAST(0 AS BIGINT) "
               f"ELSE CAST({INF} AS BIGINT) END").alias("d"),
    )
    offsets = F.expr(
        "explode(array(struct(1 AS dx, 0 AS dy), struct(-1 AS dx, 0 AS dy),"
        " struct(0 AS dx, 1 AS dy), struct(0 AS dx, -1 AS dy)))")
    for _ in range(rounds):
        props = (
            dist.where(f"d < {INF}")
            .select("cx", "cy", (F.col("d") + F.col("fric")).alias("pd"))
            .select(F.col("cx"), F.col("cy"), F.col("pd"), offsets.alias("o"))
            .select((F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy"), "pd")
            .groupBy("cx", "cy")
            .agg(F.min("pd").alias("pd"))
        )
        dist = (
            dist.join(props, ["cx", "cy"], "left")
            .select(
                "cx", "cy", "fric",
                F.expr("least(d, coalesce(pd + fric, d))").alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    return dist.select("cx", "cy", F.col("d").alias("dist"))


def cost_distance_oracle_sql(
    dom_sql: str, sources: list[tuple[int, int]], rounds: int,
) -> str:
    """DuckDB oracle: the same recurrence as ``rounds`` unrolled
    MATERIALIZED CTE self-joins over a cell-domain subquery ``dom_sql``
    exposing ``cx, cy, fric`` — independent formulation (Manhattan-1
    neighbor join + FILTER aggregate vs the engine's explode/groupBy)."""
    src_pred = " OR ".join(
        f"(cx = {int(x)} AND cy = {int(y)})" for x, y in sources)
    sql = [f"""
    WITH dom AS MATERIALIZED (SELECT cx, cy, fric FROM ({dom_sql}) q),
    r0 AS MATERIALIZED (
      SELECT cx, cy, fric,
             CASE WHEN {src_pred} THEN CAST(0 AS BIGINT)
                  ELSE CAST({INF} AS BIGINT) END AS d
      FROM dom)"""]
    for k in range(1, rounds + 1):
        sql.append(f""",
    r{k} AS MATERIALIZED (
      SELECT c.cx, c.cy, c.fric,
             least(c.d, coalesce(
               min(n.d + n.fric + c.fric)
                 FILTER (WHERE n.d < {INF}), {INF})) AS d
      FROM r{k - 1} c
      LEFT JOIN r{k - 1} n
        ON abs(n.cx - c.cx) + abs(n.cy - c.cy) = 1
      GROUP BY c.cx, c.cy, c.fric, c.d)""")
    sql.append(f"\n    SELECT cx, cy, d AS dist FROM r{rounds}")
    return "".join(sql)
