"""Cell-prefix partitioned table layout (north rule: "range-partitioned
shuffles by cell prefix"; reference O4 spatial partition pruning —
GTLayerNode.scala:90-95's Intersects(gridBounds) becomes ordinary
partition pruning once the table is laid out by cell prefix).

Layout: docs/tiles written with a ``cell_p`` partition column = quadtree
cell at a coarse prefix resolution, files sorted by the finer cell key
inside each partition (Iceberg write.sort-order equivalent with plain
parquet). Effects:

- spatial window queries prune to the partitions whose prefix cells
  intersect the window (directory-level pruning, no file reads);
- per-cell aggregations and tile-key joins arrive pre-clustered, so
  shuffles move near-sorted runs (smaller spill, better compression);
- neighbor tiles co-locate for the focal halo join (J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sqlgen
from ..geometry.pip import envelope_cells
from ..grids import cells as C

PREFIX_RES = 3  # 64 partitions worldwide


def write_docs_partitioned(
    docs_with_geom: DataFrame,
    path: str,
    prefix_res: int = PREFIX_RES,
    sort_res: int = 12,
    time_col: str | None = None,
) -> None:
    """Write docs partitioned by coarse cell prefix (and, when
    ``time_col`` is given, by UTC month ``t_month`` — the second layout
    dimension the Q3 pushdown compiler prunes on), sorted by fine cell
    within files."""
    out = docs_with_geom.withColumn("cell_p", C.cell_key_col("lon", "lat", prefix_res))
    parts = ["cell_p"]
    if time_col:
        out = out.withColumn("t_month", F.date_format(F.col(time_col), "yyyy-MM"))
        parts.append("t_month")
    (
        out.repartition(*parts)
        .sortWithinPartitions(F.expr(sqlgen.cell_key_sql("lon", "lat", sort_res)))
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(path)
    )


def read_docs_query(
    spark: SparkSession,
    path: str,
    query,
    prefix_res: int = PREFIX_RES,
    time_col: str | None = None,
) -> DataFrame:
    """Q3 pushdown: compile the query tree to its (bbox × time) scan
    region (query/compile.compile_scan_region — SearchFiltersQuery
    semigroups), prune BOTH layout dimensions (cell_p partition list +
    t_month partition range), then apply the exact residual row predicate.
    Results are identical to filtering the unpartitioned table; only the
    scan shrinks."""
    from ..query.compile import compile_scan_region, point_record_predicate

    region = compile_scan_region(query)
    df = spark.read.parquet(path)
    if region.empty:
        return df.filter(F.lit(False))
    if region.bbox is not None:
        cells = envelope_cells(*region.bbox, prefix_res)
        df = df.filter(F.col("cell_p").isin([int(c) for c in cells]))
    if region.time is not None and time_col:
        lo, hi = region.time
        df = df.filter(
            (F.col("t_month") >= lo.strftime("%Y-%m"))
            & (F.col("t_month") <= hi.strftime("%Y-%m"))
        )
    return df.filter(point_record_predicate(query, time_col=time_col or "ts"))


def read_docs_window(
    spark: SparkSession,
    path: str,
    window: tuple[float, float, float, float],
    prefix_res: int = PREFIX_RES,
) -> DataFrame:
    """Read only the partitions whose prefix cells intersect the lon/lat
    window (Catalyst prunes `cell_p IN (...)` at the directory level),
    then apply the exact residual filter."""
    xmin, ymin, xmax, ymax = window
    cells = envelope_cells(xmin, ymin, xmax, ymax, prefix_res)
    df = spark.read.parquet(path).filter(F.col("cell_p").isin([int(c) for c in cells]))
    return df.filter(
        (F.col("lon") >= xmin) & (F.col("lon") <= xmax)
        & (F.col("lat") >= ymin) & (F.col("lat") <= ymax)
    )


def n_files_scanned(df: DataFrame) -> int:
    """Evidence helper: number of parquet files actually read at execution
    (DataFrame.inputFiles() ignores partition pruning; input_file_name()
    observes the post-pruning scan)."""
    return df.select(F.input_file_name()).distinct().count()
