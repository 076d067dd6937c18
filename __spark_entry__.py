"""Driver contract for the spark-graft builder (PySpark target).

Engine: geotrellis_server_spark — a PySpark-native spatial-join + tiling
engine (SURVEY.md). The primary input is the interleaved text+media
document table fixed by BASELINE.json input_hint, synthesized
deterministically (sources/synth.py) and sized 10× the driver's
``documents`` table so it scales with sf. Every geometry is a pure
function of doc_id (exact 1/1024° doubles) so DuckDB oracles reproduce
the engine's span-extraction path bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotrellis_server_spark import sqlgen
from geotrellis_server_spark.grids import cells as C
from geotrellis_server_spark.operators import knn as knn_op
from geotrellis_server_spark.operators import spatial_join, tiling
from geotrellis_server_spark.sources import synth

DOCS_PER_DOCUMENT = 20  # synthetic docs = 20 × driver documents rows

# fixed kNN query points (deterministic; cluster / sparse / corner)
KNN_QUERIES = [(0, -74.0, 40.5), (1, 10.0, 10.0), (2, 179.0, -80.0), (3, 0.25, 0.25)]
KNN_K = 10

_LON = sqlgen.lon_sql("id")
_LAT = sqlgen.lat_sql("id")
# DuckDB range() rejects subquery params; driver doc_ids are contiguous
# 0..M-1, so synth ids 0..20M-1 come from a cross join.
_IDS_SQL = f"(SELECT d.doc_id * {DOCS_PER_DOCUMENT} + k.i AS id FROM documents d CROSS JOIN range({DOCS_PER_DOCUMENT}) k(i))"


def _n_docs(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count() * DOCS_PER_DOCUMENT


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth.extract_geometry(synth.docs(spark, _n_docs(spark, sf_dir)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs → geometry extraction → broadcast PIP
    join → zoom-8 tile assignment → per-(zone, tile) counts."""
    d = _docs(spark, "/root/testdata/sf0.001")
    zones = synth.zone_grid(spark)
    joined = spatial_join.pip_join_rect(d, zones)
    tiled = tiling.assign_tiles(joined, 8)
    return tiled.groupBy("zone_id", "tile_x", "tile_y").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("cell", C.cell_key_col("lon", "lat", 6))
        .groupBy("cell")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_tile_assign(zoom: int):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return tiling.tile_counts(_docs(spark, sf_dir), zoom)

    return q


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return spatial_join.pip_join_rect(d, synth.zone_grid(spark)).select("doc_id", "zone_id")


def _q_pip_zone_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        spatial_join.pip_join_rect(d, synth.zone_grid(spark))
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return knn_op.knn_join(d, KNN_QUERIES, k=KNN_K).select("query_id", "doc_id", "rank")


def _q_span_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = synth.docs(spark, _n_docs(spark, sf_dir))
    return (
        d.select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n"))
    )


def _q_pixel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rasterization per-pixel counts at z=4 (the groupBy feeding
    rasterize_count's dense tile assembly)."""
    d = _docs(spark, sf_dir)
    tx, ty, px, py = tiling.pixel_index_sql("lon", "lat", 4, 64)
    return (
        d.select(
            F.expr(tx).alias("tile_x"),
            F.expr(ty).alias("tile_y"),
            (F.expr(py) * 64 + F.expr(px)).alias("pixel"),
        )
        .groupBy("tile_x", "tile_y", "pixel")
        .agg(F.count("*").alias("cnt"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "geo_cell_encode_r6": _q_cell_encode,
        "geo_tile_assign_z8": _q_tile_assign(8),
        "geo_tile_assign_z12": _q_tile_assign(12),
        "geo_pip_join_rect": _q_pip_join,
        "geo_pip_zone_agg": _q_pip_zone_agg,
        "geo_knn_ring_k10": _q_knn,
        "doc_span_kind_counts": _q_span_kinds,
        "geo_rasterize_pixel_counts_z4": _q_pixel_counts,
    }


def oracle_sql() -> dict[str, str]:
    pts = f"SELECT id, {_LON} AS lon, {_LAT} AS lat FROM {_IDS_SQL} t"
    knn_vals = ", ".join(f"({q}, CAST({x} AS DOUBLE), CAST({y} AS DOUBLE))" for q, x, y in KNN_QUERIES)
    tx4, ty4 = sqlgen.tile_x_sql("lon", 4), sqlgen.tile_y_sql("lat", 4)
    npx4 = (1 << 4) * 64
    gpx = f"CAST(greatest(least(floor(({sqlgen.mercator_x_sql('lon')}) * {npx4}), {npx4 - 1}), 0) AS BIGINT)"
    gpy = f"CAST(greatest(least(floor(({sqlgen.mercator_y_sql('lat')}) * {npx4}), {npx4 - 1}), 0) AS BIGINT)"
    return {
        "geo_cell_encode_r6": f"""
            SELECT {sqlgen.cell_key_sql('lon', 'lat', 6)} AS cell, count(*) AS n_docs
            FROM ({pts}) GROUP BY 1
        """,
        "geo_tile_assign_z8": f"""
            SELECT {sqlgen.tile_x_sql('lon', 8)} AS tile_x, {sqlgen.tile_y_sql('lat', 8)} AS tile_y,
                   count(*) AS n_docs
            FROM ({pts}) GROUP BY 1, 2
        """,
        "geo_tile_assign_z12": f"""
            SELECT {sqlgen.tile_x_sql('lon', 12)} AS tile_x, {sqlgen.tile_y_sql('lat', 12)} AS tile_y,
                   count(*) AS n_docs
            FROM ({pts}) GROUP BY 1, 2
        """,
        "geo_pip_join_rect": f"""
            SELECT printf('doc-%012d', id) AS doc_id,
                   {sqlgen.zone_id_for_point_sql('lon', 'lat')} AS zone_id
            FROM ({pts})
        """,
        "geo_pip_zone_agg": f"""
            SELECT {sqlgen.zone_id_for_point_sql('lon', 'lat')} AS zone_id, count(*) AS n_docs
            FROM ({pts}) GROUP BY 1
        """,
        "geo_knn_ring_k10": f"""
            WITH q(query_id, qlon, qlat) AS (VALUES {knn_vals}),
            d AS (SELECT q.query_id, printf('doc-%012d', p.id) AS doc_id,
                         (p.lon - q.qlon) * (p.lon - q.qlon)
                       + (p.lat - q.qlat) * (p.lat - q.qlat) AS dist_sq
                  FROM ({pts}) p CROSS JOIN q)
            SELECT query_id, doc_id, rank FROM (
              SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY dist_sq, doc_id) AS INT) AS rank
              FROM d) WHERE rank <= {KNN_K}
        """,
        "doc_span_kind_counts": f"""
            SELECT CASE WHEN i = id % ((id % 7) + 1) THEN 'geo'
                        WHEN (id + i) % 3 = 0 THEN 'media'
                        ELSE 'text' END AS kind, count(*) AS n
            FROM {_IDS_SQL} t
            JOIN range(8) s(i) ON s.i <= t.id % 7
            GROUP BY 1
        """,
        "geo_rasterize_pixel_counts_z4": f"""
            SELECT {tx4} AS tile_x, {ty4} AS tile_y,
                   (({gpy}) - ({ty4}) * 64) * 64 + (({gpx}) - ({tx4}) * 64) AS pixel,
                   count(*) AS cnt
            FROM ({pts}) GROUP BY 1, 2, 3
        """,
    }
