"""GeoJSON source — read RFC 7946 FeatureCollections (or newline-
delimited Features) into the engine's (id, wkt, properties) frame,
ready for geometry/wkt.py parsing, PIP joins, and rasterization.

Reference parity note: the reference's MAML/OGC stack consumes vector
geometries (mask-by-geometry, GetFeatureInfo); GeoJSON is the wire
format those geometries arrive in. The engine already EMITS GeoJSON
(operators/stitch.to_geojson_features, ogc_xml WFS) — this closes the
read direction.

Parsing strategy: features land as JSON strings (one per row — either
exploded from a FeatureCollection read with multiLine, or ndjson
lines); type-specific ``from_json`` casts pull the coordinate arrays
(Point / MultiPoint / LineString / Polygon) and WKT text is assembled
with array/concat builtins — all row-local whole-stage codegen, no
UDF, so the source composes with any downstream join at any scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FMT = "%.10f"  # matches sqlgen's WKT round-trip precision


def _fmt(expr: str) -> str:
    return f"format_string('{_FMT}', {expr})"


def _pt(arr: str) -> str:
    """'x y' from a [x, y] double array expression."""
    return (f"concat({_fmt(f'element_at({arr}, 1)')}, ' ', "
            f"{_fmt(f'element_at({arr}, 2)')})")


def _ring(arr: str) -> str:
    """'x y, x y, ...' from an array<array<double>>."""
    return (f"array_join(transform({arr}, c -> "
            + _pt("c") + "), ', ')")


def features_to_wkt(features: DataFrame,
                    json_col: str = "feature_json") -> DataFrame:
    """(feature_json string) -> (geom_type, wkt, properties_json).
    Unsupported geometry types yield NULL wkt (kept, flagged by type)."""
    typed = features.withColumn(
        "geom_type",
        F.expr(f"get_json_object({json_col}, '$.geometry.type')")
    ).withColumn(
        "_coords",
        F.expr(f"get_json_object({json_col}, '$.geometry.coordinates')")
    ).withColumn(
        "properties_json",
        F.expr(f"get_json_object({json_col}, '$.properties')"))
    c1 = "from_json(_coords, 'array<double>')"
    c2 = "from_json(_coords, 'array<array<double>>')"
    c3 = "from_json(_coords, 'array<array<array<double>>>')"
    wkt = f"""
        CASE geom_type
        WHEN 'Point' THEN concat('POINT (', {_pt(c1)}, ')')
        WHEN 'MultiPoint' THEN concat('MULTIPOINT (', {_ring(c2)}, ')')
        WHEN 'LineString' THEN concat('LINESTRING (', {_ring(c2)}, ')')
        WHEN 'Polygon' THEN concat('POLYGON (',
            array_join(transform({c3}, r -> concat('(',
                {_ring('r')}, ')')), ', '), ')')
        ELSE CAST(NULL AS STRING) END"""
    return typed.select("geom_type", F.expr(wkt).alias("wkt"),
                        "properties_json")


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoJSON file: a FeatureCollection document (any layout)
    or ndjson Features. The COLLECTION envelope is parsed on the driver
    (it is one JSON value by definition); each feature then becomes a
    row and all geometry work happens distributed via
    :func:`features_to_wkt`. For lake-scale vector data, store ndjson
    features and skip the envelope entirely (the splittable layout)."""
    import json

    with open(path) as f:
        head = f.read(512)
    if '"FeatureCollection"' in head:
        with open(path) as f:
            doc = json.load(f)
        rows = [(json.dumps(feat),) for feat in doc.get("features", [])]
        feats = spark.createDataFrame(rows, "feature_json string")
    else:  # ndjson: one Feature per line — fully distributed read
        feats = spark.read.text(path).select(
            F.col("value").alias("feature_json"))
    return features_to_wkt(feats)
