"""Declarative engine configuration — the ogc-example Conf analog.

Reference parity: ogc-example/src/main/scala/geotrellis/server/ogc/conf
(OgcSourceConf.scala: RasterSourceConf / MapAlgebraSourceConf decoded
from HOCON; StyleConf.scala). The engine's analog is a plain JSON/dict
document — same shape, Spark-native sources:

```json
{
  "layers": [
    {"name": "density",
     "source": {"type": "parquet", "path": "/data/tiles"},
     "style": {"poles": {"0.0": [0, 0, 255, 255],
                         "10.0": [255, 0, 0, 255]},
               "clip": "none"}},
    {"name": "scene", "source": {"type": "geotiff", "path": "/a.tif"}},
    {"name": "ndvi2",
     "algebra": {"symbol": "*", "args": [
        {"symbol": "rasterV", "name": "nir"}, {"symbol": "dbl",
         "value": 2.0}]},
     "parameters": {"nir": "density"}}
  ],
  "catalog": {"type": "parquet", "path": "/meta"}
}
```

- ``source.type``: ``parquet`` (a TILE_SCHEMA tile table),
  ``geotiff`` (sources/gtiff.py loader), ``table`` (a saved/bucketed
  Spark table, e.g. from bucketed.materialize_tile_pyramid).
- ``algebra``: a MAML expression in the engine's JSON AST
  (maml/ast.py Expr.to_dict round-trip — node names mirror the
  reference's QueryF/MAML spellings); ``parameters`` maps each raster
  var to a previously-defined layer (MapAlgebraSourceConf.toLayer
  analog).
- ``style``: the Layer.style dict; pole keys arrive as JSON strings
  and are coerced to float, colors to RGBA tuples.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from .engine import Engine, Layer
from .maml.ast import Expr


def _load_style(style: dict | None) -> dict | None:
    if not style:
        return None
    out = dict(style)
    if "poles" in out:
        out["poles"] = {
            float(k): tuple(int(c) for c in v)
            for k, v in out["poles"].items()
        }
    return out


def _load_source(spark: SparkSession, name: str, src: dict):
    """(tiles DataFrame, native crs_epsg | None). A GeoTIFF source
    keeps its file CRS so capabilities bboxes reproject correctly;
    parquet/table tile tables follow the engine's 3857 convention
    unless the config says otherwise via ``crs_epsg``."""
    kind = src.get("type", "parquet")
    declared = src.get("crs_epsg")
    if kind == "parquet":
        return spark.read.parquet(src["path"]), declared
    if kind == "geotiff":
        from .sources.gtiff import load_geotiff, read_geotiff_path

        _, _, file_epsg = read_geotiff_path(src["path"])
        return (load_geotiff(spark, src["path"], layer=name),
                declared or file_epsg)
    if kind == "table":
        ref = src.get("table") or src.get("path")
        if not ref:
            raise ValueError(
                f"layer {name!r}: source type 'table' needs a 'table'"
                " (or 'path') key naming the saved Spark table")
        return spark.table(ref), declared
    raise ValueError(f"unknown source type {kind!r} for layer {name!r}")


def engine_from_config(
    spark: SparkSession, config: dict | str
) -> Engine:
    """Build an Engine from a config dict (or JSON string) — the
    ogc-example ``Conf.loadOgcModel`` analog. Layers are defined in
    order; a map-algebra layer's ``parameters`` may reference any layer
    defined before it."""
    if isinstance(config, str):
        config = json.loads(config)
    layers: dict[str, Layer] = {}
    for spec in config.get("layers", []):
        name = spec["name"]
        style = _load_style(spec.get("style"))
        if "algebra" in spec:
            params = spec.get("parameters", {})
            expr = Expr.from_dict(spec["algebra"])
            sources, subst = {}, {}
            for var, ref in params.items():
                if ref not in layers:
                    raise ValueError(
                        f"layer {name!r} references undefined layer {ref!r}"
                        " (map-algebra layers may only use layers defined"
                        " before them)")
                ref_layer = layers[ref]
                if ref_layer.expression is not None:
                    # composing onto another algebra layer: substitute
                    # its expression tree for the var (bind_params) and
                    # inherit its raster sources — binding the raw
                    # tiles would silently drop the referenced math
                    subst[var] = ref_layer.expression
                    for sv, sdf in ref_layer.sources.items():
                        if sv in sources and sources[sv] is not sdf:
                            raise ValueError(
                                f"layer {name!r}: raster var {sv!r} is"
                                f" bound by two different layers")
                        sources[sv] = sdf
                else:
                    sources[var] = ref_layer.tiles
            if subst:
                expr = expr.bind_params(subst)
            missing = sorted(set(expr.var_names()) - set(sources))
            if missing:
                raise ValueError(
                    f"layer {name!r}: algebra vars {missing} missing from"
                    " parameters")
            if not sources:
                raise ValueError(
                    f"layer {name!r}: a map-algebra layer needs at least"
                    " one raster parameter (a constant expression has no"
                    " tile grid to evaluate over)")
            # single-var convention: the engine evaluates over .tiles
            first = next(iter(sources.values()))
            layers[name] = Layer(name, first, expression=expr,
                                 sources=sources, style=style)
        else:
            tiles, crs = _load_source(spark, name, spec["source"])
            layers[name] = Layer(name, tiles, style=style,
                                 crs_epsg=crs or 3857)
    catalog = None
    cat = config.get("catalog")
    if cat:
        if cat.get("type") == "stac":
            from .sources.stac_http import load_stac_items

            catalog = load_stac_items(spark, cat["url"])
        else:
            catalog = spark.read.parquet(cat["path"])
    return Engine(spark, layers, catalog=catalog)
