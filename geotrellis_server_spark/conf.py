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
    kind = src.get("type", "parquet")
    if kind == "parquet":
        return spark.read.parquet(src["path"])
    if kind == "geotiff":
        from .sources.gtiff import load_geotiff

        return load_geotiff(spark, src["path"], layer=name)
    if kind == "table":
        return spark.table(src["table"])
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
            sources = {}
            for var, ref in params.items():
                if ref not in layers:
                    raise ValueError(
                        f"layer {name!r} references undefined layer {ref!r}"
                        " (map-algebra layers may only use layers defined"
                        " before them)")
                sources[var] = layers[ref].tiles
            expr = Expr.from_dict(spec["algebra"])
            missing = sorted(set(expr.var_names()) - set(sources))
            if missing:
                raise ValueError(
                    f"layer {name!r}: algebra vars {missing} missing from"
                    " parameters")
            # single-var convention: the engine evaluates over .tiles
            first = next(iter(sources.values())) if sources else None
            layers[name] = Layer(name, first, expression=expr,
                                 sources=sources, style=style)
        else:
            tiles = _load_source(spark, name, spec["source"])
            layers[name] = Layer(name, tiles, style=style)
    catalog = None
    cat = config.get("catalog")
    if cat:
        if cat.get("type") == "stac":
            from .sources.stac_http import load_stac_items

            catalog = load_stac_items(spark, cat["url"])
        else:
            catalog = spark.read.parquet(cat["path"])
    return Engine(spark, layers, catalog=catalog)
