"""STAC catalog over HTTP → the engine catalog DataFrame.

Reference parity: stac/src/main/scala/geotrellis/server/stac (the
reference resolves OGC layers from a remote STAC API: collections and
items fetched over HTTP, bbox + datetime per item). The engine's
``Engine.catalog`` is a plain DataFrame with columns
(name, xmin, ymin, xmax, ymax, time); this module builds it from STAC
JSON documents (spec: STAC 1.0 Item/ItemCollection/Catalog, public
radiantearth/stac-spec):

- ``load_stac_items(spark, url)`` — a FeatureCollection-style
  ``/search`` or ``/items`` response (or a bare list of Items),
- item ``bbox`` → xmin..ymax; ``properties.datetime`` → ``times``,
  ``start_datetime``/``end_datetime`` → ``t_start``/``t_end``;
  ``id`` → name,
- paging: follows ``links[rel=next]`` up to ``max_pages``.

Fetch happens driver-side (a catalog is metadata, thousands of rows,
not data); the resulting DataFrame then participates in the usual
pushdown-compiled catalog filters. Tested against a live localhost
HTTP server (test_stac_http.py) — the same harness that tests the COG
range reader."""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        T.StructField("times", T.ArrayType(T.TimestampType())),
        T.StructField("t_start", T.TimestampType()),
        T.StructField("t_end", T.TimestampType()),
    ]
)


def _parse_dt(s: str | None) -> dt.datetime | None:
    if not s:
        return None
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))


def _item_row(item: dict):
    bbox = item.get("bbox")
    if not bbox or len(bbox) < 4:
        return None
    props = item.get("properties", {})
    when = _parse_dt(props.get("datetime"))
    t0 = _parse_dt(props.get("start_datetime"))
    t1 = _parse_dt(props.get("end_datetime"))
    return (item.get("id"), float(bbox[0]), float(bbox[1]),
            float(bbox[2]), float(bbox[3]),
            [when] if when else None, t0, t1)


def _fetch_json(url: str, timeout: float) -> dict:
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def load_stac_items(
    spark: SparkSession, url: str, max_pages: int = 32,
    timeout: float = 30.0,
) -> DataFrame:
    """Fetch a STAC item collection (with ``rel=next`` paging) into the
    engine catalog DataFrame."""
    rows, seen = [], {url}
    for _ in range(max_pages):
        doc = _fetch_json(url, timeout)
        items = (doc if isinstance(doc, list)
                 else doc.get("features", doc.get("items", [])))
        for item in items:
            row = _item_row(item)
            if row is not None:
                rows.append(row)
        nxt = None
        if isinstance(doc, dict):
            for link in doc.get("links", []):
                if link.get("rel") == "next" and link.get("href"):
                    nxt = link["href"]
                    break
        if not nxt or nxt in seen:
            break
        seen.add(nxt)
        url = nxt
    return spark.createDataFrame(rows, CATALOG_SCHEMA)
