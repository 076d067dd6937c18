"""Mosaic merge + temporal selection (MosaicRasterSourceF semantics,
FIXTURES.md F6/F7)."""

import datetime as dt

import numpy as np
import pyspark.sql.functions as F

from geotrellis_server_spark.operators import mosaic as MO
from geotrellis_server_spark.sources import synth

UTC = dt.timezone.utc


def _tiles(spark, rows):
    # rows: (src_rank, cells)
    data = [(0, 0, 0, 0, 4, 4, r, [None if v is None else float(v) for v in c]) for r, c in rows]
    return spark.createDataFrame(
        data, "zoom INT, tile_x LONG, tile_y LONG, band INT, width INT, height INT,"
        " src_rank INT, cells ARRAY<DOUBLE>"
    )


def test_left_biased_first_non_nodata(spark):
    a = [1.0] * 16
    a[3] = None  # NoData hole in A
    b = [2.0] * 16
    out = MO.mosaic_merge(_tiles(spark, [(0, a), (1, b)])).collect()[0]
    cells = [v for v in out.cells]
    assert cells[3] == 2.0  # B shows through A's hole
    assert all(v == 1.0 for i, v in enumerate(cells) if i != 3)


def test_merge_order_is_rank_not_arrival(spark):
    a = [1.0] * 16
    b = [2.0] * 16
    # insert B first; rank must still make A win
    out = MO.mosaic_merge(_tiles(spark, [(1, b), (0, a)])).collect()[0]
    assert all(v == 1.0 for v in out.cells)


def test_three_source_cascade(spark):
    a = [None] * 16
    b = [None] * 8 + [2.0] * 8
    c = [3.0] * 16
    out = MO.mosaic_merge(_tiles(spark, [(0, a), (1, b), (2, c)])).collect()[0]
    assert all(v == 3.0 for v in out.cells[:8])
    assert all(v == 2.0 for v in out.cells[8:])


def test_merge_plan_stays_jvm_side(spark):
    df = MO.mosaic_merge(_tiles(spark, [(0, [1.0] * 16), (1, [2.0] * 16)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_mosaic_metadata(spark):
    cat = spark.createDataFrame(
        [(0.0, 0.0, 4.0, 4.0, 1.0, "int32"), (2.0, 0.0, 6.0, 4.0, 0.5, "float64")],
        "xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE, cell_size DOUBLE, celltype STRING",
    )
    m = MO.mosaic_metadata(cat).collect()[0]
    assert (m.xmin, m.ymin, m.xmax, m.ymax) == (0.0, 0.0, 6.0, 4.0)  # union
    assert m.cell_size == 0.5  # finest
    assert m.celltype == "float64"  # widest


def _items(spark):
    rows = [
        ("L", dt.datetime(2020, 1, 1, tzinfo=UTC), "a"),
        ("L", dt.datetime(2020, 2, 1, tzinfo=UTC), "b"),
        ("L", dt.datetime(2020, 3, 1, tzinfo=UTC), "c"),
        ("M", dt.datetime(2021, 6, 1, tzinfo=UTC), "d"),
    ]
    return spark.createDataFrame(rows, "layer STRING, time TIMESTAMP, item STRING")


def test_time_slice_newest_oldest_fixed(spark):
    items = _items(spark)
    newest = {r.layer: r.item for r in MO.time_slice(items, default="newest").collect()}
    assert newest == {"L": "c", "M": "d"}
    oldest = {r.layer: r.item for r in MO.time_slice(items, default="oldest").collect()}
    assert oldest == {"L": "a", "M": "d"}
    fixed = {r.layer: r.item for r in MO.time_slice(
        items, default="fixed", fixed_time="2020-02-10 00:00:00").collect()}
    assert fixed["L"] == "b"


def test_source_for_time(spark):
    items = _items(spark)
    # t between b and c → latest <= t is b; layer M has nothing <= t → earliest d
    got = {r.layer: r.item for r in MO.source_for_time(items, "2020-02-15 00:00:00").collect()}
    assert got == {"L": "b", "M": "d"}


def test_temporal_aggregate_mean_max(spark):
    from geotrellis_server_spark.operators.mosaic import temporal_aggregate

    def tile(t, cells):
        return (2, 1, 1, 2, 2, t, [float(c) for c in cells])

    df = spark.createDataFrame(
        [tile(0, [1, 2, 3, 4]), tile(1, [3, 2, 1, 0]), tile(2, [5, 5, 5, 5])],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT,"
        " time INT, cells ARRAY<DOUBLE>",
    )
    mean = temporal_aggregate(df, "mean").collect()[0]
    assert mean.cells == [3.0, 3.0, 3.0, 3.0]
    mx = temporal_aggregate(df, "max").collect()[0]
    assert mx.cells == [5.0, 5.0, 5.0, 5.0]
    sm = temporal_aggregate(df, "sum").collect()[0]
    assert sm.cells == [9.0, 9.0, 9.0, 9.0]


def test_temporal_aggregate_single_and_nan(spark):
    import math

    from geotrellis_server_spark.operators.mosaic import temporal_aggregate

    df = spark.createDataFrame(
        [(2, 0, 0, 2, 1, 0, [1.0, float("nan")])],
        "zoom INT, tile_x BIGINT, tile_y BIGINT, width INT, height INT,"
        " time INT, cells ARRAY<DOUBLE>",
    )
    r = temporal_aggregate(df, "mean").collect()[0]
    assert r.cells[0] == 1.0 and (r.cells[1] is None or math.isnan(r.cells[1]))
