"""Histogram + aggregation parity (LayerHistogramTest budget semantics,
HistogramHeuristicsTest seeded coverage, extent folds)."""

import numpy as np
import pyspark.sql.functions as F

from geotrellis_server_spark.grids.layout import Extent
from geotrellis_server_spark.operators import histogram as H
from geotrellis_server_spark.sources import synth


def test_budget_64_uses_all_64_cells(spark):
    # LayerHistogramTest: budget 64 on the 8×8 source → 64 cells;
    # budget 128 → still 64 (clamped to source)
    r8 = synth.raster8(spark)
    for budget in (64, 128):
        h = H.layer_histogram(r8, n_bins=8, max_cells=budget)
        assert h.agg(F.sum("count")).collect()[0][0] == 64


def test_choose_coarsest_zoom():
    zc = {0: 64, 1: 256, 2: 1024}
    assert H.choose_coarsest_zoom(zc, 64) == 0
    assert H.choose_coarsest_zoom(zc, 100) == 1
    assert H.choose_coarsest_zoom(zc, 1024) == 2
    assert H.choose_coarsest_zoom(zc, 10_000) == 2  # clamp to finest


def test_histogram_counts_match_numpy(spark):
    r8 = synth.raster8(spark)
    h = H.layer_histogram(r8, n_bins=4, max_cells=64).collect()
    got = {r.bucket: r["count"] for r in h}
    vals = np.arange(1, 65, dtype=float)
    edges = np.linspace(1.0, 64.0, 5)
    exp, _ = np.histogram(vals, bins=edges)
    assert [got.get(i, 0) for i in range(4)] == exp.tolist()
    assert sum(got.values()) == 64


def test_minmax_and_percentiles(spark):
    r8 = synth.raster8(spark)
    mm = H.minmax(r8).collect()[0]
    assert (mm.min_value, mm.max_value) == (1.0, 64.0)
    p = H.approx_percentiles(r8, [0.0, 0.5, 1.0]).collect()[0].percentiles
    assert p[0] == 1.0 and p[2] == 64.0 and 30 <= p[1] <= 35


def test_corner_samples_always_within_uber_seeded():
    # HistogramHeuristicsTest: 1000 seeded iterations — corner extents are
    # always covered by the uber extent
    rng = np.random.default_rng(1337)
    for _ in range(1000):
        xmin, ymin = rng.uniform(-100, 100, 2)
        w, h = rng.uniform(0.1, 200, 2)
        uber = Extent(xmin, ymin, xmin + w, ymin + h)
        cs = rng.uniform(0.001, 10)
        cells = int(rng.integers(4, 10_000))
        for e in H.corner_sample_extents(uber, cs, cells):
            assert e.xmin >= uber.xmin - 1e-9 and e.xmax <= uber.xmax + 1e-9
            assert e.ymin >= uber.ymin - 1e-9 and e.ymax <= uber.ymax + 1e-9


def test_extent_folds(spark):
    cat = synth.catalog_fixture(spark)
    u = H.extent_union(cat).collect()[0]
    assert (u.xmin, u.ymin, u.xmax, u.ymax) == (0.0, 0.0, 10.0, 10.0)
    i = H.extent_intersection(cat).collect()[0]
    assert i.xmin is None  # "fourth" (6,6,10,10) is disjoint from "first"
    i2 = H.extent_intersection(cat.filter("name IN ('second','third')")).collect()[0]
    assert (i2.xmin, i2.ymin, i2.xmax, i2.ymax) == (2.0, 2.0, 4.0, 4.0)


def test_time_monoid(spark):
    cat = synth.catalog_fixture(spark)
    pos = H.time_positions(cat).collect()[0].positions
    assert len(pos) == 3 and pos == sorted(pos)  # dedup (second==third) + sort
    hull = H.time_interval_hull(cat).collect()[0]
    assert hull.start.month == 1 and hull.end.month == 3
