"""Hilbert keys (sources/hilbert.py) — curve invariants, SQL-vs-numpy
cross-formulation agreement, Spark UDF path, layout locality."""

import duckdb
import numpy as np

from geotrellis_server_spark.sources.hilbert import (hilbert_d2xy,
                                                     hilbert_index_ranges,
                                                     hilbert_key_udf,
                                                     hilbert_unrolled_sql,
                                                     hilbert_xy2d)
from pyspark.sql import functions as F


def _full_grid(order):
    side = 1 << order
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    return xs.ravel(), ys.ravel()


def test_curve_invariants_orders_1_to_6():
    for order in range(1, 7):
        side = 1 << order
        xs, ys = _full_grid(order)
        d = hilbert_xy2d(order, xs, ys)
        # bijective onto [0, side^2)
        assert sorted(d.tolist()) == list(range(side * side))
        pos = {int(k): (int(a), int(b)) for k, a, b in zip(d, xs, ys)}
        assert pos[0] == (0, 0)
        # defining property: consecutive keys are 4-adjacent cells
        for k in range(1, side * side):
            (x1, y1), (x0, y0) = pos[k], pos[k - 1]
            assert abs(x1 - x0) + abs(y1 - y0) == 1


def test_order2_golden_sequence():
    xs, ys = _full_grid(2)
    d = hilbert_xy2d(2, xs, ys)
    pos = {int(k): (int(a), int(b)) for k, a, b in zip(d, xs, ys)}
    assert [pos[k] for k in range(16)] == [
        (0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
        (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0)]


def test_unrolled_sql_matches_numpy_on_full_z8_grid():
    con = duckdb.connect()
    out = con.execute(
        hilbert_unrolled_sql(
            8, "SELECT i AS pid, (i // 256) AS x, (i % 256) AS y"
               " FROM range(65536) t(i)", keep="pid,")
        + " ORDER BY pid").fetchnumpy()
    xs = (out["pid"] // 256).astype(np.int64)
    ys = (out["pid"] % 256).astype(np.int64)
    assert (out["hkey"] == hilbert_xy2d(8, xs, ys)).all()


def test_d2xy_inverts_xy2d():
    for order in (1, 2, 5, 8):
        n = 1 << (2 * order)
        d = np.arange(n)
        x, y = hilbert_d2xy(order, d)
        assert (hilbert_xy2d(order, x, y) == d).all()


def test_index_ranges_exact_cover_random_bboxes():
    import random
    rng = random.Random(3)
    order, side = 6, 64
    xs, ys = _full_grid(order)
    keys = hilbert_xy2d(order, xs, ys)
    key_of = {(int(a), int(b)): int(k) for a, b, k in zip(xs, ys, keys)}
    for _ in range(30):
        x0, x1 = sorted(rng.randrange(side) for _ in range(2))
        y0, y1 = sorted(rng.randrange(side) for _ in range(2))
        ranges = hilbert_index_ranges(order, x0, y0, x1, y1)
        want = {key_of[(a, b)]
                for a in range(x0, x1 + 1) for b in range(y0, y1 + 1)}
        got = {k for lo, hi in ranges for k in range(lo, hi)}
        assert got == want
        # minimal: sorted, disjoint, no two mergeable
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2
    assert hilbert_index_ranges(order, 5, 5, 4, 9) == []
    assert hilbert_index_ranges(order, 0, 0, side - 1, side - 1) == \
        [(0, side * side)]


def test_spark_udf_matches_numpy_and_partitioning(spark):
    rng = np.random.default_rng(5)
    tx = rng.integers(0, 256, 500)
    ty = rng.integers(0, 256, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(tx, ty)], "tx long, ty long")
    k = hilbert_key_udf(8)
    got = [r.h for r in
           df.repartition(7).select(k("tx", "ty").alias("h")).collect()]
    ref = hilbert_xy2d(8, tx, ty)
    assert sorted(got) == sorted(ref.tolist())


def test_hilbert_layout_prunes_files(spark, tmp_path):
    """Measured pruning: quarter-extent bbox over a 64x64 tile grid
    written as 16 Hilbert-ordered files touches ~1/4 of them (parquet
    min/max stats prune both axes; a quadrant is a PREFIX of the
    Hilbert curve, so it can't do worse than the Z layout's seam
    crossings)."""
    from geotrellis_server_spark.sources.hilbert import write_hilbert_ordered

    n = 64
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "tile_x long, tile_y long, v long")
    hpath = str(tmp_path / "h")
    write_hilbert_ordered(df, hpath, order=6, n_files=16)
    hit = (spark.read.parquet(hpath)
           .where("tile_x < 32 AND tile_y < 32")
           .select(F.input_file_name().alias("f")).distinct().count())
    assert hit <= 5, hit   # quarter bbox = curve prefix -> ~4 of 16


def test_hilbert_segments_are_tighter_than_zorder(spark, tmp_path):
    """Locality claim, measured: split the full z8 grid into 64 equal
    key ranges; the summed bbox area of Hilbert segments must beat the
    Z-order split (seam jumps inflate Z bboxes)."""
    from geotrellis_server_spark.sources.zorder import zorder_key_expr

    xs, ys = _full_grid(8)

    def bbox_area_sum(keys):
        order_ix = np.argsort(keys, kind="stable")
        tot = 0
        for seg in np.array_split(order_ix, 64):
            tot += (int(xs[seg].max()) - int(xs[seg].min()) + 1) * \
                   (int(ys[seg].max()) - int(ys[seg].min()) + 1)
        return tot

    hil = bbox_area_sum(hilbert_xy2d(8, xs, ys))
    # evaluate the zorder SQL expr through DuckDB for the same grid
    z = duckdb.connect().execute(
        "SELECT " + zorder_key_expr("(i // 256)", "(i % 256)")
        + " AS z FROM range(65536) t(i) ORDER BY i").fetchnumpy()["z"]
    zor = bbox_area_sum(np.asarray(z))
    assert hil <= zor
    assert hil <= 2 * 65536  # segments stay compact in absolute terms
