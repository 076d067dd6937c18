"""Region labeling (operators/vectorize.py) — flood-fill reference,
cross-block merging, determinism, partition invariance."""

import pytest

from geotrellis_server_spark.operators.vectorize import (_PACK,
                                                         region_label,
                                                         unpack_region)


def _reference(cells: dict) -> dict:
    out, seen = {}, set()
    for start in sorted(cells):
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            c = stack.pop()
            comp.append(c)
            x, y = c
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in cells and nb not in seen and cells[nb] == cells[c]:
                    seen.add(nb)
                    stack.append(nb)
        mx, my = min(comp)
        for c in comp:
            out[c] = mx * _PACK + my
    return out


def _grid(spark, cells):
    return spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()],
        "cx bigint, cy bigint, v bigint")


def test_regions_cross_block_boundaries(spark):
    # a 40-wide stripe of one value spans 3 blocks (tile=16)
    cells = {(x, y): (1 if y == 2 else 0) for x in range(40) for y in range(5)}
    out = {(r.cx, r.cy): r.region
           for r in region_label(_grid(spark, cells), tile=16, n_iter=6).collect()}
    want = _reference(cells)
    assert out == want
    stripe = {out[(x, 2)] for x in range(40)}
    assert stripe == {0 * _PACK + 2}


def test_checkerboard_isolated_cells(spark):
    cells = {(x, y): (x + y) % 2 for x in range(6) for y in range(6)}
    out = {(r.cx, r.cy): r.region
           for r in region_label(_grid(spark, cells), tile=4).collect()}
    assert out == _reference(cells)
    # every diagonal-only "region" is its own cell... no — equal-valued
    # cells only touch diagonally, so each cell is its own region
    assert len(set(out.values())) == 36


def test_spiral_needs_rounds_and_converges(spark):
    # U-shaped region spanning blocks: left leg, bottom, right leg
    cells = {}
    for y in range(20):
        cells[(0, y)] = 7
        cells[(19, y)] = 7
    for x in range(20):
        cells[(x, 19)] = 7
    for x in range(1, 19):
        for y in range(0, 19):
            cells.setdefault((x, y), 0)
    out = {(r.cx, r.cy): r.region
           for r in region_label(_grid(spark, cells), tile=8, n_iter=8).collect()}
    assert out == _reference(cells)


def test_partition_invariance(spark):
    cells = {(x, y): (x * 3 + y) % 4 for x in range(12) for y in range(12)}
    g = _grid(spark, cells)
    a = sorted(map(tuple, region_label(g, tile=5, n_iter=8).collect()))
    b = sorted(map(tuple,
                   region_label(g.repartition(7), tile=5, n_iter=8).collect()))
    assert a == b
    assert a == sorted((c[0], c[1], r) for c, r in _reference(cells).items())


def test_unpack_region():
    assert unpack_region(5 * _PACK + 9) == (5, 9)


def test_region_stats_square_and_stripe(spark):
    from geotrellis_server_spark.operators.vectorize import region_stats

    # 3x3 block of 7s inside a field of 0s (10x10)
    cells = {(x, y): 0 for x in range(10) for y in range(10)}
    for x in range(4, 7):
        for y in range(4, 7):
            cells[(x, y)] = 7
    out = {r.region: r for r in
           region_stats(_grid(spark, cells), tile=4, n_iter=8).collect()}
    assert len(out) == 2
    sq = next(r for r in out.values() if r.v == 7)
    assert sq.n_cells == 9 and sq.perimeter == 12
    assert (sq.xmin, sq.ymin, sq.xmax, sq.ymax) == (4, 4, 6, 6)
    bg = next(r for r in out.values() if r.v == 0)
    assert bg.n_cells == 91
    # background perimeter = outer boundary (40) + hole boundary (12)
    assert bg.perimeter == 40 + 12
