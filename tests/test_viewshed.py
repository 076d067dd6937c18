"""Viewshed (operators/viewshed.py) — scalar line-of-sight reference,
wall shadows, grazing-equality rule, partition invariance, and
DuckDB-oracle agreement."""

import duckdb
import pytest

from geotrellis_server_spark.operators import viewshed as V
from geotrellis_server_spark.operators.viewshed import viewshed


def _dda(c0, c1, n, t):
    return c0 if n == 0 else (2 * (c0 * n + t * (c1 - c0)) + n) // (2 * n)


def _reference(cells: dict, src) -> dict:
    sx, sy = src
    zs = cells[src]
    out = {}
    for (cx, cy), zc in cells.items():
        n = max(abs(cx - sx), abs(cy - sy))
        blocked = False
        for t in range(1, n):
            ix, iy = _dda(sx, cx, n, t), _dda(sy, cy, n, t)
            if (cells[(ix, iy)] - zs) * n > (zc - zs) * t:
                blocked = True
                break
        out[(cx, cy)] = not blocked
    return out


def _grid(spark, cells):
    return spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells.items()],
        "cx bigint, cy bigint, z bigint")


def test_flat_terrain_all_visible(spark):
    cells = {(x, y): 5 for x in range(6) for y in range(6)}
    out = {(r.cx, r.cy): r.visible
           for r in viewshed(_grid(spark, cells), (2, 2)).collect()}
    assert all(out.values()) and len(out) == 36


def test_wall_casts_shadow(spark):
    cells = {(x, 0): 0 for x in range(8)}
    cells[(3, 0)] = 100  # tall wall between source 0 and the far cells
    out = {(r.cx, r.cy): r.visible
           for r in viewshed(_grid(spark, cells), (0, 0)).collect()}
    assert out[(3, 0)]                      # the wall itself is visible
    assert not any(out[(x, 0)] for x in (4, 5, 6, 7))
    assert out[(1, 0)] and out[(2, 0)]


def test_grazing_equality_is_visible(spark):
    # ramp z = x: every intermediate angle EQUALS the target angle
    cells = {(x, 0): x for x in range(6)}
    out = {(r.cx, r.cy): r.visible
           for r in viewshed(_grid(spark, cells), (0, 0)).collect()}
    assert all(out.values())


def test_matches_scalar_reference_and_oracle(spark):
    cells = {(x, y): (x * 13 + y * 29) % 17 for x in range(7) for y in range(7)}
    src = (3, 3)
    got = {(r.cx, r.cy): r.visible
           for r in viewshed(_grid(spark, cells), src).collect()}
    assert got == _reference(cells, src)
    vals = ", ".join(f"({x}, {y}, {z})" for (x, y), z in cells.items())
    dom = f"SELECT * FROM (VALUES {vals}) v(cx, cy, z)"
    want = {(x, y): vis for x, y, vis in duckdb.sql(
        V.viewshed_oracle_sql(dom, src)).fetchall()}
    assert got == want


def test_partition_invariance(spark):
    cells = {(x, y): (x * 7 + y * 11) % 9 for x in range(6) for y in range(6)}
    g = _grid(spark, cells)
    a = sorted(map(tuple, viewshed(g, (1, 4)).collect()))
    b = sorted(map(tuple, viewshed(g.repartition(7), (1, 4)).collect()))
    assert a == b


def test_missing_source_raises(spark):
    cells = {(x, 0): 1 for x in range(3)}
    with pytest.raises(ValueError, match="not a window cell"):
        viewshed(_grid(spark, cells), (9, 9))
