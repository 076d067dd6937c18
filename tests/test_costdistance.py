"""Cost distance (operators/costdistance.py) — scalar Bellman-Ford
reference exactness, wall detours, round semantics, partition
invariance, and DuckDB-oracle agreement."""

import duckdb
import pytest

from geotrellis_server_spark.operators import costdistance as CD


def _reference(cells: dict, sources, rounds: int) -> dict:
    """Plain-python synchronized Bellman-Ford — the contract recurrence."""
    d = {c: (0 if c in set(sources) else CD.INF) for c in cells}
    for _ in range(rounds):
        nd = dict(d)
        for (x, y), dist in d.items():
            best = dist
            for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if (nx, ny) in d and d[(nx, ny)] < CD.INF:
                    cand = d[(nx, ny)] + cells[(nx, ny)] + cells[(x, y)]
                    best = min(best, cand)
            nd[(x, y)] = best
        d = nd
    return d


def _grid(spark, cells: dict):
    return spark.createDataFrame(
        [(x, y, f) for (x, y), f in cells.items()],
        "cx bigint, cy bigint, fric bigint")


def test_uniform_friction_is_scaled_manhattan(spark):
    cells = {(x, y): 1 for x in range(5) for y in range(5)}
    out = {(r.cx, r.cy): r.dist
           for r in CD.cost_distance(_grid(spark, cells), [(2, 2)], 8).collect()}
    for (x, y), dist in out.items():
        assert dist == 2 * (abs(x - 2) + abs(y - 2))


def test_wall_forces_detour_matches_reference(spark):
    cells = {(x, y): 1 for x in range(6) for y in range(5)}
    for y in range(4):  # costly wall at x=3, gap at y=4
        cells[(3, y)] = 100
    # at 9 rounds the 13-hop detour is unreachable: best <=9-hop path
    # goes THROUGH the wall (2+2+101+101+2 = 208)
    out9 = {(r.cx, r.cy): r.dist
            for r in CD.cost_distance(_grid(spark, cells), [(0, 0)], 9).collect()}
    assert out9 == _reference(cells, [(0, 0)], 9)
    assert out9[(5, 0)] == 208
    # with enough rounds the detour (13 hops x cost 2 = 26) wins
    out14 = {(r.cx, r.cy): r.dist
             for r in CD.cost_distance(_grid(spark, cells), [(0, 0)], 14).collect()}
    assert out14 == _reference(cells, [(0, 0)], 14)
    assert out14[(5, 0)] == 26


def test_round_bound_and_unreached(spark):
    cells = {(x, 0): 1 for x in range(6)}
    out = {(r.cx, r.cy): r.dist
           for r in CD.cost_distance(_grid(spark, cells), [(0, 0)], 3).collect()}
    assert out[(3, 0)] == 6
    assert out[(4, 0)] == CD.INF  # 4 hops > 3 rounds
    assert len(out) == 6  # full domain kept


def test_multi_source_min(spark):
    cells = {(x, 0): 1 for x in range(7)}
    out = {(r.cx, r.cy): r.dist
           for r in CD.cost_distance(_grid(spark, cells), [(0, 0), (6, 0)], 6).collect()}
    assert out[(3, 0)] == 6
    assert out[(5, 0)] == 2  # nearer to the right source


def test_partition_invariance(spark):
    cells = {(x, y): 1 + (x * 7 + y * 3) % 5 for x in range(6) for y in range(6)}
    g = _grid(spark, cells)
    a = sorted(map(tuple, CD.cost_distance(g, [(1, 1)], 6).collect()))
    b = sorted(map(tuple,
                   CD.cost_distance(g.repartition(7), [(1, 1)], 6).collect()))
    assert a == b


def test_matches_duckdb_oracle(spark):
    cells = {(x, y): 1 + (x * 5 + y * 11) % 7 for x in range(8) for y in range(6)}
    got = {(r.cx, r.cy): r.dist
           for r in CD.cost_distance(_grid(spark, cells), [(4, 3)], 5).collect()}
    vals = ", ".join(f"({x}, {y}, {f})" for (x, y), f in cells.items())
    dom = f"SELECT * FROM (VALUES {vals}) v(cx, cy, fric)"
    want = {(x, y): d for x, y, d in duckdb.sql(
        CD.cost_distance_oracle_sql(dom, [(4, 3)], 5)).fetchall()}
    assert got == want
