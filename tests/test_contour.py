"""Marching-squares contours (operators/contour.py) — case-table
correctness on analytic shapes, closed-loop topology, border handling,
partition invariance, DuckDB-oracle agreement."""

import duckdb
import pytest

from geotrellis_server_spark.operators import contour as C


def _grid(spark, cells):
    return spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()],
        "cx bigint, cy bigint, v bigint")


def _segs(df):
    return {((r.x1, r.y1), (r.x2, r.y2)) for r in df.collect()}


def test_single_high_cell_forms_diamond(spark):
    cells = {(x, y): 0 for x in range(5) for y in range(5)}
    cells[(2, 2)] = 10
    segs = _segs(C.contour_segments(_grid(spark, cells), 5))
    # the isoline around one interior cell is 4 segments: cases 2,1,4,8
    assert len(segs) == 4
    # endpoints each appear exactly twice → closed loop
    from collections import Counter

    deg = Counter()
    for p, q in segs:
        deg[p] += 1
        deg[q] += 1
    assert all(d == 2 for d in deg.values())


def test_vertical_edge_line(spark):
    # left half low, right half high → vertical isoline of T-B segments
    cells = {(x, y): (0 if x < 3 else 9) for x in range(6) for y in range(6)}
    out = C.contour_segments(_grid(spark, cells), 5).collect()
    assert all(r.case == 6 for r in out)
    assert len(out) == 5  # one per block row
    # all segments share the same doubled x
    assert len({r.x1 for r in out}) == 1 and all(r.x1 == r.x2 for r in out)


def test_saddle_conventions(spark):
    cells = {(0, 0): 9, (1, 0): 0, (0, 1): 0, (1, 1): 9}  # case 10 (TL+BR)
    out = C.contour_segments(_grid(spark, cells), 5).collect()
    assert {r.case for r in out} == {10} and len(out) == 2
    cells2 = {(0, 0): 0, (1, 0): 9, (0, 1): 9, (1, 1): 0}  # case 5
    out2 = C.contour_segments(_grid(spark, cells2), 5).collect()
    assert {r.case for r in out2} == {5} and len(out2) == 2
    ref = set()
    for c, bx, by in ((10, 0, 0),):
        for p, q in C.segments_of_case(c, bx, by):
            ref.add((p, q))
    assert {((r.x1, r.y1), (r.x2, r.y2)) for r in out} == ref


def test_matches_python_reference_everywhere(spark):
    cells = {(x, y): (x * 7 + y * 13) % 11 for x in range(8) for y in range(8)}
    got = _segs(C.contour_segments(_grid(spark, cells), 6))
    want = set()
    for bx in range(7):
        for by in range(7):
            case = (8 * (cells[(bx, by)] >= 6) + 4 * (cells[(bx + 1, by)] >= 6)
                    + 2 * (cells[(bx + 1, by + 1)] >= 6)
                    + 1 * (cells[(bx, by + 1)] >= 6))
            want |= set(C.segments_of_case(case, bx, by))
    assert got == want


def test_matches_duckdb_oracle_and_partition_invariance(spark):
    cells = {(x, y): (x * 5 + y * 3) % 9 for x in range(7) for y in range(7)}
    g = _grid(spark, cells)
    got = sorted(map(tuple, C.contour_segments(g, 4).collect()))
    vals = ", ".join(f"({x}, {y}, {v})" for (x, y), v in cells.items())
    dom = f"SELECT * FROM (VALUES {vals}) t(cx, cy, v)"
    want = sorted(map(tuple, duckdb.sql(C.contour_oracle_sql(dom, 4)).fetchall()))
    assert got == want
    rep = sorted(map(tuple,
                     C.contour_segments(g.repartition(5), 4).collect()))
    assert got == rep
