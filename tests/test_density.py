"""Kernel density + IDW (operators/density.py) — scalar-reference
exactness, edge semantics, and DuckDB-oracle agreement on the gate
formulation."""

import duckdb
import pytest

from geotrellis_server_spark.operators import density as D


def test_kernel_density_single_point(spark):
    # one point well inside the grid: output IS the kernel, centred
    pts = spark.createDataFrame([(10.0, 20.0)], "lon double, lat double")
    # zoom 0, tile 64 → global grid 64×64; compute expected centre pixel
    rows = {(r.gx, r.gy): r.density
            for r in D.kernel_density(pts, 0, 64).collect()}
    assert len(rows) == 9
    assert sum(rows.values()) == 16  # binomial3 total mass
    (cx, cy) = max(rows, key=lambda k: rows[k])
    assert rows[(cx, cy)] == 4
    for (gx, gy), d in rows.items():
        dx, dy = gx - cx, gy - cy
        assert d == D.KERNEL_BINOMIAL3[dy + 1][dx + 1]


def test_kernel_density_overlap_sums(spark):
    # two identical points: every stamp doubles
    pts = spark.createDataFrame(
        [(10.0, 20.0), (10.0, 20.0)], "lon double, lat double")
    rows = [r.density for r in D.kernel_density(pts, 0, 64).collect()]
    assert sorted(rows) == [2, 2, 2, 2, 4, 4, 4, 4, 8]


def test_kernel_density_edge_dropped(spark):
    # point in the corner pixel: stamps past the edge are DROPPED
    pts = spark.createDataFrame([(-179.999, 85.05)], "lon double, lat double")
    out = D.kernel_density(pts, 0, 64).collect()
    assert all(r.gx >= 0 and r.gy >= 0 for r in out)
    assert sum(r.density for r in out) < 16


def test_kernel_density_matches_duckdb_oracle(spark):
    pts = [(i * 0.37 - 5.0, i * 0.23 + 1.0) for i in range(200)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = {(r.gx, r.gy): r.density
           for r in D.kernel_density(df, 3, 64).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE p (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    want = {(gx, gy): d for gx, gy, d in con.execute(
        D.kernel_density_oracle_sql("SELECT lon, lat FROM p", 3, 64)
    ).fetchall()}
    assert got == want


def test_idw_exact_hit_and_falloff(spark):
    samples = spark.createDataFrame(
        [(10, 10, 100)], "sx bigint, sy bigint, v bigint")
    out = {(r.cx, r.cy): r for r in
           D.idw_grid(samples, 8, 8, 5, 5, radius=2).collect()}
    # exact hit: w = 2^20, value = v
    hit = out[(10, 10)]
    assert hit.wsum == D.IDW_W_NUM and hit.wvsum == D.IDW_W_NUM * 100
    # distance 1: w = floor(2^20 / 2)
    assert out[(11, 10)].wsum == D.IDW_W_NUM // 2
    # circular cut: d² = 5 > r² = 4 → no row
    assert (12, 11) not in out
    # out of radius entirely
    assert (12, 12) not in out


def test_idw_blocked_join_matches_duckdb_direct(spark):
    # irregular samples, window chosen to exercise block boundaries
    samples = [(7 + 3 * i % 40, 5 + 5 * i % 37, 10 + i % 23)
               for i in range(60)]
    df = spark.createDataFrame(samples, "sx bigint, sy bigint, v bigint")
    got = {(r.cx, r.cy): (r.wsum, r.wvsum, r.n_samples)
           for r in D.idw_grid(df, 0, 0, 48, 40, radius=6).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE s (sx BIGINT, sy BIGINT, v BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", samples)
    want = {(cx, cy): (ws, wv, n) for cx, cy, ws, wv, n in con.execute(
        D.idw_oracle_sql("SELECT * FROM s", 0, 0, 48, 40, 6)
    ).fetchall()}
    assert got == want
    assert len(got) > 100  # the window is actually covered


def test_idw_partition_invariance(spark):
    samples = [(i % 30, (i * 7) % 30, i % 11) for i in range(50)]
    df = spark.createDataFrame(samples, "sx bigint, sy bigint, v bigint")
    a = sorted(map(tuple, D.idw_grid(df, 0, 0, 30, 30, 4).collect()))
    b = sorted(map(tuple,
                   D.idw_grid(df.repartition(7), 0, 0, 30, 30, 4).collect()))
    assert a == b
