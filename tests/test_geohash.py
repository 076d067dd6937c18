import duckdb
import pytest
from pyspark.sql import functions as F

from geotrellis_server_spark.grids.geohash import (
    BASE32, geohash_decode_bounds, geohash_expr, geohash_key_expr)


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Independent reference: the classic bisection encoder (no shared
    arithmetic with the SQL closed form)."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    bits = []
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        g = 0
        for m in range(5):
            g = (g << 1) | bits[5 * i + m]
        out.append(BASE32[g])
    return "".join(out)


# published worked examples (geohash.org / the original public spec)
PUBLISHED = [
    (-5.603027, 42.60498, 5, "ezs42"),
    (10.40744, 57.64911, 11, "u4pruydqqvj"),
    (-0.1278, 51.5074, 7, "gcpvj0d"),  # London, cross-checked vs bisection
]


def test_published_examples(spark):
    for lon, lat, p, want in PUBLISHED:
        assert _ref_geohash(lon, lat, p) == want
        df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
        got = df.select(F.expr(geohash_expr("lon", "lat", p)).alias("g")).first().g
        assert got == want, (lon, lat, p, got, want)


def test_sql_matches_bisection_battery(spark):
    import random

    rng = random.Random(42)
    rows = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
            for _ in range(500)]
    # corners and axes (exact cell edges follow IEEE rounding of the
    # closed form — documented; ±180/±90 clamp into the edge cells)
    rows += [(0.0, 0.0), (-180.0, -90.0), (179.999999, 89.999999),
             (180.0, 90.0), (-179.999999, -89.999999)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    for p in (1, 2, 5, 6, 12):
        got = df.select("lon", "lat",
                        F.expr(geohash_expr("lon", "lat", p)).alias("g")).collect()
        for r in got:
            lon, lat = float(r.lon), float(r.lat)
            # bisection handles lon=180/lat=90 naturally (always >= mid
            # -> all-ones path = the top cell the closed form clamps to)
            want = _ref_geohash(lon, lat, p)
            assert r.g == want, (lon, lat, p, r.g, want)


def test_expr_is_engine_portable():
    con = duckdb.connect()
    for p in (1, 5, 6, 11):
        e = geohash_expr("lon", "lat", p)
        k = geohash_key_expr("lon", "lat", p)
        rows = con.execute(
            f"SELECT {e} AS g, {k} AS key FROM (SELECT -5.603027 AS lon, "
            f"42.60498 AS lat)").fetchall()
        assert rows[0][0] == _ref_geohash(-5.603027, 42.60498, p)
        # the packed key re-emits the same characters
        key = rows[0][1]
        chars = "".join(BASE32[(key >> (5 * (p - 1 - i))) & 31]
                        for i in range(p))
        assert chars == rows[0][0]


def test_key_expr_matches_string_expr(spark):
    df = spark.createDataFrame(
        [(l / 7.0, l / 13.0) for l in range(-600, 601, 37)],
        "lon double, lat double")
    p = 6
    got = df.select(
        F.expr(geohash_expr("lon", "lat", p)).alias("g"),
        F.expr(geohash_key_expr("lon", "lat", p)).alias("k")).collect()
    for r in got:
        chars = "".join(BASE32[(int(r.k) >> (5 * (p - 1 - i))) & 31]
                        for i in range(p))
        assert chars == r.g


def test_decode_bounds_roundtrip():
    for lon, lat, p, gh in PUBLISHED:
        lon_lo, lat_lo, lon_hi, lat_hi = geohash_decode_bounds(gh)
        assert lon_lo <= lon < lon_hi
        assert lat_lo <= lat < lat_hi
    # prefix is the parent cell
    b5 = geohash_decode_bounds("ezs42")
    b4 = geohash_decode_bounds("ezs4")
    assert b4[0] <= b5[0] and b4[1] <= b5[1]
    assert b4[2] >= b5[2] and b4[3] >= b5[3]


def test_precision_validation():
    with pytest.raises(ValueError):
        geohash_expr("lon", "lat", 0)
    with pytest.raises(ValueError):
        geohash_key_expr("lon", "lat", 13)
