"""Shared SQL fragments — single source of truth for engine and oracle.

Every deterministic derivation (doc geometry from doc_id, mercator tile
keys, cell keys) is written ONCE here as an ANSI-SQL fragment that both
Spark (via ``F.expr``) and DuckDB (oracle) evaluate identically. Only
functions with matching semantics in both engines are allowed:
``floor ln tan radians pi least greatest cast case %`` — all double math,
so results agree to the last ulp on the same host libm in practice.

This keeps the hot path fully inside Catalyst whole-stage codegen (no UDF
for geometry extraction or tile assignment — SURVEY.md O8) while making
queries oracle-checkable.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Deterministic geometry derivation (the "graft": each document gets a geo
# point extracted from its spans; at SQL level the point is a pure function
# of doc_id so the DuckDB oracle can reproduce it — FIXTURES.md §F1).
#
# All coordinates are multiples of 1/1024° — exact binary doubles, so the
# WKT text in the geo span ("%.10f") round-trips bit-exactly through
# format→parse, and the oracle's arithmetic recomputation agrees with the
# engine's span-extracted values to the last bit.
#
# ~25% of docs (doc_id % 4 = 0) snap into 3 hot clusters to exercise
# hot-cell salting (BASELINE.json north_rule / SURVEY.md O11).
# ---------------------------------------------------------------------------


def lon_sql(doc_id: str = "doc_id") -> str:
    # CAST→DOUBLE before dividing: Spark types `1024.0` as Decimal and
    # bigint/decimal stays Decimal; double/decimal promotes to double in
    # both Spark and DuckDB. Values < 2^53 so the cast is exact.
    base = f"CAST(((({doc_id}) * 9973) % 368640) AS DOUBLE) / 1024.0 - 180.0"
    jitter = f"CAST(((({doc_id}) * 31) % 2048) AS DOUBLE) / 1024.0 - 1.0"
    center = f"(-74.0 + CAST((({doc_id}) % 12) / 4 AS INT) * 40.0)"
    return f"(CASE WHEN ({doc_id}) % 4 = 0 THEN {center} + ({jitter}) ELSE {base} END)"


def lat_sql(doc_id: str = "doc_id") -> str:
    base = f"CAST(((({doc_id}) * 7919) % 174080) AS DOUBLE) / 1024.0 - 85.0"
    jitter = f"CAST(((({doc_id}) * 17) % 2048) AS DOUBLE) / 1024.0 - 1.0"
    center = f"(40.0 - CAST((({doc_id}) % 12) / 4 AS INT) * 30.0)"
    return f"(CASE WHEN ({doc_id}) % 4 = 0 THEN {center} + ({jitter}) ELSE {base} END)"


# ---------------------------------------------------------------------------
# WebMercator tile / cell keys (GeoTrellis SpatialKey floor convention:
# x east from -180, y SOUTH from top; edge points clamp into last tile).
# Same math as grids.layout.tile_key_np — keep in lockstep.
# ---------------------------------------------------------------------------

MAX_LAT = 85.05112877980659


def _clamped_lat(lat: str) -> str:
    return f"least(greatest({lat}, {-MAX_LAT}), {MAX_LAT})"


def mercator_x_sql(lon: str) -> str:
    """Normalized [0,1) mercator x."""
    return f"(({lon}) + 180.0) / 360.0"


def mercator_y_sql(lat: str) -> str:
    """Normalized [0,1) mercator y (0 = north edge)."""
    c = _clamped_lat(lat)
    return f"(0.5 - ln(tan(pi()/4.0 + radians({c})/2.0)) / (2.0*pi()))"


def tile_x_sql(lon: str, zoom: int) -> str:
    n = 1 << zoom
    return f"CAST(greatest(least(floor(({mercator_x_sql(lon)}) * {n}), {n - 1}), 0) AS BIGINT)"


def tile_y_sql(lat: str, zoom: int) -> str:
    n = 1 << zoom
    return f"CAST(greatest(least(floor(({mercator_y_sql(lat)}) * {n}), {n - 1}), 0) AS BIGINT)"


def cell_key_sql(lon: str, lat: str, res: int) -> str:
    """Packed cell id at resolution ``res``: cx * 2^res + cy (unique within
    a resolution; res <= 30 fits bigint). The engine's H3-equivalent —
    SURVEY.md §1.1 SpatialKey mapping."""
    n = 1 << res
    return f"(({tile_x_sql(lon, res)}) * {n} + ({tile_y_sql(lat, res)}))"


# ---------------------------------------------------------------------------
# Deterministic zone grid (broadcast PIP side, FIXTURES.md §F2): 10×10
# world rectangles zone_id 0..99; zone i covers
# lon ∈ [-180 + (i%10)*36, +36), lat ∈ [-85 + (i/10)*17, +17).
# ---------------------------------------------------------------------------

N_ZONE_COLS = 10
N_ZONE_ROWS = 10
ZONE_LON0, ZONE_LON_W = -180.0, 36.0
ZONE_LAT0, ZONE_LAT_H = -85.0, 17.0


def zone_id_for_point_sql(lon: str, lat: str) -> str:
    """Direct zone assignment for the rectangular base grid (oracle path —
    the engine computes it with the real broadcast PIP join instead)."""
    col = f"CAST(greatest(least(floor((({lon}) - {ZONE_LON0}) / {ZONE_LON_W}), {N_ZONE_COLS - 1}), 0) AS BIGINT)"
    row = f"CAST(greatest(least(floor((({lat}) - {ZONE_LAT0}) / {ZONE_LAT_H}), {N_ZONE_ROWS - 1}), 0) AS BIGINT)"
    return f"(({row}) * {N_ZONE_COLS} + ({col}))"
