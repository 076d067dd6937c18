"""Geohash encoding as engine-portable SQL — the public-web cell key.

Geohash (Niemeyer 2008; the de-facto public geocode used by
Elasticsearch/Lucene/Redis GEO) interleaves quantized longitude and
latitude bits MSB-first — the FIRST (most significant) bit is a
longitude bit — then emits 5-bit groups through the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz`` (i, l, o are excluded).

This module builds the whole encoding as ONE SQL string of BIGINT
bit arithmetic + ``substr`` lookups, so it

- runs entirely inside whole-stage codegen (no UDF, no Python row
  path), and
- parses VERBATIM in both Spark and DuckDB (shifts spelled as
  multiplication/division by 2^k, masks as decimal literals — the
  same portability doctrine as sources/zorder.py), which is what the
  driver-gate oracle relies on.

Quantization semantics: ``lon_q = floor((lon+180)/360 * 2^nbits)``
clamped to the top cell, matching the closed-form encoders in public
geohash libraries. Points mathematically ON a cell boundary follow
IEEE-754 rounding of that product (the double cannot always represent
the boundary exactly); both engines evaluate the identical expression
so results agree bit-for-bit regardless.

Reference parity: geotrellis-server keys layers by GeoTrellis
SpatialKey / Z-curve SFC index; geohash is the same
space-filling-curve idea with a textual, prefix-coarsenable key —
``substr(geohash, 1, p-1)`` IS the parent cell, so the engine's
cell-prefix range partitioning (north rule) applies unchanged.
"""

from __future__ import annotations

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 60 bits — full classic geohash range


def _spread_bits_expr(col_expr: str, nbits: int) -> str:
    """Spread the low ``nbits`` (≤ 32) bits of a BIGINT expression so a
    zero separates every data bit (Morton spreading; Warren, Hacker's
    Delight §7-2 magic numbers, 64-bit variant). Pure BIGINT ops that
    parse identically in Spark and DuckDB."""
    if nbits > 32:
        raise ValueError("spread supports at most 32 input bits")
    x = f"(CAST({col_expr} AS BIGINT) & {(1 << nbits) - 1})"
    steps = [
        (1 << 16, 0x0000FFFF0000FFFF),
        (1 << 8, 0x00FF00FF00FF00FF),
        (1 << 4, 0x0F0F0F0F0F0F0F0F),
        (1 << 2, 0x3333333333333333),
        (1 << 1, 0x5555555555555555),
    ]
    e = x
    for mul, mask in steps:
        # skip steps that cannot move any bit of an nbits-wide input
        if mul > (1 << (2 * nbits)):
            continue
        e = f"((({e}) | (({e}) * {mul})) & {mask})"
    return e


def _quantize_expr(coord: str, lo: float, hi: float, nbits: int) -> str:
    """floor((coord - lo) / (hi - lo) * 2^nbits), clamped to the valid
    cell range — the closed-form geohash quantizer."""
    span = hi - lo
    top = (1 << nbits) - 1
    raw = (f"CAST(floor(((CAST({coord} AS DOUBLE)) - ({lo!r})) / {span!r} "
           f"* {float(1 << nbits)!r}) AS BIGINT)")
    # clamp: lon=180 / lat=90 land in the top cell; tiny negative
    # rounding at the low edge lands in cell 0
    return f"least(greatest({raw}, 0), {top})"


def geohash_key_expr(lon_col: str, lat_col: str, precision: int) -> str:
    """BIGINT geohash key (the 5·precision interleaved bits) as one
    engine-portable SQL expression."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be 1..{MAX_PRECISION}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2  # lon owns the MSB, so it gets the extra bit
    nlat = nbits // 2
    lon_q = _quantize_expr(lon_col, -180.0, 180.0, nlon)
    lat_q = _quantize_expr(lat_col, -90.0, 90.0, nlat)
    s_lon = _spread_bits_expr(lon_q, nlon)
    s_lat = _spread_bits_expr(lat_q, nlat)
    if nbits % 2 == 1:
        # odd bit count (odd precision): MSB position nbits-1 is EVEN,
        # so lon bits sit at even positions from the LSB
        return f"(({s_lon}) | (({s_lat}) * 2))"
    # even bit count: MSB position is odd → lon bits at odd positions
    return f"((({s_lon}) * 2) | ({s_lat}))"


def _bit_expr(q_expr: str, j: int) -> str:
    """Bit ``j`` of a small (< 2^32) non-negative BIGINT expression —
    floor-division spelled through DOUBLE, exact because the operand is
    far below 2^53."""
    if j == 0:
        return f"(({q_expr}) % 2)"
    return (f"(CAST(floor(CAST(({q_expr}) AS DOUBLE) / {float(1 << j)!r}) "
            f"AS BIGINT) % 2)")


def geohash_expr(lon_col: str, lat_col: str, precision: int) -> str:
    """Geohash STRING of ``precision`` characters as one SQL expression
    (base-32 characters via 1-based ``substr`` — identical semantics in
    Spark and DuckDB).

    Characters are assembled from bit extractions on the QUANTIZED
    lon/lat integers directly (each < 2^30, so every floor-division is
    double-exact) — never by splitting the packed 5p-bit key, which
    exceeds 2^53 at high precision. Codegen common-subexpression-
    eliminates the repeated quantizers."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be 1..{MAX_PRECISION}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_q = _quantize_expr(lon_col, -180.0, 180.0, nlon)
    lat_q = _quantize_expr(lat_col, -90.0, 90.0, nlat)
    chars = []
    for i in range(precision):
        terms = []
        for m in range(5):
            t = 5 * i + m  # MSB-first position in the interleaved key
            if t % 2 == 0:  # longitude bit
                bit = _bit_expr(lon_q, nlon - 1 - t // 2)
            else:  # latitude bit
                bit = _bit_expr(lat_q, nlat - 1 - (t - 1) // 2)
            terms.append(f"(({bit}) * {1 << (4 - m)})" if m < 4 else bit)
        group = "(" + " + ".join(terms) + ")"
        chars.append(f"substr('{BASE32}', CAST({group} AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def geohash_decode_bounds(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a geohash cell — the
    standard bisection decode (driver-side helper for tests/serving)."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True  # first bit is a longitude bit
    for ch in gh:
        idx = BASE32.index(ch)
        for bit in range(4, -1, -1):
            b = (idx >> bit) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lon_lo, lat_lo, lon_hi, lat_hi
