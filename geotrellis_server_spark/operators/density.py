"""Point-density surfaces: kernel density estimation and inverse-distance
weighting (GeoTrellis parity: ``geotrellis.raster.density.KernelDensity``
and ``geotrellis.raster.interpolation.InverseDistanceWeighted`` — library
ops underneath the reference server's raster sources; the reference
exposes whatever the layer pipeline computed, so these are the build-side
complements of the serving ops in operators/tiling.py).

Both are exact-integer by construction so the DuckDB gate can hash them:

* kernel density stamps an INTEGER kernel (binomial by default) around
  each point's global pixel — the per-pixel density is a plain BIGINT
  sum, associative/commutative, engine- and partitioning-invariant.
* IDW emits the weighted-sum NUMERATOR and DENOMINATOR as BIGINTs
  (weight = floor(2^20 / (1 + d²)) on the integer pixel grid — the
  regularized-IDW weight; 2^20/k for k ≤ 1+2r² is never within an ulp
  of an integer it doesn't equal, so the floor is cross-engine exact).
  Callers divide at the edge; the gate hashes the exact sums.

Scale shape (100 TB): kernel stamping is ROW-LOCAL (a ≤(2r+1)²-way
explode of literal offsets — no join), collapsed by ONE map-side-combined
groupBy on the pixel key: hot clusters partial-aggregate before the
exchange. IDW is the LSH-banding join pattern: samples replicate to the
≤9 neighbor blocks of side `radius`, target cells key by their own
block, one equi-join on the block key + a cell-keyed aggregate — never
cells × samples, and nothing is broadcast, so both sides can be huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen
from .tiling import pixel_index_sql

# binomial (Pascal) 3×3 — the discrete Gaussian a density surface wants;
# integer weights keep every sum exact.
KERNEL_BINOMIAL3 = ((1, 2, 1), (2, 4, 2), (1, 2, 1))

IDW_W_NUM = 1 << 20  # weight numerator: floor(2^20 / (1 + d²))


def _kernel_offsets(kernel) -> list[tuple[int, int, int]]:
    r = len(kernel) // 2
    out = []
    for dy, row in enumerate(kernel):
        for dx, w in enumerate(row):
            if w:
                out.append((dx - r, dy - r, int(w)))
    return out


def global_pixel_sql(
    lon: str, lat: str, zoom: int, tile_size: int = 64
) -> tuple[str, str]:
    """(gpx, gpy) global-pixel SQL fragments at ``zoom`` — engine-portable
    (same floor convention as tiling.pixel_index_sql, recombined to the
    global grid)."""
    _, _, px, py = pixel_index_sql(lon, lat, zoom, tile_size)
    gpx = f"(({sqlgen.tile_x_sql(lon, zoom)}) * {tile_size} + ({px}))"
    gpy = f"(({sqlgen.tile_y_sql(lat, zoom)}) * {tile_size} + ({py}))"
    return gpx, gpy


def kernel_density(
    points: DataFrame,
    zoom: int,
    tile_size: int = 64,
    kernel=KERNEL_BINOMIAL3,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-global-pixel integer kernel density at ``zoom``:
    ``(gx, gy, density)``, density = Σ over points of kernel[dy][dx].

    GeoTrellis ``KernelDensity.apply`` semantics (stamp the kernel
    centred on each point, sum overlaps); off-grid stamps are dropped,
    not clamped — clamping would double-count the world edge.
    """
    n_px = (1 << zoom) * tile_size
    gpx, gpy = global_pixel_sql(lon, lat, zoom, tile_size)
    offs = _kernel_offsets(kernel)
    stamps = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(w).alias("kw"))
        for dx, dy, w in offs
    ])
    # the aggregation groups on ONE packed bigint (gx * n_px + gy,
    # bijective after the bounds filter) and unpacks post-agg: a single
    # 8-byte key through the stamp-stream exchange instead of two,
    # fewer bytes and one hash per row (identical groups and sums)
    return (
        points.select(F.expr(gpx).alias("_gx"), F.expr(gpy).alias("_gy"))
        .select("_gx", "_gy", F.explode(stamps).alias("k"))
        .select(
            (F.col("_gx") + F.col("k.dx")).alias("gx"),
            (F.col("_gy") + F.col("k.dy")).alias("gy"),
            F.col("k.kw").alias("kw"),
        )
        .where(f"gx >= 0 AND gx < {n_px} AND gy >= 0 AND gy < {n_px}")
        .select((F.col("gx") * n_px + F.col("gy")).alias("_pk"), "kw")
        .groupBy("_pk")
        .agg(F.sum("kw").alias("density"))
        .select(F.expr(f"_pk DIV {n_px}").alias("gx"),
                F.expr(f"_pk % {n_px}").alias("gy"),
                "density")
    )


def kernel_density_oracle_sql(
    pts_sql: str, zoom: int, tile_size: int = 64, kernel=KERNEL_BINOMIAL3,
    lon: str = "lon", lat: str = "lat",
) -> str:
    """DuckDB oracle for :func:`kernel_density` over a point subquery
    ``pts_sql`` (must expose ``lon``/``lat``): the same stamp-and-sum
    via a VALUES cross join — independent formulation (join vs row-local
    explode), identical integers."""
    n_px = (1 << zoom) * tile_size
    gpx, gpy = global_pixel_sql(lon, lat, zoom, tile_size)
    vals = ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in _kernel_offsets(kernel))
    return f"""
    WITH pix AS (SELECT {gpx} AS gx, {gpy} AS gy FROM ({pts_sql}) p),
    stamp AS (
      SELECT pix.gx + k.dx AS gx, pix.gy + k.dy AS gy, k.kw
      FROM pix CROSS JOIN (VALUES {vals}) k(dx, dy, kw))
    SELECT gx, gy, CAST(sum(kw) AS BIGINT) AS density
    FROM stamp
    WHERE gx >= 0 AND gx < {n_px} AND gy >= 0 AND gy < {n_px}
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# IDW
# ---------------------------------------------------------------------------


def idw_weight_sql(d2: str) -> str:
    """Exact-integer regularized-IDW weight floor(2^20 / (1 + d²)).
    Portable: both engines evaluate the double division correctly
    rounded, and 2^20/k (k small) is never within an ulp of a wrong
    integer, so floor agrees bit-for-bit."""
    return (
        f"CAST(floor(CAST({IDW_W_NUM} AS DOUBLE) / "
        f"CAST(1 + ({d2}) AS DOUBLE)) AS BIGINT)"
    )


def idw_grid(
    samples: DataFrame,
    x0: int,
    y0: int,
    width: int,
    height: int,
    radius: int,
    sx: str = "sx",
    sy: str = "sy",
    value: str = "v",
) -> DataFrame:
    """Inverse-distance interpolation of integer samples ``(sx, sy, v)``
    (global-pixel coords) onto the dense cell window
    ``[x0, x0+width) × [y0, y0+height)``:

        (cx, cy, wsum, wvsum, n_samples)

    with weight w = floor(2^20 / (1 + d²)), d² the integer pixel
    distance², over samples within ``radius`` (Chebyshev box pre-filter,
    exact circular d² ≤ radius² cut). Cells out of every sample's reach
    get no row (NoData) — GeoTrellis IDW ``radius`` semantics. The
    interpolated value is wvsum / wsum at the consumer's precision.

    Join shape: samples explode to their ≤9 overlapping blocks of side
    ``radius``; cells carry one block key; equi-join on the block then a
    map-side-combined cell aggregate. Both sides stay distributed.
    """
    b = radius
    cells = (
        samples.sparkSession.range(width * height)
        .select(
            F.expr(f"{x0} + id % {width}").alias("cx"),
            F.expr(f"{y0} + id DIV {width}").alias("cy"),
        )
        .withColumn("bx", F.expr(f"CAST(floor(cx / {b}.0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(cy / {b}.0) AS BIGINT)"))
    )
    reps = F.expr("explode(sequence(-1, 1))")
    samp = (
        samples.select(
            F.col(sx).alias("_sx"), F.col(sy).alias("_sy"),
            F.col(value).alias("_v"),
        )
        .withColumn("_dbx", reps)
        .withColumn("_dby", F.expr("explode(sequence(-1, 1))"))
        .select(
            "_sx", "_sy", "_v",
            F.expr(f"CAST(floor(_sx / {b}.0) AS BIGINT) + _dbx").alias("bx"),
            F.expr(f"CAST(floor(_sy / {b}.0) AS BIGINT) + _dby").alias("by"),
        )
    )
    d2 = "(cx - _sx) * (cx - _sx) + (cy - _sy) * (cy - _sy)"
    w = idw_weight_sql(d2)
    return (
        cells.join(samp, ["bx", "by"])
        .where(f"{d2} <= {radius * radius}")
        .groupBy("cx", "cy")
        .agg(
            F.expr(f"sum({w})").alias("wsum"),
            F.expr(f"sum(({w}) * _v)").alias("wvsum"),
            F.count("*").alias("n_samples"),
        )
    )


def idw_oracle_sql(
    samples_sql: str, x0: int, y0: int, width: int, height: int, radius: int,
) -> str:
    """DuckDB oracle for :func:`idw_grid` over a sample subquery exposing
    ``sx, sy, v`` — direct range-predicate join (no block decomposition),
    identical integer sums."""
    d2 = "(c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy)"
    w = idw_weight_sql(d2)
    return f"""
    WITH cells AS (
      SELECT {x0} + j.j AS cx, {y0} + i.i AS cy
      FROM range({height}) i(i) CROSS JOIN range({width}) j(j)),
    samp AS (SELECT * FROM ({samples_sql}) q)
    SELECT c.cx, c.cy,
           CAST(sum({w}) AS BIGINT) AS wsum,
           CAST(sum(({w}) * s.v) AS BIGINT) AS wvsum,
           count(*) AS n_samples
    FROM cells c
    JOIN samp s ON s.sx BETWEEN c.cx - {radius} AND c.cx + {radius}
               AND s.sy BETWEEN c.cy - {radius} AND c.cy + {radius}
    WHERE {d2} <= {radius * radius}
    GROUP BY 1, 2
    """
