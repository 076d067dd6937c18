"""Z-order (Morton) clustering for spatial lake layouts — the engine's
Delta/Iceberg ZORDER BY analog: sort the table by the bit-interleaved
tile key before writing, so parquet min/max column statistics make any
bbox predicate prune most FILES and row groups at planning time.

Reference parity note: geotrellis persists layers keyed by SFC index
(GeoTrellis Z/Hilbert KeyIndex) for exactly this locality; here the
same idea lands as a write-side sort + ordinary parquet statistics, so
Catalyst's stock pushdown does the pruning — no custom reader.

The key is pure codegen SQL (shift/mask bit spreading, no UDF) and is
engine-portable: the gate oracle recomputes it in DuckDB bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread_bits_expr(col: str) -> str:
    """Spread the low 16 bits of ``col`` so a zero bit separates every
    data bit (x -> x with gaps): the classic magic-number sequence,
    e.g. Morton/BMI reference implementations (public domain bit
    twiddling; Warren, Hacker's Delight §7-2). All BIGINT ops."""
    x = f"(CAST({col} AS BIGINT) & 65535)"
    steps = [
        (256, "16711935"),       # << 8, 0x00FF00FF
        (16, "252645135"),       # << 4, 0x0F0F0F0F
        (4, "858993459"),        # << 2, 0x33333333
        (2, "1431655765"),       # << 1, 0x55555555
    ]
    e = x
    # left shifts spelled as multiplication by 2^k: identical BIGINT
    # semantics in range, and — unlike shiftleft()/<< — the SAME string
    # parses in both Spark and DuckDB (&, | agree already)
    for mul, mask in steps:
        e = f"((({e}) | (({e}) * {mul})) & {mask})"
    return e


def zorder_key_expr(x_col: str, y_col: str) -> str:
    """32-bit Morton key interleaving two 16-bit grid coordinates
    (x in even bits, y in odd): z = spread(x) | spread(y) * 2. One
    engine-portable string (the gate oracle runs it verbatim)."""
    return (f"({_spread_bits_expr(x_col)} | "
            f"({_spread_bits_expr(y_col)} * 2))")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    n_files: int = 16,
    **writer_opts,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Morton key of (x_col, y_col). Each file then covers a
    compact Z-curve segment — a contiguous spatial blob — so min/max
    stats on x/y prune files for bbox predicates (tested: a quarter-
    extent bbox reads ~1/4 of the files instead of all of them).

    repartitionByRange + sortWithinPartitions is the exact recipe
    Delta's OPTIMIZE ZORDER BY executes; at 100 TB the sort is the
    usual global range exchange and runs once per layout rebuild."""
    key = F.expr(zorder_key_expr(x_col, y_col))
    (df.withColumn("_z", key)
       .repartitionByRange(int(n_files), "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").options(**writer_opts).parquet(path))
