"""Resampling / regridding (SURVEY.md R3) — the reference's
``resample(TargetRegion(gridExtent), method)`` (conf-decodable methods at
ogc-example/.../conf/package.scala:161-173: nearest-neighbor, bilinear,
cubic-convolution, cubic-spline, lanczos, average, mode, median, max,
min, sum). All 11 methods are implemented in pure numpy — the cubic /
lanczos family as separable convolutions (Keys cubic a=-0.5, cubic
B-spline, Lanczos a=3 — the standard public kernels; scipy not required).

Kernels are pure numpy over whole tile blocks; the DataFrame operator
rescales every tile in place (same key space, new pixel dims). Arbitrary
target grids compose from this + tiling.assign_tiles (regrid = retile at
the target zoom then resample to cell size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INTERPOLATING = {"nearest", "bilinear", "cubic-convolution", "cubic-spline", "lanczos"}
AGGREGATING = {"average", "mode", "median", "max", "min", "sum"}


def _keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic-convolution kernel (a = -0.5: exact for linear ramps)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )


def _bspline_cubic(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline (smoothing — does NOT interpolate the samples)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (4.0 - 6.0 * ax**2 + 3.0 * ax**3) / 6.0,
        np.where(ax < 2.0, (2.0 - ax) ** 3 / 6.0, 0.0),
    )


def _lanczos(x: np.ndarray, a: int = 3) -> np.ndarray:
    ax = np.abs(x)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.sinc(x) * np.sinc(x / a)
    return np.where(ax < a, out, 0.0)


_CONV_KERNELS = {
    "cubic-convolution": (_keys_cubic, 2),
    "cubic-spline": (_bspline_cubic, 2),
    "lanczos": (_lanczos, 3),
}


def _resample_axis0(a: np.ndarray, out_n: int, kernel, radius: int) -> np.ndarray:
    """Separable 1-D convolution resample along axis 0 (cell centers;
    edge-clamped taps; weights renormalized so constants are preserved
    everywhere, incl. edges). Tap gathering (not a dense matmul) so a NaN
    sample only poisons outputs whose support actually touches it."""
    n = a.shape[0]
    s = (np.arange(out_n, dtype=np.float64) + 0.5) * n / out_n - 0.5
    base = np.floor(s).astype(np.int64)
    out = np.zeros((out_n,) + a.shape[1:], dtype=np.float64)
    wsum = np.zeros(out_n, dtype=np.float64)
    for t in range(-radius + 1, radius + 1):
        j = base + t
        w = kernel(s - j)
        jc = np.clip(j, 0, n - 1)
        out += w.reshape((-1,) + (1,) * (a.ndim - 1)) * a[jc]
        wsum += w
    return out / wsum.reshape((-1,) + (1,) * (a.ndim - 1))


def resample_block(a: np.ndarray, out_h: int, out_w: int, method: str) -> np.ndarray:
    h, w = a.shape
    if method == "nearest":
        yi = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(int)
        xi = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(int)
        return a[yi[:, None], xi[None, :]]
    if method in _CONV_KERNELS:
        kernel, radius = _CONV_KERNELS[method]
        tmp = _resample_axis0(np.asarray(a, dtype=np.float64), out_h, kernel, radius)
        return _resample_axis0(tmp.T, out_w, kernel, radius).T
    if method == "bilinear":
        # bilinear on cell centers
        y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        fy = np.clip(y - y0, 0, 1)[:, None]
        fx = np.clip(x - x0, 0, 1)[None, :]
        tl = a[y0[:, None], x0[None, :]]
        tr = a[y0[:, None], x1[None, :]]
        bl = a[y1[:, None], x0[None, :]]
        br = a[y1[:, None], x1[None, :]]
        return tl * (1 - fy) * (1 - fx) + tr * (1 - fy) * fx + bl * fy * (1 - fx) + br * fy * fx
    if method in AGGREGATING:
        if h % out_h or w % out_w:
            raise ValueError(f"{method} resample needs integer downscale factors ({h}x{w} -> {out_h}x{out_w})")
        fh, fw = h // out_h, w // out_w
        win = a.reshape(out_h, fh, out_w, fw).transpose(0, 2, 1, 3).reshape(out_h, out_w, fh * fw)
        with np.errstate(all="ignore"):
            if method == "average":
                return np.nanmean(win, axis=-1)
            if method == "sum":
                # all-NoData windows stay NoData (np.nansum alone returns 0)
                s = np.nansum(win, axis=-1)
                return np.where(np.isnan(win).all(axis=-1), np.nan, s)
            if method == "max":
                return np.nanmax(win, axis=-1)
            if method == "min":
                return np.nanmin(win, axis=-1)
            if method == "median":
                return np.nanmedian(win, axis=-1)
            # mode
            out = np.full((out_h, out_w), np.nan)
            for i in range(out_h):
                for j in range(out_w):
                    vals = win[i, j]
                    vals = vals[~np.isnan(vals)]
                    if len(vals):
                        u, c = np.unique(vals, return_counts=True)
                        out[i, j] = u[np.argmax(c)]
            return out
    raise ValueError(f"unknown resample method: {method}")


def resample_tiles(tiles: DataFrame, out_h: int, out_w: int, method: str = "nearest") -> DataFrame:
    """Per-tile resample to (out_h, out_w) pixels (Arrow-batched)."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def rs(cells: pd.Series, w_s: pd.Series, h_s: pd.Series) -> pd.Series:
        out = []
        for c, w, h in zip(cells, w_s, h_s):
            a = np.array([np.nan if v is None else v for v in c], dtype=np.float64).reshape(h, w)
            out.append(resample_block(a, out_h, out_w, method).ravel())
        return pd.Series(out)

    return (
        tiles.withColumn("cells", rs("cells", "width", "height"))
        .withColumn("width", F.lit(out_w))
        .withColumn("height", F.lit(out_h))
    )


def interpret_as(tiles: DataFrame, celltype: str, nodata: float | None = None) -> DataFrame:
    """R9 cellType coercion: int* truncates values; a user-defined nodata
    VALUE is mapped to NaN (the engine's unified NoData) — reference
    interpretAs + NoDataHandlingTest semantics."""
    expr = "transform(cells, v -> "
    body = "v"
    if nodata is not None and nodata == nodata:
        body = f"CASE WHEN v = CAST({nodata!r} AS DOUBLE) THEN CAST('NaN' AS DOUBLE) ELSE v END"
    if celltype.startswith("int"):
        # guard NaN/NULL: ANSI CAST(NaN AS BIGINT) errors
        body = (
            f"CASE WHEN ({body}) IS NULL OR isnan(({body})) THEN ({body}) "
            f"ELSE CAST(CAST(({body}) AS BIGINT) AS DOUBLE) END"
        )
    return tiles.withColumn("cells", F.expr(expr + body + ")")).withColumn(
        "celltype", F.lit(celltype)
    )
