"""MAML expression → ONE fused numpy closure per tile batch (reference O8:
"lazy/fused cell pipelines" — the MAML interpreter composes local ops over
LazyMultibandRaster so cell loops fuse, ogc-example/docs/maml.md:163-186.
Here the whole tree compiles to a single Python closure executed once per
Arrow batch; scalar subtrees are constant-folded first).

NoData semantics: the engine's unified NoData is NaN in float64 arrays
(reference converts user NoData → NaN on mixed-celltype ops —
core/src/test/.../NoDataHandlingTest.scala:35-58):
- arithmetic/trig propagate NaN natively;
- comparisons/logicals return 0/1 but NaN where any operand is NaN;
- def/undef return 1/0 (never NaN);
- classify/ifelse/clamp keep NaN cells NaN.

Focal ops operate on 2D blocks padded by the expression's buffer
(Vars.varsWithBuffer analog): each compiled node returns (array, pad) and
local ops align operands by cropping to the smaller pad — mirroring the
reference's TileWithNeighbors.withBuffer 3×3 read
(core/.../gtlayer/GTLayerNode.scala:88-124).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

from .ast import Expr, FOCAL_OPS

Env = dict  # name -> np.ndarray (local path: any shape; focal path: 2D padded)


def _crop(a: np.ndarray, pad: int, to: int) -> np.ndarray:
    d = pad - to
    if d == 0 or np.isscalar(a) or a.ndim == 0:
        return a
    return a[..., d:-d or None, d:-d or None] if a.ndim >= 2 else a


def _align(vals: list[tuple[np.ndarray, int]]) -> tuple[list[np.ndarray], int]:
    pads = [p for _, p in vals]
    m = min(pads)
    return [_crop(a, p, m) for a, p in vals], m


def _nan_where(mask_nan: np.ndarray, x: np.ndarray) -> np.ndarray:
    out = np.asarray(x, dtype=np.float64)
    return np.where(mask_nan, np.nan, out)


def _cmp(op) -> Callable:
    def f(a, b):
        bad = np.isnan(a) | np.isnan(b)
        with np.errstate(invalid="ignore"):
            return _nan_where(bad, op(a, b).astype(np.float64))

    return f


def _logical(op) -> Callable:
    def f(a, b):
        bad = np.isnan(a) | np.isnan(b)
        return _nan_where(bad, op(a != 0, b != 0).astype(np.float64))

    return f


def _fold(op, args):
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _windows(a2d: np.ndarray, r: int) -> np.ndarray:
    """(h+2r, w+2r) padded block → (h, w, 2r+1, 2r+1) window view."""
    from numpy.lib.stride_tricks import sliding_window_view

    return sliding_window_view(a2d, (2 * r + 1, 2 * r + 1))


def _shift_reduce(a2d: np.ndarray, r: int, op) -> np.ndarray:
    """Separable (2r+1)² window reduce by shifted-slice accumulation:
    rows first, then columns — 2(2r+1) whole-array ops on contiguous
    slices instead of a nan-reduce over a 4-D strided window view
    (measured 9× on 64² tiles at r=1). ``op`` must be associative and
    NaN-transparent in the accumulation sense used below."""
    h, w = a2d.shape
    rows = a2d[0:h - 2 * r, :]
    for dy in range(1, 2 * r + 1):
        rows = op(rows, a2d[dy:h - 2 * r + dy, :])
    out = rows[:, 0:w - 2 * r]
    for dx in range(1, 2 * r + 1):
        out = op(out, rows[:, dx:w - 2 * r + dx])
    return out


def _focal_reduce(kind: str):
    # fsum/fmean/fmax/fmin have separable shifted-slice forms. For sums
    # the accumulation order (rows then columns, west→east) replaces
    # numpy's window-reduce order; on the engine's exact-integer tile
    # doctrine (counts, quantized values < 2^53) every order gives the
    # same double, so declared-query results are bit-identical — and
    # max/min are order-free. fmedian/fstddev keep the windowed
    # nan-reduce (no separable form).
    if kind in ("fsum", "fmean", "fmax", "fmin"):
        def f(a, r):
            nan = np.isnan(a)
            with np.errstate(all="ignore"):
                if kind in ("fmax", "fmin"):
                    op = np.fmax if kind == "fmax" else np.fmin
                    out = _shift_reduce(a, r, op)  # fmax/fmin skip NaN
                else:
                    v = np.where(nan, 0.0, a)  # nansum convention
                    s = _shift_reduce(v, r, np.add)
                    if kind == "fsum":
                        out = s
                    else:
                        c = _shift_reduce((~nan).astype(np.float64), r,
                                          np.add)
                        out = s / c  # 0/0 → NaN = nanmean's all-NaN
            centre = a[r:-r or None, r:-r or None]
            return np.where(np.isnan(centre), np.nan, out)

        return f

    red = {
        "fmedian": np.nanmedian,
        "fstddev": np.nanstd,
    }[kind]

    def f(a, r):
        w = _windows(a, r)
        with np.errstate(all="ignore"):
            out = red(w, axis=(-2, -1))
        # cells whose own value is NoData stay NoData (TargetCell.data)
        centre = a[r:-r or None, r:-r or None]
        return np.where(np.isnan(centre), np.nan, out)

    return f


def _focal_mode(a, r):
    w = _windows(a, r).reshape(*a.shape[:2] and (a.shape[0] - 2 * r, a.shape[1] - 2 * r), -1)
    h, wd, n = w.shape
    out = np.full((h, wd), np.nan)
    for i in range(h):  # mode lacks a vectorized nan-aware numpy form;
        for j in range(wd):  # tiles are 256², this is per-tile not per-row
            vals = w[i, j]
            vals = vals[~np.isnan(vals)]
            if len(vals):
                u, c = np.unique(vals, return_counts=True)
                out[i, j] = u[np.argmax(c)]
    centre = a[r:-r or None, r:-r or None]
    return np.where(np.isnan(centre), np.nan, out)


def _horn_gradients(a: np.ndarray, cellsize: float):
    """Horn's method on a 1-cell-padded block → RAW (dz/dx, dz/dy) for the
    unpadded interior (same formulation GeoTrellis focal Slope/Hillshade
    uses). z_factor is applied exactly once by the caller — inside the
    arctan — never here (applying it to the gradients AND the arctan would
    square it)."""
    c = a
    tl, t, tr = c[:-2, :-2], c[:-2, 1:-1], c[:-2, 2:]
    l, r = c[1:-1, :-2], c[1:-1, 2:]
    bl, b, br = c[2:, :-2], c[2:, 1:-1], c[2:, 2:]
    dzdx = ((tr + 2 * r + br) - (tl + 2 * l + bl)) / (8.0 * cellsize)
    dzdy = ((bl + 2 * b + br) - (tl + 2 * t + tr)) / (8.0 * cellsize)
    return dzdx, dzdy


def _fslope(a, radius, cellsize=1.0, z_factor=1.0):
    dzdx, dzdy = _horn_gradients(a, cellsize)
    return np.degrees(np.arctan(z_factor * np.sqrt(dzdx * dzdx + dzdy * dzdy)))


def _faspect(a, radius, cellsize=1.0):
    """Compass azimuth of steepest DESCENT in degrees [0, 360), 0 = north,
    clockwise (GeoTrellis focal Aspect semantics). Horn gradients:
    dzdx = eastward, dzdy = southward (rows grow south), so the descent
    vector in (east, north) components is (-dzdx, dzdy). Flat → NaN."""
    dzdx, dzdy = _horn_gradients(a, cellsize)
    az = np.degrees(np.arctan2(-dzdx, dzdy))
    az = np.where(az < 0, az + 360.0, az)
    return np.where((dzdx == 0) & (dzdy == 0), np.nan, az)


def _fhillshade(a, radius, cellsize=1.0, z_factor=1.0, azimuth=315.0, altitude=45.0):
    dzdx, dzdy = _horn_gradients(a, cellsize)
    slope = np.arctan(z_factor * np.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    shaded = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(az - aspect)
    return np.clip(shaded * 255.0, 0, 255)


def fold_constants(e: Expr) -> Expr:
    """Pre-fold scalar subtrees ("carry out addition on scalars first",
    maml.md:163-186)."""

    def f(node: Expr) -> Expr:
        if node.symbol in ("int", "dbl", "bool", "rasterV") or not node.args:
            return node
        if all(a.symbol in ("int", "dbl", "bool") for a in node.args):
            try:
                env: Env = {}
                v = compile_node(node)(env)
                if np.isscalar(v) or getattr(v, "ndim", 1) == 0:
                    return Expr.lit(float(v))
            except Exception:
                pass
        return node

    return e.transform(f)


def compile_node(e: Expr) -> Callable[[Env], np.ndarray]:
    fn, _pad = _compile(e)

    def run(env: Env):
        out, pad = fn(env)
        if pad and hasattr(out, "ndim") and out.ndim >= 2:
            out = out[..., pad:-pad or None, pad:-pad or None]
        return out

    return run


def _compile(e: Expr):
    """Returns fn(env) -> (array, pad)."""
    s = e.symbol
    if s in ("int", "dbl"):
        v = float(e.p("value"))
        return (lambda env: (v, 10 ** 9)), 0
    if s == "bool":
        v = 1.0 if e.p("value") else 0.0
        return (lambda env: (v, 10 ** 9)), 0
    if s == "rasterV":
        name = e.p("name")
        pad = e.p("pad", 0)
        return (lambda env: (env[name], env.get("__pad__", {}).get(name, 0))), 0
    if s == "geomLit":
        # local-path geometry literal: rasterized IN the fused kernel from
        # the batch's tile keys (env["__keys__"], provided by eval_local)
        # — no mask-tile DataFrame, no join, no shuffle. The focal path
        # instead rewrites geomLit to a halo-padded raster var
        # (eval._bind_geom_masks), which this branch never sees.
        ring = [tuple(float(v) for v in p) for p in e.p("ring")]

        def f(env):
            from ..geometry.rasterize import ring_mask_block

            zs, xs, ys, ws, hs = env["__keys__"]
            blocks = [
                ring_mask_block(ring, int(z), int(x), int(y), int(w), int(h)).ravel()
                for z, x, y, w, h in zip(zs, xs, ys, ws, hs)
            ]
            return np.stack(blocks), 0

        return f, 0

    subs = [_compile(a)[0] for a in e.args]

    def arrs(env):
        vals = [f(env) for f in subs]
        real = [(a, p) for a, p in vals if not np.isscalar(a)]
        if not real:
            return [a for a, _ in vals], 0
        aligned, m = _align(real)
        it = iter(aligned)
        return [next(it) if not np.isscalar(a) else a for a, p in vals], m

    def mk(op):
        def f(env):
            a, m = arrs(env)
            with np.errstate(all="ignore"):
                return op(a), m

        return f

    simple = {
        "+": lambda a: _fold(np.add, a),
        "-": lambda a: _fold(np.subtract, a) if len(a) > 1 else np.negative(a[0]),
        "*": lambda a: _fold(np.multiply, a),
        "/": lambda a: _fold(np.divide, a),
        "**": lambda a: _fold(np.power, a),
        "min": lambda a: _fold(np.minimum, a),
        "max": lambda a: _fold(np.maximum, a),
        "<": lambda a: _cmp(np.less)(a[0], a[1]),
        "<=": lambda a: _cmp(np.less_equal)(a[0], a[1]),
        ">": lambda a: _cmp(np.greater)(a[0], a[1]),
        ">=": lambda a: _cmp(np.greater_equal)(a[0], a[1]),
        "=": lambda a: _cmp(np.equal)(a[0], a[1]),
        "!=": lambda a: _cmp(np.not_equal)(a[0], a[1]),
        "and": lambda a: _logical(np.logical_and)(a[0], a[1]),
        "or": lambda a: _logical(np.logical_or)(a[0], a[1]),
        "xor": lambda a: _logical(np.logical_xor)(a[0], a[1]),
        "sin": lambda a: np.sin(a[0]),
        "cos": lambda a: np.cos(a[0]),
        "tan": lambda a: np.tan(a[0]),
        "sinh": lambda a: np.sinh(a[0]),
        "cosh": lambda a: np.cosh(a[0]),
        "tanh": lambda a: np.tanh(a[0]),
        "asin": lambda a: np.arcsin(a[0]),
        "acos": lambda a: np.arccos(a[0]),
        "atan": lambda a: np.arctan(a[0]),
        "atan2": lambda a: np.arctan2(a[0], a[1]),
        "round": lambda a: np.round(a[0]),
        "floor": lambda a: np.floor(a[0]),
        "ceil": lambda a: np.ceil(a[0]),
        "loge": lambda a: np.log(a[0]),
        "log10": lambda a: np.log10(a[0]),
        "sqrt": lambda a: np.sqrt(a[0]),
        "abs": lambda a: np.abs(a[0]),
        "nneg": lambda a: np.negative(a[0]),
        "def": lambda a: (~np.isnan(np.asarray(a[0], dtype=np.float64))).astype(np.float64),
        "undef": lambda a: np.isnan(np.asarray(a[0], dtype=np.float64)).astype(np.float64),
        "lneg": lambda a: _nan_where(
            np.isnan(np.asarray(a[0], dtype=np.float64)),
            np.logical_not(np.asarray(a[0]) != 0).astype(np.float64),
        ),
    }
    if s in simple:
        return mk(simple[s]), 0

    if s == "ifelse":
        def f(env):
            (c, x, y), m = arrs(env)
            c = np.asarray(c, dtype=np.float64)
            out = np.where(c != 0, x, y)
            return _nan_where(np.isnan(c), out), m

        return f, 0
    if s == "classify":
        breaks = np.asarray(e.p("breaks"), dtype=np.float64)
        values = np.asarray(e.p("values"), dtype=np.float64)

        def f(env):
            (x,), m = arrs(env)
            x = np.asarray(x, dtype=np.float64)
            idx = np.clip(np.digitize(x, breaks), 0, len(values) - 1)
            return _nan_where(np.isnan(x), values[idx]), m

        return f, 0
    if s == "clamp":
        lo, hi = e.p("lo"), e.p("hi")
        return mk(lambda a: np.clip(a[0], lo, hi)), 0
    if s == "normalize":
        a0, a1 = e.p("old_min"), e.p("old_max")
        b0, b1 = e.p("new_min"), e.p("new_max")

        def f(env):
            (x,), m = arrs(env)
            return (np.asarray(x) - a0) / (a1 - a0) * (b1 - b0) + b0, m

        return f, 0
    if s == "rescale":
        b0, b1 = e.p("new_min"), e.p("new_max")

        def f(env):
            # per-TILE min/max — in the local path arrays are (batch, npix)
            # with one tile per row (env flag set by eval_local), so reduce
            # per row; using batch-wide extrema would make output depend on
            # Arrow batch composition (nondeterministic across partitions).
            (x,), m = arrs(env)
            x = np.asarray(x, dtype=np.float64)
            with np.errstate(all="ignore"):
                if env.get("__rowwise__") and x.ndim == 2:
                    a0 = np.nanmin(x, axis=-1, keepdims=True)
                    a1 = np.nanmax(x, axis=-1, keepdims=True)
                else:
                    a0, a1 = np.nanmin(x), np.nanmax(x)
            span = np.where((a1 - a0) == 0, 1.0, a1 - a0)
            return (x - a0) / span * (b1 - b0) + b0, m

        return f, 0
    if s == "mask":
        def f(env):
            (x, mk_), m = arrs(env)
            mk_ = np.asarray(mk_, dtype=np.float64)
            return np.where(np.isnan(mk_) | (mk_ == 0), np.nan, x), m

        return f, 0
    if s == "rgb":
        def f(env):
            a, m = arrs(env)
            return np.stack(a, axis=-1), m

        return f, 0
    if s == "sel":
        band = int(e.p("band", 0))

        def f(env):
            (x,), m = arrs(env)
            return np.asarray(x)[..., band], m

        return f, 0

    if s in FOCAL_OPS:
        r = int(e.p("radius", 1))
        if s in ("fmax", "fmin", "fmean", "fmedian", "fsum", "fstddev"):
            op = _focal_reduce(s)

            def f(env, op=op, r=r):
                (x,), m = arrs(env)
                return op(np.asarray(x, dtype=np.float64), r), m - r

            return f, r
        if s == "fmode":
            def f(env, r=r):
                (x,), m = arrs(env)
                return _focal_mode(np.asarray(x, dtype=np.float64), r), m - r

            return f, r
        if s == "fslope":
            cs, zf = float(e.p("cellsize", 1.0)), float(e.p("z_factor", 1.0))

            def f(env):
                (x,), m = arrs(env)
                return _fslope(np.asarray(x, dtype=np.float64), 1, cs, zf), m - 1

            return f, 1
        if s == "faspect":
            cs = float(e.p("cellsize", 1.0))

            def f(env, cs=cs):
                (x,), m = arrs(env)
                return _faspect(np.asarray(x, dtype=np.float64), 1, cs), m - 1

            return f, 1
        if s == "fhillshade":
            cs, zf = float(e.p("cellsize", 1.0)), float(e.p("z_factor", 1.0))
            az, alt = float(e.p("azimuth", 315.0)), float(e.p("altitude", 45.0))

            def f(env):
                (x,), m = arrs(env)
                return _fhillshade(np.asarray(x, dtype=np.float64), 1, cs, zf, az, alt), m - 1

            return f, 1

    if s in CUSTOM_KERNELS:
        op = CUSTOM_KERNELS[s]

        def f(env):
            a, m = arrs(env)
            return op(a), m

        return f, 0

    raise ValueError(f"unhandled MAML symbol: {s}")  # UnhandledCase analog


# registry of user-extensible kernels (reference Directive mechanism,
# ogc-example/docs/maml.md:146-206): users register (symbol, fn) pairs
# where fn(args_list) -> array; looked up before raising UnhandledCase.
CUSTOM_KERNELS: dict[str, Callable] = {}


def register_kernel(symbol: str, fn: Callable) -> None:
    CUSTOM_KERNELS[symbol] = fn
