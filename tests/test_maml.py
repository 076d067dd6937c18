"""MAML parity tests: NDVI (bench AST, TmsReificationBench.scala:39-41),
NoData→NaN semantics (NoDataHandlingTest.scala:28-58), crop golden sum
1596 (LayerExtentTest.scala:29-37), focal ops vs numpy oracle, JSON
round-trip, constant folding, custom kernel registry."""

import math

import numpy as np
import pytest


def cells_np(cells):
    """Materialized arrays may carry NoData as SQL NULL (Arrow converts
    NaN→null on pandas→Arrow list conversion); kernels treat both as NaN.
    Normalize for assertions."""
    return np.array([np.nan if v is None else v for v in cells], dtype=np.float64)

from geotrellis_server_spark.maml import ast as M
from geotrellis_server_spark.maml.ast import Expr
from geotrellis_server_spark.maml.eval import crop_to_extent, eval_expr, eval_local
from geotrellis_server_spark.maml.kernels import compile_node, fold_constants, register_kernel
from geotrellis_server_spark.sources import synth


def tile_df(spark, name, cells, w=4, h=4, key=(0, 0, 0)):
    z, x, y = key
    row = (name, z, x, y, 0, w, h, 0.0, 0.0, float(w), float(h), "float64", float("nan"),
           [float(v) for v in cells])
    return spark.createDataFrame([row], synth.TILE_SCHEMA)


# ---------------------------------------------------------------------------
# kernel-level
# ---------------------------------------------------------------------------


def test_ndvi_kernel():
    red = np.array([[0.1, 0.2], [0.3, 0.4]])
    nir = np.array([[0.5, 0.6], [0.7, 0.8]])
    e = (M.var("nir") - M.var("red")) / (M.var("nir") + M.var("red"))
    out = compile_node(e)({"red": red, "nir": nir})
    assert np.allclose(out, (nir - red) / (nir + red))


def test_nodata_nan_propagation():
    # NoDataHandlingTest: t1 + t2 yields NaN at NoData cells
    a = np.array([1.0, np.nan, 3.0])
    b = np.array([10.0, 20.0, np.nan])
    out = compile_node(M.var("a") + M.var("b"))({"a": a, "b": b})
    assert out[0] == 11.0 and np.isnan(out[1]) and np.isnan(out[2])


def test_comparison_nodata_and_branch():
    a = np.array([1.0, np.nan, 3.0])
    lt = compile_node(M.var("a") < 2.0)({"a": a})
    assert lt[0] == 1.0 and np.isnan(lt[1]) and lt[2] == 0.0
    br = compile_node(M.ifelse(M.var("a") < 2.0, 100.0, 200.0))({"a": a})
    assert br[0] == 100.0 and np.isnan(br[1]) and br[2] == 200.0
    d = compile_node(Expr("def", (M.var("a"),)))({"a": a})
    assert d.tolist() == [1.0, 0.0, 1.0]


def test_classify_clamp_normalize():
    a = np.array([-5.0, 0.5, 5.0, np.nan])
    cl = compile_node(M.classify(M.var("a"), [0.0, 1.0], [10.0, 20.0, 30.0]))({"a": a})
    assert cl[0] == 10.0 and cl[1] == 20.0 and cl[2] == 30.0 and np.isnan(cl[3])
    cp = compile_node(M.clamp(M.var("a"), 0.0, 1.0))({"a": a})
    assert cp[0] == 0.0 and cp[1] == 0.5 and cp[2] == 1.0 and np.isnan(cp[3])
    nm = compile_node(M.normalize(M.var("a"), -5.0, 5.0, 0.0, 100.0))({"a": a})
    assert nm[0] == 0.0 and nm[2] == 100.0


def test_constant_folding():
    e = M.var("x") * (M.lit(2) + M.lit(3))
    folded = fold_constants(e)
    assert folded.args[1].symbol == "dbl" and folded.args[1].p("value") == 5.0


def test_json_roundtrip():
    e = M.ifelse(M.var("x") < 0.5, M.clamp(M.var("y"), 0, 1), M.lit(2) ** M.lit(3))
    assert Expr.from_json(e.to_json()) == e


def test_vars_with_buffer():
    e = M.focal("fmean", M.var("dem"), radius=2) + M.var("x")
    assert e.vars_with_buffer() == {"dem": 2, "x": 0}
    nested = M.focal("fmax", M.focal("fmean", M.var("dem"), radius=1), radius=1)
    assert nested.vars_with_buffer() == {"dem": 2}


def test_custom_kernel_registry():
    register_kernel("plus1", lambda a: a[0] + 1.0)
    out = compile_node(Expr("plus1", (M.var("x"),)))({"x": np.array([1.0, 2.0])})
    assert out.tolist() == [2.0, 3.0]


def test_unhandled_symbol_raises():
    with pytest.raises(ValueError, match="unhandled"):
        compile_node(Expr("nope", (M.var("x"),)))


# ---------------------------------------------------------------------------
# DataFrame-level
# ---------------------------------------------------------------------------


def test_ndvi_over_tiles(spark):
    red = tile_df(spark, "red", range(1, 17))
    nir = tile_df(spark, "nir", range(17, 33))
    e = (M.var("nir") - M.var("red")) / (M.var("nir") + M.var("red"))
    out = eval_local(e, {"red": red, "nir": nir}).collect()
    assert len(out) == 1
    r = np.arange(1, 17, dtype=float)
    n = np.arange(17, 33, dtype=float)
    assert np.allclose(out[0].cells, (n - r) / (n + r))


def test_layer_extent_crop_golden_1596(spark):
    """8×8 fixture values 1..64, crop to Extent(0,1,8,8) excises the bottom
    row → sum 1596 (LayerExtentTest.scala:29-37)."""
    from geotrellis_server_spark.grids.layout import Extent

    r8 = synth.raster8(spark)
    out = crop_to_extent(
        eval_local(M.var("r8"), {"r8": r8}),
        (0.0, 1.0, 8.0, 8.0),
        lambda z, tx, ty: Extent(0.0, 0.0, 8.0, 8.0),
    ).collect()[0]
    assert np.nansum(cells_np(out.cells)) == 1596.0


def test_nodata_over_tiles(spark):
    """NoDataHandlingTest parity: two 10×10 tiles 1..100, NoData at value 1
    (t1) and 2.0 (t2) → sum NaN at those cells, numeric elsewhere."""
    v1 = [float("nan") if v == 1 else float(v) for v in range(1, 101)]
    v2 = [float("nan") if v == 2.0 else float(v) for v in range(1, 101)]
    t1 = tile_df(spark, "t1", v1, w=10, h=10)
    t2 = tile_df(spark, "t2", v2, w=10, h=10)
    out = eval_local(M.var("t1") + M.var("t2"), {"t1": t1, "t2": t2}).collect()[0]
    cells = cells_np(out.cells)
    assert np.isnan(cells[0]) and np.isnan(cells[1])
    assert cells[2] == 6.0 and not np.isnan(cells[2:]).any()


def test_focal_mean_with_halo(spark):
    """3 adjacent tiles in a row; fmean(radius 1) at a tile's edge must see
    the neighbor's cells — compare against a numpy oracle on the stitched
    array."""
    import pandas as pd

    w = h = 4
    t_left = tile_df(spark, "d", range(0, 16), key=(1, 0, 0))
    t_mid = tile_df(spark, "d", range(16, 32), key=(1, 1, 0))
    t_right = tile_df(spark, "d", range(32, 48), key=(1, 2, 0))
    tiles = t_left.union(t_mid).union(t_right)
    e = M.focal("fmean", M.var("d"), radius=1)
    out = {(r.tile_x, r.tile_y): cells_np(r.cells).reshape(h, w)
           for r in eval_expr(e, {"d": tiles}).collect()}
    assert set(out) == {(0, 0), (1, 0), (2, 0)}
    # numpy oracle: stitch 3 tiles horizontally, pad with NaN, nanmean windows
    stitched = np.hstack([np.arange(0, 16).reshape(4, 4),
                          np.arange(16, 32).reshape(4, 4),
                          np.arange(32, 48).reshape(4, 4)]).astype(float)
    padded = np.full((h + 2, 12 + 2), np.nan)
    padded[1:-1, 1:-1] = stitched
    from numpy.lib.stride_tricks import sliding_window_view
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = np.nanmean(sliding_window_view(padded, (3, 3)), axis=(-2, -1))
    got = np.hstack([out[(0, 0)], out[(1, 0)], out[(2, 0)]])
    assert np.allclose(got, exp, equal_nan=True)


def test_focal_skipped_for_local_expr(spark):
    # local expressions must not pay the halo shuffle
    red = tile_df(spark, "red", range(1, 17))
    plan = eval_expr(M.var("red") * 2.0, {"red": red})._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan


def test_hillshade_flat_surface(spark):
    # flat DEM → slope 0 → hillshade = 255*sin(altitude); with 45° default
    # = 180.31... exact: clip(255 * sin(45°)) = 180.31
    flat = tile_df(spark, "dem", [100.0] * 16, key=(0, 5, 5))
    e = M.focal("fhillshade", M.var("dem"), radius=1, cellsize=1.0)
    out = eval_expr(e, {"dem": flat}).collect()[0]
    cells = cells_np(out.cells).reshape(4, 4)
    # interior cells (edges see NaN halo) — value = 255*sin(45°)
    assert np.allclose(cells[1:-1, 1:-1], 255.0 * math.sin(math.radians(45.0)))


def test_slope_hillshade_z_factor_applied_once():
    # tilted plane z = 3*x (cellsize 1): dz/dx = 3, dz/dy = 0.
    # slope must be atan(z_factor * 3) — NOT atan(z_factor^2 * 3)
    # (regression: _horn_gradients used to pre-multiply by z_factor and
    # _fhillshade multiplied again inside the arctan).
    from geotrellis_server_spark.maml.kernels import _fhillshade, _fslope

    x = np.arange(6, dtype=np.float64)
    plane = np.tile(3.0 * x, (6, 1))  # padded 6x6 → interior 4x4
    zf = 2.0
    slope = _fslope(plane, 1, cellsize=1.0, z_factor=zf)
    assert np.allclose(slope, math.degrees(math.atan(zf * 3.0)))

    shade = _fhillshade(plane, 1, cellsize=1.0, z_factor=zf, azimuth=315.0, altitude=45.0)
    # direct formula with z applied exactly once
    sl = math.atan(zf * 3.0)
    aspect = math.atan2(0.0, -3.0)
    az = math.radians(360.0 - 315.0 + 90.0)
    alt = math.radians(45.0)
    exp = max(0.0, min(255.0, 255.0 * (
        math.sin(alt) * math.cos(sl) + math.cos(alt) * math.sin(sl) * math.cos(az - aspect)
    )))
    assert np.allclose(shade, exp)


def test_eval_local_constant_expression_raises():
    with pytest.raises(ValueError, match="no raster vars"):
        eval_local(fold_constants(M.lit(2) + M.lit(3)), {})


def test_media_ref_no_bigint_overflow(spark):
    # spans_sql's media_ref hash must agree with exact Python int math even
    # for doc ids where id*2654435761 would overflow BIGINT (~3.5e9).
    # > 2^32, < 2^53; ≡6 mod 7 (7 spans, geo at i=6) and ≡0 mod 3
    # (media spans at i=0 and i=3)
    big = 10_000_000_000_017
    row = (
        spark.range(1)
        .selectExpr(f"id + {big} AS id")
        .selectExpr(f"{synth.spans_sql('id')} AS spans")
        .collect()[0]
    )
    media = [s for s in row.spans if s.kind == "media"]
    assert media, "fixture doc must contain a media span"
    for s in media:
        i = s.offset
        want = (big * 2654435761 + i * 97) % 4294967296
        assert s.media_ref == f"ref://{want:08x}"


def test_multivar_focal_ndvi_fmean(spark):
    # fmean over a multi-var local expression — per-var halo pad + join
    # (reference Vars.varsWithBuffer, LayerTms.scala:66-74)
    red_v = np.arange(1.0, 17.0)
    nir_v = np.arange(17.0, 33.0)
    red = tile_df(spark, "red", red_v, key=(1, 3, 2))
    nir = tile_df(spark, "nir", nir_v, key=(1, 3, 2))
    e = M.focal("fmean", (M.var("nir") - M.var("red")) / (M.var("nir") + M.var("red")), radius=1)
    out = eval_expr(e, {"red": red, "nir": nir}).collect()
    assert len(out) == 1
    got = cells_np(out[0].cells).reshape(4, 4)
    ndvi = ((nir_v - red_v) / (nir_v + red_v)).reshape(4, 4)
    padded = np.full((6, 6), np.nan)
    padded[1:-1, 1:-1] = ndvi
    from numpy.lib.stride_tricks import sliding_window_view
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = np.nanmean(sliding_window_view(padded, (3, 3)), axis=(-2, -1))
    assert np.allclose(got, exp, equal_nan=True)


def test_multivar_focal_per_var_halo(spark):
    # a has a right neighbor, b does not: the neighbor's contribution to
    # fsum(a+b) must be dropped (a's halo value + b's NaN halo = NaN,
    # skipped by nansum) — per-var halos, not a shared one.
    a0 = tile_df(spark, "a", [1.0] * 16, key=(1, 0, 0))
    a1 = tile_df(spark, "a", [10.0] * 16, key=(1, 1, 0))
    b0 = tile_df(spark, "b", [2.0] * 16, key=(1, 0, 0))
    e = M.focal("fsum", M.var("a") + M.var("b"), radius=1)
    out = eval_expr(e, {"a": a0.union(a1), "b": b0}).collect()
    # join keeps only keys present in BOTH vars
    assert [(r.tile_x, r.tile_y) for r in out] == [(0, 0)]
    got = cells_np(out[0].cells).reshape(4, 4)
    # interior: 9 windows of (1+2)=3 → 27; right edge column: the a-only
    # neighbor (value 10) must NOT leak in → 6 cells of 3 = 18
    assert got[1, 1] == 27.0
    assert got[1, 3] == 18.0  # not 18 + anything from a1
    assert got[0, 0] == 12.0  # corner: 4 cells


def test_faspect_cardinal_planes():
    """Aspect = compass azimuth of steepest descent (0=N, clockwise)."""
    from geotrellis_server_spark.maml.kernels import _faspect

    x = np.arange(6, dtype=np.float64)
    east_up = np.tile(x, (6, 1))          # z grows east → descent west
    assert np.allclose(_faspect(east_up, 1), 270.0)
    south_up = np.tile(x, (6, 1)).T       # z grows south → descent north
    assert np.allclose(_faspect(south_up, 1), 0.0)
    west_up = east_up[:, ::-1]            # z grows west → descent east
    assert np.allclose(_faspect(west_up, 1), 90.0)
    north_up = south_up[::-1, :]          # z grows north → descent south
    assert np.allclose(_faspect(north_up, 1), 180.0)
    # diagonal: z grows NE → descent SW = 225
    ne = east_up + north_up
    assert np.allclose(_faspect(np.ascontiguousarray(ne), 1), 225.0)
    # flat → NaN
    assert np.all(np.isnan(_faspect(np.zeros((5, 5)), 1)))


def test_faspect_via_eval(spark):
    """faspect through the focal halo machinery: a west-dipping plane
    (z = global x) yields 270 everywhere the 3x3 window is complete;
    windows touching the layer edge yield NaN (halo semantics)."""
    vals = lambda x0: [x0 + (i % 4) for i in range(16)]  # z = global col
    tiles = (tile_df(spark, "d", vals(0), key=(1, 0, 0))
             .union(tile_df(spark, "d", vals(4), key=(1, 1, 0)))
             .union(tile_df(spark, "d", vals(8), key=(1, 2, 0))))
    e = M.focal("faspect", M.var("d"), radius=1)
    out = {(r.tile_x, r.tile_y): cells_np(r.cells).reshape(4, 4)
           for r in eval_expr(e, {"d": tiles}).collect()}
    strip = np.hstack([out[(0, 0)], out[(1, 0)], out[(2, 0)]])
    assert np.all(np.isnan(strip[0, :])) and np.all(np.isnan(strip[-1, :]))
    assert np.all(np.isnan(strip[:, 0])) and np.all(np.isnan(strip[:, -1]))
    assert np.allclose(strip[1:-1, 1:-1], 270.0)
