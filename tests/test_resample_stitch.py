"""R3 resample kernels vs numpy oracles; R7 stitch; R9 interpret_as; R11
axis swap; S12 GeoJSON sink; S9/S10 stubs."""

import json

import numpy as np
import pytest

from geotrellis_server_spark.operators import resample as RS
from geotrellis_server_spark.operators import stitch as ST
from geotrellis_server_spark.sources import synth


def test_nearest_upscale_block():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = RS.resample_block(a, 4, 4, "nearest")
    assert (out[:2, :2] == 1.0).all() and (out[2:, 2:] == 4.0).all()


def test_bilinear_midpoint():
    a = np.array([[0.0, 10.0], [20.0, 30.0]])
    out = RS.resample_block(a, 4, 4, "bilinear")
    assert out[0, 0] == 0.0  # corner maps to corner cell center
    assert 0.0 < out[1, 1] < 30.0
    # downscale to 1x1 via average = exact mean
    assert RS.resample_block(a, 1, 1, "average")[0, 0] == 15.0


def test_aggregating_downscale_with_nodata():
    a = np.array([[1.0, np.nan], [3.0, 5.0]])
    assert RS.resample_block(a, 1, 1, "average")[0, 0] == 3.0  # nan-aware
    assert RS.resample_block(a, 1, 1, "sum")[0, 0] == 9.0
    assert RS.resample_block(a, 1, 1, "max")[0, 0] == 5.0
    assert RS.resample_block(a, 1, 1, "min")[0, 0] == 1.0
    assert RS.resample_block(a, 1, 1, "median")[0, 0] == 3.0
    b = np.array([[1.0, 1.0], [2.0, np.nan]])
    assert RS.resample_block(b, 1, 1, "mode")[0, 0] == 1.0


def test_non_integer_aggregating_raises():
    with pytest.raises(ValueError, match="integer downscale"):
        RS.resample_block(np.ones((3, 3)), 2, 2, "average")


def test_resample_tiles_df(spark):
    r8 = synth.raster8(spark)
    out = RS.resample_tiles(r8, 4, 4, "average").collect()[0]
    assert out.width == 4 and out.height == 4
    a = np.arange(1, 65, dtype=float).reshape(8, 8)
    exp = a.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3).reshape(4, 4, 4).mean(-1)
    got = np.array([np.nan if v is None else v for v in out.cells]).reshape(4, 4)
    assert np.allclose(got, exp)


def test_interpret_as_int_with_nodata(spark):
    r8 = synth.raster8(spark)
    out = RS.interpret_as(r8, "int32", nodata=5.0).collect()[0]
    cells = [v for v in out.cells]
    assert cells[4] is None or np.isnan(cells[4])  # value 5 → NoData
    assert cells[0] == 1.0 and out.celltype == "int32"


def test_stitch_two_tiles(spark):
    import pyspark.sql.functions as F

    # no extent columns -> stitch falls back to WebMercator layout math
    keep = ["zoom", "tile_x", "tile_y", "width", "height", "cells"]
    a = synth.raster8(spark).withColumn("zoom", F.lit(1)).select(keep)
    b = (
        synth.raster8(spark)
        .withColumn("zoom", F.lit(1))
        .withColumn("tile_x", F.lit(1))
        .withColumn("cells", F.expr("transform(cells, v -> v + 100.0)"))
        .select(keep)
    )
    arr, ext = ST.stitch(a.union(b))
    assert arr.shape == (8, 16)
    assert arr[0, 0] == 1.0 and arr[0, 8] == 101.0
    from geotrellis_server_spark.grids.layout import WEBMERCATOR_BOUND as B

    assert ext.xmin == -B and abs(ext.xmax - B) < 1e-6  # both z1 tiles span the world x


def test_geojson_sink(spark):
    df = spark.createDataFrame([(1.5, 2.5, 7.0)], "lon DOUBLE, lat DOUBLE, value DOUBLE")
    feat = json.loads(ST.to_geojson_features(df).collect()[0].feature)
    assert feat["type"] == "Feature"
    assert feat["geometry"]["coordinates"] == [1.5, 2.5]
    assert feat["properties"]["value"] == 7.0


def test_axis_swap():
    assert ST.swap_xy_extent((1.0, 2.0, 3.0, 4.0)) == (2.0, 1.0, 4.0, 3.0)


def test_repo_union(spark):
    a = synth.catalog_fixture(spark)
    assert ST.repositories_union(a, a).count() == 8  # concat keeps duplicates


def test_jpeg_sink_roundtrips():
    # JPEG sink is REAL on both paths now (Pillow or styles/jpeg.py);
    # the stdlib decoder recovers the pixels within lossy tolerance
    import numpy as np

    from geotrellis_server_spark.styles.jpeg import decode_jpeg

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200
    back = decode_jpeg(ST.render_jpg(rgb, quality=90))
    assert back.shape == (8, 8, 3)
    assert abs(int(back[4, 4, 0]) - 200) < 12 and int(back[4, 4, 1]) < 24


# --- cubic / lanczos convolution kernels (R3, conf/package.scala:161-173) ---


def _direct_conv_resample(a, out_h, out_w, kfn, R):
    """Independent oracle: straightforward per-pixel double loop."""
    import numpy as np

    h, w = a.shape
    tmp = np.zeros((out_h, w))
    for i in range(out_h):
        s = (i + 0.5) * h / out_h - 0.5
        base = int(np.floor(s))
        num = np.zeros(w)
        den = 0.0
        for t in range(-R + 1, R + 1):
            j = base + t
            wgt = float(kfn(np.array([s - j]))[0])
            num += wgt * a[min(max(j, 0), h - 1)]
            den += wgt
        tmp[i] = num / den
    out = np.zeros((out_h, out_w))
    for i in range(out_w):
        s = (i + 0.5) * w / out_w - 0.5
        base = int(np.floor(s))
        num = np.zeros(out_h)
        den = 0.0
        for t in range(-R + 1, R + 1):
            j = base + t
            wgt = float(kfn(np.array([s - j]))[0])
            num += wgt * tmp[:, min(max(j, 0), w - 1)]
            den += wgt
        out[:, i] = num / den
    return out


def test_cubic_lanczos_vs_direct_oracle():
    import numpy as np
    from geotrellis_server_spark.operators.resample import (
        _CONV_KERNELS, resample_block)

    rng = np.arange(16, dtype=np.float64)
    a = (rng[:, None] * 3.7 + rng[None, :] ** 1.5 % 5.0)[:4, :4] * 1.0
    a = np.array([[1.0, 5.0, 2.0, 8.0],
                  [3.0, 7.0, 4.0, 6.0],
                  [9.0, 0.0, 5.0, 2.0],
                  [4.0, 8.0, 1.0, 7.0]])
    for method, (kfn, R) in _CONV_KERNELS.items():
        got = resample_block(a, 8, 8, method)
        want = _direct_conv_resample(a, 8, 8, kfn, R)
        assert np.allclose(got, want), method


def test_cubic_constant_and_linear_preservation():
    import numpy as np
    from geotrellis_server_spark.operators.resample import resample_block

    const = np.full((8, 8), 42.0)
    for m in ("cubic-convolution", "cubic-spline", "lanczos"):
        out = resample_block(const, 16, 16, m)
        assert np.allclose(out, 42.0), m  # normalized weights: edges too
    # Keys a=-0.5 reproduces linear ramps exactly (interior: full support)
    ramp = np.arange(8, dtype=np.float64)[None, :].repeat(8, axis=0)
    out = resample_block(ramp, 16, 16, "cubic-convolution")
    xs = (np.arange(16) + 0.5) * 8 / 16 - 0.5
    interior = (xs >= 1.0) & (xs <= 6.0)
    assert np.allclose(out[4, interior], xs[interior])


def test_cubic_nan_stays_local():
    import numpy as np
    from geotrellis_server_spark.operators.resample import resample_block

    a = np.full((8, 8), 1.0)
    a[4, 4] = np.nan
    out = resample_block(a, 8, 8, "cubic-convolution")
    # a corner far outside the NaN's 4x4 support must be clean
    assert not np.isnan(out[0, 0])
    assert np.isnan(out[4, 4])


def test_no_bilinear_fallback_distinct_outputs():
    import numpy as np
    from geotrellis_server_spark.operators.resample import resample_block

    a = np.array([[1.0, 5.0, 2.0, 8.0],
                  [3.0, 7.0, 4.0, 6.0],
                  [9.0, 0.0, 5.0, 2.0],
                  [4.0, 8.0, 1.0, 7.0]])
    bil = resample_block(a, 8, 8, "bilinear")
    for m in ("cubic-convolution", "cubic-spline", "lanczos"):
        assert not np.allclose(resample_block(a, 8, 8, m), bil), m
