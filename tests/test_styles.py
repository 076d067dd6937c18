"""Style goldens (InterpolatedColorMapSpec.scala:39-78,
OgcStyleSpec.scala:29-41) + PNG round-trip."""

import numpy as np

from geotrellis_server_spark.styles import colormap as C
from geotrellis_server_spark.styles.png import decode_png, encode_png

POLES = {-100.0: (255, 0, 0, 100), 0.0: (0, 255, 0, 100), 100.0: (0, 0, 255, 100)}


def test_interpolation_midpoint_golden():
    # InterpolatedColorMapSpec: interpolate(50) between green and blue
    # → rgba(0, 127, 127, 100) (integer rounding of 127.5 both channels)
    out = C.interpolated_colormap(np.array([50.0]), POLES)
    r, g, b, a = out[0]
    assert (r, a) == (0, 100)
    assert abs(int(g) - 127) <= 1 and abs(int(b) - 127) <= 1
    assert int(g) + int(b) == 255


def test_clip_modes_at_infinity():
    # InterpolatedColorMapSpec clip behavior at ±∞
    v = np.array([-np.inf, np.inf])
    none = C.interpolated_colormap(v, POLES, C.CLIP_NONE)
    assert tuple(none[0]) == (255, 0, 0, 100) and tuple(none[1]) == (0, 0, 255, 100)
    left = C.interpolated_colormap(v, POLES, C.CLIP_LEFT)
    assert tuple(left[0]) == (0, 0, 0, 0) and tuple(left[1]) == (0, 0, 255, 100)
    right = C.interpolated_colormap(v, POLES, C.CLIP_RIGHT)
    assert tuple(right[0]) == (255, 0, 0, 100) and tuple(right[1]) == (0, 0, 0, 0)
    both = C.interpolated_colormap(v, POLES, C.CLIP_BOTH)
    assert tuple(both[0]) == (0, 0, 0, 0) and tuple(both[1]) == (0, 0, 0, 0)


def test_nan_transparent():
    out = C.interpolated_colormap(np.array([np.nan]), POLES)
    assert tuple(out[0]) == (0, 0, 0, 0)


def test_color_ramp_breaks_golden():
    # OgcStyleSpec: 50 breaks over [-10, 90], endpoints exact
    b = C.color_ramp_breaks(-10.0, 90.0, 50)
    assert len(b) == 50 and b[0] == -10.0 and b[-1] == 90.0
    assert np.allclose(np.diff(b), b[1] - b[0])


def test_exact_color_map():
    out = C.color_map(np.array([1.0, 2.0, 3.0]), {1.0: (255, 0, 0, 255), 2.0: (0, 255, 0, 255)})
    assert tuple(out[0]) == (255, 0, 0, 255)
    assert tuple(out[1]) == (0, 255, 0, 255)
    assert tuple(out[2]) == (0, 0, 0, 0)  # unmapped → fallback transparent


def test_classify_breaks_render():
    breaks = np.array([0.0, 10.0])
    colors = np.array([(255, 0, 0, 255), (0, 0, 255, 255)])
    out = C.classify_breaks(np.array([-5.0, 5.0, 50.0, np.nan]), breaks, colors)
    assert tuple(out[0]) == (255, 0, 0, 255)
    assert tuple(out[1]) == (0, 0, 255, 255)
    assert tuple(out[2]) == (0, 0, 0, 0)  # above last break → transparent
    assert tuple(out[3]) == (0, 0, 0, 0)


def test_png_roundtrip_rgba_and_grey():
    rng = np.random.default_rng(42)
    rgba = rng.integers(0, 256, (16, 12, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()
    grey = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert (decode_png(encode_png(grey)) == grey).all()


def test_png_deterministic():
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    assert encode_png(rgba) == encode_png(rgba)


def test_render_rgba_default_grey_nodata_transparent():
    cells = np.array([[0.0, np.nan], [50.0, 100.0]])
    out = C.render_rgba(cells)
    assert out[0, 1, 3] == 0  # NoData transparent
    assert out[1, 1, 0] == 255 and out[0, 0, 0] == 0  # rescaled 0..255
