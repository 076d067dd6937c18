"""load_geotiff_window: the windowed COG source end-to-end in Spark."""

import numpy as np

from geotrellis_server_spark.sources.gtiff import (
    build_overviews,
    encode_geotiff_pyramid,
    load_geotiff_window,
)


def test_load_geotiff_window(spark, tmp_path):
    base = (np.arange(256 * 512, dtype=np.float64) % 331.0).reshape(256, 512)
    blob = encode_geotiff_pyramid(
        build_overviews(base, min_size=64),
        (0.0, 0.0, 512.0, 256.0),
        epsg=3857,
        rows_per_strip=16,
    )
    p = tmp_path / "pyr.tif"
    p.write_bytes(blob)
    df = load_geotiff_window(spark, str(p), (128.0, 64.0, 256.0, 128.0))
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height) == (128, 64)
    assert (r.xmin, r.ymin, r.xmax, r.ymax) == (128.0, 64.0, 256.0, 128.0)
    got = np.array(r.cells).reshape(64, 128)
    np.testing.assert_array_equal(got, base[128:192, 128:256])
