"""GeoTIFF sink/source: stdlib encoder roundtrip, tag correctness,
stitched-window render, and import-gated optional backends."""

import math
import struct

import numpy as np
import pytest

from geotrellis_server_spark.sources.gtiff import (
    HAS_RASTERIO, decode_geotiff, encode_geotiff)


def test_float64_roundtrip_with_nodata():
    a = np.arange(48, dtype=np.float64).reshape(6, 8) / 3.0
    a[2, 3] = np.nan
    ext = (-20037508.342789244, -10.5, 20037508.342789244, 8192.25)
    data = encode_geotiff(a, ext, epsg=3857, nodata=float("nan"))
    arr, got_ext, epsg = decode_geotiff(data)
    assert arr.dtype == np.float64 and arr.shape == (6, 8)
    assert np.allclose(arr, a, equal_nan=True)
    assert epsg == 3857
    assert np.allclose(got_ext, ext)


def test_uint8_rgb_roundtrip_geographic():
    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 3) % 255
    ext = (-180.0, -85.0, 180.0, 85.0)
    data = encode_geotiff(rgb, ext, epsg=4326)
    arr, got_ext, epsg = decode_geotiff(data)
    assert arr.dtype == np.uint8 and arr.shape == (4, 5, 3)
    assert (arr == rgb).all()
    assert epsg == 4326
    assert np.allclose(got_ext, ext)


def test_tiff_structure_is_valid():
    # header magic, IFD entry count, ascending tag order (TIFF spec)
    data = encode_geotiff(np.zeros((2, 2)), (0, 0, 1, 1), epsg=3857)
    bo, magic, ifd = struct.unpack_from("<2sHI", data, 0)
    assert bo == b"II" and magic == 42
    (n,) = struct.unpack_from("<H", data, ifd)
    tags = [struct.unpack_from("<H", data, ifd + 2 + i * 12)[0] for i in range(n)]
    assert tags == sorted(tags)
    assert {256, 257, 259, 273, 279, 33550, 33922, 34735} <= set(tags)


def test_render_geotiff_stitched_window(spark):
    from geotrellis_server_spark.grids.layout import ZoomedLayoutScheme
    from geotrellis_server_spark.operators.stitch import render_geotiff
    from geotrellis_server_spark.sources import synth

    lay0 = ZoomedLayoutScheme(4).layout(2)
    rows = []
    for tx in (2, 3):
        e = lay0.extent_for(tx, 1)
        rows.append(("d", 2, tx, 1, 0, 4, 4, e.xmin, e.ymin, e.xmax, e.ymax,
                     "float64", float("nan"),
                     [float(tx * 100 + i) for i in range(16)]))
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    data = render_geotiff(tiles)
    arr, ext, epsg = decode_geotiff(data)
    assert arr.shape == (4, 8) and epsg == 3857
    assert arr[0, 0] == 200.0 and arr[0, 4] == 300.0
    lay = ZoomedLayoutScheme(4).layout(2)
    exp_nw = lay.extent_for(2, 1)
    assert math.isclose(ext[0], exp_nw.xmin) and math.isclose(ext[3], exp_nw.ymax)


def test_decoder_rejects_unsupported_compression():
    data = bytearray(encode_geotiff(np.zeros((2, 2)), (0, 0, 1, 1)))
    # flip the Compression tag to 34712 (JPEG 2000 — not a codec we
    # implement; none/LZW/Deflate/PackBits/JPEG ARE handled natively now)
    (n,) = struct.unpack_from("<H", data, 8)
    for i in range(n):
        off = 8 + 2 + i * 12
        tag = struct.unpack_from("<H", data, off)[0]
        if tag == 259:
            struct.pack_into("<H", data, off + 8, 34712)
    with pytest.raises(ValueError, match="rasterio"):
        decode_geotiff(bytes(data))


@pytest.mark.skipif(not HAS_RASTERIO, reason="rasterio not installed")
def test_rasterio_backend_reads_our_output(tmp_path):  # pragma: no cover
    from geotrellis_server_spark.sources.gtiff import read_geotiff_path

    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    p = tmp_path / "t.tif"
    p.write_bytes(encode_geotiff(a, (0, 0, 4, 4), epsg=3857))
    arr, ext, epsg = read_geotiff_path(str(p))
    assert np.allclose(arr, a) and epsg == 3857


def test_jpeg_real_on_both_paths():
    # Pillow when installed, pure-numpy baseline encoder otherwise —
    # either way render_jpg returns a real JFIF stream
    from geotrellis_server_spark.operators.stitch import render_jpg

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    out = render_jpg(rgb)
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"


def test_load_geotiff_as_tile_table(spark, tmp_path):
    from geotrellis_server_spark.sources.gtiff import load_geotiff

    a = np.arange(1, 65, dtype=np.float64).reshape(8, 8)
    p = tmp_path / "r8.tif"
    p.write_bytes(encode_geotiff(a, (0.0, 0.0, 8.0, 8.0), epsg=3857))
    df = load_geotiff(spark, str(p), layer="r8")
    r = df.collect()[0]
    assert (r.layer, r.width, r.height, r.xmin, r.ymax) == ("r8", 8, 8, 0.0, 8.0)
    assert r.cells[:3] == [1.0, 2.0, 3.0] and sum(r.cells) == sum(range(1, 65))


def test_pyramid_overview_chain_roundtrip():
    from geotrellis_server_spark.operators.resample import resample_block
    from geotrellis_server_spark.sources.gtiff import (
        build_overviews, decode_geotiff_pages, encode_geotiff_pyramid)

    full = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    pages_in = build_overviews(full, min_size=16)
    assert [p.shape for p in pages_in] == [(64, 64), (32, 32), (16, 16)]
    ext = (0.0, 0.0, 64.0, 64.0)
    data = encode_geotiff_pyramid(pages_in, ext, epsg=3857, nodata=float("nan"))

    pages = decode_geotiff_pages(data)
    assert len(pages) == 3
    arr0, ext0, epsg0, ov0 = pages[0]
    assert not ov0 and epsg0 == 3857 and np.allclose(arr0, full)
    assert np.allclose(ext0, ext)
    for i, (arr, exti, _, ov) in enumerate(pages[1:], start=1):
        assert ov  # NewSubfileType marks reduced resolution
        assert np.allclose(exti, ext)  # same footprint, coarser pixels
        assert np.allclose(arr, pages_in[i])
    # overview content = average downsample of the level above
    assert np.allclose(pages[1][0], resample_block(full, 32, 32, "average"))
    # decode_geotiff still returns the full-resolution page
    from geotrellis_server_spark.sources.gtiff import decode_geotiff

    arr, e2, p2 = decode_geotiff(data)
    assert arr.shape == (64, 64) and np.allclose(e2, ext)
