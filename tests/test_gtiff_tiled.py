"""Tiled GeoTIFF layout (TIFF 6.0 §15, tags 322-325) — the block
structure the COG spec mandates. Covers encoder/decoder roundtrip over
every codec, edge-tile padding, and the CogReader's both-axis fetch
pruning (the whole point of tiles over strips)."""

import numpy as np
import pytest

from geotrellis_server_spark.sources.cog import CogReader
from geotrellis_server_spark.sources.gtiff import (
    build_overviews,
    decode_geotiff_pages,
    encode_geotiff,
    encode_geotiff_pyramid,
)
from geotrellis_server_spark.sources.rangereader import (
    BytesRangeReader,
    CachingRangeReader,
)


@pytest.mark.parametrize(
    "shape,dtype,comp,pred",
    [
        ((100, 130), "f8", "none", 1),
        ((100, 130), "u1", "lzw", 2),
        ((64, 64), "u1", "deflate", 1),
        ((200, 75, 3), "u1", "packbits", 1),
        ((16, 16), "f8", "deflate", 1),  # exactly one tile
    ],
)
def test_tiled_roundtrip_all_codecs(shape, dtype, comp, pred):
    rng = np.random.default_rng(sum(shape))
    a = (rng.random(shape) * 255).astype(dtype)
    blob = encode_geotiff(
        a, (0.0, 0.0, 13.0, 10.0), 3857,
        compression=comp, predictor=pred, tile=(16, 32),
    )
    arr, extent, epsg, _ = next(iter(decode_geotiff_pages(blob)))
    assert arr.shape == a.shape
    assert (arr.astype(a.dtype) == a).all()
    assert epsg == 3857 and extent == (0.0, 0.0, 13.0, 10.0)


def test_tile_dims_must_be_multiples_of_16():
    a = np.zeros((32, 32), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_geotiff(a, (0, 0, 1, 1), 3857, tile=(20, 16))
    with pytest.raises(ValueError, match="exclusive"):
        from geotrellis_server_spark.sources.gtiff import _page_block

        _page_block(a, (0, 0, 1, 1), 3857, None, 8, False,
                    rows_per_strip=8, tile=(16, 16))


def test_cogreader_tiled_window_reads_match_array():
    rng = np.random.default_rng(11)
    a = (rng.random((150, 220)) * 255).astype(np.uint8)
    blob = encode_geotiff(a, (0, 0, 22, 15), 3857,
                          compression="deflate", tile=(32, 16))
    cr = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    p = cr.pages[0]
    assert p.tile_width == 32 and p.tile_height == 16
    for r0, r1, c0, c1 in [(5, 40, 7, 100), (0, 150, 0, 220),
                           (140, 300, 200, 999), (17, 18, 33, 34),
                           (10, 10, 5, 8), (-5, 10, -3, 10)]:
        win = cr.read_window(0, r0, r1, c0, c1)
        rr0, rr1 = max(0, r0), min(150, max(r0, r1))
        cc0, cc1 = max(0, c0), min(220, max(c0, c1))
        assert win.shape[:2] == (rr1 - rr0, cc1 - cc0)
        assert (win.astype(np.uint8) == a[rr0:rr1, cc0:cc1]).all()
    rows = cr.read_rows(0, 90, 130)
    assert (rows.astype(np.uint8) == a[90:130]).all()


def test_tiled_fetch_prunes_both_axes():
    """A small window over a wide tiled page must fetch far fewer pixel
    bytes than the stripped layout would (strips span the full width)."""
    rng = np.random.default_rng(4)
    a = rng.random((512, 2048))  # f8: 8 MiB page, well past header cache
    blob_t = encode_geotiff(a, (0, 0, 2048, 512), 3857, tile=(64, 64))
    blob_s = encode_geotiff(a, (0, 0, 2048, 512), 3857)

    def fetched(blob, **kw):
        cr = CogReader(CachingRangeReader(BytesRangeReader(blob), **kw))
        before = cr.stats()["bytes_fetched"]
        win = cr.read_window(0, 100, 160, 300, 360)
        assert (win == a[100:160, 300:360]).all()
        return cr.stats()["bytes_fetched"] - before

    got_t = fetched(blob_t)
    # window touches 2x2 64px tiles = 4 * 32 KiB of pixels; the caching
    # reader rounds each fetch to its 64 KiB chunk, so allow 4 chunks + 1
    assert got_t <= 5 * 65536
    got_s = fetched(blob_s)
    assert got_t < got_s / 10  # strips must read full-width rows


def test_tiled_pyramid_extent_read():
    rng = np.random.default_rng(9)
    a = rng.random((256, 256)) * 100
    blob = encode_geotiff_pyramid(
        build_overviews(a, min_size=32), (0, 0, 256, 256), 3857,
        tile=(64, 64), compression="deflate",
    )
    cr = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    assert len(cr.pages) == 4
    assert all(p.tile_width == 64 for p in cr.pages)
    arr, snapped, epsg = cr.read_extent((10, 10, 50, 50))
    assert np.allclose(arr, a[206:246, 10:50])
    assert snapped == (10.0, 10.0, 50.0, 50.0) and epsg == 3857
    # overview pick still works through the tiled pages
    arr2, _, _ = cr.read_extent((0, 0, 256, 256), target_cell_width=4.0)
    assert arr2.shape == (64, 64)


def test_rgb_tiled_window():
    rng = np.random.default_rng(2)
    a = (rng.random((90, 70, 3)) * 255).astype(np.uint8)
    blob = encode_geotiff(a, (0, 0, 7, 9), 4326, tile=(16, 16),
                          compression="lzw", predictor=2)
    cr = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    win = cr.read_window(0, 10, 50, 5, 66)
    assert win.shape == (40, 61, 3)
    assert (win.astype(np.uint8) == a[10:50, 5:66]).all()
