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


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("tile", [None, (32, 16)])
@pytest.mark.parametrize("nbands", [1, 3])
def test_jpeg_in_tiff_roundtrip(tile, nbands):
    """Compression 7 (new-style JPEG-in-TIFF, TIFF TechNote 2) — the
    dominant imagery-COG compression — through the in-house codec."""
    yy, xx = np.mgrid[0:150, 0:220]
    if nbands == 3:
        img = np.stack([(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256],
                       -1).astype(np.uint8)
    else:
        img = ((yy * 3 + xx) % 256).astype(np.uint8)
    kw = {"tile": tile} if tile else {}
    blob = encode_geotiff(img, (0, 0, 22, 15), 3857, compression="jpeg", **kw)
    arr, extent, epsg, _ = next(iter(decode_geotiff_pages(blob)))
    assert arr.shape == img.shape and arr.dtype == np.uint8
    assert _psnr(img, arr) > 30
    cr = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    win = cr.read_window(0, 5, 40, 7, 100)
    assert _psnr(img[5:40, 7:100], win) > 35


def test_jpeg_in_tiff_rejects_float_and_predictor():
    f = np.zeros((32, 32))
    with pytest.raises(ValueError, match="uint8"):
        encode_geotiff(f, (0, 0, 1, 1), 3857, compression="jpeg")
    u = np.zeros((32, 32), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_geotiff(u, (0, 0, 1, 1), 3857, compression="jpeg",
                       predictor=2)


def test_jpeg_tables_tag_abbreviated_streams():
    """Wild JPEG-in-TIFFs share DQT/DHT via the JPEGTables tag (347) and
    store abbreviated per-segment streams; decode_strip splices them."""
    from geotrellis_server_spark.sources.gtiff import decode_strip
    from geotrellis_server_spark.styles.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:32, 0:48]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    full = encode_jpeg(img, 90)

    # split the self-contained stream into tables + abbreviated scan
    tables, scan, pos = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8"), 2
    import struct as _s

    while pos < len(full) - 1:
        assert full[pos] == 0xFF
        marker = full[pos + 1]
        if marker == 0xDA:  # SOS: rest of the stream is scan data
            scan += full[pos:]
            break
        seg_len = _s.unpack_from(">H", full, pos + 2)[0]
        seg = full[pos : pos + 2 + seg_len]
        (tables if marker in (0xDB, 0xC4) else scan).extend(seg)
        pos += 2 + seg_len
    tables += b"\xff\xd9"

    out = decode_strip(
        bytes(scan), compression=7, predictor=1, dtype="u1",
        width=48, bands=1, rows=32, jpeg_tables=bytes(tables),
    )
    ref = decode_strip(
        full, compression=7, predictor=1, dtype="u1",
        width=48, bands=1, rows=32,
    )
    assert (out == ref).all()
    assert _psnr(img, out) > 40


def test_jpeg_in_tiff_pyramid_overviews():
    yy, xx = np.mgrid[0:128, 0:128]
    img = ((yy + xx) % 256).astype(np.uint8)
    pages = [img, img[::2, ::2].copy()]
    blob = encode_geotiff_pyramid(pages, (0, 0, 128, 128), 3857,
                                  compression="jpeg", tile=(64, 64))
    cr = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    assert len(cr.pages) == 2 and cr.pages[1].is_overview
    arr, _, _ = cr.read_extent((0, 0, 128, 128), target_cell_width=2.0)
    assert arr.shape == (64, 64)
    assert _psnr(img[::2, ::2], arr) > 25
