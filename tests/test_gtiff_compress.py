"""Compressed GeoTIFF strips: Deflate / PackBits / LZW codecs +
horizontal-differencing predictor (TIFF 6.0 §13/§14, "Section 9"),
through both the whole-file decoder and the ranged CogReader."""

import numpy as np
import pytest

from geotrellis_server_spark.sources.gtiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    _predictor2_decode,
    _predictor2_encode,
    decode_geotiff,
    decode_geotiff_pages,
    encode_geotiff,
    encode_geotiff_pyramid,
)
from geotrellis_server_spark.sources.cog import CogReader
from geotrellis_server_spark.sources.rangereader import (
    BytesRangeReader,
    CachingRangeReader,
)

EXTENT = (0.0, 0.0, 64.0, 48.0)


def _float_page(rng):
    a = rng.normal(size=(48, 64))
    a[5, 7] = np.nan
    return a


def _rgb_page(rng):
    base = np.arange(64, dtype=np.uint8)[None, :, None]
    noise = rng.integers(0, 8, (48, 64, 3), dtype=np.uint8)
    return (np.broadcast_to(base, (48, 64, 3)) + noise).astype(np.uint8)


@pytest.mark.parametrize("compression", ["deflate", "packbits", "lzw"])
def test_float_roundtrip_compressed(compression):
    a = _float_page(np.random.default_rng(3))
    data = encode_geotiff(a, EXTENT, epsg=3857, nodata=float("nan"),
                          compression=compression)
    arr, extent, epsg = decode_geotiff(data)
    np.testing.assert_array_equal(arr, a)  # NaN-safe bit-exact
    assert extent == EXTENT and epsg == 3857


@pytest.mark.parametrize("compression", ["deflate", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [1, 2])
def test_rgb_roundtrip_compressed(compression, predictor):
    a = _rgb_page(np.random.default_rng(4))
    data = encode_geotiff(a, EXTENT, epsg=4326,
                          compression=compression, predictor=predictor)
    arr, extent, epsg = decode_geotiff(data)
    np.testing.assert_array_equal(arr, a)
    assert epsg == 4326


def test_compression_shrinks_repetitive_data():
    # constant blocks: runs for PackBits, repeats for LZW/Deflate
    a = np.repeat(np.arange(6, dtype=np.uint8) * 40, 512).reshape(48, 64)
    raw = len(encode_geotiff(a, EXTENT))
    for c in ("deflate", "packbits", "lzw"):
        assert len(encode_geotiff(a, EXTENT, compression=c)) < raw


def test_predictor_improves_gradient_compression():
    # smooth horizontal gradient: differencing turns it into near-runs
    a = np.tile(np.arange(256, dtype=np.uint8), (64, 2))[:, :256]
    plain = len(encode_geotiff(a, EXTENT, compression="lzw"))
    pred = len(encode_geotiff(a, EXTENT, compression="lzw", predictor=2))
    assert pred < plain


def test_predictor2_rejects_float_pages():
    with pytest.raises(ValueError, match="integer-only"):
        encode_geotiff(np.zeros((4, 4)), EXTENT, compression="deflate",
                       predictor=2)


def test_packbits_spec_worked_example():
    # TIFF 6.0 "PackBits" section worked example (decode golden)
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    assert _packbits_decode(packed, len(unpacked)) == unpacked
    # and our own packer's output decodes back
    assert _packbits_decode(_packbits_encode(unpacked), len(unpacked)) == \
        unpacked


def test_lzw_roundtrip_crosses_width_boundaries_and_reset():
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),  # >4094 codes
        bytes(np.tile(np.arange(64, dtype=np.uint8), 3000)),
        b"\x00" * 100000 + b"\x01\x02" * 5000,
        b"a",
        b"",
    ]
    for raw in cases:
        assert _lzw_decode(_lzw_encode(raw), len(raw)) == raw


def test_lzw_late_change_compat_fallback():
    # our encoder + a late-change decode must NOT silently succeed with
    # wrong bytes; the early-change decode is the matching pair
    raw = np.random.default_rng(9).integers(0, 256, 2000,
                                            dtype=np.uint8).tobytes()
    enc = _lzw_encode(raw)
    assert _lzw_decode(enc, len(raw), early_change=True) == raw
    with pytest.raises(ValueError):
        _lzw_decode(enc, len(raw), early_change=False)


def test_predictor2_wraps_mod_256():
    a = np.array([[250, 5, 250], [1, 0, 255]], dtype=np.uint8)[..., None]
    d = _predictor2_encode(a)
    assert d[0, 1, 0] == (5 - 250) % 256
    np.testing.assert_array_equal(_predictor2_decode(d), a)


def test_multistrip_compressed_pyramid_and_windowed_cog_read():
    rng = np.random.default_rng(11)
    full = _float_page(rng)
    half = full[::2, ::2]
    data = encode_geotiff_pyramid(
        [full, half], EXTENT, epsg=3857, rows_per_strip=8,
        compression="deflate",
    )
    pages = decode_geotiff_pages(data)
    np.testing.assert_array_equal(pages[0][0], full)
    np.testing.assert_array_equal(pages[1][0], half)
    assert pages[1][3] is True  # overview flag survives

    class CountingReader(BytesRangeReader):
        def __init__(self, payload):
            super().__init__(payload)
            self.reads = []

        def read(self, offset, length):
            self.reads.append((offset, length))
            return super().read(offset, length)

    reader = CountingReader(data)
    cog = CogReader(reader)
    reader.reads.clear()  # drop the header/IFD parse reads
    win = cog.read_window(0, 10, 30, 5, 20)
    np.testing.assert_array_equal(win, full[10:30, 5:20])
    # rows 10..30 at rps=8 = strips 1..3 only: exactly 3 strip fetches,
    # each of a COMPRESSED strip's stored length
    p = cog.pages[0]
    assert reader.reads == [
        (p.strip_offsets[s], p.strip_counts[s]) for s in (1, 2, 3)
    ]


def test_render_geotiff_sink_compressed(spark):
    from geotrellis_server_spark.operators.stitch import render_geotiff
    from geotrellis_server_spark.sources import synth

    rows = [(
        "L", 2, 1, 1, 0, 8, 4, -20037508.34, 0.0, 0.0, 20037508.34,
        "float64", float("nan"),
        [float(v) for v in range(32)],
    )]
    tiles = spark.createDataFrame(rows, synth.TILE_SCHEMA)
    plain = render_geotiff(tiles)
    comp = render_geotiff(tiles, compression="deflate")
    a0, e0, _ = decode_geotiff(plain)
    a1, e1, _ = decode_geotiff(comp)
    np.testing.assert_array_equal(a0, a1)
    assert e0 == e1 and len(comp) < len(plain)


def test_uncompressed_files_still_roundtrip():
    a = _float_page(np.random.default_rng(12))
    arr, extent, epsg = decode_geotiff(encode_geotiff(a, EXTENT, epsg=3857))
    np.testing.assert_array_equal(arr, a)
