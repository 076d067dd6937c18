"""RangeReader stack + windowed COG reads (SURVEY.md S1/S2/R5).

Reference behavior being matched: header chunk fetched once and cached
(CogUtils.scala:41-70, CacheRangeReader.scala), overview picked by
requested resolution, and window reads touching only intersecting
segments — asserted here via fetch accounting on a synthetic pyramid.
"""

import numpy as np
import pytest

from geotrellis_server_spark.sources.cog import CogReader
from geotrellis_server_spark.sources.gtiff import (
    build_overviews,
    decode_geotiff,
    decode_geotiff_pages,
    encode_geotiff,
    encode_geotiff_pyramid,
)
from geotrellis_server_spark.sources.rangereader import (
    BytesRangeReader,
    CachingRangeReader,
    FileRangeReader,
    HttpRangeReader,
    open_range_reader,
)

EXTENT = (0.0, 0.0, 1024.0, 512.0)


def _grid(h, w):
    return (np.arange(h * w, dtype=np.float64) % 977.0).reshape(h, w)


# ---------------------------------------------------------------- encoder


def test_multi_strip_roundtrip_matches_single_strip():
    a = _grid(100, 64)
    single = decode_geotiff(encode_geotiff(a, EXTENT, epsg=3857))
    multi = decode_geotiff(
        encode_geotiff_pyramid([a], EXTENT, epsg=3857, rows_per_strip=16)
    )
    np.testing.assert_array_equal(single[0], a)
    np.testing.assert_array_equal(multi[0], a)
    assert single[1] == multi[1]
    assert multi[2] == 3857


def test_multi_strip_rgb_roundtrip():
    rgb = (np.arange(48 * 32 * 3, dtype=np.uint8) % 251).reshape(48, 32, 3)
    arr, extent, epsg = decode_geotiff(
        encode_geotiff_pyramid([rgb], EXTENT, epsg=4326, rows_per_strip=7)
    )
    np.testing.assert_array_equal(arr, rgb)
    assert epsg == 4326


# ------------------------------------------------------------ range readers


def test_caching_reader_header_fetched_once():
    data = bytes(range(256)) * 1024  # 256 KiB
    inner = BytesRangeReader(data)
    r = CachingRangeReader(inner, header_bytes=4096, chunk_bytes=1024)
    assert r.read(0, 100) == data[:100]
    assert r.read(1000, 200) == data[1000:1200]
    assert r.read(0, 4096) == data[:4096]
    assert r.fetch_calls == 1  # all served from the one header fetch
    # past the header: chunk-aligned fetches, memoized
    assert r.read(10_000, 10) == data[10_000:10_010]
    assert r.read(10_100, 10) == data[10_100:10_110]
    assert r.fetch_calls == 2
    # spanning header boundary stitches header + chunks
    assert r.read(4090, 2000) == data[4090:6090]


def test_caching_reader_lru_bound():
    data = b"\x7f" * (64 * 1024)
    r = CachingRangeReader(
        BytesRangeReader(data), header_bytes=1024, chunk_bytes=1024, max_chunks=4
    )
    for off in range(2048, 64 * 1024, 1024):
        r.read(off, 8)
    assert len(r._chunks) <= 4


def test_file_range_reader(tmp_path):
    p = tmp_path / "blob.bin"
    payload = bytes(range(256)) * 40
    p.write_bytes(payload)
    fr = FileRangeReader(str(p))
    assert fr.total_size() == len(payload)
    assert fr.read(100, 50) == payload[100:150]


def test_open_range_reader_schemes(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"abcdef")
    r = open_range_reader(str(p))
    assert isinstance(r, CachingRangeReader)
    assert isinstance(r.inner, FileRangeReader)
    h = open_range_reader("https://example.invalid/a.tif")
    assert isinstance(h.inner, HttpRangeReader)  # construct-only (no network)


# -------------------------------------------------------------- CogReader


@pytest.fixture(scope="module")
def pyramid_bytes():
    base = _grid(512, 1024)
    pages = build_overviews(base, min_size=64)
    return (
        encode_geotiff_pyramid(pages, EXTENT, epsg=3857, rows_per_strip=32),
        pages,
    )


def test_cog_pages_match_full_decode(pyramid_bytes):
    blob, pages = pyramid_bytes
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    decoded = decode_geotiff_pages(blob)
    assert len(cog.pages) == len(pages) == len(decoded)
    assert not cog.pages[0].is_overview
    assert all(p.is_overview for p in cog.pages[1:])
    for meta, arr in zip(cog.pages, pages):
        assert (meta.height, meta.width) == arr.shape


def test_cog_window_equals_full_decode_slice(pyramid_bytes):
    blob, pages = pyramid_bytes
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    win = cog.read_window(0, 100, 180, 200, 500)
    np.testing.assert_array_equal(win, pages[0][100:180, 200:500])
    # unaligned rows (not on a strip boundary)
    win2 = cog.read_window(0, 33, 34, 0, 1024)
    np.testing.assert_array_equal(win2, pages[0][33:34, :])


def test_cog_window_reads_fraction_of_file(pyramid_bytes):
    blob, _ = pyramid_bytes
    cog = CogReader(
        CachingRangeReader(BytesRangeReader(blob), header_bytes=64 * 1024)
    )
    cog.read_window(0, 100, 180, 200, 500)  # 80 rows of 512 → ≤3 strips of 32
    s = cog.stats()
    # header (64 KiB) + 3 strips (3·32·1024·8 = 768 KiB) ≪ 5.6 MiB file
    assert s["bytes_fetched"] < 0.25 * s["total_size"]


def test_cog_select_page_auto(pyramid_bytes):
    blob, pages = pyramid_bytes
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    full_cw = (EXTENT[2] - EXTENT[0]) / pages[0].shape[1]
    assert cog.select_page(full_cw) == 0
    assert cog.select_page(full_cw * 2) == 1  # exact overview match
    assert cog.select_page(full_cw * 3) == 1  # coarsest not exceeding target
    assert cog.select_page(full_cw * 0.5) == 0  # finer than full res → page 0
    assert cog.select_page(full_cw * 1024) == len(pages) - 1


def test_cog_read_extent_overview(pyramid_bytes):
    blob, pages = pyramid_bytes
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    full_cw = (EXTENT[2] - EXTENT[0]) / pages[0].shape[1]
    req = (256.0, 128.0, 512.0, 256.0)
    arr, snapped, epsg = cog.read_extent(req, target_cell_width=2 * full_cw)
    assert epsg == 3857
    # page 1 cell width = 2·full_cw = 2.0 world units → window is exact
    assert snapped == req
    p1 = pages[1]
    np.testing.assert_array_equal(arr, p1[128:192, 128:256])


def test_cog_read_extent_clamps_to_page():
    a = _grid(64, 64)
    blob = encode_geotiff_pyramid(
        [a], (0.0, 0.0, 64.0, 64.0), epsg=4326, rows_per_strip=8
    )
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    arr, snapped, _ = cog.read_extent((-10.0, 50.0, 10.0, 100.0))
    np.testing.assert_array_equal(arr, a[0:14, 0:10])
    assert snapped == (0.0, 50.0, 10.0, 64.0)


def test_cog_read_extent_disjoint_returns_empty():
    a = _grid(64, 64)
    blob = encode_geotiff_pyramid(
        [a], (100.0, 0.0, 164.0, 64.0), epsg=4326, rows_per_strip=8
    )
    cog = CogReader(CachingRangeReader(BytesRangeReader(blob)))
    # entirely west of the page: empty window, consistent snapped extent
    arr, snapped, _ = cog.read_extent((0.0, 10.0, 50.0, 30.0))
    assert arr.size == 0
    assert snapped[0] <= snapped[2] and snapped[1] <= snapped[3]
    # entirely east
    arr2, _, _ = cog.read_extent((200.0, 10.0, 250.0, 30.0))
    assert arr2.size == 0


class _RangeHandler:
    """RFC 7233 single-range handler over an in-memory blob."""


def _serve_blob(blob: bytes):
    import http.server
    import socketserver
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_HEAD(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, b = rng[6:].split("-")
                a, b = int(a), min(int(b), len(blob) - 1)
                body = blob[a : b + 1]
                self.send_response(206)
                self.send_header("Content-Range",
                                 f"bytes {a}-{b}/{len(blob)}")
            else:
                body = blob
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_http_range_reader_against_live_server():
    """HttpRangeReader over a real socket (localhost RFC 7233 server) —
    the remote-COG read path, previously construct-only."""
    from geotrellis_server_spark.sources.rangereader import (
        CachingRangeReader,
        HttpRangeReader,
    )

    blob = bytes(range(256)) * 64  # 16 KiB, position-identifying bytes
    srv, port = _serve_blob(blob)
    try:
        rr = HttpRangeReader(f"http://127.0.0.1:{port}/blob")
        assert rr.total_size() == len(blob)
        assert rr.read(0, 4) == b"\x00\x01\x02\x03"
        assert rr.read(1000, 10) == blob[1000:1010]
        assert rr.read(len(blob) - 3, 3) == blob[-3:]
        # through the caching layer: header prefetch + chunk LRU
        cached = CachingRangeReader(
            HttpRangeReader(f"http://127.0.0.1:{port}/blob"),
            header_bytes=1024, chunk_bytes=512)
        assert cached.read(10, 20) == blob[10:30]       # header hit
        assert cached.read(5000, 100) == blob[5000:5100]
        assert cached.read(5050, 10) == blob[5050:5060]  # chunk hit
    finally:
        srv.shutdown()


def test_cog_reader_over_http():
    """CogReader strip-windowed reads through HttpRangeReader — a real
    COG served over a real socket, fetch accounting proving windowed
    access touches ranges, not the whole file."""
    from geotrellis_server_spark.sources.cog import CogReader
    from geotrellis_server_spark.sources.gtiff import encode_geotiff_pyramid
    from geotrellis_server_spark.sources.rangereader import (
        CachingRangeReader,
        HttpRangeReader,
    )

    import numpy as np

    arr = (np.arange(256 * 256, dtype=np.float64) % 251).reshape(256, 256)
    blob = encode_geotiff_pyramid([arr], (0.0, 0.0, 256.0, 256.0),
                                  epsg=4326, rows_per_strip=32)
    srv, port = _serve_blob(blob)
    try:
        http_rr = HttpRangeReader(f"http://127.0.0.1:{port}/cog.tif")
        rr = CachingRangeReader(http_rr, header_bytes=4096,
                                chunk_bytes=8192)
        reader = CogReader(rr)
        # a 32-row window: only the strips covering it should be fetched
        win = reader.read_window(0, row0=64, row1=96, col0=0, col1=256)
        np.testing.assert_array_equal(win, arr[64:96])
        assert rr.bytes_fetched < len(blob) / 2, (
            rr.bytes_fetched, len(blob))
    finally:
        srv.shutdown()
