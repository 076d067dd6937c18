"""GeoTIFF sink/source (SURVEY.md S10 / S1) — pure-stdlib implementation.

The reference renders GeoTIFF via geotrellis GeoTiff writers
(ogc/.../Render.scala:36,47,64) and reads COGs via GeoTiffRasterSource
(core/.../util/CogUtils.scala:41-70). rasterio is not available in this
container, but an UNCOMPRESSED (Geo)TIFF is a simple public container —
header + IFD tags + strip data — so the engine ships its own encoder and
a matching strip-decoder built on ``struct``:

- ``encode_geotiff``: float64 single-band (SampleFormat=IEEEFP, the
  engine's tile celltype) or uint8 1/3-band; one strip; GeoTIFF keys
  ModelPixelScale + ModelTiepoint + GeoKeyDirectory (EPSG:4326
  geographic / EPSG:3857 or any projected code), GDAL_NODATA.
- ``decode_geotiff``: striped AND tiled TIFFs (TIFF 6.0 §15 tags
  322-325 — the layout the COG spec mandates) — uncompressed, Deflate
  (8 and the legacy 32946, via stdlib zlib), PackBits (32773, TIFF 6.0
  "Section 9") and LZW (5, TIFF 6.0 §13: MSB-first codes, early
  change), with the horizontal-differencing predictor (tag 317 = 2,
  TIFF 6.0 §14) undone. The same four codecs and both layouts are
  available at encode time (``compression=...``, ``tile=(tw, th)``),
  and the ranged CogReader prunes fetches in BOTH axes on tiled pages.

When rasterio IS present (optional dependency), ``read_geotiff_path``
uses it for exotic inputs (JPEG-in-TIFF, float predictor) and falls
back to the stdlib decoder otherwise — so the same API upgrades in a
full deployment.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - optional dependency, absent in this container
    import rasterio  # type: ignore

    HAS_RASTERIO = True
except ImportError:
    rasterio = None
    HAS_RASTERIO = False

# TIFF field types
_SHORT, _LONG, _ASCII, _DOUBLE, _UNDEF = 3, 4, 2, 12, 7
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _ASCII: 1, _DOUBLE: 8, _UNDEF: 1}
_TYPE_FMT = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}

# ---------------------------------------------------------------------------
# Strip codecs — TIFF 6.0 §13 (LZW), "Section 9" (PackBits), Adobe
# Deflate (8, plus the legacy 32946 code; both plain zlib streams), and
# the §14 horizontal-differencing predictor (tag 317 = 2). All pure
# stdlib/numpy; each strip compresses independently, so the windowed
# CogReader path keeps its strip-granular range reads.

COMPRESSION_CODES = {
    "none": 1, "lzw": 5, "jpeg": 7, "deflate": 8, "packbits": 32773,
}
_SUPPORTED_COMPRESSION = (1, 5, 7, 8, 32773, 32946)


def _packbits_encode(raw: bytes) -> bytes:
    """TIFF PackBits: runs of >=3 identical bytes become (257-n, byte)
    repeat packets; everything else literal packets of <=128 bytes."""
    out = bytearray()
    i, n = 0, len(raw)
    lit_start = 0

    def _flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(raw[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            _flush_literals(i)
            out.append(257 - run)  # == -(run-1) as unsigned byte
            out.append(raw[i])
            i += run
            lit_start = i
        else:
            i += run
    _flush_literals(n)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # h+1 literal bytes
            out.extend(data[i : i + h + 1])
            i += h + 1
        elif h > 128:  # next byte repeated 257-h times
            out.extend(data[i : i + 1] * (257 - h))
            i += 1
        # h == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("PackBits strip shorter than expected")
    return bytes(out[:expected])


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first code packing, 9→12 bit
    codes with EARLY CHANGE (width bumps when the next free code is
    2^width-1, one code earlier than GIF), ClearCode reset at 4094."""
    out = bytearray()
    acc = 0  # bit accumulator, MSB-first
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    emit(_LZW_CLEAR, width)
    w = b""
    for byte in raw:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: widen when the next free code is 2^width-1
        # (libtiff convention; the decoder mirrors it one entry behind)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # keep within 12 bits: reset the table
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
        w = bytes([byte])
    if w:
        emit(table[w], width)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int, early_change: bool = True) -> bytes:
    """Early change means the ENCODER widens when its next free code is
    2^w-1; the decoder's table runs one entry behind (it adds nothing on
    the first code after a Clear), so it widens at size 2^w-2 —
    empirically pinned by roundtrip across the 9→10 boundary.
    ``early_change=False`` decodes the legacy late-change variant (the
    libtiff LZWDecodeCompat case), one entry later."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    width_off = 2 if early_change else 1
    table: list[bytes] = []
    prev = b""

    while len(out) < expected:
        if bitpos + width > nbits:
            break  # truncated stream; length check below
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0 : b0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream does not start with ClearCode")
        if prev:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            if len(table) == (1 << width) - width_off and width < 12:
                width += 1
        else:
            entry = table[code]
        out.extend(entry)
        prev = entry
    if len(out) < expected:
        raise ValueError("LZW strip shorter than expected")
    return bytes(out[:expected])


def _decompress_strip(data: bytes, compression: int, expected: int) -> bytes:
    if compression == 1:
        return data
    if compression in (8, 32946):
        return zlib.decompress(data)
    if compression == 5:
        try:
            return _lzw_decode(data, expected)
        except ValueError:
            # legacy late-change writers (pre-spec-clarification files)
            return _lzw_decode(data, expected, early_change=False)
    if compression == 32773:
        return _packbits_decode(data, expected)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _compress_strip(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):
        return zlib.compress(raw, 6)
    if compression == 5:
        return _lzw_encode(raw)
    if compression == 32773:
        return _packbits_encode(raw)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _predictor2_encode(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing (§14): store d[r,0]=v[r,0], d[r,c]=v[r,c]
    -v[r,c-1] per band, mod 2^bits. ``block`` is (rows, width[, bands])
    integer; returns same shape/dtype."""
    u = block.view(np.dtype(block.dtype.str.replace("i", "u")))
    d = u.copy()
    d[:, 1:] = u[:, 1:] - u[:, :-1]  # unsigned wraparound == mod 2^bits
    return d.view(block.dtype)


def _predictor2_decode(block: np.ndarray) -> np.ndarray:
    u = block.view(np.dtype(block.dtype.str.replace("i", "u")))
    # cumsum in the SAME unsigned dtype wraps mod 2^bits (the accumulator
    # stays in-dtype when dtype= is pinned)
    v = np.cumsum(u, axis=1, dtype=u.dtype)
    return v.view(block.dtype)


def decode_strip(
    raw: bytes,
    *,
    compression: int,
    predictor: int,
    dtype: str,
    width: int,
    bands: int,
    rows: int,
    jpeg_tables: bytes | None = None,
) -> np.ndarray:
    """One strip's stored bytes → pixel array (rows, width[, bands]) —
    the ONE decode path shared by the whole-file decoder and the ranged
    CogReader, so every codec works identically on both.

    Compression 7 (new-style JPEG-in-TIFF, TIFF Technical Note 2 — the
    dominant compression for imagery COGs) decodes each segment as a
    JFIF stream through the in-house baseline codec; shared tables from
    the JPEGTables tag (347) are spliced ahead of abbreviated segment
    streams."""
    if compression == 7:
        blob = raw
        if jpeg_tables is not None and len(jpeg_tables) > 4:
            # tables stream: SOI <tables> EOI; segment: SOI <scan> EOI.
            # Abbreviated-format splice: SOI <tables> <scan> EOI.
            blob = jpeg_tables[:-2] + raw[2:]
        from ..styles.jpeg import decode_jpeg

        a = decode_jpeg(blob)
        if bands == 1 and a.ndim == 3:
            a = a[..., 0]
        elif bands == 3 and a.ndim == 2:
            a = a[..., None].repeat(3, axis=-1)
        if a.shape[0] < rows or a.shape[1] < width:
            raise ValueError("JPEG segment smaller than expected")
        return a[:rows, :width].astype(np.dtype(dtype))
    dt = np.dtype(dtype)
    expected = rows * width * bands * dt.itemsize
    buf = _decompress_strip(raw, compression, expected)
    if len(buf) < expected:
        raise ValueError("strip shorter than expected")
    a = np.frombuffer(buf, dtype=dt, count=rows * width * bands).reshape(
        (rows, width) if bands == 1 else (rows, width, bands)
    )
    if predictor == 2:
        a = _predictor2_decode(a)
    return a


def _page_block(
    a: np.ndarray,
    extent: tuple[float, float, float, float],
    epsg: int,
    nodata: float | None,
    base_offset: int,
    overview: bool,
    rows_per_strip: int | None = None,
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    jpeg_quality: int = 90,
) -> tuple[bytes, int]:
    """One IFD + out-of-line values + strip data, with all offsets
    absolute from ``base_offset``. Returns (block bytes, offset of the
    next-IFD pointer within the block) so the caller can chain pages.

    ``rows_per_strip`` splits pixel data into that many rows per strip
    (default: one strip = the whole page). Multi-strip pages are what
    make windowed range reads useful: a reader can fetch only the strips
    a requested row window intersects (CogUtils.scala:41-70 reads COG
    tiles the same way — here strips are the block unit).

    ``tile=(tw, th)`` switches the page to the TILED layout (TIFF 6.0
    §15, tags 322-325) — the layout the COG spec mandates and every
    cloud-optimized GeoTIFF in the wild uses. Tile dims must be
    multiples of 16; edge tiles are stored zero-padded to full size,
    per spec. Mutually exclusive with ``rows_per_strip``."""
    if a.ndim == 2:
        h, w, bands = a.shape[0], a.shape[1], 1
    else:
        h, w, bands = a.shape

    if a.dtype == np.uint8:
        bits, sample_format = 8, 1  # unsigned int
        px = a.astype("<u1")
    else:
        px = a.astype("<f8")
        bits, sample_format = 64, 3  # IEEE float
    if predictor == 2 and sample_format == 3:
        raise ValueError("predictor 2 is integer-only (TIFF 6.0 §14)")

    if compression == 7:
        if a.dtype != np.uint8:
            raise ValueError("JPEG-in-TIFF requires uint8 pages")
        if predictor != 1:
            raise ValueError("JPEG-in-TIFF does not use a predictor")

    def _pack_segment(sub: np.ndarray) -> bytes:
        if compression == 7:
            from ..styles.jpeg import encode_jpeg

            return encode_jpeg(
                sub, jpeg_quality,
                subsampling="420" if sub.ndim == 3 else "444",
            )
        if predictor == 2:
            sub = _predictor2_encode(sub)
        return _compress_strip(sub.tobytes(), compression)

    if tile is not None:
        if rows_per_strip is not None:
            raise ValueError("tile= and rows_per_strip= are exclusive")
        tw, th = int(tile[0]), int(tile[1])
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tile dims must be positive multiples of 16")
        strips = []
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                sub = px[r0 : r0 + th, c0 : c0 + tw]
                if sub.shape[0] != th or sub.shape[1] != tw:
                    pad = [(0, th - sub.shape[0]), (0, tw - sub.shape[1])]
                    if sub.ndim == 3:
                        pad.append((0, 0))
                    sub = np.pad(sub, pad)  # edge tiles zero-padded (§15)
                strips.append(_pack_segment(sub))
        rps = th
    else:
        rps = h if rows_per_strip is None else max(1, min(int(rows_per_strip), h))
        strips = []
        for r0 in range(0, h, rps):
            strips.append(_pack_segment(px[r0 : r0 + rps]))
    strip_counts = [len(s) for s in strips]
    pixel_bytes = b"".join(strips)
    n_strips = len(strip_counts)

    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    xres = (xmax - xmin) / w
    yres = (ymax - ymin) / h

    geographic = epsg == 4326
    geo_keys = [
        (1024, 0, 1, 2 if geographic else 1),  # GTModelType: 2 geo, 1 projected
        (1025, 0, 1, 1),  # GTRasterType: PixelIsArea
        (2048 if geographic else 3072, 0, 1, epsg),
    ]
    geo_dir = [1, 1, 0, len(geo_keys)]
    for k in geo_keys:
        geo_dir.extend(k)

    seg_off_tag = 324 if tile is not None else 273  # Tile/StripOffsets
    entries: list[tuple[int, int, list]] = [
        (256, _LONG, [w]),
        (257, _LONG, [h]),
        (258, _SHORT, [bits] * bands),
        (259, _SHORT, [compression]),
        (262, _SHORT, [(6 if compression == 7 else 2) if bands == 3 else 1]),
        (277, _SHORT, [bands]),
        (284, _SHORT, [1]),  # chunky
        (339, _SHORT, [sample_format] * bands),
        (seg_off_tag, _LONG, [0] * n_strips),  # offsets — patched in pass 2
    ]
    if tile is not None:
        entries += [
            (322, _LONG, [tw]),  # TileWidth
            (323, _LONG, [th]),  # TileLength
            (325, _LONG, strip_counts),  # TileByteCounts
        ]
    else:
        entries += [
            (278, _LONG, [rps]),
            (279, _LONG, strip_counts),
        ]
    entries += [
        (33550, _DOUBLE, [xres, yres, 0.0]),  # ModelPixelScale
        (33922, _DOUBLE, [0.0, 0.0, 0.0, xmin, ymax, 0.0]),  # ModelTiepoint
        (34735, _SHORT, geo_dir),  # GeoKeyDirectory
    ]
    if predictor == 2:
        entries.append((317, _SHORT, [2]))  # horizontal differencing
    if overview:
        entries.append((254, _LONG, [1]))  # NewSubfileType: reduced-resolution
    if nodata is not None:
        nd = (f"{nodata!r}" if nodata == nodata else "nan") + "\x00"
        entries.append((42113, _ASCII, [nd.encode("ascii")]))  # GDAL_NODATA
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    data_area_off = base_offset + ifd_size

    def _raw_len(typ: int, vals: list) -> int:
        return len(vals[0]) if typ == _ASCII else _TYPE_SIZE[typ] * len(vals)

    # pass 1: layout — overflow size is value-independent, so strip
    # offsets can be computed before any value bytes are emitted
    overflow_len = 0
    for _, typ, vals in entries:
        rl = _raw_len(typ, vals)
        if rl > 4:
            overflow_len += rl + (rl % 2)  # word-align
    strip_base = data_area_off + overflow_len
    strip_offsets, pos = [], strip_base
    for c in strip_counts:
        strip_offsets.append(pos)
        pos += c

    # pass 2: emit with real strip offsets
    overflow = bytearray()
    packed_entries = []
    for tag, typ, vals in entries:
        if tag == seg_off_tag:
            vals = strip_offsets
        if typ == _ASCII:
            raw = vals[0]
            count = len(raw)
        else:
            raw = b"".join(struct.pack("<" + _TYPE_FMT[typ], v) for v in vals)
            count = len(vals)
        if len(raw) <= 4:
            value_field = raw + b"\x00" * (4 - len(raw))
        else:
            off = data_area_off + len(overflow)
            overflow.extend(raw)
            if len(overflow) % 2:
                overflow.append(0)  # word-align
            value_field = struct.pack("<I", off)
        packed_entries.append((tag, typ, count, value_field))

    out = bytearray()
    out.extend(struct.pack("<H", n))
    for tag, typ, count, value_field in packed_entries:
        out.extend(struct.pack("<HHI", tag, typ, count) + value_field)
    next_ptr_at = len(out)
    out.extend(struct.pack("<I", 0))  # next IFD (caller may patch)
    out.extend(overflow)
    out.extend(pixel_bytes)
    if len(out) % 2:
        out.append(0)  # keep the next IFD word-aligned
    return bytes(out), next_ptr_at


def _check_shape(array: np.ndarray) -> np.ndarray:
    a = np.asarray(array)
    if a.ndim == 2 or (a.ndim == 3 and a.shape[2] in (1, 3)):
        return a
    raise ValueError(f"unsupported array shape {a.shape}")


def encode_geotiff_pyramid(
    arrays: list[np.ndarray],
    extent: tuple[float, float, float, float],
    epsg: int = 3857,
    nodata: float | None = None,
    rows_per_strip: int | None = None,
    compression: str | int = "none",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    jpeg_quality: int = 90,
) -> bytes:
    """COG-style multi-page GeoTIFF: page 0 = full resolution, following
    pages = overviews (NewSubfileType = reduced-resolution) chained
    through the next-IFD pointers — the overview structure
    GeoTiffRasterSource's Auto(n) strategy selects from
    (CogUtils.scala:55-70). All pages share the extent (each page's pixel
    scale derives from its own dims). ``compression`` is one of
    none/lzw/deflate/packbits (or a numeric TIFF code); strips compress
    independently, so the windowed CogReader still fetches only the
    strips a request intersects. ``predictor=2`` applies horizontal
    differencing before compression (uint8 pages only)."""
    if not arrays:
        raise ValueError("need at least one page")
    comp = (
        COMPRESSION_CODES[compression]
        if isinstance(compression, str)
        else int(compression)
    )
    pages = [_check_shape(a) for a in arrays]
    header = struct.pack("<2sHI", b"II", 42, 8)
    blocks: list[bytes] = []
    ptrs: list[int] = []
    offset = len(header)
    for i, a in enumerate(pages):
        block, ptr_at = _page_block(
            a, extent, epsg, nodata, offset, overview=i > 0,
            rows_per_strip=rows_per_strip,
            compression=comp, predictor=predictor, tile=tile,
            jpeg_quality=jpeg_quality,
        )
        blocks.append(block)
        ptrs.append(offset + ptr_at)
        offset += len(block)
    out = bytearray(header)
    starts = []
    pos = len(header)
    for block in blocks:
        starts.append(pos)
        out.extend(block)
        pos += len(block)
    for i in range(len(blocks) - 1):  # chain page i → page i+1
        struct.pack_into("<I", out, ptrs[i], starts[i + 1])
    return bytes(out)


def encode_geotiff(
    array: np.ndarray,
    extent: tuple[float, float, float, float],
    epsg: int = 3857,
    nodata: float | None = None,
    compression: str | int = "none",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    jpeg_quality: int = 90,
) -> bytes:
    """array: float64 (h, w) single band, or uint8 (h, w) / (h, w, 3).
    extent: (xmin, ymin, xmax, ymax) in the CRS given by ``epsg``.
    ``tile=(tw, th)`` writes the TIFF 6.0 §15 tiled layout (the
    COG-spec block structure) instead of strips."""
    return encode_geotiff_pyramid(
        [array], extent, epsg, nodata,
        compression=compression, predictor=predictor, tile=tile,
        jpeg_quality=jpeg_quality,
    )


def build_overviews(a: np.ndarray, min_size: int = 32) -> list[np.ndarray]:
    """Full-resolution array → [full, /2, /4, ...] average-downsampled
    pages until either dim would drop below ``min_size`` (the GDAL
    overview recipe; average matches the reference's Auto overview
    resampling default for continuous data)."""
    from ..operators.resample import resample_block

    pages = [np.asarray(a, dtype=np.float64)]
    while min(pages[-1].shape[:2]) // 2 >= min_size:
        h, w = pages[-1].shape[:2]
        pages.append(resample_block(pages[-1], h // 2, w // 2, "average"))
    return pages


def _read_ifd(data: bytes, e: str, ifd_off: int):
    """One IFD → (tags dict, next IFD offset)."""
    (n,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(e + "HHI", data, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        voff = off + 8 if total <= 4 else struct.unpack_from(e + "I", data, off + 8)[0]
        if typ in (_ASCII, _UNDEF):
            tags[tag] = [data[voff : voff + count]]
        else:
            fmt = e + _TYPE_FMT[typ] * count
            tags[tag] = list(struct.unpack_from(fmt, data, voff))
    (nxt,) = struct.unpack_from(e + "I", data, ifd_off + 2 + n * 12)
    return tags, nxt


def decode_geotiff_pages(data: bytes):
    """All IFD pages → list of (array, extent, epsg, is_overview) in file
    order (page 0 = full resolution; overview pages carry
    NewSubfileType=1 — the COG overview chain)."""
    bo, magic, ifd_off = struct.unpack_from("<2sHI", data, 0)
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
        _, magic, ifd_off = struct.unpack_from(">2sHI", data, 0)
    else:
        raise ValueError("not a TIFF")
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    pages = []
    while ifd_off:
        tags, ifd_off = _read_ifd(data, e, ifd_off)
        pages.append(_decode_page(data, e, tags))
    return pages


def decode_geotiff(data: bytes):
    """Striped TIFF (uncompressed/LZW/Deflate/PackBits, predictor 1/2) →
    (array, (xmin, ymin, xmax, ymax), epsg) of the FULL-RESOLUTION page.
    Single-band float/int or chunky 3-band uint8; use
    decode_geotiff_pages for the overview chain."""
    arr, extent, epsg, _ = decode_geotiff_pages(data)[0]
    return arr, extent, epsg


def parse_page_tags(tags: dict[int, list], e: str) -> dict:
    """IFD tags → page metadata dict — the ONE place the dtype map,
    compression check, geo-transform and GeoKey parsing live (shared by
    the whole-file decoder below and the ranged CogReader in cog.py)."""
    w, h = int(tags[256][0]), int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression not in _SUPPORTED_COMPRESSION:
        raise ValueError(
            "stdlib TIFF decoder handles uncompressed/LZW/Deflate/"
            f"PackBits strips; install rasterio for compression={compression}"
        )
    predictor = int(tags.get(317, [1])[0])
    if predictor not in (1, 2):
        raise ValueError(
            f"unsupported TIFF predictor {predictor} (floating-point "
            "predictor needs rasterio)"
        )
    bands = int(tags.get(277, [1])[0])
    bits = int(tags.get(258, [8])[0])
    sample_format = int(tags.get(339, [1])[0])
    dtype = {
        (3, 64): e + "f8", (3, 32): e + "f4",
        (1, 8): e + "u1", (1, 16): e + "u2", (1, 32): e + "u4",
        (2, 8): e + "i1", (2, 16): e + "i2", (2, 32): e + "i4",
    }[(sample_format, bits)]
    extent = None
    if 33550 in tags and 33922 in tags:
        xres, yres = tags[33550][0], tags[33550][1]
        xmin, ymax = tags[33922][3], tags[33922][4]
        extent = (xmin, ymax - yres * h, xmin + xres * w, ymax)
    epsg = None
    if 34735 in tags:
        gd = tags[34735]
        for i in range(4, len(gd), 4):
            key, _, _, val = gd[i : i + 4]
            if key in (2048, 3072):
                epsg = int(val)
    tiled = 322 in tags  # TIFF 6.0 §15 tiled layout (COG-spec mandated)
    if tiled:
        tw, th = int(tags[322][0]), int(tags[323][0])
        seg_offsets = tuple(int(v) for v in tags[324])
        seg_counts = tuple(int(v) for v in tags[325])
        rps = th
    else:
        tw = th = None
        seg_offsets = tuple(int(v) for v in tags[273])
        seg_counts = tuple(int(v) for v in tags[279])
        rps = int(tags.get(278, [h])[0])
    return {
        "width": w,
        "height": h,
        "bands": bands,
        "dtype": dtype,
        "compression": compression,
        "predictor": predictor,
        "rows_per_strip": rps,
        "strip_offsets": seg_offsets,
        "strip_counts": seg_counts,
        "tile_width": tw,
        "tile_height": th,
        "jpeg_tables": bytes(tags[347][0]) if 347 in tags else None,
        "extent": extent,
        "epsg": epsg,
        "is_overview": bool(tags.get(254, [0])[0] & 1),
    }


def decode_tile(raw: bytes, m: dict) -> np.ndarray:
    """One stored tile (always full ``tile_height × tile_width``, edge
    tiles zero-padded per TIFF 6.0 §15) → pixel array."""
    return decode_strip(
        raw,
        compression=m["compression"],
        predictor=m["predictor"],
        dtype=m["dtype"],
        width=m["tile_width"],
        bands=m["bands"],
        rows=m["tile_height"],
        jpeg_tables=m.get("jpeg_tables"),
    )


def assemble_tiles(fetch, m: dict) -> np.ndarray:
    """Full tiled page via ``fetch(offset, count) -> bytes`` (shared by
    the whole-file decoder and the ranged CogReader)."""
    w, h, bands = m["width"], m["height"], m["bands"]
    tw, th = m["tile_width"], m["tile_height"]
    across = (w + tw - 1) // tw
    shape = (h, w) if bands == 1 else (h, w, bands)
    out = np.zeros(shape, dtype=m["dtype"])
    for i, (o, c) in enumerate(zip(m["strip_offsets"], m["strip_counts"])):
        ti, tj = divmod(i, across)
        r0, c0 = ti * th, tj * tw
        t = decode_tile(fetch(o, c), m)
        out[r0 : r0 + th, c0 : c0 + tw] = t[: h - r0, : w - c0]
    return out


def _decode_page(data: bytes, e: str, tags: dict[int, list]):
    m = parse_page_tags(tags, e)
    w, h, bands = m["width"], m["height"], m["bands"]
    if m["tile_width"] is not None:
        arr = assemble_tiles(lambda o, c: data[o : o + c], m)
        return arr, m["extent"], m["epsg"], m["is_overview"]
    rps = m["rows_per_strip"]
    strips = [
        decode_strip(
            data[o : o + c],
            compression=m["compression"],
            predictor=m["predictor"],
            dtype=m["dtype"],
            width=w,
            bands=bands,
            rows=min(rps, h - s * rps),
            jpeg_tables=m["jpeg_tables"],
        )
        for s, (o, c) in enumerate(zip(m["strip_offsets"], m["strip_counts"]))
    ]
    arr = strips[0] if len(strips) == 1 else np.concatenate(strips, axis=0)
    return arr.copy(), m["extent"], m["epsg"], m["is_overview"]


def read_geotiff_path(path: str):
    """Read a GeoTIFF file: rasterio when available (compressed / tiled /
    COG), stdlib decoder otherwise (uncompressed strips)."""
    if HAS_RASTERIO:  # pragma: no cover - rasterio absent in this container
        with rasterio.open(path) as src:
            arr = src.read()
            arr = arr[0] if arr.shape[0] == 1 else np.moveaxis(arr, 0, -1)
            b = src.bounds
            epsg = src.crs.to_epsg() if src.crs else None
            return arr, (b.left, b.bottom, b.right, b.top), epsg
    with open(path, "rb") as f:
        return decode_geotiff(f.read())


def load_geotiff(spark, path: str, layer: str = "gtiff"):
    """S1 GeoTIFF source: file → a TILE_SCHEMA row (single-band float; RGB
    splits into band rows) so downstream MAML / mosaic / resample operate
    on it like any tile table. Uses the rasterio backend when present,
    the stdlib strip-decoder otherwise (CogUtils.scala:41-70 analog: at
    scale the file list is parallelized and each worker range-reads its
    own file; here one local file → one row)."""
    from .synth import TILE_SCHEMA

    arr, extent, epsg = read_geotiff_path(path)
    if extent is None:
        extent = (0.0, 0.0, float(arr.shape[1]), float(arr.shape[0]))
    xmin, ymin, xmax, ymax = extent
    nan = float("nan")
    rows = []
    if arr.ndim == 2:
        planes = [(0, arr)]
    else:
        planes = [(b, arr[:, :, b]) for b in range(arr.shape[2])]
    for band, plane in planes:
        rows.append((
            layer, 0, 0, 0, band, plane.shape[1], plane.shape[0],
            float(xmin), float(ymin), float(xmax), float(ymax),
            str(plane.dtype), nan,
            [float(v) for v in plane.astype(np.float64).ravel()],
        ))
    return spark.createDataFrame(rows, TILE_SCHEMA)


def load_geotiff_window(
    spark,
    path: str,
    extent: tuple[float, float, float, float],
    target_cell_width: float | None = None,
    layer: str = "gtiff",
):
    """S1/S2 windowed COG source: open the file through the cached
    RangeReader stack, pick the overview matching the requested
    resolution, and read ONLY the strips the extent intersects — the
    GeoTiffRasterSource read path (CogUtils.scala:41-70) instead of the
    whole-file load. Returns a TILE_SCHEMA DataFrame holding the snapped
    window. At scale: one such call per (executor, file, request), with
    the 256 KiB header fetch amortized across requests by
    CachingRangeReader."""
    from .cog import CogReader
    from .synth import TILE_SCHEMA

    cog = CogReader(path)
    arr, snapped, epsg = cog.read_extent(extent, target_cell_width)
    xmin, ymin, xmax, ymax = snapped
    nan = float("nan")
    if arr.ndim == 2:
        planes = [(0, arr)]
    else:
        planes = [(b, arr[:, :, b]) for b in range(arr.shape[2])]
    rows = [
        (
            layer, 0, 0, 0, band, plane.shape[1], plane.shape[0],
            float(xmin), float(ymin), float(xmax), float(ymax),
            str(plane.dtype), nan,
            [float(v) for v in plane.astype(np.float64).ravel()],
        )
        for band, plane in planes
    ]
    return spark.createDataFrame(rows, TILE_SCHEMA)
