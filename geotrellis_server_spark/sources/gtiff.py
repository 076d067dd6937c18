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
- ``decode_geotiff``: uncompressed striped TIFFs (everything this module
  writes, plus plain uncompressed single-plane files from other tools).

When rasterio IS present (optional dependency), ``read_geotiff_path``
uses it for compressed/tiled/COG inputs and falls back to the stdlib
decoder otherwise — so the same API upgrades in a full deployment.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - optional dependency, absent in this container
    import rasterio  # type: ignore

    HAS_RASTERIO = True
except ImportError:
    rasterio = None
    HAS_RASTERIO = False

# TIFF field types
_SHORT, _LONG, _ASCII, _DOUBLE = 3, 4, 2, 12
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _ASCII: 1, _DOUBLE: 8}
_TYPE_FMT = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}


def _page_block(
    a: np.ndarray,
    extent: tuple[float, float, float, float],
    epsg: int,
    nodata: float | None,
    base_offset: int,
    overview: bool,
    rows_per_strip: int | None = None,
) -> tuple[bytes, int]:
    """One IFD + out-of-line values + strip data, with all offsets
    absolute from ``base_offset``. Returns (block bytes, offset of the
    next-IFD pointer within the block) so the caller can chain pages.

    ``rows_per_strip`` splits pixel data into that many rows per strip
    (default: one strip = the whole page). Multi-strip pages are what
    make windowed range reads useful: a reader can fetch only the strips
    a requested row window intersects (CogUtils.scala:41-70 reads COG
    tiles the same way — here strips are the block unit)."""
    if a.ndim == 2:
        h, w, bands = a.shape[0], a.shape[1], 1
    else:
        h, w, bands = a.shape

    if a.dtype == np.uint8:
        bits, sample_format = 8, 1  # unsigned int
        pixel_bytes = a.astype("<u1").tobytes()
    else:
        a = a.astype("<f8")
        bits, sample_format = 64, 3  # IEEE float
        pixel_bytes = a.tobytes()

    rps = h if rows_per_strip is None else max(1, min(int(rows_per_strip), h))
    row_bytes = w * bands * (bits // 8)
    strip_counts = [
        min(rps, h - r0) * row_bytes for r0 in range(0, h, rps)
    ]
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

    entries: list[tuple[int, int, list]] = [
        (256, _LONG, [w]),
        (257, _LONG, [h]),
        (258, _SHORT, [bits] * bands),
        (259, _SHORT, [1]),  # no compression
        (262, _SHORT, [2 if bands == 3 else 1]),  # RGB / BlackIsZero
        (273, _LONG, [0] * n_strips),  # StripOffsets — patched in pass 2
        (277, _SHORT, [bands]),
        (278, _LONG, [rps]),
        (279, _LONG, strip_counts),
        (284, _SHORT, [1]),  # chunky
        (339, _SHORT, [sample_format] * bands),
        (33550, _DOUBLE, [xres, yres, 0.0]),  # ModelPixelScale
        (33922, _DOUBLE, [0.0, 0.0, 0.0, xmin, ymax, 0.0]),  # ModelTiepoint
        (34735, _SHORT, geo_dir),  # GeoKeyDirectory
    ]
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
        if tag == 273:
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
) -> bytes:
    """COG-style multi-page GeoTIFF: page 0 = full resolution, following
    pages = overviews (NewSubfileType = reduced-resolution) chained
    through the next-IFD pointers — the overview structure
    GeoTiffRasterSource's Auto(n) strategy selects from
    (CogUtils.scala:55-70). All pages share the extent (each page's pixel
    scale derives from its own dims); strips stay uncompressed so the
    stdlib decoder reads every page."""
    if not arrays:
        raise ValueError("need at least one page")
    pages = [_check_shape(a) for a in arrays]
    header = struct.pack("<2sHI", b"II", 42, 8)
    blocks: list[bytes] = []
    ptrs: list[int] = []
    offset = len(header)
    for i, a in enumerate(pages):
        block, ptr_at = _page_block(
            a, extent, epsg, nodata, offset, overview=i > 0,
            rows_per_strip=rows_per_strip,
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
) -> bytes:
    """array: float64 (h, w) single band, or uint8 (h, w) / (h, w, 3).
    extent: (xmin, ymin, xmax, ymax) in the CRS given by ``epsg``."""
    return encode_geotiff_pyramid([array], extent, epsg, nodata)


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
        if typ == _ASCII:
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
    """Uncompressed striped TIFF → (array, (xmin, ymin, xmax, ymax), epsg)
    of the FULL-RESOLUTION page. Single-band float/int or chunky 3-band
    uint8; use decode_geotiff_pages for the overview chain."""
    arr, extent, epsg, _ = decode_geotiff_pages(data)[0]
    return arr, extent, epsg


def parse_page_tags(tags: dict[int, list], e: str) -> dict:
    """IFD tags → page metadata dict — the ONE place the dtype map,
    compression check, geo-transform and GeoKey parsing live (shared by
    the whole-file decoder below and the ranged CogReader in cog.py)."""
    w, h = int(tags[256][0]), int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression != 1:
        raise ValueError(
            "stdlib TIFF decoder handles uncompressed strips only; "
            f"install rasterio for compression={compression}"
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
    return {
        "width": w,
        "height": h,
        "bands": bands,
        "dtype": dtype,
        "rows_per_strip": int(tags.get(278, [h])[0]),
        "strip_offsets": tuple(int(v) for v in tags[273]),
        "strip_counts": tuple(int(v) for v in tags[279]),
        "extent": extent,
        "epsg": epsg,
        "is_overview": bool(tags.get(254, [0])[0] & 1),
    }


def _decode_page(data: bytes, e: str, tags: dict[int, list]):
    m = parse_page_tags(tags, e)
    raw = b"".join(
        data[o : o + c] for o, c in zip(m["strip_offsets"], m["strip_counts"])
    )
    w, h, bands = m["width"], m["height"], m["bands"]
    arr = np.frombuffer(raw, dtype=m["dtype"]).reshape(
        (h, w) if bands == 1 else (h, w, bands)
    )
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
