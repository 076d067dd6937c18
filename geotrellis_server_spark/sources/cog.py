"""Windowed COG reading over a RangeReader (SURVEY.md S1/S2/R5).

The reference's ``GeoTiffRasterSource`` never reads a whole COG: it
fetches the header chunk once, walks the IFD chain out of cache, picks
the overview whose resolution best matches the request, and range-reads
only the segments that intersect the requested window
(core/.../vlm/geotiff/util/CogUtils.scala:41-70 — ``fromUri`` reads the
first 256 KiB, ``cropGeoTiff`` crops by extent; overview pick at :55-65).

``CogReader`` is that access path for the stdlib GeoTIFF container this
engine writes (sources/gtiff.py): IFD metadata parsed through the
(cached) reader, strip-level windowed reads, and Auto(n)-style overview
selection. Strips are the block unit (the encoder writes row strips;
``rows_per_strip`` at encode time controls read granularity), so a
window read fetches ``ceil(rows/rps)`` strips instead of the page.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .gtiff import (
    _ASCII,
    _TYPE_FMT,
    _TYPE_SIZE,
    _UNDEF,
    decode_strip,
    decode_tile,
    parse_page_tags,
)
from .rangereader import CachingRangeReader, RangeReader, open_range_reader


@dataclass(frozen=True)
class CogPage:
    """Metadata for one IFD page — everything needed to plan a windowed
    read without touching pixel bytes."""

    width: int
    height: int
    bands: int
    dtype: str  # numpy dtype string, endian-qualified
    compression: int
    predictor: int
    rows_per_strip: int
    strip_offsets: tuple[int, ...]
    strip_counts: tuple[int, ...]
    tile_width: int | None
    tile_height: int | None
    jpeg_tables: bytes | None
    extent: tuple[float, float, float, float] | None
    epsg: int | None
    is_overview: bool

    @property
    def cell_width(self) -> float | None:
        if self.extent is None:
            return None
        return (self.extent[2] - self.extent[0]) / self.width


def _read_ifd_ranged(reader: RangeReader, e: str, ifd_off: int):
    """One IFD via ranged reads → (tags dict, next IFD offset).

    The entry table is one read; each out-of-line value is one more read
    — all served from the header chunk by CachingRangeReader for files
    with head-packed metadata, and range-fetched otherwise (the
    CacheRangeReader fallback behavior)."""
    (n,) = struct.unpack_from(e + "H", reader.read(ifd_off, 2), 0)
    table = reader.read(ifd_off + 2, n * 12 + 4)
    tags: dict[int, list] = {}
    for i in range(n):
        off = i * 12
        tag, typ, count = struct.unpack_from(e + "HHI", table, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            raw = table[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack_from(e + "I", table, off + 8)
            raw = reader.read(voff, total)
        if typ in (_ASCII, _UNDEF):
            tags[tag] = [raw]
        else:
            tags[tag] = list(struct.unpack_from(e + _TYPE_FMT[typ] * count, raw))
    (nxt,) = struct.unpack_from(e + "I", table, n * 12)
    return tags, nxt


def _page_meta(tags: dict[int, list], e: str) -> CogPage:
    # tag parsing (dtype map, compression check, geo keys) is shared with
    # the whole-file decoder — gtiff.parse_page_tags is the one source
    return CogPage(**parse_page_tags(tags, e))


class CogReader:
    """Parse IFD metadata through a RangeReader; read pixel windows by
    strip. ``CogReader(uri_or_reader)`` — a string is opened via
    ``open_range_reader`` (cached)."""

    def __init__(self, source: RangeReader | str):
        self.reader: RangeReader = (
            open_range_reader(source) if isinstance(source, str) else source
        )
        head = self.reader.read(0, 8)
        bo, magic, ifd_off = struct.unpack_from("<2sHI", head, 0)
        if bo == b"II":
            self._e = "<"
        elif bo == b"MM":
            self._e = ">"
            _, magic, ifd_off = struct.unpack_from(">2sHI", head, 0)
        else:
            raise ValueError("not a TIFF")
        if magic != 42:
            raise ValueError("not a TIFF (bad magic)")
        self.pages: list[CogPage] = []
        while ifd_off:
            tags, ifd_off = _read_ifd_ranged(self.reader, self._e, ifd_off)
            self.pages.append(_page_meta(tags, self._e))

    def select_page(self, target_cell_width: float) -> int:
        """Auto(0)/AutoHigherResolution overview pick (CogUtils.scala:55-65):
        the COARSEST page whose cell width is <= the requested resolution;
        page 0 if every overview is finer than needed (never upsample past
        full resolution)."""
        best, best_cw = 0, None
        for i, p in enumerate(self.pages):
            cw = p.cell_width
            if cw is None:
                continue
            if cw <= target_cell_width and (best_cw is None or cw > best_cw):
                best, best_cw = i, cw
        return best

    def _rows_view(self, page_idx: int, row0: int, row1: int) -> np.ndarray:
        """Rows [row0, row1) (already clamped by callers) as a VIEW over
        the fetched strip bytes — callers slice columns then copy once."""
        p = self.pages[page_idx]
        if row1 <= row0:
            shape = (0, p.width) if p.bands == 1 else (0, p.width, p.bands)
            return np.empty(shape, dtype=p.dtype)
        rps = p.rows_per_strip
        s0, s1 = row0 // rps, (row1 - 1) // rps
        strips = [
            decode_strip(
                self.reader.read(p.strip_offsets[s], p.strip_counts[s]),
                compression=p.compression,
                predictor=p.predictor,
                dtype=p.dtype,
                width=p.width,
                bands=p.bands,
                rows=min(rps, p.height - s * rps),
                jpeg_tables=p.jpeg_tables,
            )
            for s in range(s0, s1 + 1)
        ]
        first_row = s0 * rps
        block = strips[0] if len(strips) == 1 else np.concatenate(strips, axis=0)
        return block[row0 - first_row : row1 - first_row]

    def read_rows(self, page_idx: int, row0: int, row1: int) -> np.ndarray:
        """Rows [row0, row1) of one page, fetching ONLY intersecting
        segments. Returns (rows, width) or (rows, width, bands)."""
        p = self.pages[page_idx]
        if p.tile_width is not None:
            return self.read_window(page_idx, row0, row1, 0, p.width)
        return self._rows_view(page_idx, max(0, row0), min(p.height, row1)).copy()

    def _window_tiled(
        self, p: CogPage, r0: int, r1: int, c0: int, c1: int
    ) -> np.ndarray:
        """Tiled-layout window: fetch ONLY the tiles the window
        intersects — unlike strips, tiles prune in BOTH axes, which is
        why the COG spec mandates this layout (a 256-px window over a
        100k-px-wide mosaic touches ~1/400th of the row's bytes)."""
        tw, th = p.tile_width, p.tile_height
        across = (p.width + tw - 1) // tw
        shape = (r1 - r0, c1 - c0)
        if p.bands != 1:
            shape += (p.bands,)
        out = np.zeros(shape, dtype=p.dtype)
        m = {
            "compression": p.compression, "predictor": p.predictor,
            "dtype": p.dtype, "tile_width": tw, "tile_height": th,
            "bands": p.bands, "jpeg_tables": p.jpeg_tables,
        }
        for ti in range(r0 // th, (max(r0, r1 - 1)) // th + 1):
            for tj in range(c0 // tw, (max(c0, c1 - 1)) // tw + 1):
                idx = ti * across + tj
                t = decode_tile(
                    self.reader.read(p.strip_offsets[idx],
                                     p.strip_counts[idx]), m)
                tr0, tc0 = ti * th, tj * tw  # tile origin in page pixels
                sr0, sr1 = max(r0, tr0), min(r1, tr0 + th, p.height)
                sc0, sc1 = max(c0, tc0), min(c1, tc0 + tw, p.width)
                out[sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = \
                    t[sr0 - tr0 : sr1 - tr0, sc0 - tc0 : sc1 - tc0]
        return out

    def read_window(
        self, page_idx: int, row0: int, row1: int, col0: int, col1: int
    ) -> np.ndarray:
        """Pixel window [row0:row1, col0:col1) — fetches only the
        segments the window intersects: tiles (both-axis pruning) for
        tiled pages, strips + column slice for stripped pages."""
        p = self.pages[page_idx]
        r0 = max(0, row0)
        r1 = max(r0, min(p.height, row1))
        c0 = max(0, col0)
        c1 = max(c0, min(p.width, col1))
        if p.tile_width is not None:
            if r1 <= r0 or c1 <= c0:
                shape = (max(0, r1 - r0), max(0, c1 - c0))
                if p.bands != 1:
                    shape += (p.bands,)
                return np.empty(shape, dtype=p.dtype)
            return self._window_tiled(p, r0, r1, c0, c1)
        return self._rows_view(page_idx, r0, r1)[:, c0:c1].copy()

    def read_extent(
        self,
        extent: tuple[float, float, float, float],
        target_cell_width: float | None = None,
    ) -> tuple[np.ndarray, tuple[float, float, float, float], int | None]:
        """cropGeoTiff analog: pick the overview for the requested
        resolution (default: page-0 resolution), convert the extent to a
        pixel window on that page, read only those strips. Returns
        (array, snapped extent of returned pixels, epsg)."""
        p0 = self.pages[0]
        if p0.extent is None:
            raise ValueError("page has no geo transform")
        idx = (
            self.select_page(target_cell_width)
            if target_cell_width is not None
            else 0
        )
        p = self.pages[idx]
        xmin, ymin, xmax, ymax = p.extent
        cw = (xmax - xmin) / p.width
        ch = (ymax - ymin) / p.height
        # clamp BOTH bounds into the page so a disjoint request yields an
        # empty (0-sized) window, never a negative slice of wrong pixels
        c0 = int(np.clip(np.floor((extent[0] - xmin) / cw), 0, p.width))
        c1 = int(np.clip(np.ceil((extent[2] - xmin) / cw), c0, p.width))
        r0 = int(np.clip(np.floor((ymax - extent[3]) / ch), 0, p.height))
        r1 = int(np.clip(np.ceil((ymax - extent[1]) / ch), r0, p.height))
        arr = self.read_window(idx, r0, r1, c0, c1)
        snapped = (
            xmin + c0 * cw, ymax - r1 * ch, xmin + c1 * cw, ymax - r0 * ch,
        )
        return arr, snapped, p.epsg

    def stats(self) -> dict:
        """Fetch accounting when the reader is caching (test hook)."""
        r = self.reader
        if isinstance(r, CachingRangeReader):
            return {
                "fetch_calls": r.fetch_calls,
                "bytes_fetched": r.bytes_fetched,
                "total_size": r.total_size(),
            }
        return {}
