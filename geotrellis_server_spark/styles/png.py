"""Minimal pure-stdlib PNG encoder (S8 sink — PIL is unavailable in this
environment; output parity target is ogc/.../OutputFormat.scala:54-124:
grey / rgb / rgba encodings, NoData→transparent).

Deterministic: fixed zlib level, no timestamps → byte-stable goldens.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgba: np.ndarray) -> bytes:
    """rgba: (h, w, 4) uint8 (or (h, w) uint8 → greyscale)."""
    a = np.asarray(rgba)
    if a.ndim == 2:
        h, w = a.shape
        color_type, channels = 0, 1
        a = a[..., None]
    else:
        h, w, channels = a.shape
        color_type = {1: 0, 3: 2, 4: 6}[channels]
    a = a.astype(np.uint8)
    # filter type 0 per scanline
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * channels)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Full baseline PNG decoder (pure stdlib): 8-bit depth, color types
    0 (grey) / 2 (RGB) / 4 (grey+alpha) / 6 (RGBA), non-interlaced, all
    five scanline filters (None/Sub/Up/Average/Paeth) — reads PNGs from
    other tools, not just encode_png's filter-0 output."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8 or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub — per-channel cumulative sum mod 256
            rec = line.reshape(w, bpp).cumsum(axis=0).ravel() & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average (sequential in x)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (sequential in x)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    out = out.reshape(h, w, channels)
    return out[..., 0] if channels == 1 else out
