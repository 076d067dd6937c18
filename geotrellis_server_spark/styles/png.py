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
    """Inverse (tests only) — handles the subset encode_png emits."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * channels)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    out = raw[:, 1:].reshape(h, w, channels)
    return out[..., 0] if channels == 1 else out
