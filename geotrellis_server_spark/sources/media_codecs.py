"""Pure-stdlib audio/video codecs for UNCOMPRESSED containers.

The container ships no media libraries, but — exactly like the TIFF and
PNG codecs in sources/gtiff.py and styles/png.py — the uncompressed
variants of the standard containers are simple public formats:

- WAV (RIFF/WAVE, PCM16): chunked RIFF header + interleaved samples.
- Y4M (YUV4MPEG2): ASCII stream header + ``FRAME\\n``-delimited raw
  4:2:0 planes.

These make the engine's audio decode and video demux REAL for
uncompressed payloads (synth media generates them), with compressed
codecs (mp3/aac/h264) still delegated to the drop-in ``DECODERS``
replacement point in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
Y4M_MAGIC = b"YUV4MPEG2 "


# --------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1] (n,) mono or (n, ch) → PCM16 WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate,
                             ch * 2, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (float32 samples in [-1, 1], sample_rate).
    Mono returns (n,); multi-channel (n, ch). Walks RIFF chunks, so
    extra chunks (LIST/fact) before ``data`` are handled."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, bits, rate, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"stdlib WAV decoder reads PCM16 only (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if data is None or n_ch is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch)
    return pcm, int(rate)


# --------------------------------------------------------------------- Y4M


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """uint8 luma frames (n, h, w) with EVEN h/w → YUV4MPEG2 bytes
    (C420jpeg; chroma planes neutral 128)."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("y4m 4:2:0 needs even frame dims")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    chroma = bytes([128]) * ((h // 2) * (w // 2))
    out = [head]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def y4m_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from a YUV4MPEG2 payload — header parse
    plus arithmetic; no frame bytes are touched."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    frame_bytes = len(b"FRAME\n") + w * h + 2 * (w // 2) * (h // 2)
    n = (len(payload) - nl - 1) // frame_bytes
    return w, h, n


def decode_y4m_frame(payload: bytes, idx: int) -> np.ndarray:
    """Luma plane of frame ``idx`` as uint8 (h, w) — an O(1) offset read
    (fixed frame stride), the in-memory analog of a seekable demux."""
    w, h, n = y4m_info(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    nl = payload.index(b"\n")
    stride = len(b"FRAME\n") + w * h + 2 * (w // 2) * (h // 2)
    off = nl + 1 + idx * stride + len(b"FRAME\n")
    return np.frombuffer(payload[off : off + w * h], dtype=np.uint8).reshape(h, w).copy()
