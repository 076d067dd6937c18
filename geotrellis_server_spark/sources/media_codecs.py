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


def _riff_chunks(payload: bytes, form: bytes = b"WAVE"):
    """Yield (chunk id, body) from a flat RIFF container (WAV) —
    word-aligned advance, truncated-size clamp; raises ValueError for a
    non-RIFF payload. (The AVI walkers keep their own loops: LIST
    nesting needs the raw offsets.)"""
    if payload[:4] != b"RIFF" or payload[8:12] != form:
        raise ValueError(f"not a RIFF/{form.decode().strip()} payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)


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
    n_ch, rate, data = None, None, None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("malformed WAV fmt chunk")
            fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"stdlib WAV decoder reads PCM16 only (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
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


# ------------------------------------------------------------- MJPEG AVI

AVI_MAGIC = b"RIFF"


def encode_mjpeg_avi(
    frames: np.ndarray, fps: int = 25, quality: int = 85
) -> bytes:
    """uint8 luma frames (n, h, w) → a Motion-JPEG AVI: a RIFF container
    (Microsoft AVI spec / OpenDML) whose '00dc' movi chunks are baseline
    JPEGs from the in-house T.81 encoder (styles/jpeg.py). This is a
    COMPRESSED video format the engine reads and writes with zero
    external codec libraries."""
    from ..styles.jpeg import encode_jpeg

    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    payloads = [encode_jpeg(f[i], quality=quality) for i in range(n)]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_sz = max(len(p) for p in payloads)
    # avih: MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_sz * fps, 0, 0x10,  # HASINDEX
        n, 0, 1, max_sz, w, h, 0, 0, 0, 0)
    # strh: AVIStreamHeader for a 'vids'/'MJPG' stream
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHH8I4H", 0, 0, 0, 0, 1, fps, 0, n, max_sz, 0xFFFFFFFF,
        0, 0, 0, w, h)
    # strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<IiiII", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00dc", p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: one entry per frame (offset relative to the movi 'kind' word)
    off, idx = 4, []
    for p, c in zip(payloads, movi_chunks):
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(p)))
        off += len(c)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_movi_span(payload: bytes) -> tuple[int, int]:
    """(start, end) byte span of the movi LIST body (after 'movi')."""
    if payload[:4] != AVI_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if fourcc == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            return pos + 12, pos + 8 + size
        pos += 8 + size + (size % 2)
    raise ValueError("AVI has no movi list")


def avi_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — avih header parse plus a movi chunk
    walk (sizes only; no JPEG bytes are decoded)."""
    if payload[:4] != AVI_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    # avih is the first chunk inside LIST hdrl at offset 12
    if payload[12:16] != b"LIST" or payload[20:24] != b"hdrl":
        raise ValueError("AVI missing hdrl")
    if payload[24:28] != b"avih":
        raise ValueError("AVI missing avih")
    a = struct.unpack("<14I", payload[32:88])
    w, h = a[8], a[9]
    start, end = _avi_movi_span(payload)
    pos, n = start, 0
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if fourcc[2:4] in (b"dc", b"db"):
            n += 1
        pos += 8 + size + (size % 2)
    return w, h, n


def avi_frame_jpeg(payload: bytes, idx: int) -> bytes:
    """JPEG bytes of frame ``idx`` — a chunk walk over the movi list
    (the seekable-demux analog; idx1, when present, would make this an
    O(1) offset read on a real range reader)."""
    start, end = _avi_movi_span(payload)
    pos, n = start, 0
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if fourcc[2:4] in (b"dc", b"db"):
            if n == idx:
                return payload[pos + 8 : pos + 8 + size]
            n += 1
        pos += 8 + size + (size % 2)
    raise IndexError(f"frame {idx} of {n}")


def decode_avi_frame(payload: bytes, idx: int) -> np.ndarray:
    """Luma frame ``idx`` of an MJPEG AVI as uint8 (h, w) — REAL
    compressed-video decode: RIFF demux + the T.81 baseline decoder."""
    from ..styles.jpeg import decode_jpeg

    arr = decode_jpeg(avi_frame_jpeg(payload, idx))
    return arr if arr.ndim == 2 else arr[..., 0]


# ------------------------------------------------------- IMA ADPCM WAV

# IMA/DVI ADPCM tables (public spec: IMA Recommended Practices for
# Enhancing Digital Audio Compatibility, rev 3.00; also RFC 3551 §4.5.1)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (new predictor, new index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[code]))
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> int:
    """Pick the 4-bit code for ``sample`` given the (pred, index) state
    — the standard quantizer: sign + successive step comparisons."""
    step = _IMA_STEPS[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """float mono samples in [-1, 1] → IMA ADPCM WAV (wFormatTag 0x11,
    4 bits/sample — a genuinely COMPRESSED audio payload, ~4x smaller
    than PCM16, encoded and decoded with zero external libraries)."""
    pcm = np.clip(np.round(np.asarray(samples, dtype=np.float64) * 32767.0),
                  -32768, 32767).astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    n = len(pcm)
    blocks = []
    index = 0
    for b0 in range(0, n, spb):
        chunk = pcm[b0 : b0 + spb]
        pred = int(chunk[0])
        blocks.append(struct.pack("<hBB", pred, index, 0))
        nibbles = []
        for s in chunk[1:]:
            code = _ima_encode_sample(int(s), pred, index)
            pred, index = _ima_step(pred, index, code)
            nibbles.append(code)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))  # pad last
        packed = bytes(
            (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(packed)
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 52 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHHHH", 20, 0x11, 1, sample_rate,
                             byte_rate, block_align, 4, 2, spb),
        b"fact", struct.pack("<II", 4, n),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def decode_wav_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """IMA ADPCM WAV → (float32 mono samples in [-1, 1], rate)."""
    rate, block_align, data, total = None, None, None, None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            if len(body) < 14:
                raise ValueError("malformed ADPCM fmt chunk")
            fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            block_align = struct.unpack_from("<H", body, 12)[0]
            if fmt != 0x11 or ch != 1:
                raise ValueError(f"not mono IMA ADPCM (fmt={fmt}, ch={ch})")
        elif cid == b"fact" and len(body) >= 4:
            total = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
    if data is None or block_align is None:
        raise ValueError("malformed ADPCM WAV: missing fmt/data")
    out = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred, index, _ = struct.unpack_from("<hBB", block, 0)
        # malformed input keeps the ValueError contract of decode_wav
        # (a corrupt index byte must not escape as IndexError)
        index = max(0, min(88, index))
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0xF, byte >> 4):
                pred, index = _ima_step(pred, index, code)
                out.append(pred)
    if total is not None:
        out = out[:total]
    return np.asarray(out, dtype=np.float32) / 32767.0, int(rate)


# --- GIF (GIF89a, CompuServe spec + LZW per Welch 1984 / the GIF
# application of it) — lossless indexed-color images, pure numpy/stdlib.
# The reference's media handling delegates decode to JVM ImageIO
# (SURVEY.md media inventory); here the codec is in-house like
# PNG/JPEG/ADPCM so compressed IMAGE payloads are real both ways.


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_pack_codes(codes: list[int], widths: list[int]) -> bytes:
    """LSB-first variable-width bit packing into 255-byte sub-blocks."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in zip(codes, widths):
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace start/step


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an RGB uint8 image (≤ 256 distinct colors — GIF is
    indexed; raise otherwise rather than silently quantize) as GIF89a
    with a global color table and real LZW compression. Lossless:
    decode_gif(encode_gif(x)) == x bit-for-bit."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("GIF dimensions out of range")
    flat = rgb.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > 256; quantize first")
    # palette size must be a power of two in [2, 256]
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    idx = inverse.astype(np.int32).reshape(h, w)
    if interlace:
        rows = [r for start, step in _GIF_PASSES for r in range(start, h, step)]
        idx = idx[rows]
    pixels = idx.reshape(-1).tolist()

    min_code = max(2, bits)
    clear = 1 << min_code
    eoi = clear + 1
    codes: list[int] = []
    widths: list[int] = []

    def emit(code: int, width: int) -> None:
        codes.append(code)
        widths.append(width)

    width = min_code + 1
    emit(clear, width)
    dict_: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    prefix = pixels[0]
    for k in pixels[1:]:
        if (prefix, k) in dict_:
            prefix = dict_[(prefix, k)]
            continue
        emit(prefix, width)
        dict_[(prefix, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            dict_.clear()
            next_code = eoi + 1
            width = min_code + 1
        prefix = k
    emit(prefix, width)
    emit(eoi, width)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) & 0x07))  # GCT present, size 2^bits
    out += b"\x00\x00"
    out += table.tobytes()
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    out.append(min_code)
    out += _gif_pack_codes(codes, widths)
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a stream to (h, w, 3) uint8
    — real LZW with variable code widths, clear-code resets, and
    interlace reordering; extensions (GCE/comment/application) are
    skipped per spec."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF stream")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF trailer before any image")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
    ipacked = payload[pos + 9]
    pos += 10
    table = gct
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 0x07)
        table = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        table = table.reshape(n, 3)
        pos += 3 * n
    if table is None:
        raise ValueError("GIF image without a color table")
    interlaced = bool(ipacked & 0x40)
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        data += payload[pos + 1: pos + 1 + ln]
        pos += 1 + ln

    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    done = False
    for byte in data:
        if done:
            break
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                done = True
                break
            if prev is None:
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):  # the KwKwK case
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(dict_) == (1 << width) and width < 12:
                width += 1
    idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
    if len(idx) < w * h:
        raise ValueError("truncated GIF pixel data")
    img = idx.reshape(h, w)
    if interlaced:
        rows = [r for start, step in _GIF_PASSES for r in range(start, h, step)]
        de = np.empty_like(img)
        de[rows] = img
        img = de
    return table[img]


# --- G.711 companded audio (ITU-T G.711: mu-law and A-law, the PSTN
# codecs) carried in WAV fmt tags 7 / 6. Decode is the published
# segment-expansion formula; encode picks the NEAREST code by binary
# search over the decoded level table (optimal quantization, immune to
# the off-by-one conventions that plague hand-rolled segment encoders).


def _ulaw_decode_table() -> np.ndarray:
    """All 256 mu-law codes → linear PCM16 (Sun/G.711 16-bit scaling:
    mantissa<<3 + bias 0x84, shifted by the 3-bit exponent)."""
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """All 256 A-law codes → linear PCM16 (XOR 0x55 toggle, segment
    expansion with the implicit leading 1 from segment 1 up). The
    (mant<<4) + 0x108 << (seg-1) form IS already the standard 16-bit
    scale (max 504<<6 = 32256, the Sun/ITU reference table) — no extra
    shift, which would overflow int16 and flip signs on loud codes."""
    codes = np.arange(256, dtype=np.int32) ^ 0x55
    exp = (codes >> 4) & 7
    mant = codes & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(codes & 0x80, mag, -mag).astype(np.int16)


_G711_TABLES = {"ulaw": _ulaw_decode_table(), "alaw": _alaw_decode_table()}
_G711_FMT = {"ulaw": 7, "alaw": 6}


def _g711_encode_samples(pcm: np.ndarray, law: str) -> np.ndarray:
    table = _G711_TABLES[law].astype(np.int32)
    order = np.argsort(table, kind="stable")
    levels = table[order]
    pos = np.clip(np.searchsorted(levels, pcm), 1, 255)
    lo, hi = levels[pos - 1], levels[np.minimum(pos, 255)]
    pick = np.where(np.abs(pcm - lo) <= np.abs(hi - pcm), pos - 1, pos)
    return order[pick].astype(np.uint8)


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """float [-1, 1] mono → G.711 companded WAV (fmt 7 mu-law / 6 A-law,
    8 bits per sample — 2x smaller than PCM16 with ~38 dB SNR)."""
    if law not in _G711_FMT:
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int32)
    codes = _g711_encode_samples(pcm, law)
    fmt = struct.pack("<HHIIHH", _G711_FMT[law], 1, sample_rate,
                      sample_rate, 1, 8)
    data = codes.tobytes()
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(payload: bytes) -> tuple[np.ndarray, int]:
    """G.711 WAV (fmt 7/6) → (float32 mono samples, rate)."""
    fmt_tag, rate, data = None, None, None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt_tag, _n_ch, rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"data":
            data = body
    if data is None or fmt_tag is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    law = {7: "ulaw", 6: "alaw"}.get(fmt_tag)
    if law is None:
        raise ValueError(f"not a G.711 WAV (fmt={fmt_tag})")
    codes = np.frombuffer(data, dtype=np.uint8)
    pcm = _G711_TABLES[law][codes].astype(np.float32) / 32767.0
    return pcm, int(rate)


# --- Compressed-bitstream DEMUX layers (mp3 / AAC-ADTS / H.264 Annex B) -----
#
# The entropy-decode stages of mp3/aac/h264 stay stubbed (no codec libs
# in this environment, and their huffman/CABAC tables are too large to
# re-derive); the FRAMING layers below are real implementations of the
# public bitstream specs (ISO 11172-3 frame headers, ISO 14496-3 ADTS,
# ITU-T H.264 Annex B byte streams) — enough for the metadata a corpus
# pipeline extracts at scale: duration, bitrate, sample rate, channel
# layout, frame/NAL inventory, keyframe positions.

_MP3_BITRATES_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                    224, 256, 320)  # MPEG-1 Layer III, kbit/s
_MP3_BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                    256, 320, 384)  # MPEG-1 Layer II
_MP3_RATES = (44100, 48000, 32000)


def mp3_frames(payload: bytes, max_frames: int | None = None) -> dict:
    """Parse an MPEG-1 audio (Layer II/III) byte stream into its frame
    inventory: {sample_rate, channels, layer, n_frames, duration_s,
    bitrate_kbps (mean), frames: [(offset, size, bitrate_kbps), ...]}.
    Skips ID3v2 prefixes. Raises ValueError when no conformant frame
    sync is found. Framing only — see module note."""
    data = payload
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit size, ID3v2 header is 10 bytes
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
             ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    frames = []
    sr = ch = layer = None
    while pos + 4 <= len(data):
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if not (b0 == 0xFF and (b1 & 0xE0) == 0xE0):
            if frames:
                break  # trailing garbage after a valid run
            pos += 1
            continue
        version = (b1 >> 3) & 3          # 3 = MPEG-1
        lyr = (b1 >> 1) & 3              # 2 = Layer II, 1 = Layer III
        if version != 3 or lyr not in (1, 2):
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            pos += 1
            continue
        table = _MP3_BITRATES_L3 if lyr == 1 else _MP3_BITRATES_L2
        br = table[br_idx]
        rate = _MP3_RATES[sr_idx]
        size = 144 * br * 1000 // rate + pad
        if size < 4 or pos + size > len(data):
            break
        mode = (data[pos + 3] >> 6) & 3
        sr, ch, layer = rate, (1 if mode == 3 else 2), (3 if lyr == 1 else 2)
        frames.append((pos, size, br))
        pos += size
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("no MPEG-1 audio frame sync found")
    return {
        "sample_rate": sr, "channels": ch, "layer": layer,
        "n_frames": len(frames),
        "duration_s": len(frames) * 1152.0 / sr,
        "bitrate_kbps": sum(f[2] for f in frames) / len(frames),
        "frames": frames,
    }


_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000)


def aac_adts_frames(payload: bytes, max_frames: int | None = None) -> dict:
    """Parse an AAC ADTS byte stream (ISO/IEC 14496-3 §1.A.3): returns
    {sample_rate, channels, profile, n_frames, duration_s, frames:
    [(offset, size), ...]}. ADTS carries an explicit 13-bit frame
    length, so framing is exact. Framing only — see module note."""
    data = payload
    pos = 0
    frames = []
    sr = ch = profile = None
    while pos + 7 <= len(data):
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xF0) == 0xF0):
            if frames:
                break
            pos += 1
            continue
        profile_i = (data[pos + 2] >> 6) & 3
        sr_idx = (data[pos + 2] >> 2) & 0xF
        ch_cfg = ((data[pos + 2] & 1) << 2) | ((data[pos + 3] >> 6) & 3)
        size = ((data[pos + 3] & 3) << 11) | (data[pos + 4] << 3) | \
               ((data[pos + 5] >> 5) & 7)
        if sr_idx >= len(_ADTS_RATES) or size < 7 or pos + size > len(data):
            if frames:
                break
            pos += 1
            continue
        sr, ch, profile = _ADTS_RATES[sr_idx], ch_cfg, profile_i + 1
        frames.append((pos, size))
        pos += size
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("no ADTS frame sync found")
    return {
        "sample_rate": sr, "channels": ch, "profile": profile,
        "n_frames": len(frames),
        "duration_s": len(frames) * 1024.0 / sr,
        "frames": frames,
    }


_H264_NAL_NAMES = {1: "slice", 5: "idr", 6: "sei", 7: "sps", 8: "pps",
                   9: "aud"}


def h264_nal_units(payload: bytes) -> list[dict]:
    """Split an H.264 Annex B byte stream (ITU-T H.264 §B.1: 3- or
    4-byte start codes) into NAL units: [{offset, size, type, name,
    keyframe}]. Keyframes are IDR slices (type 5) — the positions a
    frame-sampling pipeline seeks to. Framing only — see module note."""
    data = payload
    starts = []
    i = 0
    while i + 3 <= len(data):
        if data[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex B start code found")
    units = []
    for j, s in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else len(data)
        if end > s and data[end - 1:end] == b"\x00" and j + 1 < len(starts):
            end -= 1  # 4-byte start code: trailing zero belongs to the code
        if end <= s:
            continue
        t = data[s] & 0x1F
        units.append({"offset": s, "size": end - s, "type": t,
                      "name": _H264_NAL_NAMES.get(t, f"nal{t}"),
                      "keyframe": t == 5})
    return units
