"""Baseline JPEG (JFIF) encoder + decoder — pure numpy/stdlib.

The reference renders ``image/jpeg`` via GeoTrellis `renderJpg`
(ogc/.../Render.scala:35,46,63). No JPEG library ships in this
container, but baseline sequential JPEG is a public spec (ITU-T T.81):
8×8 DCT blocks, Annex-K quantization + Huffman tables, JFIF markers.
This module implements:

- ``encode_jpeg(array, quality)``: grayscale (h, w) or RGB (h, w, 3)
  uint8 → baseline JFIF bytes (4:4:4, single interleaved scan, standard
  Annex-K Huffman tables — decodable by any JPEG reader).
- ``decode_jpeg(payload)``: the matching decoder (baseline, the subset
  this encoder emits plus any 4:4:4/grayscale single-scan baseline
  file with standard or embedded Huffman tables).

Lossy-roundtrip fidelity is property-tested (PSNR bound) in
tests/test_styles.py; when Pillow is installed the render path prefers
it (operators/stitch.py), so this is the no-dependency fallback that
makes ``format=image/jpeg`` WORK instead of raising.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# standard Huffman tables: (bits[1..16] counts, symbol values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# DCT-II orthonormal matrix (8×8)
_D = np.array([
    [np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
    for k in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex-C canonical code assignment: symbol → (code, length)."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.float64)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(w: _BitWriter, coef: np.ndarray, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """One quantized 8×8 block (already zigzagged, int) → bitstream."""
    dc = int(coef[0])
    diff = dc - prev_dc
    size = _category(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(_amplitude(diff, size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    for i in range(1, 64):
        v = int(coef[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(_amplitude(v, size), size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table[z]) for z in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(
    array: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling), "422" (chroma
    halved horizontally) or "420" (halved both ways — what mainstream
    encoders emit by default). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (T.81 §B.2.4.4)."""
    a = np.asarray(array)
    if a.dtype != np.uint8:
        a = np.clip(a, 0, 255).astype(np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]

    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    qlum = _quality_scale(QT_LUM, quality)
    qchrom = _quality_scale(QT_CHROM, quality)
    qts = [qlum] + ([qchrom, qchrom] if not gray else [])

    hi_l, vi_l = (1, 1) if gray else _SUBSAMPLING[subsampling]
    samps = [(hi_l, vi_l)] + ([(1, 1)] * 2 if not gray else [])

    # pad to MCU multiples by edge replication, then box-downsample chroma
    ph, pw = -h % (8 * vi_l), -w % (8 * hi_l)
    planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge") for p in planes]
    if not gray and (hi_l, vi_l) != (1, 1):

        def _down(p: np.ndarray) -> np.ndarray:
            hh, ww = p.shape
            return p.reshape(
                hh // vi_l, vi_l, ww // hi_l, hi_l).mean(axis=(1, 3))

        planes = [planes[0], _down(planes[1]), _down(planes[2])]

    dc_tabs = [_huff_codes(*DC_LUM)] + (
        [_huff_codes(*DC_CHROM)] * 2 if not gray else [])
    ac_tabs = [_huff_codes(*AC_LUM)] + (
        [_huff_codes(*AC_CHROM)] * 2 if not gray else [])

    # quantized zigzag coefficients per component, block-major
    comp_coefs = []
    for p, qt in zip(planes, qts):
        bh_c, bw_c = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p - 128.0).reshape(bh_c, 8, bw_c, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
        quant = np.round(dct.reshape(bh_c, bw_c, 64)[..., ZIGZAG].reshape(
            bh_c, bw_c, 64) / qt[ZIGZAG]).astype(np.int64)
        comp_coefs.append(quant)

    mcus_y = planes[0].shape[0] // (8 * vi_l)
    mcus_x = planes[0].shape[1] // (8 * hi_l)
    wbits = _BitWriter()
    prev = [0] * len(planes)
    mcu_n, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                wbits.flush()
                wbits.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev = [0] * len(planes)
            for c, (hi, vi) in enumerate(samps):
                for byy in range(vi):
                    for bxx in range(hi):
                        prev[c] = _encode_block(
                            wbits,
                            comp_coefs[c][my * vi + byy, mx * hi + bxx],
                            prev[c], dc_tabs[c], ac_tabs[c],
                        )
            mcu_n += 1
    wbits.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _dqt_segment(0, qlum)
    if not gray:
        out += _dqt_segment(1, qchrom)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        samp_byte = (samps[c][0] << 4) | samps[c][1]
        sof += bytes([c + 1, samp_byte, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _dht_segment(0x00, *DC_LUM)
    out += _dht_segment(0x10, *AC_LUM)
    if not gray:
        out += _dht_segment(0x01, *DC_CHROM)
        out += _dht_segment(0x11, *AC_CHROM)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += wbits.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    self.pos -= 1  # marker: stop feeding
                    b = None
            if b is None:
                break
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:  # past end: pad zeros (final partial block)
            self.acc <<= (length - self.n)
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume the next RSTn marker (T.81 §B.2.4.4) —
        entropy state resets; the caller resets DC predictors."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RSTn marker")


def _huff_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    lut, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return lut


def _read_symbol(r: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read(1)
        if (ln, code) in lut:
            return lut[(ln, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline single-scan JFIF → uint8 array ((h, w) or (h, w, 3)).
    Handles grayscale and interleaved color at ANY integer sampling
    factors — 4:4:4, 4:2:2, 4:2:0 (the mainstream-encoder default),
    4:1:1, 4:4:0 — with restart markers (DRI/RSTn, T.81 §B.2.4.4).
    Chroma is upsampled by sample replication; progressive (SOF2) and
    arithmetic coding are not supported."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hufs: dict[int, dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    scan: list[tuple[int, int, int]] = []  # (id, dc_tab, ac_tab)
    data_start = None
    ri = 0  # restart interval in MCUs (DRI)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qts[pq_tq & 0xF] = tbl
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if not (1 <= samp >> 4 <= 4 and 1 <= samp & 0xF <= 4):
                    raise ValueError(f"bad sampling factors 0x{samp:02x}")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                hufs[tc_th] = _huff_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            data_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if h is None or data_start is None:
        raise ValueError("malformed JPEG (missing SOF/SOS)")

    r = _BitReader(payload[data_start:])
    ncomp = len(comps)
    tq_of = {cid: tq for cid, _, tq in comps}
    samp_of = {cid: (samp >> 4, samp & 0xF) for cid, samp, _ in comps}
    hmax = max(s[0] for s in samp_of.values())
    vmax = max(s[1] for s in samp_of.values())
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-scan-component block planes at NATIVE (subsampled) resolution
    planes = [
        np.zeros((mcus_y * samp_of[cid][1] * 8, mcus_x * samp_of[cid][0] * 8))
        for cid, _, _ in scan
    ]
    pred = [0] * ncomp
    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_n and mcu_n % ri == 0:
                r.restart()
                pred = [0] * ncomp
            for ci, (cid, dc_t, ac_t) in enumerate(scan):
                hi, vi = samp_of[cid]
                for byy in range(vi):
                    for bxx in range(hi):
                        coef = np.zeros(64)
                        size = _read_symbol(r, hufs[0x00 | dc_t])
                        diff = _extend(r.read(size), size) if size else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(r, hufs[0x10 | ac_t])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(r.read(size), size)
                            k += 1
                        dq = np.zeros(64)
                        dq[ZIGZAG] = coef * qts[tq_of[cid]][ZIGZAG]
                        block = _D.T @ dq.reshape(8, 8) @ _D + 128.0
                        py = (my * vi + byy) * 8
                        px = (mx * hi + bxx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
            mcu_n += 1

    # upsample subsampled components by sample replication, crop to (h, w)
    up = []
    for ci, (cid, _, _) in enumerate(scan):
        hi, vi = samp_of[cid]
        p = planes[ci]
        if vi != vmax:
            if vmax % vi:
                raise ValueError("non-integer vertical sampling ratio")
            p = np.repeat(p, vmax // vi, axis=0)
        if hi != hmax:
            if hmax % hi:
                raise ValueError("non-integer horizontal sampling ratio")
            p = np.repeat(p, hmax // hi, axis=1)
        up.append(p[:h, :w])
    planes = up
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
