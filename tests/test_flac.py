"""FLAC codec tests — lossless roundtrip is bit-exact by construction.

Decode-only features the in-house encoder never emits (LPC subframes,
verbatim, wasted bits, stereo decorrelation, partitioned/escaped
residuals) are exercised with hand-built conformant frames.
"""

import hashlib
import struct

import numpy as np
import pytest

from geotrellis_server_spark.sources.flac import (
    FLAC_MAGIC,
    _BitWriter,
    _crc8,
    _crc16,
    _raw_bytes,
    _write_coded_number,
    decode_flac,
    encode_flac,
)


def _rt(a, bits=16):
    dec, rate = decode_flac(encode_flac(a, 8000, bits))
    assert rate == 8000
    back = np.round(dec * (1 << (bits - 1))).astype(np.int64)
    assert back.shape == np.asarray(a).shape
    assert (back == np.asarray(a)).all()
    return dec


@pytest.mark.parametrize(
    "n,ch,bits",
    [(100, 1, 16), (5000, 2, 16), (4096, 1, 8), (9000, 3, 24),
     (1, 1, 16), (300, 2, 8), (4097, 1, 16)],
)
def test_roundtrip_bit_exact(n, ch, bits):
    rng = np.random.default_rng(n * 31 + ch * 7 + bits)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    a = rng.integers(lo, hi + 1, (n, ch))
    if ch == 1:
        a = a[:, 0]
    _rt(a, bits)


def test_tone_compresses_and_is_exact():
    t = np.arange(20000)
    tone = (3000 * np.sin(t * 0.01)).astype(np.int64)
    blob = encode_flac(tone)
    assert len(blob) < 0.25 * 20000 * 2  # beats raw PCM16 by 4x+
    _rt(tone)


def test_constant_block_is_tiny():
    const = np.full(8000, 123, dtype=np.int64)
    blob = encode_flac(const)
    assert len(blob) < 100
    _rt(const)


def test_empty_stream():
    dec, rate = decode_flac(encode_flac(np.empty(0, dtype=np.int64)))
    assert dec.size == 0 and rate == 8000


def test_float_input_quantized():
    t = np.arange(500)
    wave = 0.5 * np.sin(t * 0.07)
    dec, _ = decode_flac(encode_flac(wave))
    q = np.clip(np.round(wave * 32768), -32768, 32767) / 32768.0
    assert np.allclose(dec, q, atol=1e-7)


def test_md5_mismatch_detected():
    blob = bytearray(encode_flac(np.arange(100, dtype=np.int64)))
    # STREAMINFO md5 lives at bytes 26..42 (4 magic + 4 header + 18)
    blob[26] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_frame_crc_mismatch_detected():
    blob = bytearray(encode_flac(np.arange(200, dtype=np.int64) * 13))
    blob[-3] ^= 0x55  # inside the last frame body
    with pytest.raises(ValueError):  # CRC mismatch or desync, both caught
        decode_flac(bytes(blob))


# ---- hand-built frames for decode-only features ---------------------------


def _stream(frame_bodies, n_total, ch, bits, sample_rate=8000):
    """Wrap raw frame bodies (bytes, already CRC16-suffixed) in a
    minimal STREAMINFO container with a zeroed (unchecked) MD5."""
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n_total, 36)
    info = si.getvalue() + b"\x00" * 16
    head = FLAC_MAGIC + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    return head + b"".join(frame_bodies)


def _frame_header(w, bs, ch_code, bits, frame_no=0):
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize at end
    w.write(0, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write({8: 0b001, 16: 0b100, 24: 0b110}[bits], 3)
    w.write(0, 1)
    _write_coded_number(w, frame_no)
    w.write(bs - 1, 16)
    w.write(_crc8(w.getvalue()), 8)


def _verbatim_subframe(w, x, bits, wasted=0):
    w.write(0, 1)
    w.write(0b000001, 6)  # SUBFRAME_VERBATIM
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # unary wasted-1: (wasted-1) zeros then a 1
    else:
        w.write(0, 1)
    for v in np.asarray(x).tolist():
        w.write(int(v) >> wasted, bits - wasted)


def _finish(w):
    w.align()
    body = w.getvalue()
    return body + struct.pack(">H", _crc16(body))


def test_decode_verbatim_and_wasted_bits():
    x = (np.arange(64, dtype=np.int64) - 32) << 3  # all multiples of 8
    w = _BitWriter()
    _frame_header(w, 64, 0, 16)
    _verbatim_subframe(w, x, 16, wasted=3)
    blob = _stream([_finish(w)], 64, 1, 16)
    dec, _ = decode_flac(blob)
    assert (np.round(dec * 32768).astype(np.int64) == x).all()


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decode_stereo_decorrelation(mode):
    rng = np.random.default_rng(5)
    left = rng.integers(-20000, 20000, 64)
    right = rng.integers(-20000, 20000, 64)
    side = left - right
    w = _BitWriter()
    if mode == "left_side":
        _frame_header(w, 64, 8, 16)
        _verbatim_subframe(w, left, 16)
        _verbatim_subframe(w, side, 17)
    elif mode == "right_side":
        _frame_header(w, 64, 9, 16)
        _verbatim_subframe(w, side, 17)
        _verbatim_subframe(w, right, 16)
    else:
        mid = (left + right) >> 1
        _frame_header(w, 64, 10, 16)
        _verbatim_subframe(w, mid, 16)
        _verbatim_subframe(w, side, 17)
    blob = _stream([_finish(w)], 64, 2, 16)
    dec, _ = decode_flac(blob)
    back = np.round(dec * 32768).astype(np.int64)
    assert (back[:, 0] == left).all() and (back[:, 1] == right).all()


def test_decode_lpc_subframe():
    # signal following an exact order-2 LPC recurrence with residuals
    rng = np.random.default_rng(9)
    coef = [3, -2]  # qlp coefficients, shift 1 → pred = (3x[i-1]-2x[i-2])>>1
    shift = 1
    res = rng.integers(-5, 6, 64)
    x = np.zeros(64, dtype=np.int64)
    x[0], x[1] = 100, 120
    for i in range(2, 64):
        pred = (coef[0] * x[i - 1] + coef[1] * x[i - 2]) >> shift
        x[i] = res[i] + pred
    w = _BitWriter()
    _frame_header(w, 64, 0, 16)
    w.write(0, 1)
    w.write(0b100001, 6)  # SUBFRAME_LPC, order 2 (0b1 00001 = 32+1)
    w.write(0, 1)  # no wasted bits
    w.write(int(x[0]), 16)
    w.write(int(x[1]), 16)
    w.write(4 - 1, 4)  # precision 4 bits
    w.write(shift, 5)
    for c in coef:
        w.write(c, 4)
    # residual: RICE, partition order 1 (two partitions)
    u = np.where(res >= 0, res * 2, -res * 2 - 1)
    w.write(0, 2)
    w.write(1, 4)
    parts = [u[2:32], u[32:]]
    for p in parts:
        w.write(3, 4)  # k=3
        for v in p.tolist():
            w.write_unary(int(v) >> 3)
            w.write(int(v) & 7, 3)
    blob = _stream([_finish(w)], 64, 1, 16)
    dec, _ = decode_flac(blob)
    assert (np.round(dec * 32768).astype(np.int64) == x).all()


def test_decode_escaped_partition():
    x = np.arange(32, dtype=np.int64) * 3 + 7
    res = np.diff(x)  # constant 3 after order-1 fixed predictor
    w = _BitWriter()
    _frame_header(w, 32, 0, 16)
    w.write(0, 1)
    w.write(0b001001, 6)  # SUBFRAME_FIXED order 1
    w.write(0, 1)
    w.write(int(x[0]), 16)
    w.write(0, 2)  # RICE method
    w.write(0, 4)  # partition order 0
    w.write(0xF, 4)  # escape code
    w.write(7, 5)  # 7-bit raw residuals
    for v in res.tolist():
        w.write(int(v), 7)
    blob = _stream([_finish(w)], 32, 1, 16)
    dec, _ = decode_flac(blob)
    assert (np.round(dec * 32768).astype(np.int64) == x).all()


def test_raw_bytes_md5_matches_streaminfo():
    a = np.arange(-50, 50, dtype=np.int64)[:, None]
    blob = encode_flac(a[:, 0])
    assert hashlib.md5(_raw_bytes(a, 16)).digest() == blob[26:42]


def test_decode_path_in_multimodal_dispatch():
    from geotrellis_server_spark.operators.multimodal import _decode_audio

    t = np.arange(400, dtype=np.float64)
    wave = 0.5 * np.sin(t * 0.07)
    samples = _decode_audio(encode_flac(wave))
    assert samples.ndim == 1 and samples.shape == (400,)
    assert np.corrcoef(samples, wave)[0, 1] > 0.9999


def test_streaminfo_fixed_blocksize_contract():
    """RFC 9639 §8.2: fixed-blocksize streams must declare
    min_blocksize == max_blocksize == the nominal block size; the last
    partial frame is excluded (and 16 is the legal floor)."""
    from geotrellis_server_spark.sources.flac import (_BLOCK, encode_flac,
                                                      _parse_streaminfo)

    blob = encode_flac(np.zeros(_BLOCK + 4, dtype=np.int16))  # partial tail
    info, _ = _parse_streaminfo(blob)
    assert info["min_block"] == info["max_block"] == _BLOCK
    assert info["min_block"] >= 16
