"""FLAC codec (functions/flac_codec.py): round-trip exactness, CRC/MD5
corruption detection, and decoder-only spec paths (LPC, stereo
decorrelation, wasted bits, Rice2, partition order > 0) via hand-built
spec-valid frames."""

import struct

import numpy as np
import pytest

from ocr_search_ray.functions import flac_codec as fc
from ocr_search_ray.functions.flac_codec import (
    _BitWriter,
    _utf8_coded_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_tone_mono_multiframe():
    t = np.arange(10000)
    tone = (np.sin(t / 9.0) * 12000).astype(np.int16)
    b = encode_flac(tone, 16000, blocksize=4096)
    rate, out = decode_flac(b)
    assert rate == 16000
    assert np.array_equal(out[:, 0], tone)
    # a tonal signal must actually compress through the fixed predictors
    assert len(b) < tone.nbytes // 2


def test_roundtrip_noise_stereo():
    rng = np.random.default_rng(7)
    noise = rng.integers(-32768, 32768, size=(3000, 2)).astype(np.int16)
    b = encode_flac(noise, 44100, blocksize=1024)
    rate, out = decode_flac(b)
    assert rate == 44100
    assert np.array_equal(out, noise)


def test_roundtrip_constant_and_ramp():
    const = np.full(5000, -123, dtype=np.int16)
    _, out = decode_flac(encode_flac(const, 8000))
    assert np.array_equal(out[:, 0], const)
    ramp = (np.arange(8000) % 20000 - 10000).astype(np.int16)
    b = encode_flac(ramp, 22050)
    _, out = decode_flac(b)
    assert np.array_equal(out[:, 0], ramp)
    assert len(b) < ramp.nbytes // 4  # order-1/2 predictors nearly free


@pytest.mark.parametrize("n", [0, 1, 2, 5, 4095, 4096, 4097])
def test_roundtrip_boundary_lengths(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-2000, 2000, size=n).astype(np.int16)
    rate, out = decode_flac(encode_flac(x, 8000))
    assert rate == 8000
    assert np.array_equal(out[:, 0], x)


def test_corruption_detected():
    tone = (np.sin(np.arange(6000) / 5.0) * 9000).astype(np.int16)
    b = bytearray(encode_flac(tone, 16000))
    b[len(b) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(b))


def test_md5_guard_detects_metadata_tamper():
    # flip a bit inside the stored MD5 itself: frames stay valid, the
    # stream-level checksum must catch it
    tone = (np.sin(np.arange(3000) / 7.0) * 5000).astype(np.int16)
    b = bytearray(encode_flac(tone, 8000))
    b[8 + 18 + 3] ^= 0x01  # inside STREAMINFO MD5 (4 magic + 4 hdr + 18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(b))


def test_not_flac_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")


# ---------------------------------------------------- hand-built frames


def _stream(n_ch, rate, total, frames_payload, md5=b"\x00" * 16):
    """Assemble fLaC magic + STREAMINFO + raw frame bytes."""
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(n_ch - 1, 3)
    info.write(16 - 1, 5)
    info.write(total, 36)
    body = info.getvalue() + md5
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
            + frames_payload)


def _frame_header(n_ch_code, blocksize, frame_no=0):
    h = _BitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 2)
    h.write(0b0111, 4)      # 16-bit blocksize-1 at end
    h.write(0b0000, 4)      # rate from STREAMINFO
    h.write(n_ch_code, 4)
    h.write(0b100, 3)       # 16 bps
    h.write(0, 1)
    header = h.getvalue() + _utf8_coded_number(frame_no) \
        + struct.pack(">H", blocksize - 1)
    return header + bytes([crc8(header)])


def _finish_frame(header, bits: _BitWriter):
    bits.align()
    frame = header + bits.getvalue()
    return frame + struct.pack(">H", crc16(frame))


def _write_verbatim(w, sig, bps=16):
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for v in sig:
        w.write_signed(int(v), bps)


def test_decode_lpc_subframe():
    # LPC order 2, coefs [3, -1], shift 1: pred = (3*s[i-1] - s[i-2]) >> 1
    n = 64
    rng = np.random.default_rng(3)
    sig = rng.integers(-500, 500, size=n).astype(np.int64)
    order, shift, coefs, precision = 2, 1, [3, -1], 4
    res = [int(sig[i]) - ((3 * int(sig[i - 1]) - int(sig[i - 2])) >> shift)
           for i in range(order, n)]
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)   # LPC, order bits = order-1
    w.write(0, 1)                        # no wasted bits
    for v in sig[:order]:
        w.write_signed(int(v), 16)
    w.write(precision - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, precision)
    # residual: rice method 0, partition order 0, escape raw (width 12)
    w.write(0b00, 2)
    w.write(0, 4)
    w.write(0b1111, 4)
    w.write(12, 5)
    for v in res:
        w.write_signed(v, 12)
    payload = _stream(1, 8000, n, _finish_frame(_frame_header(0, n), w))
    rate, out = decode_flac(payload)
    assert rate == 8000
    assert np.array_equal(out[:, 0], sig.astype(np.int16))


@pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
def test_decode_stereo_decorrelation(mode):
    n = 48
    rng = np.random.default_rng(11)
    left = rng.integers(-3000, 3000, size=n).astype(np.int64)
    right = rng.integers(-3000, 3000, size=n).astype(np.int64)
    side = left - right
    code = {"left-side": 0b1000, "right-side": 0b1001, "mid-side": 0b1010}[mode]
    w = _BitWriter()
    if mode == "left-side":
        _write_verbatim(w, left, 16)
        _write_verbatim(w, side, 17)
    elif mode == "right-side":
        _write_verbatim(w, side, 17)
        _write_verbatim(w, right, 16)
    else:
        mid = (left + right) >> 1
        _write_verbatim(w, mid, 16)
        _write_verbatim(w, side, 17)
    payload = _stream(2, 8000, n, _finish_frame(_frame_header(code, n), w))
    _, out = decode_flac(payload)
    assert np.array_equal(out[:, 0], left.astype(np.int16))
    assert np.array_equal(out[:, 1], right.astype(np.int16))


def test_decode_wasted_bits():
    # samples all share 2 trailing zero bits: stored at bps-2 with the
    # wasted-bits field set; decoder must shift them back up
    n = 32
    base = (np.arange(n) - 16).astype(np.int64)
    sig = base << 2
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b000001, 6)    # VERBATIM
    w.write(1, 1)           # wasted-bits flag
    w.write_unary(1)        # unary(1) → wasted = 2
    for v in base:
        w.write_signed(int(v), 16 - 2)
    payload = _stream(1, 8000, n, _finish_frame(_frame_header(0, n), w))
    _, out = decode_flac(payload)
    assert np.array_equal(out[:, 0], sig.astype(np.int16))


def test_decode_rice2_and_partition_order():
    # FIXED order 1, partition order 1 (two partitions), Rice2 (5-bit params)
    n = 64
    sig = np.cumsum(np.repeat([3, -2], n // 2)).astype(np.int64)
    res = np.diff(sig)
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b001001, 6)    # FIXED order 1
    w.write(0, 1)
    w.write_signed(int(sig[0]), 16)
    w.write(0b01, 2)        # residual method 1: Rice2
    w.write(1, 4)           # partition order 1
    half = n // 2
    parts = [res[: half - 1], res[half - 1:]]
    for part in parts:
        z = np.where(part >= 0, part << 1, (-part << 1) - 1)
        k = 2
        w.write(k, 5)
        for q, v in zip((z >> k).tolist(), z.tolist()):
            w.write_unary(int(q))
            w.write(int(v) & ((1 << k) - 1), k)
    payload = _stream(1, 8000, n, _finish_frame(_frame_header(0, n), w))
    _, out = decode_flac(payload)
    assert np.array_equal(out[:, 0], sig.astype(np.int16))


def test_media_router_decodes_flac():
    from ocr_search_ray.stages.multimodal import _decode_stats

    tone = (np.sin(np.arange(777) / 6.0) * 11000).astype(np.int16)
    payload = encode_flac(tone, 24000)
    feat, wpx, hpx, n_samples, rate = _decode_stats(payload, "audio")
    assert (wpx, hpx) == (-1, -1)
    assert n_samples == 777
    assert rate == 24000
    assert feat.shape == (16,) and feat.dtype == np.float32


def test_hypothesis_roundtrip():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
           st.sampled_from([1, 2]))
    def inner(vals, n_ch):
        arr = np.array(vals, dtype=np.int16)
        if n_ch == 2:
            arr = np.stack([arr, arr[::-1]], axis=1) if len(arr) else \
                np.zeros((0, 2), dtype=np.int16)
        rate, out = decode_flac(encode_flac(arr, 48000, blocksize=64))
        want = arr[:, None] if arr.ndim == 1 else arr
        assert np.array_equal(out, want)

    inner()
