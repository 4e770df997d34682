"""Baseline JPEG codec (ITU-T T.81), from scratch, numpy-vectorized DCT.

The container has no image libraries, so — like ``gif_codec`` (GIF89a LZW)
and ``adpcm`` (IMA ADPCM) — this implements the public specification
directly.  Scope is the format that covers virtually all real-world JPEG
files: **baseline sequential DCT, 8-bit, Huffman-coded**, grayscale or
YCbCr color, 4:4:4 or 4:2:0 chroma subsampling, restart markers honored
on decode.  Progressive (SOF2), arithmetic coding and 12-bit precision
raise ``ValueError`` (quarantined by the media stages, never a task
failure).

Reference parity note: the reference repo (tom6311tom6311/ocr_search)
shells out to system converters for raster work and has no JPEG path of
its own; this codec exists so the engine's multimodal stages
(`stages/multimodal.py`) run a REAL decode → feature/resize kernel for
JPEG payloads instead of the documented digest stub.

Design:
- The 2-D DCT/IDCT is the orthonormal matrix form ``T @ B @ T.T`` applied
  to ALL 8×8 blocks of a component at once (one ``einsum`` per component),
  so the transform cost is numpy matmul, not Python loops.
- Entropy coding is canonical Huffman from (BITS, HUFFVAL) pairs exactly
  as T.81 Annex C builds them; the encoder EMBEDS its tables in DHT
  segments and the decoder always reads tables from the stream, so
  round-trip correctness never depends on any table being "standard".
- Quantization tables are the T.81 Annex K visual-weighting matrices,
  scaled by the widely-published libjpeg quality formula
  (``scale = 5000/q`` below 50 else ``200 - 2q``).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# T.81 Annex K.1 luminance / K.2 chrominance quantization tables
# (natural row-major order).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# T.81 Annex K.3 typical Huffman tables as (BITS[1..16], HUFFVAL) pairs.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: T[u, x] = c(u) * cos((2x+1)uπ/16) / 2,
# c(0) = 1/√2 else 1.  2-D DCT = T @ B @ T.T; IDCT = T.T @ D @ T.
_T = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C.2
    (canonical codes: counted by length, assigned in increasing order)."""
    if sum(bits) != len(vals):
        raise ValueError("invalid Huffman table: BITS does not sum to HUFFVAL")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(length, code): symbol} for the decoder."""
    enc = _build_huffman(bits, vals)
    return {(length, code): sym for sym, (code, length) in enc.items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma.astype(np.int64), chroma.astype(np.int64)


# ----------------------------------------------------------------- encoder


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._buf.append(byte)
            if byte == 0xFF:  # stuff a zero so entropy data never forms a marker
                self._buf.append(0x00)
            self._nbits -= 8
            self._acc &= (1 << self._nbits) - 1

    def pad_to_byte(self) -> None:
        if self._nbits:
            # pad the final byte with 1-bits (T.81 F.1.2.3)
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)

    def write_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self._buf += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self._buf)


def _magnitude_category(v: int) -> int:
    """SSSS of a coefficient value (number of bits of |v|)."""
    return int(abs(v)).bit_length()


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (multiple of 8) → (n_blocks, 8, 8) in raster MCU
    order (row-major over 8×8 tiles)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _dct_quantize(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Level-shift, batched 2-D DCT, quantize → (n_blocks, 64) int32 zigzag."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T, optimize=True)
    quant = np.round(coeffs / qtable[None, :, :]).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate a (h, w) plane up to multiples of ``mult``."""
    h, w = plane.shape
    ph, pw = (-h) % mult, (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    zz: np.ndarray,
    prev_dc: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    out: _BitWriter,
) -> int:
    """Entropy-encode one zigzag block; returns its DC for the next diff."""
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _magnitude_category(diff)
    out.write(*dc_tab[size])
    if size:
        out.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    # index of the last nonzero AC coefficient (0 = none)
    nz = np.nonzero(zz[1:])[0]
    last = (int(nz[-1]) + 1) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.write(*ac_tab[0xF0])  # ZRL: 16 zeros
            run -= 16
        size = _magnitude_category(v)
        out.write(*ac_tab[(run << 4) | size])
        out.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        out.write(*ac_tab[0x00])  # EOB
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([16 * tc + th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in table.reshape(64)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 grayscale → baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma (16×16 MCUs, the common
    real-world layout); default is 4:4:4.  ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every that many MCUs (the layout
    real-world encoders use for error resilience / parallel decode).
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected (h, w[, 3]) uint8")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("expected 3 channels")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q_luma, q_chroma = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    # header segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _dqt_segment(0, q_luma)
    if not gray:
        out += _dqt_segment(1, q_chroma)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    luma_hv = 0x22 if (subsample and not gray) else 0x11
    sof += bytes([1, luma_hv, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()

    if gray or not subsample:
        # 4:4:4 (or 1-component): MCU = one 8×8 block per component
        zz = [
            _dct_quantize(_pad_to(p, 8), q_luma if i == 0 else q_chroma)
            for i, p in enumerate(planes)
        ]
        n_mcu = zz[0].shape[0]
        prev = [0] * len(planes)
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                writer.write_marker(0xD0 + (m // restart_interval - 1) % 8)
                prev = [0] * len(planes)
            for c in range(len(planes)):
                tabs = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
                prev[c] = _encode_block(zz[c][m], prev[c], *tabs, writer)
    else:
        # 4:2:0: MCU = 4 luma blocks (2×2) + 1 Cb + 1 Cr
        y = _pad_to(planes[0], 16)
        ph, pw = y.shape
        # chroma: 2×2 box average of the padded luma grid, then 8-pad is
        # automatic (ph, pw are multiples of 16 → halves are multiples of 8)
        cb = _pad_to(planes[1], 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = _pad_to(planes[2], 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        zz_y = _dct_quantize(y, q_luma)
        zz_cb = _dct_quantize(cb, q_chroma)
        zz_cr = _dct_quantize(cr, q_chroma)
        mcus_x = pw // 16
        mcus_y = ph // 16
        blocks_x = pw // 8
        prev = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                m = my * mcus_x + mx
                if restart_interval and m and m % restart_interval == 0:
                    writer.write_marker(0xD0 + (m // restart_interval - 1) % 8)
                    prev = [0, 0, 0]
                for by in range(2):
                    for bx in range(2):
                        idx = (2 * my + by) * blocks_x + 2 * mx + bx
                        prev[0] = _encode_block(
                            zz_y[idx], prev[0], dc_l, ac_l, writer)
                cidx = my * mcus_x + mx
                prev[1] = _encode_block(zz_cb[cidx], prev[1], dc_c, ac_c, writer)
                prev[2] = _encode_block(zz_cr[cidx], prev[2], dc_c, ac_c, writer)

    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at markers (RSTn handled via ``restart``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker (EOI / RSTn): feed pad bits; caller handles
                # the marker via restart()/stop conditions
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip any fill bytes up to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` received bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB ((h, w) stays 3-channel
    by replication for 1-component files).  Raises ``ValueError`` on
    progressive/arithmetic/12-bit or corrupt streams."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    restart_interval = 0
    n = len(payload)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (need baseline SOF0)")
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4: pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — may hold several tables
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                bpos += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, bpos).astype(np.int64)
                    bpos += 64
                else:  # 16-bit precision
                    vals = np.frombuffer(body, ">u2", 64, bpos).astype(np.int64)
                    bpos += 128
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals
                qtables[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT — may hold several tables
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1: bpos + 17])
                count = sum(bits)
                vals = list(body[bpos + 17: bpos + 17 + count])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                bpos += 17 + count
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError("unsupported precision")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c: 3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                payload, pos + 2 + seg_len, frame, scan, qtables,
                htables, restart_interval)
        elif marker == 0xD9:  # EOI without a scan
            break
        pos += 2 + seg_len
    raise ValueError("no image scan found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("interleaved scan must cover all components")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}

    # per-component block grids (zigzag coefficient rows, filled in MCU order)
    grids = []
    meta = []
    for cs, td, ta in scan:
        hi, vi, tq = by_id[cs]
        bw, bh = mcus_x * hi, mcus_y * vi
        grids.append(np.zeros((bh * bw, 64), dtype=np.int64))
        dc_tab = htables.get((0, td))
        ac_tab = htables.get((1, ta))
        if dc_tab is None or ac_tab is None or tq not in qtables:
            raise ValueError("missing Huffman/quant table")
        meta.append((hi, vi, bw, dc_tab, ac_tab))

    reader = _BitReader(data, pos)
    prev = [0] * len(scan)
    mcu_count = 0
    done = False
    for my in range(mcus_y):
        if done:
            break
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                prev = [0] * len(scan)
            try:
                for c, (hi, vi, bw, dc_tab, ac_tab) in enumerate(meta):
                    for by in range(vi):
                        for bx in range(hi):
                            row = (my * vi + by) * bw + mx * hi + bx
                            prev[c] = _decode_block(
                                reader, grids[c][row], prev[c], dc_tab, ac_tab)
            except _MarkerHit:
                done = True  # truncated stream: decode what we have
                break
            mcu_count += 1

    # dequantize + batched IDCT per component, assemble planes
    planes = []
    for (cs, td, ta), (hi, vi, bw, _, _), grid in zip(scan, meta, grids):
        _, _, tq = by_id[cs]
        q = qtables[tq]
        coeffs = np.zeros((grid.shape[0], 64), dtype=np.float64)
        coeffs[:, ZIGZAG] = grid  # inverse zigzag
        blocks = coeffs.reshape(-1, 8, 8) * q[None, :, :]
        pixels = np.einsum("xu,nuv,yv->nxy", _T.T, blocks, _T.T, optimize=True)
        bh = grid.shape[0] // bw
        plane = (
            pixels.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        ) + 128.0
        # upsample to full MCU-grid resolution (nearest), then crop
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _decode_block(reader, zz_row, prev_dc, dc_tab, ac_tab):
    size = _decode_huffman(reader, dc_tab)
    diff = _extend(reader.receive(size), size)
    dc = prev_dc + diff
    zz_row[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        run, size = rs >> 4, rs & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC index overrun")
        zz_row[k] = _extend(reader.receive(size), size)
        k += 1
    return dc
