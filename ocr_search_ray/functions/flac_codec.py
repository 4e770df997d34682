"""FLAC codec (fixed-predictor subset encoder, fuller decoder) from the
public specification (RFC 9639 / xiph.org format.html). Pure stdlib+numpy —
no audio libraries.

Encoder (spec-valid streams, the ``flac -l 0`` / fixed-predictor subset):
- ``fLaC`` magic + STREAMINFO metadata block (min/max blocksize, sample
  rate, channels, bits-per-sample, total samples, MD5 of the unencoded
  int16-LE interleaved stream).
- Frames with the spec's 14-bit sync code, UTF-8-coded frame number,
  CRC-8 header checksum and CRC-16 frame checksum.
- Per-channel subframes: CONSTANT for flat blocks, otherwise the best of
  FIXED orders 0-4 (chosen by minimal total zigzag residual magnitude)
  with VERBATIM as the incompressible fallback.
- Residuals use Rice method 0 (4-bit parameters), one partition per
  subframe (partition order 0), per-partition parameter fitted from the
  partition's mean magnitude, escape code (0b1111 → 5-bit raw width) when
  raw storage is cheaper.

Decoder (accepts more than the encoder emits — the usual codec asymmetry):
- CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes (LPC = warm-up +
  quantized-coefficient dot-product recurrence), wasted-bits fields,
  Rice method 0 and 1 (5-bit Rice2 parameters), any partition order,
  escape partitions, all block-size and sample-rate header codes,
  independent channel assignments (mono / n-channel); the stereo
  decorrelation modes (left-side / right-side / mid-side) are decoded
  per the spec's difference-channel algebra.
- Fixed-predictor residual reconstruction is vectorized as k-fold
  ``np.cumsum`` (the fixed predictors are exactly k-th-order differencing).
- The STREAMINFO MD5 is verified over the reconstructed stream; a
  mismatch raises (corruption is detected, not returned as audio).

Only 16-bit samples are supported end-to-end (the WAV/ADPCM/G.711 family's
width); other widths decode but are rejected before feature extraction.

No reference-repo analogue (the reference has no audio path); this extends
the multimodal real-codec family (SURVEY.md §8b).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc8_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table[i] = c
    return table


def _make_crc16_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        table[i] = c
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]) ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a 1 bit (libFLAC write_unary_unsigned)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._byte = pos
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        data, byte, bit = self._data, self._byte, self._bit
        while nbits > 0:
            if byte >= len(data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - bit
            take = min(avail, nbits)
            chunk = (data[byte] >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            bit += take
            nbits -= take
            if bit == 8:
                byte += 1
                bit = 0
        self._byte, self._bit = byte, bit
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self._bit:
            self._byte += 1
            self._bit = 0

    @property
    def byte_pos(self) -> int:
        return self._byte


def _utf8_coded_number(n: int) -> bytes:
    """The frame header's UTF-8-style extended coded number (RFC 9639
    §9.1.5; like UTF-8 but allows up to 36 bits / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded_number(reader: _BitReader) -> int:
    b0 = reader.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = reader.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------- encoding

_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


def _fixed_residual(sig: np.ndarray, order: int) -> np.ndarray:
    """k-th-order difference: residual of the fixed predictor of order k."""
    r = sig
    for _ in range(order):
        r = np.diff(r)
    return r


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _rice_param_for(z: np.ndarray) -> int:
    """Fit a Rice parameter from the partition's mean magnitude."""
    if len(z) == 0:
        return 0
    mean = float(z.mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_rice_partition(w: _BitWriter, z: np.ndarray, k: int) -> None:
    qs = (z >> k).astype(np.int64)
    for q, v in zip(qs.tolist(), z.tolist()):
        w.write_unary(int(q))
        if k:
            w.write(int(v) & ((1 << k) - 1), k)


def _rice_cost(z: np.ndarray, k: int) -> int:
    return int((z >> k).sum()) + len(z) * (k + 1)


def _write_residual(w: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int) -> None:
    """Rice method 0, partition order 0 (one partition for the subframe)."""
    z = _zigzag(res.astype(np.int64))
    k = _rice_param_for(z)
    # try k-1, k, k+1 and the raw escape; keep the cheapest
    best_k, best_cost = k, _rice_cost(z, k)
    for kk in (k - 1, k + 1):
        if 0 <= kk <= 14:
            c = _rice_cost(z, kk)
            if c < best_cost:
                best_k, best_cost = kk, c
    raw_width = int(z.max()).bit_length() if len(z) and z.max() > 0 else 1
    # raw escape stores the SIGNED residual at raw_width+1 bits
    esc_width = min(raw_width + 1, 32)
    esc_cost = 5 + len(z) * esc_width
    w.write(0b00, 2)        # residual method 0: 4-bit Rice
    w.write(0, 4)           # partition order 0
    if esc_cost < best_cost:
        w.write(0b1111, 4)  # escape
        w.write(esc_width, 5)
        for v in res.astype(np.int64).tolist():
            w.write_signed(int(v), esc_width)
    else:
        w.write(best_k, 4)
        _write_rice_partition(w, z, best_k)


def _encode_subframe(w: _BitWriter, sig: np.ndarray, bps: int) -> None:
    n = len(sig)
    sig = sig.astype(np.int64)
    if n and bool((sig == sig[0]).all()):
        w.write(0, 1)           # zero bit
        w.write(0b000000, 6)    # CONSTANT
        w.write(0, 1)           # no wasted bits
        w.write_signed(int(sig[0]), bps)
        return
    best_order, best_cost, best_res = None, None, None
    for order in range(min(4, n - 1) + 1):
        res = _fixed_residual(sig, order)
        cost = int(_zigzag(res).sum()) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    verbatim_bits = n * bps
    z = _zigzag(best_res)
    k = _rice_param_for(z)
    approx_res_bits = _rice_cost(z, k) + best_order * bps + 6
    if best_order is None or approx_res_bits >= verbatim_bits:
        w.write(0, 1)
        w.write(0b000001, 6)    # VERBATIM
        w.write(0, 1)
        for v in sig.tolist():
            w.write_signed(int(v), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | best_order, 6)   # FIXED, order
    w.write(0, 1)                        # no wasted bits
    for v in sig[:best_order].tolist():
        w.write_signed(int(v), bps)
    _write_residual(w, best_res, n, best_order)


def encode_flac(samples: np.ndarray, sample_rate: int, *,
                blocksize: int = 4096) -> bytes:
    """(n,) or (n, channels≤8) int16 → FLAC stream bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or not 1 <= samples.shape[1] <= 8:
        raise ValueError("expected (n,) or (n, channels<=8)")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("sample rate out of range")
    n_total, n_ch = samples.shape
    bps = 16
    md5 = hashlib.md5(
        np.ascontiguousarray(samples).astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO: last-block flag set (no other metadata blocks)
    info = _BitWriter()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)   # min frame size unknown
    info.write(0, 24)   # max frame size unknown
    info.write(sample_rate, 20)
    info.write(n_ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n_total, 36)
    body = info.getvalue() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n_total, blocksize) or [0]:
        block = samples[start:start + blocksize]
        bs = len(block)
        if bs == 0:
            break
        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)               # reserved
        h.write(0, 1)               # fixed-blocksize strategy
        h.write(0b0111, 4)          # blocksize-1 as 16 bits at end
        h.write(0b0000, 4)          # sample rate from STREAMINFO
        h.write(n_ch - 1, 4)        # independent channels
        h.write(0b100, 3)           # 16 bits per sample
        h.write(0, 1)               # reserved
        header = h.getvalue() + _utf8_coded_number(frame_no) \
            + struct.pack(">H", bs - 1)
        header += bytes([crc8(header)])
        fw = _BitWriter()
        for ch in range(n_ch):
            _encode_subframe(fw, block[:, ch], bps)
        fw.align()
        frame = header + fw.getvalue()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1
    if n_total == 0:
        pass  # zero-sample stream: metadata only, spec-valid
    return bytes(out)


# ---------------------------------------------------------------- decoding

_BLOCKSIZE_CODES = {0b0001: 192}
for _i in range(2, 6):
    _BLOCKSIZE_CODES[_i] = 576 << (_i - 2)
for _i in range(8, 16):
    _BLOCKSIZE_CODES[_i] = 256 << (_i - 8)

_RATE_CODES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}

_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("blocksize not divisible by partition count")
    part_n = blocksize >> porder
    if part_n <= order:
        raise ValueError("partition smaller than predictor order")
    res = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        count = part_n - (order if p == 0 else 0)
        k = r.read(plen)
        if k == escape:
            width = r.read(5)
            for i in range(count):
                res[pos + i] = r.read_signed(width) if width else 0
        else:
            for i in range(count):
                q = r.read_unary()
                v = (q << k) | (r.read(k) if k else 0)
                res[pos + i] = (v >> 1) ^ -(v & 1)   # un-zigzag
        pos += count
    return res


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    sftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if sftype == 0:                      # CONSTANT
        sig = np.full(blocksize, r.read_signed(bps), dtype=np.int64)
    elif sftype == 1:                    # VERBATIM
        sig = np.array([r.read_signed(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= sftype <= 12:              # FIXED order 0-4
        order = sftype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        sig = _fixed_reconstruct(np.array(warm, dtype=np.int64), res)
    elif sftype >= 32:                   # LPC, order 1-32
        order = sftype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        sig = np.empty(blocksize, dtype=np.int64)
        sig[:order] = warm
        c = np.array(coefs, dtype=np.int64)[::-1]
        for i in range(order, blocksize):
            pred = int(np.dot(c, sig[i - order:i])) >> shift
            sig[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved subframe type {sftype}")
    if wasted:
        sig = sig << wasted
    return sig


def _fixed_reconstruct(warm: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Exact fixed-predictor reconstruction: order-k residual is the k-th
    difference, so rebuild by k successive cumsums seeded from the
    warm-up samples' own difference pyramid."""
    order = len(warm)
    if order == 0:
        return res.copy()
    # difference pyramid of the warm-ups: diffs[j] = j-th difference
    seeds = []
    d = warm.astype(np.int64)
    for j in range(order):
        seeds.append(d[-1])
        d = np.diff(d)
    # seeds[j] = last value of the j-th difference of the warm-ups
    sig = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        sig = np.cumsum(np.concatenate([[seeds[j]], sig]))[1:]
    return np.concatenate([warm, sig])


def decode_flac(payload: bytes) -> "tuple[int, np.ndarray]":
    """FLAC bytes → (sample_rate, (n, channels) int16). Verifies frame
    CRCs and the STREAMINFO MD5; raises ValueError on any mismatch."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            n_ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, n_ch, bps, total, md5)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, n_ch, bps, total, md5 = info
    channels = [[] for _ in range(n_ch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad frame sync")
        if r.read(1):
            raise ValueError("reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame bit set")
        _read_utf8_coded_number(r)
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError("reserved blocksize code")
        if rate_code == 0b1100:
            r.read(8)
        elif rate_code in (0b1101, 0b1110):
            r.read(16)
        elif rate_code != 0 and rate_code not in _RATE_CODES:
            raise ValueError("invalid sample-rate code")
        frame_bps = _BPS_CODES[bps_code] if bps_code else bps
        header_len = r.byte_pos - frame_start
        expect_crc8 = crc8(payload[frame_start:frame_start + header_len])
        if r.read(8) != expect_crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            n_sub = ch_code + 1
            if n_sub != n_ch:
                raise ValueError("channel count mismatch")
            subs = [_decode_subframe(r, blocksize, frame_bps)
                    for _ in range(n_sub)]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if n_ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # side channel carries one extra bit (RFC 9639 §9.2.2)
            a = _decode_subframe(
                r, blocksize, frame_bps + (1 if ch_code == 0b1001 else 0))
            b = _decode_subframe(
                r, blocksize, frame_bps + (0 if ch_code == 0b1001 else 1))
            if ch_code == 0b1000:        # left-side
                subs = [a, a - b]
            elif ch_code == 0b1001:      # right-side
                subs = [a + b, b]
            else:                        # mid-side
                side = b
                mid = (a << 1) | (side & 1)
                subs = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        frame_body_end = r.byte_pos
        expect_crc16 = crc16(payload[frame_start:frame_body_end])
        stored = struct.unpack_from(">H", payload, frame_body_end)[0]
        if stored != expect_crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = frame_body_end + 2
        take = blocksize if total == 0 else min(blocksize, total - got)
        for ch in range(n_ch):
            channels[ch].append(subs[ch][:take])
        got += take
    if total and got != total:
        raise ValueError("truncated FLAC stream")
    if got:
        stacked = np.stack(
            [np.concatenate(c) for c in channels], axis=1)
    else:
        stacked = np.zeros((0, n_ch), dtype=np.int64)
    if bps == 16:
        lo = np.iinfo(np.int16)
        if stacked.size and (stacked.min() < lo.min or stacked.max() > lo.max):
            raise ValueError("decoded sample out of 16-bit range")
        out = stacked.astype(np.int16)
        calc = hashlib.md5(
            np.ascontiguousarray(out).astype("<i2").tobytes()).digest()
        if md5 != b"\x00" * 16 and calc != md5:
            raise ValueError("STREAMINFO MD5 mismatch")
        return rate, out
    raise ValueError(f"unsupported bits-per-sample {bps}")
