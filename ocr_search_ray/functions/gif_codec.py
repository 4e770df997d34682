"""Pure-python GIF89a codec — the engine's real COMPRESSED image format.

``media_codecs`` proves the multimodal plumbing on raw formats (BMP24,
WAV-PCM16); this module adds a genuinely compressed codec, from scratch
from the public GIF89a specification: palette quantization + variable-
width LSB-first LZW with clear/EOI codes, dictionary growth to 12 bits
and mid-stream resets — both directions, so the decoder is exercised on
real LZW streams the encoder synthesizes (the ``officetext`` pack+extract
pattern). No external codec library anywhere.

Scope: global-color-table GIFs with ≤256 distinct colors, single-frame
(``encode_gif``/``decode_gif``) or ANIMATED full-frame-replacement
(``encode_gif_frames``/``decode_gif_frames`` with per-frame Graphic
Control delays) — the shapes the media pipeline synthesizes.
Interlacing, local palettes, transparency and partial-frame disposal
are out of scope and rejected loudly.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_BITS = 12
_MAX_DICT = 1 << _MAX_CODE_BITS


def _palette(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (k,3) uint8, indices (h,w) int32) — exact quantization;
    images with > 256 distinct colors are a caller error for this codec."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(palette)}")
    return palette.astype(np.uint8), inverse.reshape(h, w).astype(np.int32)


class _BitWriter:
    """LSB-first bit packer (the GIF LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.cur & ((1 << width) - 1)
        self.cur >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh() -> tuple[dict, int, int]:
        return ({(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1)

    table, next_code, width = fresh()
    bw.write(clear, width)
    seq: tuple[int, ...] = ()
    for sym in indices.ravel().tolist():
        cand = seq + (sym,)
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # GIF widens when the NEXT code to assign no longer fits
        if next_code - 1 == (1 << width) and width < _MAX_CODE_BITS:
            width += 1
        if next_code >= _MAX_DICT:
            bw.write(clear, width)
            table, next_code, width = fresh()
        seq = (sym,)
    if seq:
        bw.write(table[seq], width)
    # The decoder appends one table entry upon reading that FINAL data
    # code (its appends lag the encoder's assigns by one code, and the
    # flush write closes the lag), so its table size becomes exactly
    # next_code BEFORE it reads EOI — and it widens if that hits the
    # width boundary. Mirror it, or the EOI is written one bit narrower
    # than the decoder reads it (hypothesis-found: 12px, 3 colors, the
    # final assign landing on 2^width - 1).
    if next_code > eoi + 1 and next_code == (1 << width) \
            and width < _MAX_CODE_BITS:
        width += 1
    bw.write(eoi, width)
    return bw.finish()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = np.empty(n_expected, dtype=np.int32)
    n_out = 0

    def fresh() -> tuple[list, int]:
        return ([(i,) for i in range(clear)] + [(), ()], min_code_size + 1)

    table, width = fresh()
    prev: tuple[int, ...] | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("GIF: corrupt LZW code")
        if n_out + len(entry) > n_expected:
            raise ValueError("GIF: more pixels than the descriptor declares")
        out[n_out:n_out + len(entry)] = entry
        n_out += len(entry)
        if prev is not None and len(table) == (1 << width) \
                and width < _MAX_CODE_BITS:
            width += 1
        prev = entry
    if n_out != n_expected:
        raise ValueError(f"GIF: decoded {n_out} pixels, expected {n_expected}")
    return out


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → single-frame GIF89a bytes (global palette, real
    LZW compression)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3)")
    h, w, _ = img.shape
    palette, indices = _palette(img)
    # palette table size: 2^(n+1) entries, smallest that fits
    n = 0
    while (2 << n) < len(palette):
        n += 1
    table_len = 2 << n
    min_code_size = max(2, n + 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | n)  # global table, 8-bit color res, size n
    out += b"\x00\x00"               # bg index, aspect
    out += palette.tobytes()
    out += b"\x00\x00\x00" * (table_len - len(palette))
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Single-frame GIF87a/89a bytes → (h, w, 3) uint8."""
    try:
        return _decode_gif(payload)
    except (struct.error, IndexError) as e:
        # truncated header/descriptor/sub-block walk — same loud contract
        # as a truncated LZW stream
        raise ValueError(f"GIF: truncated structure ({e})") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    palette = None
    if packed & 0x80:
        table_len = 2 << (packed & 0x07)
        palette = np.frombuffer(
            payload, np.uint8, table_len * 3, pos).reshape(-1, 3)
        pos += table_len * 3
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: no image descriptor")
        block = payload[pos]
        if block == 0x2C:
            pos += 1
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block == 0x3B:
            raise ValueError("GIF: trailer before any image")
        raise ValueError(f"GIF: unexpected block 0x{block:02x}")
    left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
    ipacked = payload[pos + 8]
    pos += 9
    if (left, top, iw, ih) != (0, 0, w, h):
        raise ValueError("GIF: sub-rectangle frames out of scope")
    if ipacked & 0x80:
        raise ValueError("GIF: local color tables out of scope")
    if ipacked & 0x40:
        raise ValueError("GIF: interlacing out of scope")
    if palette is None:
        raise ValueError("GIF: no color table")
    min_code_size = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        size = payload[pos]
        pos += 1
        if size == 0:
            break
        lzw += payload[pos:pos + size]
        pos += size
    indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
    return palette[indices].reshape(h, w, 3)


def encode_gif_frames(frames: "list[np.ndarray]", delay_ms: int = 100) -> bytes:
    """list of (h, w, 3) uint8 frames → ANIMATED GIF89a bytes: one global
    palette over all frames (≤256 colors total), a Graphic Control
    Extension per frame carrying ``delay_ms`` (centisecond granularity),
    full-frame replacement (no partial disposal). The multi-frame form of
    ``encode_gif`` — real video-kind container bytes for the frame
    sampler."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(palette)}")
    palette = palette.astype(np.uint8)
    n = 0
    while (2 << n) < len(palette):
        n += 1
    table_len = 2 << n
    min_code_size = max(2, n + 1)
    delay_cs = max(0, delay_ms // 10)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | n)
    out += b"\x00\x00"
    out += palette.tobytes()
    out += b"\x00\x00\x00" * (table_len - len(palette))
    per_frame = h * w
    for i in range(len(frames)):
        # Graphic Control Extension: disposal=1 (leave), no transparency
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) \
            + b"\x00"
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code_size)
        idx = inverse[i * per_frame:(i + 1) * per_frame].astype(np.int32)
        lzw = _lzw_encode(idx, min_code_size)
        for j in range(0, len(lzw), 255):
            block = lzw[j:j + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> "tuple[list[int], list[np.ndarray]]":
    """Animated (or single-frame) GIF bytes → (per-frame delay_ms list,
    list of (h, w, 3) uint8 frames). Same scope guards as ``decode_gif``
    (global palette, full-frame images, no interlace)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    palette = None
    if packed & 0x80:
        table_len = 2 << (packed & 0x07)
        palette = np.frombuffer(
            payload, np.uint8, table_len * 3, pos).reshape(-1, 3)
        pos += table_len * 3
    if palette is None:
        raise ValueError("GIF: no color table")
    delays: list[int] = []
    frames: list[np.ndarray] = []
    pending_delay = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                pending_delay = struct.unpack_from(
                    "<H", payload, pos + 2)[0] * 10
                pos += 1 + size
            # Non-GCE extensions (NETSCAPE application, comment, plain-text)
            # fall through to the common sub-block skip below, which also
            # consumes the 0x00 block terminator — mirroring decode_gif.
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        ipacked = payload[pos + 9]
        pos += 10
        if (left, top, iw, ih) != (0, 0, w, h):
            raise ValueError("GIF: sub-rectangle frames out of scope")
        if ipacked & 0x80:
            raise ValueError("GIF: local color tables out of scope")
        if ipacked & 0x40:
            raise ValueError("GIF: interlacing out of scope")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            lzw += payload[pos:pos + size]
            pos += size
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        frames.append(palette[indices].reshape(h, w, 3))
        delays.append(pending_delay)
        pending_delay = 0
    if not frames:
        raise ValueError("GIF: no frames")
    return delays, frames
