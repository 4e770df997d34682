"""Pure-stdlib page rasterization: real PNG bytes for S8's image sink.

The reference rasterizes every pdf page to a PNG and serves it — the page
image IS what a search hit renders (``pdf2png``,
``src/TypeConverter/TypeConverter.class.js:124-191``; static serving,
``src/ApiServer/ApiHandler.const.js:49-58``). This sandbox ships no
poppler/pdfium/Pillow, so the hermetic backend renders the PAGE TEXT into
a real, spec-valid PNG raster (grayscale-8, zlib-compressed IDAT) using
deterministic information-preserving placeholder glyphs: each character
cell encodes its codepoint's low 7 bits as vertical bars, so the page text
round-trips from the PIXELS alone (``read_page_text``) — a stronger gate
than glyph aesthetics, which no test could pin anyway. A real deployment
swaps in a pdfium raster backend behind the same one-constructor-argument
seam as ``extract.PdfTextBackend`` did for O4.

PNG layout written: signature, IHDR (bit depth 8, color type 0), one IDAT
(filter 0 per scanline), IEND — readable by any PNG decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# glyph geometry (pixels)
CELL_W, CELL_H = 6, 10  # 5x7 glyph + 1px/3px padding
MARGIN = 4


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → PNG bytes (bit depth 8, color type 0)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8 grayscale")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 grayscale. Supports the subset this module
    writes (bit depth 8, color type 0, filter 0 scanlines); raises on
    anything else — it is a verification tool, not a general decoder."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, hh, depth, ctype = struct.unpack(">IIBB", data[:10])
            h = hh
            if depth != 8 or ctype != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, w + 1)
    if not (rows[:, 0] == 0).all():
        raise ValueError("unsupported PNG filter")
    return rows[:, 1:].copy()


def _wrap(text: str, cols: int, max_lines: int) -> list[str]:
    lines: list[str] = []
    for para in (text or "").split("\n"):
        if not para:
            lines.append("")
            continue
        for start in range(0, len(para), cols):
            lines.append(para[start:start + cols])
            if len(lines) >= max_lines:
                return lines
        if len(lines) >= max_lines:
            break
    return lines[:max_lines] or [""]


def render_page_text(text: str, *, cols: int = 80,
                     max_lines: int = 64) -> np.ndarray:
    """Page text → (h, w) uint8 raster, white background, dark glyphs.

    Glyph cells are decodable: column 0 of each 5x7 glyph carries the
    codepoint's bits 0..6 top-to-bottom (dark = 1), column 3 the inverted
    bits (visual distinction + parity check). Codepoints > 127 render as
    DEL (0x7F) — the decode side reports them as ``\\x7f``; the hermetic
    raster is a text artifact, not a unicode font engine."""
    lines = _wrap(text, cols, max_lines)
    width = cols * CELL_W + 2 * MARGIN
    height = len(lines) * CELL_H + 2 * MARGIN
    img = np.full((height, width), 255, dtype=np.uint8)
    for li, line in enumerate(lines):
        y0 = MARGIN + li * CELL_H
        for ci, ch in enumerate(line):
            c = ord(ch)
            if c > 0x7F:
                c = 0x7F
            x0 = MARGIN + ci * CELL_W
            for bit in range(7):
                on = (c >> bit) & 1
                if on:
                    img[y0 + bit, x0] = 0
                    img[y0 + bit, x0 + 1] = 64
                else:
                    img[y0 + bit, x0 + 3] = 0
    return img


def read_page_text(img: np.ndarray) -> str:
    """Inverse of :func:`render_page_text` — reconstruct the page text from
    the raster's pixels (trailing spaces / blank lines trimmed)."""
    height, width = img.shape
    cols = (width - 2 * MARGIN) // CELL_W
    n_lines = (height - 2 * MARGIN) // CELL_H
    out_lines = []
    for li in range(n_lines):
        y0 = MARGIN + li * CELL_H
        chars = []
        for ci in range(cols):
            x0 = MARGIN + ci * CELL_W
            c = 0
            for bit in range(7):
                if img[y0 + bit, x0] == 0:
                    c |= 1 << bit
            chars.append(chr(c) if c else " ")
        out_lines.append("".join(chars).rstrip())
    while out_lines and not out_lines[-1]:
        out_lines.pop()
    return "\n".join(out_lines)


class TextRasterBackend:
    """Hermetic raster backend. Contract (what a pdfium backend implements
    instead, from the page's source payload): ``rasterize(text) ->
    (h, w) uint8 ndarray``."""

    def __init__(self, *, cols: int = 80, max_lines: int = 64) -> None:
        self.cols = cols
        self.max_lines = max_lines

    def rasterize(self, text: str) -> np.ndarray:
        return render_page_text(text, cols=self.cols,
                                max_lines=self.max_lines)


class PillowRasterBackend(TextRasterBackend):
    """Optional adapter over Pillow when importable (import-guarded — this
    sandbox ships no imaging library, so the constructor raising
    ``ImportError`` is the expected path here). Renders real font glyphs;
    same seam, same output contract."""

    def __init__(self, *, cols: int = 80, max_lines: int = 64) -> None:
        super().__init__(cols=cols, max_lines=max_lines)
        from PIL import Image, ImageDraw  # noqa: F401 — availability gate

        self._Image = Image
        self._ImageDraw = ImageDraw

    def rasterize(self, text: str) -> np.ndarray:
        lines = _wrap(text, self.cols, self.max_lines)
        width = self.cols * CELL_W + 2 * MARGIN
        height = len(lines) * CELL_H + 2 * MARGIN
        im = self._Image.new("L", (width, height), 255)
        draw = self._ImageDraw.Draw(im)
        for li, line in enumerate(lines):
            draw.text((MARGIN, MARGIN + li * CELL_H), line, fill=0)
        return np.asarray(im, dtype=np.uint8)
