"""Deterministic paged binary container ("FPDF") — the PDF stand-in.

Real PDF rasterization/OCR backends (pdfium / poppler / Tesseract — reference
``src/TypeConverter/TypeConverter.class.js:124-191``, ``src/PdfUtil/
PdfUtil.class.js:107-164``) are not installable in this sandbox, so multi-page
binary payloads travel in a trivial deterministic container the fallback
extractor parses (FIXTURES.md §1). The Ray-side plumbing — binary column,
1→N page fan-out, page_count probe, per-row error quarantine — is identical to
what a pdfium/Tesseract-backed extractor needs; only ``unpack`` would change.

Layout (all integers big-endian uint32):
    b"FPDF" | version=1 | page_count | per page: [byte_len | utf-8 text]
"""

from __future__ import annotations

import struct

MAGIC = b"FPDF"
VERSION = 1


def pack(pages: list[str]) -> bytes:
    """Serialize page texts into the container."""
    out = [MAGIC, struct.pack(">II", VERSION, len(pages))]
    for text in pages:
        raw = text.encode("utf-8")
        out.append(struct.pack(">I", len(raw)))
        out.append(raw)
    return b"".join(out)


def page_count(payload: bytes) -> int:
    """Header-only page-count probe (the getNumPages analogue,
    PdfUtil.class.js:107-132 — errors map to 0, not an exception)."""
    try:
        if payload[:4] != MAGIC:
            return 0
        version, n = struct.unpack(">II", payload[4:12])
        return n if version == VERSION else 0
    except Exception:
        return 0


def unpack(payload: bytes) -> list[str]:
    """Decode all page texts. Raises ValueError on a corrupt payload
    (callers quarantine per-row — skip-don't-fail, SURVEY.md §4)."""
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    version, n = struct.unpack(">II", payload[4:12])
    if version != VERSION:
        raise ValueError(f"unsupported version {version}")
    pages: list[str] = []
    off = 12
    for _ in range(n):
        if off + 4 > len(payload):
            raise ValueError("truncated header")
        (ln,) = struct.unpack(">I", payload[off : off + 4])
        off += 4
        if off + ln > len(payload):
            raise ValueError("truncated page")
        pages.append(payload[off : off + ln].decode("utf-8"))
        off += ln
    return pages
