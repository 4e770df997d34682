"""Deterministic office-document container stand-in (pptx/docx).

The reference converts pptx/docx to PDF through a pinned LibreOffice
instance before the PDF chain runs (``src/TypeConverter/TypeConverter.
class.js:24-117``). The sandbox has no LibreOffice, so this module defines a
hermetic container the FormatNormalizer stage can route and convert
deterministically — same role as ``fakepdf`` for the PDF chain: the Ray
plumbing (magic-byte routing, pinned converter state, timeout, quarantine)
is real; only the byte format is a stand-in.

Layout: ``MAGIC_PPTX|MAGIC_DOCX (4 bytes) + utf-8 text``.
"""

from __future__ import annotations

MAGIC_PPTX = b"FPT1"
MAGIC_DOCX = b"FDC1"
_MAGICS = {"pptx": MAGIC_PPTX, "docx": MAGIC_DOCX}


def pack(text: str, kind: str) -> bytes:
    """Serialize ``text`` as a fake office container of ``kind``."""
    return _MAGICS[kind] + text.encode("utf-8")


def kind_of(payload: bytes | None) -> str | None:
    """pptx/docx if the payload carries an office magic, else None."""
    if payload is None:
        return None
    for kind, magic in _MAGICS.items():
        if payload[:4] == magic:
            return kind
    return None


def unpack(payload: bytes) -> str:
    """Inverse of :func:`pack`. Raises on wrong magic / undecodable body."""
    if kind_of(payload) is None:
        raise ValueError("not a fake office container")
    return payload[4:].decode("utf-8")
