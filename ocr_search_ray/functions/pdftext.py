"""Minimal real-PDF text extraction — pure stdlib, no external engine.

The reference's binary-extraction chain is pdf→image→OCR
(``src/PdfUtil/PdfUtil.class.js:140-164``, ``TypeConverter.class.js:124-191``).
This module implements the DIRECT text channel of that contract for real
PDF files: parse the cross-referenced object graph, walk the page tree in
document order, FlateDecode content streams (stdlib ``zlib``), and read the
text-showing operators per page. It exists so the
:class:`~ocr_search_ray.stages.extract.PageExtractor` seam runs against
REAL ``%PDF-`` payloads end to end even in environments without
pdfium/Tesseract; a raster-OCR backend drops into the same seam
(``PdfTextBackend`` / ``PypdfBackend`` in ``stages/extract.py``).

Supported subset (deliberate, documented):
- classic xref or no xref (objects located by scanning ``N G obj``);
- uncompressed and ``/FlateDecode`` content streams (no predictors);
- page tree via ``/Root → /Pages → /Kids`` recursion, ``/Contents`` as a
  single ref or an array of refs;
- text operators ``Tj``, ``'``, ``\"`` and ``TJ`` (array form), literal
  ``( )`` strings with octal/char escapes and hex ``< >`` strings,
  1-byte encodings (latin-1); ``Td``/``TD``/``T*``/``ET`` break lines.
Out of scope: encryption, object streams (/ObjStm), CID/CMap fonts,
predictors. Out-of-scope constructs raise ``PdfParseError`` → the caller
quarantines the row (``status='error'``), never crashes the pipeline.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_REF_RE = {
    key: re.compile(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R")
    for key in (b"Root", b"Pages", b"Contents")
}
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")


class PdfParseError(ValueError):
    """Raised for malformed or out-of-subset PDF payloads."""


def _split_objects(data: bytes) -> dict[int, bytes]:
    """Map object number → raw object body (between ``obj`` and ``endobj``).

    Scanning beats xref-table walking for robustness: linearized,
    incrementally-updated and slightly-corrupt files still resolve; for
    duplicate object numbers the LAST occurrence wins (incremental-update
    semantics)."""
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end == -1:
            continue
        objects[int(m.group(1))] = data[m.end():end]
    if not objects:
        raise PdfParseError("no PDF objects found")
    return objects


def _stream_bytes(body: bytes) -> bytes | None:
    """Decoded stream content of an object body, or None if not a stream."""
    i = body.find(b"stream")
    if i == -1:
        return None
    j = i + len(b"stream")
    if body[j:j + 2] == b"\r\n":
        j += 2
    elif body[j:j + 1] in (b"\n", b"\r"):
        j += 1
    k = body.rfind(b"endstream")
    if k == -1:
        raise PdfParseError("unterminated stream")
    raw = body[j:k]
    # strip one trailing EOL the writer may pad before `endstream`
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw.endswith((b"\n", b"\r")):
        raw = raw[:-1]
    if b"/FlateDecode" in body[:i]:
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfParseError(f"bad Flate stream: {exc}") from exc
    if b"/Filter" in body[:i]:
        raise PdfParseError("unsupported stream filter")
    return raw


def _page_order(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in page-tree order (the order getNumPages /
    per-page OCR sees — SURVEY.md O3/O4)."""
    root = None
    for body in objects.values():
        m = _NAME_REF_RE[b"Root"].search(body)
        if m is not None and b"trailer" not in body[:m.start()].lower():
            root = int(m.group(1))
    if root is None:
        # trailer may not be inside an object body; scan catalog directly
        candidates = [
            num for num, body in objects.items()
            if b"/Type" in body and b"/Catalog" in body
        ]
        if not candidates:
            raise PdfParseError("no document catalog")
        root = candidates[-1]
    cat = objects.get(root)
    if cat is None:
        raise PdfParseError("dangling /Root reference")
    m = _NAME_REF_RE[b"Pages"].search(cat)
    if m is None:
        raise PdfParseError("catalog has no /Pages")
    pages: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64:
            raise PdfParseError("page tree too deep / cyclic")
        body = objects.get(num)
        if body is None:
            raise PdfParseError(f"dangling page-tree ref {num}")
        if _TYPE_PAGES_RE.search(body):
            kids = _KIDS_RE.search(body)
            if kids is None:
                raise PdfParseError("/Pages node without /Kids")
            for ref in _REF_RE.finditer(kids.group(1)):
                walk(int(ref.group(1)), depth + 1)
        elif _TYPE_PAGE_RE.search(body):
            pages.append(num)
        else:
            raise PdfParseError(f"object {num} is not a page-tree node")

    walk(int(m.group(1)))
    if not pages:
        raise PdfParseError("empty page tree")
    return pages


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Decode a ``(...)`` literal starting at the '(' — returns (text, end)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                oct_digits = chr(e)
                i += 1
                while (len(oct_digits) < 3 and i < n
                       and 0x30 <= data[i] <= 0x37):
                    oct_digits += chr(data[i])
                    i += 1
                out.append(chr(int(oct_digits, 8)))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        out.append(chr(c))
        i += 1
    raise PdfParseError("unterminated literal string")


def _hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i)
    if end == -1:
        raise PdfParseError("unterminated hex string")
    digits = re.sub(rb"\s", b"", data[i + 1:end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), end + 1


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_text(content: bytes) -> str:
    """Text of one page's content stream: shows concatenate; Td/TD/T*/', \"
    and ET start a new line (the deterministic layout convention this
    backend declares — a raster-OCR backend would produce engine-specific
    layout instead)."""
    lines: list[str] = [""]
    pending: list[str] = []  # strings shown since the last operator
    i, n = 0, len(content)

    def flush_shows() -> None:
        if pending:
            lines[-1] += "".join(pending)
            pending.clear()

    def newline() -> None:
        flush_shows()
        if lines[-1]:
            lines.append("")

    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _literal_string(content, i)
            pending.append(s)
        elif c == 0x3C and content[i:i + 2] != b"<<":  # <hex>
            s, i = _hex_string(content, i)
            pending.append(s)
        elif c == 0x3C:  # <<dict>>
            i += 2
        elif _OP_RE.match(content, i):
            m = _OP_RE.match(content, i)
            op = m.group(0)
            i = m.end()
            if op == b"Tj" or op == b"TJ":
                flush_shows()
            elif op in (b"'", b'"'):
                # show-on-next-line operators
                s = pending[-1:] or [""]
                pending.clear()
                if lines[-1]:
                    lines.append("")
                lines[-1] += "".join(s)
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                newline()
        else:
            i += 1
    flush_shows()
    return "\n".join(line for line in lines if line != "") if any(
        line for line in lines
    ) else ""


def extract_pdf_pages(payload: bytes) -> list[str]:
    """→ per-page extracted text, page-tree order. Raises
    :class:`PdfParseError` on malformed / out-of-subset input."""
    if payload[:5] != b"%PDF-":
        raise PdfParseError("not a PDF payload")
    objects = _split_objects(payload)
    texts: list[str] = []
    for num in _page_order(objects):
        body = objects[num]
        refs: list[int] = []
        m = _NAME_REF_RE[b"Contents"].search(body)
        if m is not None:
            refs = [int(m.group(1))]
        else:
            arr = re.search(
                rb"/Contents\s*\[((?:[^\[\]])*)\]", body
            )
            if arr is not None:
                refs = [int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))]
        parts: list[str] = []
        for ref in refs:
            target = objects.get(ref)
            if target is None:
                raise PdfParseError(f"dangling /Contents ref {ref}")
            stream = _stream_bytes(target)
            if stream is None:
                raise PdfParseError(f"/Contents object {ref} has no stream")
            parts.append(_content_text(stream))
        texts.append("\n".join(p for p in parts if p))
    return texts
