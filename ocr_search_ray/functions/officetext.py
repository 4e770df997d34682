"""Real office-container (OPC zip+XML) text pack/extract — stdlib only.

O1/O2 close-out (VERDICT r3 #4): the reference converts pptx/docx through
LibreOffice before the pdf chain (``src/TypeConverter/TypeConverter.class.
js:24-117``). pptx and docx are OPC packages — a zip holding
``word/document.xml`` (WordprocessingML) or ``ppt/slides/slideN.xml``
(DrawingML text bodies) — so a genuine text extractor needs only
``zipfile`` + ``ElementTree``, the same pure-stdlib pattern that closed O4
for real PDFs (``functions/pdftext.py``). This module therefore handles
REAL .docx/.pptx files; the ``fakeoffice`` stand-in remains only for
hermetic failure-path fixtures.

Pack side: minimal valid OPC containers ([Content_Types].xml, _rels/.rels,
document/slide parts), deterministic bytes (fixed zip timestamps, stored
order) — used by tests and the contract corpus so round-trips are exact.
CR characters are emitted as ``&#13;`` so XML line-ending normalization
cannot corrupt the round-trip.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"

_CT_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>{overrides}'
    "</Types>"
)
_RELS_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="{target}"/>'
    "</Relationships>"
)


def _esc(text: str) -> str:
    """XML text-node escape, plus ``\\r`` as a char ref (a literal CR would
    be normalized to LF by any conforming parser)."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\r", "&#13;")
    )


def _zip_parts(parts: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def _w_paragraphs(text: str) -> str:
    out = []
    for para in text.split("\n"):
        out.append(
            f'<w:p><w:r><w:t xml:space="preserve">{_esc(para)}</w:t>'
            "</w:r></w:p>"
        )
    return "".join(out)


def pack_docx(text: str) -> bytes:
    """text → a minimal valid .docx (one ``<w:p>`` per line)."""
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        f"{_w_paragraphs(text)}</w:body></w:document>"
    )
    ct = _CT_XML.format(
        overrides='<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/>'
    )
    return _zip_parts(
        [
            ("[Content_Types].xml", ct.encode()),
            ("_rels/.rels",
             _RELS_XML.format(target="word/document.xml").encode()),
            ("word/document.xml", doc.encode()),
        ]
    )


def pack_pptx(slides: list[str]) -> bytes:
    """slide texts → a minimal valid .pptx (one ``<a:p>`` per line within
    each slide's single text body)."""
    slides = slides or [""]
    overrides = [
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'presentation.main+xml"/>'
    ]
    parts: list[tuple[str, bytes]] = []
    slide_rels = []
    for i, slide in enumerate(slides, start=1):
        paras = "".join(
            f'<a:p><a:r><a:t>{_esc(p)}</a:t></a:r></a:p>'
            for p in slide.split("\n")
        )
        sld = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{P_NS}" xmlns:a="{A_NS}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody><a:bodyPr/>{paras}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
        parts.append((f"ppt/slides/slide{i}.xml", sld.encode()))
        overrides.append(
            f'<Override PartName="/ppt/slides/slide{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.presentationml.'
            'slide+xml"/>'
        )
        slide_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/slide\" "
            f'Target="slides/slide{i}.xml"/>'
        )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{P_NS}"><p:sldIdLst>'
        + "".join(
            f'<p:sldId id="{255 + i}" r:id="rId{i}" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships"/>'
            for i in range(1, len(slides) + 1)
        )
        + "</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">' + "".join(slide_rels) + "</Relationships>"
    )
    return _zip_parts(
        [
            ("[Content_Types].xml",
             _CT_XML.format(overrides="".join(overrides)).encode()),
            ("_rels/.rels",
             _RELS_XML.format(target="ppt/presentation.xml").encode()),
            ("ppt/presentation.xml", pres.encode()),
            ("ppt/_rels/presentation.xml.rels", pres_rels.encode()),
        ]
        + parts
    )


def kind_of(payload: bytes | None) -> str | None:
    """'docx' / 'pptx' for a real OPC container, else None. Cheap: zip
    magic first, then a namelist probe (no part is inflated)."""
    if payload is None or payload[:4] != b"PK\x03\x04":
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = set(zf.namelist())
    except Exception:
        return None
    if "word/document.xml" in names:
        return "docx"
    if any(n.startswith("ppt/slides/slide") for n in names):
        return "pptx"
    return None


def _runs_text(el, t_tag: str, br_tag: str | None = None,
               tab_tag: str | None = None) -> str:
    parts: list[str] = []
    for node in el.iter():
        if node.tag == t_tag:
            parts.append(node.text or "")
        elif br_tag and node.tag == br_tag:
            parts.append("\n")
        elif tab_tag and node.tag == tab_tag:
            parts.append("\t")
    return "".join(parts)


def extract_docx_text(payload: bytes) -> str:
    """word/document.xml → text: one line per ``<w:p>``; ``<w:br/>`` →
    newline, ``<w:tab/>`` → tab (foreign docx compatibility)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    paras = [
        _runs_text(p, f"{{{W_NS}}}t", f"{{{W_NS}}}br", f"{{{W_NS}}}tab")
        for p in root.iter(f"{{{W_NS}}}p")
    ]
    return "\n".join(paras)


def extract_pptx_slides(payload: bytes) -> list[str]:
    """ppt/slides/slideN.xml (numeric order) → one text per slide: one
    line per ``<a:p>``, runs concatenated."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        slide_names = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
        )
        out = []
        for name in slide_names:
            root = ET.fromstring(zf.read(name))
            paras = [
                _runs_text(p, f"{{{A_NS}}}t")
                for p in root.iter(f"{{{A_NS}}}p")
            ]
            out.append("\n".join(paras))
    return out
