"""Real OPC (zip+XML) office containers: pack/extract round-trips, magic
routing, and the O1/O2 chain end-to-end through FormatNormalizer →
extract_pages — the real-container analogue of test_pdf_backend.py."""

from __future__ import annotations

import zipfile

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions import officetext


def test_docx_roundtrip_exact():
    cases = [
        "hello world",
        "",
        "line one\nline two\n\nline four",
        "escapes & <tags> > amp",
        "tabs\tand\rcarriage",  # CR survives via &#13;
        "x" * 1000,
    ]
    for text in cases:
        payload = officetext.pack_docx(text)
        assert payload[:4] == b"PK\x03\x04"
        assert officetext.kind_of(payload) == "docx"
        assert officetext.extract_docx_text(payload) == text, repr(text)


def test_pptx_roundtrip_exact_and_slide_order():
    slides = [f"slide {i}\nsecond line {i}" for i in range(1, 13)]
    payload = officetext.pack_pptx(slides)
    assert officetext.kind_of(payload) == "pptx"
    # 12 slides: numeric (not lexicographic) ordering matters
    assert officetext.extract_pptx_slides(payload) == slides
    assert officetext.extract_pptx_slides(officetext.pack_pptx([])) == [""]


def test_pack_is_deterministic():
    assert officetext.pack_docx("abc") == officetext.pack_docx("abc")
    assert officetext.pack_pptx(["a", "b"]) == officetext.pack_pptx(["a", "b"])


def test_kind_of_rejects_non_office():
    from ocr_search_ray.functions import fakeoffice

    assert officetext.kind_of(None) is None
    assert officetext.kind_of(b"<html></html>") is None
    assert officetext.kind_of(b"%PDF-1.4 ...") is None
    assert officetext.kind_of(fakeoffice.pack("x", "pptx")) is None
    # a zip that is not an OPC office package
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "nope")
    assert officetext.kind_of(buf.getvalue()) is None
    # truncated zip → None, not an exception
    assert officetext.kind_of(b"PK\x03\x04garbage") is None


def test_foreign_docx_br_and_tab_elements():
    """Hand-built document.xml using <w:br/> and <w:tab/> (as real Word
    output does) — extraction must map them to \\n and \\t."""
    import io

    w = officetext.W_NS
    doc = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t><w:tab/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert officetext.extract_docx_text(buf.getvalue()) == "a\nb\tc"


def test_normalize_chain_real_containers_end_to_end():
    """Real .docx / .pptx payloads through the Ray chain: FormatNormalizer
    (magic routing, OfficeXmlConverter) → extract_pages; a corrupt zip
    quarantines, everything else converts (TypeConverter.class.js:24-117
    semantics)."""
    from ocr_search_ray.stages.extract import extract_pages
    from ocr_search_ray.stages.normalize import normalize_formats

    import io

    long_text = "word " * 120  # 600 chars → 3 pdf pages
    slides = ["alpha slide", "beta slide", "gamma slide"]
    # a VALID zip that routes as docx but whose document part is broken
    # XML — the conversion itself fails → quarantine row (an unreadable
    # zip never routes as office and passes through instead)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document><unclosed")
    corrupt = buf.getvalue()
    web = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    ["https://x.org/a.docx", "https://x.org/b.pptx",
                     "https://x.org/c.docx", "https://x.org/plain"]
                ),
                "warc_ts": pa.array([0, 0, 0, 0], pa.timestamp("us")),
                "html": pa.array(
                    [officetext.pack_docx(long_text),
                     officetext.pack_pptx(slides), corrupt, None],
                    pa.binary(),
                ),
                "text": pa.array([None, None, None, "pre-extracted"],
                                 pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
            }
        )
    )
    normalized = normalize_formats(web).materialize()
    status = {r["url"]: (r["src_kind"], r["conv_status"])
              for r in normalized.take_all()}
    assert status["https://x.org/a.docx"] == ("docx", "converted")
    assert status["https://x.org/b.pptx"] == ("pptx", "converted")
    assert status["https://x.org/c.docx"][1] == "error"  # corrupt zip
    assert status["https://x.org/plain"] == ("other", "passthrough")

    pages = normalized.select_columns(
        ["url", "warc_ts", "html", "text", "lang"]
    ).map_batches(extract_pages, batch_format="pyarrow").take_all()
    by_url: dict[str, list] = {}
    for r in pages:
        by_url.setdefault(r["url"], []).append(r)
    a = sorted(by_url["https://x.org/a.docx"], key=lambda r: r["page_idx"])
    assert [r["page_count"] for r in a] == [3, 3, 3]
    assert "".join(r["text"] for r in a) == long_text
    b = sorted(by_url["https://x.org/b.pptx"], key=lambda r: r["page_idx"])
    assert [r["text"] for r in b] == slides  # one page per slide
    # the quarantine marker is conv_status='error' (asserted above); the
    # nulled payload then surfaces downstream as one empty page row
    (c,) = by_url["https://x.org/c.docx"]
    assert c["status"] == "empty" and c["text"] == ""
    assert c["page_count"] == 1
