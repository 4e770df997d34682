"""O15 path algebra — JS replace-first semantics, all 10 conversions."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_search_ray.functions.pathconvert import PathConvert

PC = PathConvert()


def test_all_ten_conversions_roundtrip():
    assert PC.pptx_to_pdf("data/pptx/deck.pptx") == "data/pdf/deck.pdf"
    assert PC.pptx_to_png_dir("data/pptx/deck.pptx") == "data/png/deck"
    assert PC.docx_to_pdf("data/docx/doc.docx") == "data/pdf/doc.pdf"
    assert PC.docx_to_png_dir("data/docx/doc.docx") == "data/png/doc"
    assert PC.pdf_to_pptx("data/pdf/deck.pdf") == "data/pptx/deck.pptx"
    assert PC.pdf_to_docx("data/pdf/doc.pdf") == "data/docx/doc.docx"
    assert PC.pdf_to_png_dir("data/pdf/doc.pdf") == "data/png/doc"
    assert PC.png_dir_to_pptx("data/png/deck") == "data/pptx/deck.pptx"
    assert PC.png_dir_to_docx("data/png/doc") == "data/docx/doc.docx"
    assert PC.png_dir_to_pdf("data/png/doc") == "data/pdf/doc.pdf"


def test_replace_first_only_js_semantics():
    """JS String.replace(string, string) touches the FIRST occurrence; a
    path containing the token twice keeps the second one. Bug-compatible
    by design (PathConvert.const.js:20-23)."""
    assert (
        PC.pptx_to_pdf("data/pptx/archive/data/pptx/deck.pptx")
        == "data/pdf/archive/data/pptx/deck.pdf"
    )
    # '.pptx' replaced at its first occurrence even mid-name
    assert (
        PC.pptx_to_pdf("data/pptx/a.pptx.bak.pptx")
        == "data/pdf/a.pdf.bak.pptx"
    )


def test_column_variant_matches_scalar():
    paths = [
        "data/pptx/deck.pptx",
        "data/pptx/archive/data/pptx/deck.pptx",
        "data/pptx/a.pptx.bak.pptx",
        "unrelated/path.txt",
    ]
    col = pa.array(paths, pa.string())
    for src, dst in [("pptx", "pdf"), ("pptx", "png_dir")]:
        got = PC.convert_column(col, src, dst).to_pylist()
        assert got == [PC.convert(p, src, dst) for p in paths]
    # dir→file append path
    dirs = pa.array(["data/png/deck", "data/png/x/y"], pa.string())
    got = PC.convert_column(dirs, "png_dir", "pdf").to_pylist()
    assert got == [PC.png_dir_to_pdf(p) for p in dirs.to_pylist()]


def test_invalid_conversions_rejected():
    with pytest.raises(ValueError):
        PC.convert("x", "pptx", "pptx")
    with pytest.raises(ValueError):
        PC.convert("x", "gif", "pdf")
