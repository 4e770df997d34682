"""S8 page-image artifacts: PNG codec round-trip, glyph-raster text
round-trip, atomic idempotent sink, and the e2e contract the reference
serves — a search hit's img_path resolves to a real image of that page
(TypeConverter.class.js:124-191 + ApiHandler.const.js:49-58)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_search_ray.functions.raster import (
    decode_png,
    encode_png,
    read_page_text,
    render_page_text,
)


def test_png_roundtrip_and_signature():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 61), dtype=np.uint8)
    png = encode_png(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in png and b"IDAT" in png and png.endswith(
        b"IEND\xaeB`\x82")
    back = decode_png(png)
    assert back.shape == img.shape and (back == img).all()


def test_render_read_page_text_roundtrip():
    text = "Hello, world!\nSecond line with  spaces\n\nfourth"
    img = render_page_text(text, cols=40, max_lines=8)
    assert img.dtype == np.uint8 and img.ndim == 2
    assert read_page_text(img) == text

    # wrapping: a long line splits at cols and still round-trips
    long = "x" * 95
    got = read_page_text(render_page_text(long, cols=40, max_lines=8))
    assert got.replace("\n", "") == long

    # non-ASCII renders as DEL placeholders (documented lossy path)
    lossy = read_page_text(render_page_text("abc中", cols=10, max_lines=2))
    assert lossy == "abc\x7f"


def test_rasterize_pages_sink_idempotent_and_skips_quarantine(tmp_path):
    from ocr_search_ray.stages.raster import rasterize_pages

    art = str(tmp_path / "png")
    pages = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2", "d3"]),
                "text": pa.array(["page one", "page two", ""]),
                "status": pa.array(["ok", "error", "empty"]),
            }
        )
    )
    rows = {r["doc_id"]: r for r in rasterize_pages(pages, art).take_all()}
    assert rows["d1"]["status"] == "ok" and rows["d1"]["bytes_written"] > 0
    assert rows["d2"]["status"] == "skipped"
    assert rows["d3"]["status"] == "ok"  # empty page still gets an artifact
    files = sorted(os.path.basename(f) for f in glob.glob(f"{art}/*.png"))
    assert files == ["d1.png", "d3.png"]
    with open(os.path.join(art, "d1.png"), "rb") as f:
        first = f.read()

    # idempotent rerun: identical bytes, no leftovers
    rasterize_pages(pages, art).materialize()
    with open(os.path.join(art, "d1.png"), "rb") as f:
        assert f.read() == first
    assert not glob.glob(f"{art}/*.tmp")


def test_search_hit_img_path_resolves_to_page_image(tmp_path):
    """End to end: ingest → rasterize → search → the hit's img_path reads
    back from the artifact store and its PIXELS decode to the hit's page
    text — the render contract the reference's static server fulfills."""
    from ocr_search_ray.pipelines.ingest import ingest
    from ocr_search_ray.sources.webpages import read_webpages
    from ocr_search_ray.stages.raster import rasterize_pages
    from ocr_search_ray.stages.search import search

    art = str(tmp_path / "png")
    stages = ingest(read_webpages("/root/testdata/sf0.001"))
    pages = stages["pages"].materialize()
    written = rasterize_pages(pages, art).materialize()
    n_ok = written.filter(lambda r: r["status"] == "ok").count()
    assert n_ok == pages.count()  # no quarantine rows at sf0.001

    hits = search(stages["postings"], pages, "Spark MERGE data!",
                  max_return=3)
    assert hits.num_rows == 3
    page_text = {
        r["doc_id"]: r["text"]
        for r in pages.take_all()
    }
    from ocr_search_ray.stages.raster import read_page_image

    for i in range(hits.num_rows):
        img_path = hits.column("img_path")[i].as_py()
        did = hits.column("doc_id")[i].as_py()
        assert img_path == f"{did}.png"
        # the GET /pageImg/<imgPath> equivalent (ApiHandler.const.js:49-58)
        img = decode_png(read_page_image(art, img_path))
        got = read_page_text(img)
        # exact pixel-level contract: the artifact decodes to precisely
        # what rendering this page's text produces (wrap/cap included)
        expect = read_page_text(render_page_text(page_text[did]))
        assert got == expect and got


def test_packed_artifact_layout_point_lookup(tmp_path):
    """The scale layout: PNGs packed as a binary parquet column in doc-id
    hash buckets; a point lookup opens only its bucket and returns bytes
    identical to the flat layout's file."""
    from ocr_search_ray.stages.raster import (
        rasterize_pages,
        rasterize_pages_packed,
        read_page_image,
        read_page_image_packed,
    )

    flat = str(tmp_path / "flat")
    packed = str(tmp_path / "packed")
    pages = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"doc{i}" for i in range(30)] + ["bad"]),
                "text": pa.array([f"page text {i}" for i in range(30)]
                                 + [""]),
                "status": pa.array(["ok"] * 30 + ["error"]),
            }
        )
    )
    rasterize_pages(pages, flat).materialize()
    rasterize_pages_packed(pages, packed, n_buckets=8)
    assert len(glob.glob(f"{packed}/png_bucket=*")) > 1

    for did in ("doc0", "doc7", "doc29"):
        assert read_page_image_packed(packed, did, n_buckets=8) == \
            read_page_image(flat, f"{did}.png")
    with pytest.raises(FileNotFoundError):
        read_page_image_packed(packed, "bad", n_buckets=8)  # quarantined
    with pytest.raises(FileNotFoundError):
        read_page_image_packed(packed, "missing", n_buckets=8)


def test_pillow_backend_is_import_guarded():
    from ocr_search_ray.functions.raster import PillowRasterBackend

    try:
        backend = PillowRasterBackend()
    except ImportError:
        return  # expected in this sandbox (no imaging library)
    img = backend.rasterize("hi")  # pragma: no cover — PIL present
    assert img.dtype == np.uint8 and img.ndim == 2
