"""HTML main-content extraction + paged-binary decoding + page fan-out."""

import pyarrow as pa

from ocr_search_ray.functions import fakepdf
from ocr_search_ray.functions.html_extract import extract_main_text
from ocr_search_ray.sources.webpages import wrap_html
from ocr_search_ray.schemas import WEBPAGES
from ocr_search_ray.stages.extract import extract_pages


def _webpages_table(rows):
    cols = {name: [] for name in WEBPAGES.names}
    for r in rows:
        cols["url"].append(r["url"])
        cols["warc_ts"].append(r.get("warc_ts"))
        cols["html"].append(r.get("html"))
        cols["text"].append(r.get("text"))
        cols["lang"].append(r.get("lang", "en"))
    return pa.table(
        {n: pa.array(cols[n], WEBPAGES.field(n).type) for n in WEBPAGES.names}
    )


def test_html_roundtrip_byte_identical():
    for text in [
        "plain words here",
        "multi paragraph one\n\nand paragraph two",
        "entities & <tags> \"quoted\"",
        "  leading and trailing spaces  ",
        "unicode 中文 • bullets、",
    ]:
        extracted, status = extract_main_text(wrap_html(text))
        assert extracted == text
        assert status == "ok"


def test_boilerplate_fully_stripped():
    extracted, status = extract_main_text(wrap_html("real content"))
    assert "Home" not in extracted
    assert "newsletter" not in extracted
    assert "Terms" not in extracted
    assert "Read more" not in extracted  # link-density-1.0 <p> dropped
    assert "Example Site" not in extracted


def test_all_boilerplate_page_is_empty():
    extracted, status = extract_main_text(wrap_html(""))
    assert extracted == ""
    assert status == "empty"


def test_malformed_html_is_tolerated():
    text, status = extract_main_text(b"\xff\xfe not utf8 \x80")
    assert text == "" and status == "error"


def test_fakepdf_roundtrip_and_probe():
    pages = ["page one", "", "第三页 third"]
    payload = fakepdf.pack(pages)
    assert fakepdf.page_count(payload) == 3
    assert fakepdf.unpack(payload) == pages
    assert fakepdf.page_count(b"nope") == 0


def test_extract_fanout_and_quarantine():
    good_pdf = fakepdf.pack([f"page {i}" for i in range(1, 11)])  # 10 pages
    corrupt = fakepdf.MAGIC + b"\x00\x00\x00\x01\x00\x00\x00\x05" + b"\xff" * 2
    batch = _webpages_table(
        [
            {"url": "u/pdf", "html": good_pdf},
            {"url": "u/corrupt", "html": corrupt},
            {"url": "u/text", "text": "hello there"},
            {"url": "u/empty", "text": ""},
        ]
    )
    pages = extract_pages(batch)
    by_url = {}
    for r in pages.to_pylist():
        by_url.setdefault(r["url"], []).append(r)

    assert len(by_url["u/pdf"]) == 10
    # padding rule: 10 pages → width 2
    from ocr_search_ray.functions.hashing import doc_id as did
    assert by_url["u/pdf"][0]["doc_id"] == did("u/pdf", 1, 10)
    assert by_url["u/pdf"][0]["page_count"] == 10

    quarantined = by_url["u/corrupt"][0]
    assert quarantined["status"] == "error"
    assert quarantined["text"] == ""
    assert quarantined["page_count"] == 0

    assert by_url["u/text"][0]["status"] == "ok"
    assert by_url["u/text"][0]["text"] == "hello there"
    assert by_url["u/empty"][0]["status"] == "empty"


# ---------------------------------------------------------------- watchdog


def test_watchdog_unit_semantics():
    import threading
    import time

    import pytest

    from ocr_search_ray.functions.watchdog import (
        WatchdogTimeout,
        run_with_timeout,
    )

    assert run_with_timeout(lambda x: x + 1, 5.0, 41) == 42
    assert run_with_timeout(lambda: "ok", None) == "ok"

    def slow():
        t0 = time.monotonic()
        while time.monotonic() - t0 < 5:  # pure-python loop, interruptible
            pass
        return "never"

    with pytest.raises(WatchdogTimeout):
        run_with_timeout(slow, 0.1)

    # off the main thread: documented unguarded fallback (no crash)
    result = {}
    th = threading.Thread(
        target=lambda: result.setdefault("v", run_with_timeout(lambda: 7, 0.1))
    )
    th.start()
    th.join()
    assert result["v"] == 7


def test_page_extractor_timeout_quarantines_row_and_continues():
    """One pathological row must not stall the batch: it yields a single
    status='timeout' quarantine row (reference resolve-empty semantics,
    TaskQueueManager.class.js:49-53); the other rows extract normally."""
    import time

    from ocr_search_ray.stages.extract import DefaultBackend, PageExtractor

    class SlowOnMarker(DefaultBackend):
        def extract(self, payload, text):
            if payload is not None and payload.startswith(b"SLOW"):
                t0 = time.monotonic()
                while time.monotonic() - t0 < 5:
                    pass
            return super().extract(payload, text)

    batch = _webpages_table(
        [
            {"url": "https://a.example/ok", "text": "fine words here"},
            {"url": "https://a.example/slow", "html": b"SLOW payload"},
            {"url": "https://a.example/also-ok", "text": "more fine words"},
        ]
    )
    out = PageExtractor(SlowOnMarker, timeout_s=0.2)(batch)
    by_url = {u: s for u, s in zip(out.column("url").to_pylist(),
                                   out.column("status").to_pylist())}
    assert by_url["https://a.example/slow"] == "timeout"
    assert by_url["https://a.example/ok"] == "ok"
    assert by_url["https://a.example/also-ok"] == "ok"
    slow_row = out.filter(
        pa.compute.equal(out.column("url"), "https://a.example/slow")
    )
    assert slow_row.num_rows == 1
    assert slow_row.column("text").to_pylist() == [""]
    assert slow_row.column("page_count").to_pylist() == [0]
