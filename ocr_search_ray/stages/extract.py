"""Extraction stage: one web-page row → N page rows with extracted text.

The Ray-Data re-expression of the reference's per-file extract chain
(``src/PdfUtil/PdfUtil.class.js:41-100``: page-count probe → per-page text →
Doc assembly). Here it is a single ``map_batches`` flat-map-shaped transform:
each input row expands to ``page_count`` output rows; routing between the HTML
DOM walk and the paged-binary (PDF stand-in) decoder happens per row on the
payload's magic bytes.

Failure semantics: skip-don't-fail (reference resolves empty on any error —
SURVEY.md §4). A corrupt payload yields ONE quarantine row with
``status='error'``, ``text=''`` and the pipeline continues; errors are counted
into the checkpoint manifest downstream.

Scale notes:
- stateless pure function → Ray task pool (no actors needed); a real
  pdfium/Tesseract backend would become a callable class with the engine
  pinned in ``__init__`` (same output contract, see functions/fakepdf.py).
- the heavy ``html`` binary column is consumed here and NOT emitted — the
  downstream shuffle moves text/postings, never raw payload bytes.
- batch_size should be small (64-256) because payload rows are large.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import fakepdf
from ..functions.hashing import doc_id, file_id
from ..functions.html_extract import extract_main_text
from ..schemas import PAGES, assert_schema


def _extract_one(payload: bytes | None, text: str | None) -> tuple[list[str], str]:
    """Return (page_texts, status). Routing by magic bytes."""
    if payload is None:
        # pre-extracted text channel
        t = text or ""
        return [t], ("ok" if t else "empty")
    if payload[:4] == fakepdf.MAGIC:
        try:
            return fakepdf.unpack(payload), "ok"
        except Exception:
            return [""], "error"
    extracted, status = extract_main_text(payload)
    return [extracted], status


def extract_pages(batch: pa.Table) -> pa.Table:
    """map_batches fn: WEBPAGES → PAGES (1 → page_count rows)."""
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").to_pylist()
    payloads = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    out: dict[str, list] = {name: [] for name in PAGES.names}
    for url, ts, payload, text, lang in zip(urls, tss, payloads, texts, langs):
        page_texts, status = _extract_one(payload, text)
        n = len(page_texts)
        fid = file_id(url)
        page_count = 0 if status == "error" else n
        for idx, page_text in enumerate(page_texts, start=1):
            row_status = status if (status != "ok" or page_text) else "empty"
            did = doc_id(url, idx, max(page_count, 1))
            out["file_id"].append(fid)
            out["doc_id"].append(did)
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["page_idx"].append(idx)
            out["page_count"].append(page_count)
            # img_path = "<docId>.png" (ProcessDirector.class.js:140) — derive
            # from the already-computed id, don't hash twice
            out["img_path"].append(f"{did}.png")
            out["text"].append(page_text)
            out["lang"].append(lang)
            out["status"].append(row_status)

    table = pa.table(
        {
            name: pa.array(out[name], type=PAGES.field(name).type)
            for name in PAGES.names
        }
    )
    return assert_schema(table, PAGES, "extract_pages")
