"""Extraction stage: one web-page row → N page rows with extracted text.

The Ray-Data re-expression of the reference's per-file extract chain
(``src/PdfUtil/PdfUtil.class.js:41-100``: page-count probe → per-page text →
Doc assembly). Each input row expands to ``page_count`` output rows; routing
between the HTML DOM walk and the paged-binary (PDF stand-in) decoder
happens per row on the payload's magic bytes.

Backend adapter (SURVEY.md ST3 / VERDICT r1 #5): :class:`PageExtractor` is
the actor-pool callable — the extraction backend is pinned ONCE per
actor/worker in ``__init__`` (a real deployment passes a factory that opens
pdfium + a Tesseract engine, the contract at ``PdfUtil.class.js:140-164``;
the hermetic default routes the FPDF stand-in + the HTML DOM walk). Swapping
backends is one constructor argument — the Ray plumbing, schema and failure
semantics are identical.

Failure semantics: skip-don't-fail (reference resolves empty on any error —
SURVEY.md §4). A corrupt payload yields ONE quarantine row with
``status='error'``; a row whose extraction exceeds ``timeout_s`` (reference:
600 s, ``AppConfig.const.js:11-19``) yields ``status='timeout'`` via the
SIGALRM watchdog (``functions/watchdog.py``). Either way ``text=''``,
``page_count=0`` and the pipeline continues; both are counted into the
checkpoint manifest downstream.

Scale notes:
- the heavy ``html`` binary column is consumed here and NOT emitted — the
  downstream shuffle moves text/postings, never raw payload bytes.
- batch_size should be small (64-256) because payload rows are large.
- default (task-pool) use keeps per-worker cached backend state; pass
  ``concurrency=N`` at the ``map_batches`` call for a fixed actor pool when
  the backend is heavyweight (native OCR engine).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import fakepdf
from ..functions.hashing import doc_id, file_id
from ..functions.html_extract import extract_main_text
from ..functions.watchdog import BatchWatchdog, WatchdogTimeout
from ..schemas import PAGES, assert_schema

DEFAULT_EXTRACT_TIMEOUT_S = 600.0  # reference: AppConfig.const.js:11-19

# With the DEFAULT (linear-time, pure-python) backend, arm the per-row timer
# only for payloads at least this large — small rows can't reach a 600 s
# budget and per-row arming measurably taxes the hot path. A CUSTOM backend
# arms every row: native code gives no linearity guarantee on any input.
WATCHDOG_ARM_MIN_BYTES = 1 << 16


class DefaultBackend:
    """Hermetic extraction backend: FPDF paged-binary + HTML DOM walk.

    Contract (what a pdfium/Tesseract backend implements instead):
    ``extract(payload, text) -> (page_texts: list[str], status: str)``.
    A real OCR backend holds its native handles as instance state — opened
    once per actor because :class:`PageExtractor` constructs the backend in
    ``__init__`` — and rasterizes+OCRs each page in ``extract``.
    """

    def extract(self, payload: bytes | None, text: str | None) -> tuple[list[str], str]:
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


class PdfTextBackend(DefaultBackend):
    """REAL-PDF extraction backend (VERDICT r2 #4): ``%PDF-`` payloads go
    through the pure-stdlib parser in ``functions/pdftext.py`` (page tree
    walk, FlateDecode, text operators — the direct-text channel of the
    reference's pdf chain, ``PdfUtil.class.js:140-164``); everything else
    falls through to the hermetic default (FPDF stand-in, HTML DOM walk).
    Out-of-subset PDFs (encryption, CMaps, object streams) surface as
    ``status='error'`` quarantine rows — skip-don't-fail, like every
    backend on this seam."""

    def extract(self, payload: bytes | None,
                text: str | None) -> tuple[list[str], str]:
        if payload is not None and payload[:5] == b"%PDF-":
            from ..functions.pdftext import extract_pdf_pages

            try:
                pages = extract_pdf_pages(payload)
            except Exception:
                return [""], "error"
            return pages, "ok"
        return super().extract(payload, text)


class PypdfBackend(DefaultBackend):
    """Optional adapter over the ``pypdf`` library when it is importable
    (import-guarded — this sandbox ships no PDF engine, so the constructor
    raising ``ImportError`` is the expected path there; the skippable
    pytest in ``tests/test_pdf_backend.py`` exercises it where the library
    exists). Pins the module once per actor in ``__init__`` — the ST3
    stateful-stage contract."""

    def __init__(self) -> None:
        import io

        import pypdf  # noqa: F401 — ImportError here = backend unavailable

        self._pypdf = pypdf
        self._io = io

    def extract(self, payload: bytes | None,
                text: str | None) -> tuple[list[str], str]:
        if payload is not None and payload[:5] == b"%PDF-":
            try:
                reader = self._pypdf.PdfReader(self._io.BytesIO(payload))
                return [p.extract_text() or "" for p in reader.pages], "ok"
            except Exception:
                return [""], "error"
        return super().extract(payload, text)


class PageExtractor:
    """map_batches callable: WEBPAGES → PAGES (1 → page_count rows).

    ``backend_factory``: zero-arg callable returning the extraction backend
    (pinned here, once per actor/worker). ``timeout_s``: per-ROW watchdog
    budget; ``None`` disables.
    """

    def __init__(self, backend_factory=None, *,
                 timeout_s: float | None = DEFAULT_EXTRACT_TIMEOUT_S) -> None:
        self.backend = (backend_factory or DefaultBackend)()
        self.timeout_s = timeout_s
        # custom backends arm every row; the linear default gates by size
        self.arm_min_hint = (0 if backend_factory is not None
                             else WATCHDOG_ARM_MIN_BYTES)

    def _extract_one(self, wd: BatchWatchdog, payload, text) -> tuple[list[str], str]:
        hint = len(payload) if payload is not None else len(text or "")
        try:
            return wd.run(self.backend.extract, payload, text, cost_hint=hint)
        except WatchdogTimeout:
            return [""], "timeout"
        except Exception:
            return [""], "error"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()

        out: dict[str, list] = {name: [] for name in PAGES.names}
        wd_scope = BatchWatchdog(self.timeout_s, arm_min_hint=self.arm_min_hint)
        with wd_scope as wd:
            return self._emit(wd, out, urls, tss, payloads, texts, langs)

    def _emit(self, wd, out, urls, tss, payloads, texts, langs) -> pa.Table:
        for url, ts, payload, text, lang in zip(urls, tss, payloads, texts, langs):
            page_texts, status = self._extract_one(wd, payload, text)
            n = len(page_texts)
            fid = file_id(url)
            page_count = 0 if status in ("error", "timeout") else n
            for idx, page_text in enumerate(page_texts, start=1):
                row_status = status if (status != "ok" or page_text) else "empty"
                did = doc_id(url, idx, max(page_count, 1))
                out["file_id"].append(fid)
                out["doc_id"].append(did)
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["page_idx"].append(idx)
                out["page_count"].append(page_count)
                # img_path = "<docId>.png" (ProcessDirector.class.js:140) —
                # derive from the already-computed id, don't hash twice
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


_WORKER_EXTRACTOR: PageExtractor | None = None


def extract_pages(batch: pa.Table) -> pa.Table:
    """Task-pool variant with once-per-worker default-backend state (same
    pattern as ``stages.tokenize._tokenize_task``)."""
    global _WORKER_EXTRACTOR
    if _WORKER_EXTRACTOR is None:
        _WORKER_EXTRACTOR = PageExtractor()
    return _WORKER_EXTRACTOR(batch)
