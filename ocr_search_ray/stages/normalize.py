"""FormatNormalizer: convert office payloads (pptx/docx) to the PDF chain.

Reference parity (SURVEY.md O1/O2, ST2): ``src/TypeConverter/TypeConverter.
class.js:24-117`` shells out to a LibreOffice instance per file with a 600 s
timeout and quarantines failures; the produced PDF then flows through the
normal page chain. The Ray-Data re-expression is an actor-pool
``map_batches`` stage ahead of extraction:

- routing is per row on payload magic bytes (office containers pass through
  the converter, everything else — pdf/html/text — passes through untouched),
- the converter backend is pinned ONCE per actor/worker in ``__init__``
  (a real deployment passes a factory owning a LibreOffice process pool;
  the hermetic default converts the ``fakeoffice`` container to a
  ``fakepdf`` container with the standard 256-char page chunking),
- each conversion runs under the per-row watchdog (default 600 s); expiry
  or a corrupt container yields a QUARANTINE row (payload nulled,
  ``conv_status`` = 'timeout' | 'error') and the batch continues.

Output = input WEBPAGES columns (``html`` replaced by the converted
payload) + ``src_kind`` (pptx|docx|other) + ``conv_status``
(converted|passthrough|error|timeout). Feed the result straight into
``stages.extract`` — converted rows take the paged-binary path.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import fakeoffice, fakepdf, officetext
from ..functions.watchdog import BatchWatchdog, WatchdogTimeout
from ..schemas import WEBPAGES

DEFAULT_CONVERT_TIMEOUT_S = 600.0  # reference: AppConfig.const.js:11-19

PDF_PAGE_CHARS = 256

# Default (linear) converter: arm the per-row timer only for large payloads
# (see functions/watchdog.py cost model); custom backends arm every row.
WATCHDOG_ARM_MIN_BYTES = 1 << 16


class FakeOfficeConverter:
    """Hermetic converter backend: fake office container → fake PDF.

    Contract (what a LibreOffice backend implements instead):
    ``convert(payload: bytes, kind: str) -> bytes`` returning a payload the
    extraction stage can decode; raise on corrupt input. A real backend
    holds its soffice handle as instance state — opened once per actor
    because :class:`FormatNormalizer` constructs the backend in ``__init__``.
    """

    def convert(self, payload: bytes, kind: str) -> bytes:
        text = fakeoffice.unpack(payload)
        return fakepdf.pack(_chunk_pages(text))


def _chunk_pages(text: str) -> list[str]:
    n = max(1, -(-len(text) // PDF_PAGE_CHARS))  # ceil
    return [text[i * PDF_PAGE_CHARS:(i + 1) * PDF_PAGE_CHARS]
            for i in range(n)]


class OfficeXmlConverter(FakeOfficeConverter):
    """DEFAULT converter backend — handles REAL office containers.

    pptx/docx are OPC zip+XML packages, so genuine text extraction is
    pure-stdlib (``functions/officetext.py`` — the same pattern that
    closed O4 for real PDFs). Routing: a real .docx extracts its
    WordprocessingML text and paginates on the deterministic 256-char
    rule (LibreOffice's layout-dependent pagination has no hermetic
    equivalent); a real .pptx maps ONE PAGE PER SLIDE — exactly what the
    reference's pptx→pdf conversion produces
    (``TypeConverter.class.js:24-67``). ``fakeoffice`` containers fall
    through to the stand-in path; corrupt zips raise → quarantine row."""

    def convert(self, payload: bytes, kind: str) -> bytes:
        real_kind = officetext.kind_of(payload)
        if real_kind == "docx":
            return fakepdf.pack(
                _chunk_pages(officetext.extract_docx_text(payload)))
        if real_kind == "pptx":
            return fakepdf.pack(officetext.extract_pptx_slides(payload)
                                or [""])
        return super().convert(payload, kind)


class FormatNormalizer:
    """map_batches callable: WEBPAGES → WEBPAGES + (src_kind, conv_status)."""

    def __init__(self, backend_factory=None, *,
                 timeout_s: float | None = DEFAULT_CONVERT_TIMEOUT_S) -> None:
        self.backend = (backend_factory or OfficeXmlConverter)()
        self.timeout_s = timeout_s
        self.arm_min_hint = (0 if backend_factory is not None
                             else WATCHDOG_ARM_MIN_BYTES)

    def _convert_one(self, wd: BatchWatchdog, payload: bytes,
                     kind: str) -> tuple[bytes | None, str]:
        try:
            return (
                wd.run(self.backend.convert, payload, kind,
                       cost_hint=len(payload)),
                "converted",
            )
        except WatchdogTimeout:
            return None, "timeout"
        except Exception:
            return None, "error"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        out_payloads: list[bytes | None] = []
        kinds: list[str] = []
        statuses: list[str] = []
        with BatchWatchdog(self.timeout_s,
                           arm_min_hint=self.arm_min_hint) as wd:
            for payload in payloads:
                kind = (fakeoffice.kind_of(payload)
                        or officetext.kind_of(payload))
                if kind is None:
                    out_payloads.append(payload)
                    kinds.append("other")
                    statuses.append("passthrough")
                else:
                    converted, status = self._convert_one(wd, payload, kind)
                    out_payloads.append(converted)
                    kinds.append(kind)
                    statuses.append(status)

        cols = {name: batch.column(name) for name in WEBPAGES.names}
        cols["html"] = pa.array(out_payloads, pa.binary())
        cols["src_kind"] = pa.array(kinds, pa.string())
        cols["conv_status"] = pa.array(statuses, pa.string())
        return pa.table(cols)


def normalize_formats(webpages, *, backend_factory=None,
                      timeout_s: float | None = None,
                      concurrency: int | None = None,
                      batch_size: int = 128):
    """Attach the FormatNormalizer stage to a WEBPAGES dataset.

    ``concurrency=None`` → elastic task pool (instance shipped, light
    default backend); an integer → fixed actor pool (heavyweight converter
    backends, e.g. a LibreOffice process per actor)."""
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    eff_timeout = (DEFAULT_CONVERT_TIMEOUT_S if timeout_s is None
                   else timeout_s)
    if concurrency is None:
        return webpages.map_batches(
            FormatNormalizer(backend_factory, timeout_s=eff_timeout), **kwargs
        )
    return webpages.map_batches(
        FormatNormalizer,
        fn_constructor_args=(backend_factory,),
        fn_constructor_kwargs={"timeout_s": eff_timeout},
        concurrency=concurrency,
        **kwargs,
    )
