"""Deterministic synthesis of the web-page input table from ``documents``.

BASELINE.json mandates an input table shaped ``(url:string,
warc_ts:timestamp, html:binary, text:string, lang:string)``; no external data
exists in the sandbox, so the table is synthesized *deterministically* from the
driver's ``documents.parquet`` (doc_id, text, lang, ...) — the same derivation
is expressible in ANSI SQL, which is what makes the ingest pipeline
oracle-checkable end to end (see ``__ray_entry__.oracle_sql``).

Routing (by doc_id, deterministic):
    doc_id % 5 == 4          → "pdf": html = FPDF container, text split into
                                fixed 256-char pages (SQL: substr), text=NULL
    doc_id % 5 in {0, 1, 2}  → "html": html = boilerplate-wrapped page,
                                text=NULL (extractor must recover it)
    doc_id % 5 == 3          → "text": pre-extracted text channel, html=NULL

Skew: doc_id % 10 < 3 lands on one hot domain (~30% of rows) — exercises the
hot-domain repartitioning story (SURVEY.md §4 Skew).

url     = https://{domain}/doc-{doc_id:06d}
warc_ts = 2025-01-01T00:00:00Z + doc_id seconds
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import math

import pyarrow as pa

from ..functions import fakepdf
from ..schemas import WEBPAGES, assert_schema

PDF_PAGE_CHARS = 256
HOT_DOMAIN = "hot.example.com"
_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

# Boilerplate chrome around the main content. Everything outside <main> is
# either inside a skip-tag (nav/header/footer/aside) or a link list with
# link density 1.0 — both removed by functions.html_extract.
_PAGE_TEMPLATE = (
    "<!DOCTYPE html><html><head><title>doc</title>"
    "<style>body{{margin:0}}</style><script>var t=1;</script></head>"
    "<body><header><h1>Example Site</h1></header>"
    "<nav><ul><li><a href='/'>Home</a></li><li><a href='/a'>About</a></li></ul></nav>"
    "<aside>Subscribe to our newsletter for updates!</aside>"
    "<main>{paragraphs}</main>"
    "<p><a href='/more'>Read more articles</a></p>"
    "<footer><p><a href='/tos'>Terms</a> <a href='/pri'>Privacy</a></p></footer>"
    "</body></html>"
)


def doc_url(doc_id: int) -> str:
    domain = HOT_DOMAIN if doc_id % 10 < 3 else f"site{doc_id % 7}.example.org"
    return f"https://{domain}/doc-{doc_id:06d}"


def doc_warc_ts(doc_id: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(seconds=doc_id)


def doc_type(doc_id: int) -> str:
    m = doc_id % 5
    return "pdf" if m == 4 else ("html" if m <= 2 else "text")


def wrap_html(text: str) -> bytes:
    """Embed ``text`` as escaped <p> paragraphs inside the chrome template.

    Paragraph split on double newline; extract_main_text inverts this exactly
    ("\\n\\n".join of kept blocks)."""
    paragraphs = "".join(
        f"<p>{_html.escape(p)}</p>" for p in text.split("\n\n")
    )
    return _PAGE_TEMPLATE.format(paragraphs=paragraphs).encode("utf-8")


def pdf_pages(text: str) -> list[str]:
    """Fixed-width character chunking (SQL: substr(text, (i-1)*256+1, 256))."""
    n = max(1, math.ceil(len(text) / PDF_PAGE_CHARS))
    return [text[i * PDF_PAGE_CHARS : (i + 1) * PDF_PAGE_CHARS] for i in range(n)]


def documents_to_webpages(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents(doc_id, text, lang, ...) → WEBPAGES rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    urls: list[str] = []
    tss: list[_dt.datetime] = []
    payloads: list[bytes | None] = []
    out_texts: list[str | None] = []
    for d, t in zip(doc_ids, texts):
        t = t or ""
        urls.append(doc_url(d))
        tss.append(doc_warc_ts(d))
        kind = doc_type(d)
        if kind == "pdf":
            payloads.append(fakepdf.pack(pdf_pages(t)))
            out_texts.append(None)
        elif kind == "html":
            payloads.append(wrap_html(t))
            out_texts.append(None)
        else:
            payloads.append(None)
            out_texts.append(t)

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return assert_schema(table, WEBPAGES, "documents_to_webpages")


def read_webpages_scaled(sf_dir: str, *, repeat: int, num_blocks: int):
    """Amplified web-page source for load benchmarking.

    Generates ``repeat`` deterministic copies of the corpus (copy c of doc d
    gets url ``doc_url(d) + '?copy=c'`` for c > 0 — byte-identity per url is
    preserved) as ``num_blocks`` independent blocks via ``ray.data.range``,
    with the small documents table broadcast once (``ray.put``). This is the
    bench stand-in for a many-file production input: parallelism comes from
    the range partitioning, not from parquet fragment count.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    docs_ref = ray.put(docs)
    n = docs.num_rows

    def synth(batch) -> pa.Table:
        table = ray.get(docs_ref)
        idx = batch["id"]
        rows = [int(i) % n for i in idx]
        copies = [int(i) // n for i in idx]
        sub = table.take(pa.array(rows, pa.int64()))
        web = documents_to_webpages(sub)
        urls = [
            u if c == 0 else f"{u}?copy={c}"
            for u, c in zip(web.column("url").to_pylist(), copies)
        ]
        return web.set_column(0, "url", pa.array(urls, pa.string()))

    return rd.range(n * repeat, override_num_blocks=num_blocks).map_batches(
        synth, batch_format="numpy"
    )


def read_webpages(sf_dir: str, *, columns: list[str] | None = None):
    """Dataset of synthesized web pages for one testdata scale dir.

    Column pruning happens at the parquet read (only doc_id/text/lang leave
    storage); synthesis itself is a streaming batch transform.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ds = ds.map_batches(documents_to_webpages, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds
