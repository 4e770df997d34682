"""WARC source: real Common-Crawl container files → the WEBPAGES schema.

``read_warc`` turns a directory (or list) of ``.warc`` / ``.warc.gz``
files into the exact dataset ``read_webpages`` synthesizes — so every
downstream stage (extract → tokenize → index) runs unmodified on real
crawl containers. Parallelism is one read task per file, the standard
WARC unit (records inside a file are sequential by format; files are
many at crawl scale — Common Crawl ships ~64k files per crawl).

``write_warc_from_documents`` synthesizes spec-valid WARC files from the
testdata documents table INSIDE a Ray map (one file per block, no driver
materialization) so the reader is exercised end-to-end on real WARC
bytes (the ``officetext``/``gif_codec`` self-synthesis pattern).
"""

from __future__ import annotations

import datetime as _dt
import os

import pyarrow as pa

from ..functions.warc import (
    build_warc,
    iter_warc,
    parse_warc_ts,
    split_http,
)
from ..schemas import WEBPAGES, assert_schema
from .webpages import documents_to_webpages


def _records_to_rows(payload: bytes) -> pa.Table:
    urls: list[str] = []
    tss: list[_dt.datetime] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str | None] = []
    for headers, content in iter_warc(payload):
        if headers.get("warc-type") != "response":
            continue  # warcinfo / request / metadata records
        http_headers, body = split_http(content)
        urls.append(headers["warc-target-uri"])
        tss.append(parse_warc_ts(headers["warc-date"]))
        langs.append(headers.get("warc-identified-content-language"))
        ctype = http_headers.get("content-type", "")
        if ctype.startswith("text/plain"):
            # Real crawls carry mislabeled charsets; a bad record must
            # degrade (errors="replace", matching _parse_headers), never
            # fail the whole file-level read task.
            htmls.append(None)
            texts.append(body.decode("utf-8", errors="replace"))
        else:
            htmls.append(body)
            texts.append(None)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_warc(paths):
    """``.warc`` / ``.warc.gz`` file path(s) or directory → WEBPAGES
    dataset (one read task per file)."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        tables = [_records_to_rows(bytes(b)) for b in batch["bytes"]]
        out = pa.concat_tables(tables) if tables else _records_to_rows(b"")
        return assert_schema(out, WEBPAGES, "read_warc")

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="numpy"
    )


def write_warc_from_documents(sf_dir: str, out_dir: str, *,
                              compress: bool = False):
    """Synthesize spec-valid WARC files from the documents table — one
    file per input block, written inside the map (scale shape: no driver
    materialization; a crawl-sized corpus becomes many files, the WARC
    parallelism unit). → list of file paths."""
    import gzip

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_warc(batch: pa.Table) -> pa.Table:
        web = documents_to_webpages(batch)
        records = []
        for row in range(web.num_rows):
            html = web.column("html")[row].as_py()
            text = web.column("text")[row].as_py()
            if html is not None:
                body, ctype = html, (
                    "application/pdf" if html[:4] in (b"%PDF", b"FPDF")
                    else "text/html")
            else:
                body, ctype = (text or "").encode("utf-8"), "text/plain"
            records.append(
                {
                    "url": web.column("url")[row].as_py(),
                    "ts": web.column("warc_ts")[row].as_py(),
                    "body": body,
                    "content_type": ctype,
                    "lang": web.column("lang")[row].as_py(),
                }
            )
        payload = build_warc(records)
        if compress:
            payload = gzip.compress(payload)
        first = batch.column("doc_id")[0].as_py()
        suffix = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"crawl-{int(first):08d}{suffix}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    return sorted(
        r["path"] for r in docs.map_batches(
            to_warc, batch_format="pyarrow").take_all()
    )
