"""Minimal WARC/1.0 reader+writer — the Common Crawl container format.

From the public ISO 28500 / WARC 1.0 specification, stdlib only: records
are ``WARC/1.0\\r\\n`` + header lines + blank line + ``Content-Length``
bytes of content + ``\\r\\n\\r\\n``. Response records carry an HTTP
response (status line + headers + body) as content. Whole-file AND
per-record gzip both decompress through ``gzip.decompress`` (python
handles concatenated members — the Common Crawl layout).

The writer exists so the reader is always exercised on real WARC bytes
the engine synthesizes (the ``officetext``/``gif_codec`` pattern); it
emits the ``WARC-Identified-Content-Language`` field Common Crawl uses.
"""

from __future__ import annotations

import datetime as _dt
import gzip

_CRLF = b"\r\n"


def _parse_headers(lines: list[bytes]) -> dict[str, str]:
    """Key-lowercased header-line parse — shared by the WARC and HTTP
    layers so folding/duplicate handling can only ever diverge in one
    place."""
    headers: dict[str, str] = {}
    for line in lines:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    return headers


def build_warc(records: list[dict]) -> bytes:
    """records: [{url, ts (datetime), body (bytes), content_type (str),
    lang (str|None)}] → uncompressed WARC/1.0 bytes (response records)."""
    out = bytearray()
    for r in records:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: " + r["content_type"].encode() + _CRLF
            + b"Content-Length: " + str(len(r["body"])).encode() + _CRLF
            + _CRLF + r["body"]
        )
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + r["url"].encode(),
            b"WARC-Date: " + r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode(),
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(http)).encode(),
        ]
        if r.get("lang"):
            headers.append(
                b"WARC-Identified-Content-Language: " + r["lang"].encode())
        out += _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF
    return bytes(out)


def iter_warc(payload: bytes):
    """WARC bytes (plain or gzipped, incl. concatenated members) →
    yields (headers: dict[str, str], content: bytes) per record."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    pos = 0
    n = len(payload)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and payload[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: expected record header at byte {pos}")
        head_end = payload.index(_CRLF + _CRLF, pos)
        headers = _parse_headers(payload[pos:head_end].split(_CRLF)[1:])
        length = int(headers["content-length"])
        body_start = head_end + 4
        content = payload[body_start:body_start + length]
        if len(content) != length:
            raise ValueError("WARC: truncated record content")
        yield headers, content
        pos = body_start + length


def split_http(content: bytes) -> tuple[dict[str, str], bytes]:
    """HTTP response bytes → (headers dict lowercased, body bytes)."""
    sep = content.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("WARC: HTTP content without header terminator")
    return (_parse_headers(content[:sep].split(_CRLF)[1:]),
            content[sep + 4:])


def parse_warc_ts(value: str) -> _dt.datetime:
    return _dt.datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
