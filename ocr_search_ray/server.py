"""S9: the thin HTTP serving layer over the on-disk query path.

The reference serves two endpoints (``src/ApiServer/ApiHandler.const.js:
11-59``, ``src/ApiServer/ApiServer.class.js:20-28``):

- ``GET /pages?searchTerm=...&maxReturn=N`` — tokenize the query, match
  against the index, return ``{"pageList": [{oriFilePath, pageIdx,
  imgPath}, ...]}`` sorted by correlation; 400 on a missing searchTerm
  (``search term is not specified or is in wrong format``) or a
  non-``/^[1-9]\\d*$/`` maxReturn (``maxReturn should be a positive
  integer``); 500 → ``internal server error``.
- ``GET /pageImg/<imgPath>`` — static page-image bytes
  (``express.static('data/png')``).

This module reproduces both over the engine's on-disk artifacts:
``pipelines.query.search_index`` (bucket-pruned posting lookup) and
``stages.raster.read_page_image`` (the S8 PNG sink). It is stdlib-only
(``http.server``) and NEVER calls ``ray.init`` — the process entry point
(``jobs/api_server.py``) owns the Ray session, per the driver contract.

Requests serialize through one lock: Ray Dataset construction is not
thread-safe on first use from concurrent threads (the import race noted
in CLAUDE.md), and the query path is a sub-second point lookup — a
serving tier would put N replica processes behind a balancer, not N
threads in one driver.
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

NUM_SEARCH_RETURN = 20  # reference AppConfig.API_SERVER.NUM_SEARCH_RETURN
_MAX_RETURN_RE = re.compile(r"^[1-9]\d*$")


class SearchApp:
    """The endpoint logic, separated from HTTP plumbing for testability."""

    def __init__(self, index_dir: str, pages_path: str, artifact_dir: str,
                 *, history_dir: str | None = None) -> None:
        self.index_dir = index_dir
        self.pages_path = pages_path
        self.artifact_dir = artifact_dir
        self.history_dir = history_dir
        self._lock = threading.Lock()

    def search(self, query: str, max_return: int) -> list[dict]:
        from .pipelines.query import search_index

        with self._lock:
            hits = search_index(
                self.index_dir, self.pages_path, query, max_return,
                history_dir=self.history_dir,
            )
        return [
            {
                "oriFilePath": url,
                "pageIdx": page_idx,
                "imgPath": img_path,
            }
            for url, page_idx, img_path in zip(
                hits.column("url").to_pylist(),
                hits.column("page_idx").to_pylist(),
                hits.column("img_path").to_pylist(),
            )
        ]

    def page_image(self, img_path: str) -> bytes:
        from .stages.raster import read_page_image

        return read_page_image(self.artifact_dir, img_path)


def _make_handler(app: SearchApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: tests/CLI read the response
            pass

        def _json(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            parsed = urlsplit(self.path)
            if parsed.path == "/pages":
                self._pages(parse_qs(parsed.query))
            elif parsed.path.startswith("/pageImg/"):
                self._page_img(unquote(parsed.path[len("/pageImg/"):]))
            else:
                self._json(404, {"message": "not found"})

        def _pages(self, qs: dict) -> None:
            query = qs.get("searchTerm", [None])[0]
            max_return = qs.get("maxReturn", [None])[0]
            if query is None:
                self._json(400, {
                    "message":
                        "search term is not specified or is in wrong format"
                })
                return
            if max_return is not None and not _MAX_RETURN_RE.match(
                    max_return):
                self._json(400, {
                    "message": "maxReturn should be a positive integer"
                })
                return
            try:
                page_list = app.search(
                    query, int(max_return) if max_return else
                    NUM_SEARCH_RETURN)
            except Exception:
                self._json(500, {"message": "internal server error"})
                return
            self._json(200, {"pageList": page_list})

        def _page_img(self, img_path: str) -> None:
            try:
                png = app.page_image(img_path)
            except (FileNotFoundError, ValueError, OSError):
                self._json(404, {"message": "not found"})
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


def make_server(index_dir: str, pages_path: str, artifact_dir: str, *,
                port: int = 0, history_dir: str | None = None):
    """→ a ``ThreadingHTTPServer`` bound to ``port`` (0 = ephemeral, read
    ``server.server_address[1]``). Caller starts it (``serve_forever`` /
    a thread) and owns the Ray session."""
    app = SearchApp(index_dir, pages_path, artifact_dir,
                    history_dir=history_dir)
    return ThreadingHTTPServer(("127.0.0.1", port), _make_handler(app))
