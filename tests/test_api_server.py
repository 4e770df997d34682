"""S9 HTTP layer: the reference's two endpoints over the on-disk engine
(``GET /pages`` search + ``GET /pageImg/<path>`` static PNGs), response
shapes per ``src/ApiServer/ApiHandler.const.js:11-59``."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from ocr_search_ray.pipelines.ingest import ingest
from ocr_search_ray.server import make_server
from ocr_search_ray.sources.webpages import read_webpages
from ocr_search_ray.stages.index import build_index
from ocr_search_ray.stages.raster import rasterize_pages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("api")
    stages = ingest(read_webpages(SF_DIR))
    pages = stages["pages"].materialize()
    index_dir = str(tmp / "index")
    pages_dir = str(tmp / "pages")
    png_dir = str(tmp / "png")
    build_index(stages["postings"], out_dir=index_dir)
    pages.write_parquet(pages_dir)
    rasterize_pages(pages, png_dir).materialize()
    server = make_server(index_dir, pages_dir, png_dir,
                         history_dir=str(tmp / "history"))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, str(tmp)
    server.shutdown()
    server.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_pages_endpoint_returns_ranked_page_list(served):
    base, tmp = served
    status, ctype, body = _get(
        base + "/pages?searchTerm=Spark%20MERGE%20data!&maxReturn=5")
    assert status == 200 and ctype == "application/json"
    payload = json.loads(body)
    assert set(payload) == {"pageList"}
    assert 0 < len(payload["pageList"]) <= 5
    for hit in payload["pageList"]:
        assert set(hit) == {"oriFilePath", "pageIdx", "imgPath"}
        assert hit["oriFilePath"].startswith("https://")
        assert hit["imgPath"].endswith(".png")

    # default maxReturn is the reference's NUM_SEARCH_RETURN (20)
    status, _, body = _get(base + "/pages?searchTerm=data")
    assert status == 200
    assert len(json.loads(body)["pageList"]) <= 20

    # the search wrote a history row (S7 parity with the reference's
    # updateSearchHistory-before-match)
    import ray.data as rd

    hist = rd.read_parquet(f"{tmp}/history").take_all()
    assert any(r["search_query"] == "Spark MERGE data!" for r in hist)


def test_pages_endpoint_validation_matches_reference(served):
    base, _ = served
    status, _, body = _get(base + "/pages")
    assert status == 400
    assert json.loads(body)["message"] == (
        "search term is not specified or is in wrong format")
    for bad in ("0", "-3", "x", "1.5"):
        status, _, body = _get(base + f"/pages?searchTerm=a&maxReturn={bad}")
        assert status == 400
        assert json.loads(body)["message"] == (
            "maxReturn should be a positive integer")
    # stopword-only query → empty list, not an error
    status, _, body = _get(base + "/pages?searchTerm=the%20a")
    assert status == 200 and json.loads(body)["pageList"] == []


def test_page_img_endpoint_serves_real_png(served):
    base, _ = served
    _, _, body = _get(base + "/pages?searchTerm=data&maxReturn=1")
    img_path = json.loads(body)["pageList"][0]["imgPath"]
    status, ctype, png = _get(base + f"/pageImg/{img_path}")
    assert status == 200 and ctype == "image/png"
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decodes with the repo codec — real spec-valid artifact bytes
    from ocr_search_ray.functions.raster import decode_png

    assert decode_png(png).ndim == 2

    status, _, _ = _get(base + "/pageImg/nope.png")
    assert status == 404
    # traversal guard: resolver only accepts flat <doc_id>.png names
    status, _, _ = _get(base + "/pageImg/..%2Fpages%2Fx.png")
    assert status == 404


def test_unknown_route_is_404(served):
    base, _ = served
    status, _, _ = _get(base + "/nope")
    assert status == 404
