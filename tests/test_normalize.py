"""FormatNormalizer (O1/O2 parity): routing, conversion, quarantine, timeout."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions import fakeoffice, fakepdf
from ocr_search_ray.schemas import WEBPAGES
from ocr_search_ray.stages.normalize import FormatNormalizer, normalize_formats


def _web(rows):
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


def test_routing_and_conversion():
    batch = _web(
        [
            {"url": "u1", "html": fakeoffice.pack("slides here", "pptx")},
            {"url": "u2", "html": fakeoffice.pack("words " * 60, "docx")},
            {"url": "u3", "html": fakepdf.pack(["already pdf"])},
            {"url": "u4", "text": "plain text channel"},
        ]
    )
    out = FormatNormalizer()(batch)
    rows = {
        u: (k, s, p)
        for u, k, s, p in zip(
            out.column("url").to_pylist(),
            out.column("src_kind").to_pylist(),
            out.column("conv_status").to_pylist(),
            out.column("html").to_pylist(),
        )
    }
    assert rows["u1"][:2] == ("pptx", "converted")
    assert fakepdf.unpack(rows["u1"][2]) == ["slides here"]
    assert rows["u2"][:2] == ("docx", "converted")
    # 360 chars -> 2 pages of 256-char chunking
    assert len(fakepdf.unpack(rows["u2"][2])) == 2
    assert rows["u3"][:2] == ("other", "passthrough")
    assert rows["u4"][:2] == ("other", "passthrough")
    assert rows["u4"][2] is None


def test_corrupt_office_payload_quarantines():
    corrupt = fakeoffice.MAGIC_PPTX + b"\xff\xfe\xff"  # undecodable body
    out = FormatNormalizer()(_web([{"url": "bad", "html": corrupt}]))
    assert out.column("conv_status").to_pylist() == ["error"]
    assert out.column("html").to_pylist() == [None]


def test_converter_timeout_quarantines_and_continues():
    import time

    from ocr_search_ray.stages.normalize import FakeOfficeConverter

    class SlowConverter(FakeOfficeConverter):
        def convert(self, payload, kind):
            if kind == "pptx":
                t0 = time.monotonic()
                while time.monotonic() - t0 < 5:
                    pass
            return super().convert(payload, kind)

    batch = _web(
        [
            {"url": "slow", "html": fakeoffice.pack("x", "pptx")},
            {"url": "fast", "html": fakeoffice.pack("y", "docx")},
        ]
    )
    out = FormatNormalizer(SlowConverter, timeout_s=0.2)(batch)
    rows = dict(zip(out.column("url").to_pylist(),
                    out.column("conv_status").to_pylist()))
    assert rows == {"slow": "timeout", "fast": "converted"}


def test_normalize_stage_in_ray_actor_pool():
    """End-to-end through map_batches with a fixed actor pool: converted
    payloads decode through the extract stage byte-identically."""
    from ocr_search_ray.stages.extract import extract_pages

    texts = [f"office doc {i} body " + "w" * (i * 97 % 400) for i in range(30)]
    web = _web(
        [
            {"url": f"u{i}", "html": fakeoffice.pack(t, "pptx" if i % 2 == 0 else "docx")}
            for i, t in enumerate(texts)
        ]
    )
    ds = normalize_formats(rd.from_arrow(web), concurrency=2)
    pages = ds.select_columns(["url", "warc_ts", "html", "text", "lang"]).map_batches(
        extract_pages, batch_format="pyarrow"
    )
    joined = {}
    for r in pages.take_all():
        joined.setdefault(r["url"], {})[r["page_idx"]] = r["text"]
    for i, t in enumerate(texts):
        parts = joined[f"u{i}"]
        assert "".join(parts[k] for k in sorted(parts)) == t
