"""WARC reader/writer: spec round-trips, gzip, record filtering."""

import datetime as dt
import gzip

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions.warc import build_warc, iter_warc, split_http
from ocr_search_ray.sources.warc import read_warc

TS = dt.datetime(2025, 3, 1, 12, 0, 0)


def _records():
    return [
        {"url": "https://a.example/x", "ts": TS, "body": b"<html>hi</html>",
         "content_type": "text/html", "lang": "en"},
        {"url": "https://b.example/y", "ts": TS, "body": "plain text".encode(),
         "content_type": "text/plain", "lang": "de"},
        {"url": "https://c.example/z", "ts": TS, "body": b"\x00\x01binary\xff",
         "content_type": "application/pdf", "lang": None},
    ]


def test_build_iter_round_trip_plain_and_gzip():
    payload = build_warc(_records())
    for blob in (payload, gzip.compress(payload)):
        got = list(iter_warc(blob))
        assert len(got) == 3
        for rec, (headers, content) in zip(_records(), got):
            assert headers["warc-target-uri"] == rec["url"]
            assert headers["warc-type"] == "response"
            http, body = split_http(content)
            assert body == rec["body"]
            assert http["content-type"] == rec["content_type"]
        assert got[0][0]["warc-identified-content-language"] == "en"
        assert "warc-identified-content-language" not in got[2][0]


def test_non_response_records_are_skipped_and_truncation_raises(tmp_path):
    import pytest

    payload = build_warc(_records())
    # splice a warcinfo record in front (handwritten per spec)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    f = tmp_path / "t.warc"
    f.write_bytes(info + payload)
    rows = read_warc([str(f)]).take_all()
    assert [r["url"] for r in rows] == [r["url"] for r in _records()]
    with pytest.raises(Exception):
        list(iter_warc(payload[: len(payload) - 40]))


def test_read_warc_reproduces_webpages_rows(tmp_path):
    """The full container round trip: documents → WARC.gz files → read_warc
    equals documents → read_webpages, byte-for-byte per url."""
    from ocr_search_ray.sources.warc import write_warc_from_documents
    from ocr_search_ray.sources.webpages import read_webpages

    paths = write_warc_from_documents(
        "/root/testdata/sf0.001", str(tmp_path / "warc"), compress=True)
    assert len(paths) >= 1 and all(p.endswith(".warc.gz") for p in paths)
    via_warc = {r["url"]: r for r in read_warc(paths).take_all()}
    direct = {r["url"]: r for r in read_webpages("/root/testdata/sf0.001").take_all()}
    assert via_warc.keys() == direct.keys()
    for u, d in direct.items():
        w = via_warc[u]
        assert (w["html"], w["text"], w["lang"], w["warc_ts"]) == (
            d["html"], d["text"], d["lang"], d["warc_ts"]), u


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 2**20), st.binary(min_size=0, max_size=400),
              st.sampled_from(["text/html", "application/pdf", "image/gif"])),
    min_size=1, max_size=8,
))
def test_warc_round_trip_property(recs):
    records = [
        {"url": f"https://h.example/p{i}-{n}", "ts": TS, "body": body,
         "content_type": ct, "lang": "en"}
        for i, (n, body, ct) in enumerate(recs)
    ]
    got = list(iter_warc(build_warc(records)))
    assert len(got) == len(records)
    for rec, (headers, content) in zip(records, got):
        assert headers["warc-target-uri"] == rec["url"]
        _, body = split_http(content)
        assert body == rec["body"]


def test_non_utf8_text_plain_degrades_instead_of_failing_the_file(tmp_path):
    """ADVICE r5: a latin-1 (or otherwise mislabeled) text/plain record
    must decode with replacement, not raise UnicodeDecodeError and kill
    the whole file-level read task."""
    recs = _records()
    recs[1] = dict(recs[1], body="caf\xe9 über".encode("latin-1"))
    f = tmp_path / "latin.warc"
    f.write_bytes(build_warc(recs))
    rows = sorted(read_warc([str(f)]).take_all(), key=lambda r: r["url"])
    assert len(rows) == 3
    txt = rows[1]["text"]
    assert txt is not None and "caf" in txt and "�" in txt
