"""Link-graph extraction: parser edges, dedup-correct degree counts."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.linkgraph import (
    extract_links,
    link_degrees,
    page_links,
)


def test_page_links_order_nesting_and_errors():
    html = (
        b'<body><a href="/x">one <b>bold</b></a>'
        b'<a href="/y">two<a href="/z">implicit close</a>'
        b'<a>no href</a><p>plain</p></body>'
    )
    assert page_links(html) == [
        ("/x", "one bold"),
        ("/y", "two"),           # next <a> implicitly closes the open one
        ("/z", "implicit close"),
        ("", "no href"),
    ]
    assert page_links(b"\xff\xfebad") == []


def test_degrees_count_vs_distinct_sources():
    # doc 0 links /t twice, doc 1 once: n_links 3, n_srcs 2
    htmls = [
        b'<a href="/t">a</a><a href="/t">b</a><a href="/solo">c</a>',
        b'<a href="/t">d</a>',
    ]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()),
             "html": pa.array(htmls, pa.binary())}
        )
    ).repartition(2)
    edges = extract_links(ds)
    got = {
        r["href"]: (r["n_links"], r["n_srcs"])
        for r in link_degrees(edges).take_all()
    }
    assert got == {"/t": (3, 2), "/solo": (1, 1)}
