"""Link-graph extraction: parser edges, dedup-correct degree counts."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.linkgraph import (
    extract_links,
    link_degrees,
    page_links,
    top_anchor_texts,
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


def test_top_anchor_texts_counts_ties_and_k():
    # /t anchors: "x"×3 (docs 0,1,2), "y"×1, "z"×1 (tie → anchor asc);
    # /solo: single anchor. k=2 keeps exactly two rows per target.
    htmls = [
        b'<a href="/t">x</a><a href="/t">y</a>',
        b'<a href="/t">x</a><a href="/t">z</a>',
        b'<a href="/t">x</a><a href="/solo">s</a>',
    ]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1, 2], pa.int64()),
             "html": pa.array(htmls, pa.binary())}
        )
    ).repartition(3)
    rows = top_anchor_texts(extract_links(ds), k=2).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["href"], []).append((r["anchor_text"],
                                              r["n_anchor"]))
    assert got == {"/t": [("x", 3), ("y", 1)], "/solo": [("s", 1)]}


def test_top_anchor_texts_partials_never_double_count():
    # the same (href, anchor) pair split across input batches must merge
    # before ranking, not rank as separate rows
    htmls = [b'<a href="/t">same</a>'] * 4
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(4)), pa.int64()),
             "html": pa.array(htmls, pa.binary())}
        )
    ).repartition(4)
    rows = top_anchor_texts(extract_links(ds), k=3).take_all()
    assert rows == [{"href": "/t", "anchor_text": "same", "n_anchor": 4}]


def test_crawl_frontier_anti_and_rank():
    """crawl_frontier: crawled targets excluded, rank by distinct srcs
    then total links then href, k cut."""
    import pyarrow as pa
    import ray.data as rd
    from ocr_search_ray.stages.linkgraph import crawl_frontier

    edges = [
        (1, "/a"), (2, "/a"), (3, "/a"),          # 3 srcs
        (1, "/b"), (1, "/b"), (2, "/b"),          # 2 srcs, 3 links
        (1, "/c"), (2, "/c"),                     # 2 srcs, 2 links
        (1, "/d"),                                # crawled
        (1, "/e"),                                # 1 src
    ]
    eds = rd.from_items(
        [{"src": s, "link_idx": 0, "href": h, "anchor_text": ""}
         for s, h in edges]
    ).repartition(3)
    crawled = rd.from_items([{"url": "/d"}, {"url": "/zzz"}])
    got = [(r["href"], r["n_links"], r["n_srcs"])
           for r in crawl_frontier(eds, crawled, k=3).take_all()]
    got.sort(key=lambda x: (-x[2], -x[1], x[0]))
    assert got == [("/a", 3, 3), ("/b", 3, 2), ("/c", 2, 2)]
