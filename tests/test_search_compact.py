"""Search scoring semantics (A3/K1/K2) + deletion-cascade compaction (D3)."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.pipelines.compact import delete_urls
from ocr_search_ray.stages.search import search


def _pages(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "page_idx": pa.array([r[2] for r in rows], pa.int32()),
                "img_path": pa.array([f"{r[0]}.png" for r in rows], pa.string()),
            }
        )
    )


def _postings(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "term": pa.array([r[1] for r in rows], pa.string()),
                "tf": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def test_max_merge_not_sum():
    pages = _pages([("d1", "u1", 1), ("d2", "u2", 1)])
    postings = _postings(
        [("d1", "spark", 4), ("d1", "merge", 9), ("d2", "spark", 5)]
    )
    out = search(postings, pages, "spark merge", max_return=10)
    scores = dict(zip(out.column("doc_id").to_pylist(), out.column("score").to_pylist()))
    assert scores == {"d1": 9, "d2": 5}  # max, not 13


def test_rank_desc_and_topk_truncation():
    pages = _pages([(f"d{i}", f"u{i}", 1) for i in range(5)])
    postings = _postings([(f"d{i}", "spark", i + 1) for i in range(5)])
    out = search(postings, pages, "spark", max_return=3)
    assert out.column("score").to_pylist() == [5, 4, 3]


def test_delete_cascade_removes_pages_and_postings():
    pages = _pages([("d1", "u1", 1), ("d2", "u2", 1), ("d3", "u2", 2)])
    postings = _postings([("d1", "x", 1), ("d2", "y", 2), ("d3", "z", 3)])
    pages2, postings2 = delete_urls(pages, postings, {"u2"})
    assert {r["doc_id"] for r in pages2.take_all()} == {"d1"}
    assert {r["doc_id"] for r in postings2.take_all()} == {"d1"}
