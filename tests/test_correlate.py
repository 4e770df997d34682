"""Term-correlation cosine semantics incl. the ||1 norm floor (A4, K3)."""

import math

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.correlate import closest_terms, term_correlations


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


def test_cosine_with_sequential_divisions():
    # docs: d1{x:2, y:3}, d2{x:1, z:4}
    ds = _postings([("d1", "x", 2), ("d1", "y", 3), ("d2", "x", 1), ("d2", "z", 4)])
    got = {
        (r["term1"], r["term2"]): r["tcr"]
        for r in term_correlations(ds, min_df=None).take_all()
    }
    # x·y share d1: dot=2*3=6; |x|=sqrt(4+1), |y|=sqrt(9)
    expected_xy = 6 / math.sqrt(5) / math.sqrt(9)
    assert math.isclose(got[("x", "y")], expected_xy, rel_tol=0, abs_tol=0)
    # both orders present, same value
    assert got[("y", "x")] == got[("x", "y")]
    # x·z share d2: dot=1*4
    assert got[("x", "z")] == 4 / math.sqrt(5) / math.sqrt(16)
    # y·z share nothing → pair omitted (reference would compute 0 and store;
    # engine omits zero-dot pairs — they're never produced by co-occurrence)
    assert ("y", "z") not in got


def test_default_min_df_guard_drops_hapax_terms():
    # y, z appear in one doc each (df=1); x in both. Default min_df=2 keeps
    # only x → no pairs survive; the unguarded call produces them.
    ds = _postings([("d1", "x", 2), ("d1", "y", 3), ("d2", "x", 1), ("d2", "z", 4)])
    assert term_correlations(ds).count() == 0
    assert term_correlations(ds, min_df=None).count() == 4  # (x,y),(x,z) ×2 orders


def test_closest_terms_topk_with_tiebreak():
    rows = []
    # term "a" correlated with b,c,d at descending tcr; c/d tie
    corr = pa.table(
        {
            "term1": pa.array(["a", "a", "a", "b"], pa.string()),
            "term2": pa.array(["b", "d", "c", "a"], pa.string()),
            "tcr": pa.array([0.9, 0.5, 0.5, 0.9], pa.float64()),
        }
    )
    out = closest_terms(rd.from_arrow(corr), num=2).take_all()
    a_rows = [r for r in out if r["term1"] == "a"]
    assert [r["term2"] for r in a_rows] == ["b", "c"]  # tie at 0.5 → c before d


_SIM_ROWS = [
    ("d1", "x", 2), ("d1", "y", 3), ("d1", "q", 1),
    ("d2", "x", 1), ("d2", "z", 4),
    ("d3", "y", 2), ("d3", "z", 1), ("d3", "w", 5),
    # hot term in every doc — pruned by the max_df ceiling below
    ("d1", "h", 1), ("d2", "h", 1), ("d3", "h", 1),
]


def test_doc_similarity_tf_cosine_with_df_window():
    from ocr_search_ray.stages.correlate import doc_similarity

    # df: x=2, y=2, z=2 (kept), q=1, w=1 (below min_df), h=3 (above max_df)
    # kept vectors: d1{x:2,y:3} nsq=13, d2{x:1,z:4} nsq=17, d3{y:2,z:1} nsq=5
    got = {
        (r["doc_id"], r["neighbor"]): r["sim"]
        for r in doc_similarity(
            _postings(_SIM_ROWS), min_df=2, max_df=2, k=3
        ).take_all()
    }
    assert got[("d1", "d3")] == (6 / math.sqrt(13)) / math.sqrt(5)
    assert got[("d1", "d2")] == (2 / math.sqrt(13)) / math.sqrt(17)
    assert got[("d2", "d3")] == (4 / math.sqrt(17)) / math.sqrt(5)
    # both orders present, same value (computed once in lower-id order)
    assert got[("d3", "d1")] == got[("d1", "d3")]
    assert len(got) == 6


def test_doc_similarity_topk_truncates_per_doc():
    from ocr_search_ray.stages.correlate import doc_similarity

    out = doc_similarity(
        _postings(_SIM_ROWS), min_df=2, max_df=2, k=1
    ).take_all()
    assert len(out) == 3
    assert {r["doc_id"]: r["neighbor"] for r in out} == {
        "d1": "d3", "d2": "d3", "d3": "d1"
    }
