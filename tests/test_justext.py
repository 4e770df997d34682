"""jusText-family block classifier: segmentation, both passes, edges."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions.justext import classify_blocks, page_blocks
from ocr_search_ray.stages.boilerplate import justext_blocks

GOOD = "the quick brown fox jumps over the lazy dog again and again ok"
SALAD = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"


def test_page_blocks_segmentation_and_link_chars():
    html = (
        b'<html><head><title>skip</title></head><body>'
        b'<ul><li><a href="/">home</a></li></ul>'
        b'<h1>hi there</h1><p>one <a href="x">two</a> three</p>'
        b'</body></html>'
    )
    blocks = page_blocks(html)
    assert blocks == [
        ("li", "home", 4),
        ("h1", "hi there", 0),
        ("p", "one two three", 3),
    ]


def test_page_blocks_error_returns_empty():
    assert page_blocks(b"\xff\xfe garbage \xff") == []


def test_classify_context_free_rules():
    rows = classify_blocks(
        [
            ("li", "home", 4),          # link 4*2 > 4 → bad
            ("p", "tiny block", 0),     # 2 words → short
            ("p", GOOD, 0),             # 13 words, 3 stops → good (>=5%)
            ("p", SALAD, 0),            # 12 words, 0 stops → near_good
        ]
    )
    assert [r["ctx_label"] for r in rows] == [
        "bad", "short", "good", "near_good"
    ]


def test_context_pass_neighbour_inheritance():
    # near_good adjacent to a good block flips good; short needs good on
    # BOTH sides; doc edges count as bad
    rows = classify_blocks(
        [
            ("p", GOOD, 0),
            ("p", "mid gap", 0),     # short between good and good → good
            ("p", GOOD, 0),
            ("p", SALAD, 0),         # near_good, prev good → good
            ("li", "home", 4),       # bad
            ("p", SALAD, 0),         # near_good between bad and edge → bad
        ]
    )
    assert [r["label"] for r in rows] == [
        "good", "good", "good", "good", "bad", "bad"
    ]
    rows2 = classify_blocks([("p", "edge short", 0), ("p", GOOD, 0)])
    # short at the document start: prev decided = edge = bad → bad
    assert [r["label"] for r in rows2] == ["bad", "good"]


def test_justext_blocks_stage_fanout():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "html": pa.array(
                    [f"<body><p>{GOOD}</p><p>{SALAD}</p></body>".encode()],
                    pa.binary(),
                ),
            }
        )
    )
    rows = justext_blocks(ds).take_all()
    assert [(r["doc_id"], r["block_idx"], r["label"]) for r in rows] == [
        (7, 0, "good"), (7, 1, "good")
    ]
    assert rows[0]["n_stop"] == 3 and rows[1]["n_stop"] == 0


def test_extract_html_meta_fields_and_nomatch():
    """Vectorized head extraction: all four fields, '' for absent ones,
    first-match-wins on duplicate tags."""
    import pyarrow as pa
    import ray.data as rd
    from ocr_search_ray.stages.boilerplate import extract_html_meta

    pages = [
        ('<html><head><title>A B</title>'
         '<meta name="description" content="first twelve words here">'
         '<link rel="canonical" href="https://x.example/c1">'
         '<meta charset="utf-8"></head><body>t</body></html>'),
        "<html><head></head><body>no head fields</body></html>",
        ('<html><head><title>T1</title><title>T2</title>'
         '</head><body></body></html>'),
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "html": pa.array(pages)})
    ).repartition(2)
    got = {r["doc_id"]: r for r in extract_html_meta(ds).take_all()}
    assert got[0]["title"] == "A B"
    assert got[0]["meta_description"] == "first twelve words here"
    assert got[0]["canonical_url"] == "https://x.example/c1"
    assert got[0]["charset"] == "utf-8"
    assert (got[1]["title"], got[1]["meta_description"],
            got[1]["canonical_url"], got[1]["charset"]) == ("", "", "", "")
    assert got[2]["title"] == "T1"
