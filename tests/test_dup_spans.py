"""dup_spans: exact duplicated-window spans (stages/dedup.py).

Pins: overlap-window extraction, corpus-wide (within OR across doc)
occurrence counting, gap>window island breaks, maximal-span endpoints —
hand cases plus a Hypothesis naive-reference property.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_search_ray.stages.dedup import dup_spans

W = 4


def _ds(texts: list[str]):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(max(1, len(texts)))


def _naive(texts: list[str], window: int = W, min_count: int = 2):
    occ: dict[str, int] = {}
    wins: list[list[tuple[int, str]]] = []
    for t in texts:
        words = [w for w in t.split(" ") if w]
        ws = [(s, " ".join(words[s:s + window]))
              for s in range(len(words) - window + 1)]
        wins.append(ws)
        for _, w in ws:
            occ[w] = occ.get(w, 0) + 1
    spans = []
    for d, ws in enumerate(wins):
        starts = [s for s, w in ws if occ[w] >= min_count]
        if not starts:
            continue
        lo = prev = starts[0]
        for s in starts[1:]:
            if s - prev > window:
                spans.append((d, lo, prev + window))
                lo = s
            prev = s
        spans.append((d, lo, prev + window))
    return sorted(spans)


def _run(texts: list[str], **kw):
    rows = dup_spans(_ds(texts), window=W, **kw).take_all()
    return sorted((r["doc_id"], r["span_start"], r["span_end"])
                  for r in rows)


def test_cross_doc_duplicate_window():
    got = _run(["a b c d e f", "x a b c d y"])
    assert got == [(0, 0, 4), (1, 1, 5)]


def test_within_doc_repetition_counts_and_merges():
    # overlapping hits at starts 0..4 merge into one maximal span
    got = _run(["p q p q p q p q", "unrelated words only here"])
    assert got == [(0, 0, 8)]


def test_gap_beyond_window_splits_spans():
    got = _run(
        ["a b c d u1 u2 u3 u4 u5 u6 e f g h",
         "a b c d z1 z2 e f g h"]
    )
    assert got == [(0, 0, 4), (0, 10, 14), (1, 0, 4), (1, 6, 10)]


def test_no_duplicates_no_rows():
    assert _run(["w1 w2 w3 w4 w5", "v1 v2 v3 v4 v5"]) == []


def test_short_docs_emit_no_windows():
    assert _run(["a b c", "a b c"]) == []  # < window words


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12)
      .map(" ".join),
    min_size=1, max_size=6))
def test_dup_spans_matches_naive(texts):
    assert _run(texts) == _naive(texts)
