"""Property-based pins for the round-4 pure kernels: OPC office container
round-trips and the page-raster pixel round-trip — algebraic contracts the
normalize chain and the S8 artifact sink rely on, independent of any
fixture corpus."""

from __future__ import annotations

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from ocr_search_ray.functions import officetext  # noqa: E402
from ocr_search_ray.functions.raster import (  # noqa: E402
    decode_png,
    encode_png,
    read_page_text,
    render_page_text,
)

# XML-valid text: printable ASCII + CJK + tab/newline/CR (raw control
# chars below 0x20 other than these are unrepresentable in XML 1.0 —
# documented pack() precondition)
_xml_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E20),
        st.sampled_from("\t\n\r&<>\"'"),
    ),
    max_size=300,
)

# the raster glyph alphabet is ASCII-exact (non-ASCII renders as DEL);
# CR is excluded: read_page_text rstrips line tails, so trailing spaces
# don't round-trip either — normalize expectations instead
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=300,
)


@settings(max_examples=60, deadline=None)
@given(_xml_text)
def test_docx_roundtrip_property(text):
    assert officetext.extract_docx_text(officetext.pack_docx(text)) == text


@settings(max_examples=40, deadline=None)
@given(st.lists(_xml_text, max_size=6))
def test_pptx_roundtrip_property(slides):
    got = officetext.extract_pptx_slides(officetext.pack_pptx(slides))
    assert got == (slides or [""])


@settings(max_examples=60, deadline=None)
@given(_ascii_text)
def test_page_raster_pixel_roundtrip_property(text):
    """decode(encode(render(text))) reconstructs the wrapped text up to
    the documented normalizations (line tails rstripped, trailing blank
    lines dropped, cols×max_lines cap)."""
    img = render_page_text(text, cols=20, max_lines=10)
    back = read_page_text(decode_png(encode_png(img)))

    # expected: the wrap of text at 20 cols, capped at 10 lines, tails
    # rstripped, trailing blank lines dropped
    lines = []
    for para in text.split("\n"):
        if not para:
            lines.append("")
            continue
        for i in range(0, len(para), 20):
            lines.append(para[i:i + 20])
            if len(lines) >= 10:
                break
        if len(lines) >= 10:
            break
    lines = [ln.rstrip() for ln in (lines[:10] or [""])]
    while lines and not lines[-1]:
        lines.pop()
    assert back == "\n".join(lines)


def test_bigram_familiarity_partitioning_invariant_and_matches_brute():
    """Exchange exactness: identical output under any block layout, equal
    to a single-process brute-force replay."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import bigram_familiarity

    rng = __import__("numpy").random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "the"]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(0, 12, size=60)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})

    corpus: Counter = Counter()
    per_doc = []
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        bgs = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        per_doc.append(bgs)
        corpus.update(bgs)
    expect = {i: (len(bgs), sum(corpus[b] for b in bgs))
              for i, bgs in enumerate(per_doc)}

    outs = []
    for parts in (1, 9):
        got = {r["doc_id"]: (r["n_bigrams"], r["familiarity_sum"])
               for r in bigram_familiarity(
                   rd.from_arrow(tbl).repartition(parts)).take_all()}
        outs.append(got)
    assert outs[0] == outs[1] == expect


def test_semantic_dedup_partitioning_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    vecs[50] = vecs[3] * 2.0      # scaled copy: cos == 1, same sign cell
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    outs = []
    for parts in (1, 11):
        kept = sorted(r["vec_id"] for r in semantic_dedup(
            rd.from_arrow(tbl).repartition(parts),
            threshold=0.8, bucket_bits=3).take_all())
        outs.append(kept)
    assert outs[0] == outs[1]
    assert 3 in outs[0] and 50 not in outs[0]
