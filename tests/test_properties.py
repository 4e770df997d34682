"""Property-based conformance tests (hypothesis) for the pure kernels.

SURVEY.md §5: the reference ships no unit tests, so the conformance surface
is defined here — these properties pin the *algebraic* contracts that the
Ray pipeline relies on (order-insensitivity of counting, padding-rule shape,
bucket stability) independent of any fixture corpus.
"""

from collections import Counter

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from ocr_search_ray.functions.hashing import doc_id, file_id  # noqa: E402
from ocr_search_ray.functions.minhash import jaccard, shingles  # noqa: E402
from ocr_search_ray.functions.tokenizer import Tokenizer  # noqa: E402
from ocr_search_ray.stages.index import N_BUCKETS_DEFAULT, term_bucket  # noqa: E402

# text with ASCII, CJK, punctuation, whitespace and controls mixed in
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E20),
        st.sampled_from(" \t\n•、"),
    ),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_term_freqs_equals_counter_of_terms(s):
    """The memoized/fast-path term_freqs must equal counting the ordered
    terms list — for ANY input, not just the fixture corpus."""
    tok = Tokenizer()
    assert tok.term_freqs(s) == dict(Counter(tok.terms(s)))


@settings(max_examples=200, deadline=None)
@given(_text)
def test_tokenizer_is_pure(s):
    """Same input → same output, across two independent tokenizers (one with
    a warm memo, one cold)."""
    warm = Tokenizer()
    warm.term_freqs(s)  # prime the memo
    assert warm.term_freqs(s) == Tokenizer().term_freqs(s)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=80), st.integers(1, 9999))
def test_doc_id_padding_rule(url, page_count):
    """docId = sha256(url + '-' + idx zero-padded to len(str(page_count)))
    (reference PdfUtil.class.js:66-70): ids are 64-hex, distinct per page,
    and change shape exactly when page_count crosses a power of ten."""
    width = len(str(page_count))
    a = doc_id(url, 1, page_count)
    assert len(a) == 64 and len(file_id(url)) == 64
    import hashlib

    expected = hashlib.sha256(f"{url}-{str(1).zfill(width)}".encode()).hexdigest()
    assert a == expected
    if page_count >= 2:
        assert doc_id(url, 2, page_count) != a


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=30))
def test_term_bucket_in_range_and_stable(term):
    b = term_bucket(term)
    assert 0 <= b < N_BUCKETS_DEFAULT
    assert b == term_bucket(term)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30),
       st.lists(st.sampled_from("abcdxyz"), min_size=0, max_size=30))
def test_jaccard_bounds_symmetry_identity(ws1, ws2):
    a, b = shingles(" ".join(ws1)), shingles(" ".join(ws2))
    inter, union = jaccard(a, b)
    assert 0 <= inter <= union
    assert jaccard(b, a) == (inter, union)  # symmetric
    self_inter, self_union = jaccard(a, a)
    assert self_inter == self_union == len(a)  # identity


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=0, max_size=25))
def test_crc32_column_matches_zlib(strings):
    """crc32_column is bit-exact with zlib.crc32 per row — both the
    ragged fallback and (when hypothesis produces equal widths) the
    vectorized fixed-width path."""
    import zlib

    import pyarrow as pa

    from ocr_search_ray.functions.hashing import crc32_column

    got = crc32_column(pa.array(strings, pa.string()))
    assert list(got) == [zlib.crc32(s.encode()) for s in strings]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=64,
                        max_size=64), min_size=1, max_size=25),
       st.integers(min_value=0, max_value=8))
def test_crc32_column_fixed_width_path(digests, offset):
    """The vectorized (n, w)-matrix path — exercised via 64-hex digests,
    including a sliced (non-zero arr.offset) input — matches
    digest_bucket()'s scalar recipe exactly."""
    import pyarrow as pa

    from ocr_search_ray.functions.hashing import crc32_column
    from ocr_search_ray.stages.dedup_disk import digest_bucket

    arr = pa.array(digests * 2, pa.string()).slice(offset, len(digests))
    got = crc32_column(arr) % 64
    want = [digest_bucket(d) for d in arr.to_pylist()]
    assert list(got) == want
