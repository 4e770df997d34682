"""Golden fixtures for the two stopword modes (VERDICT r2 #6).

Default mode = English list (per-corpus default); multilingual mode = the
packaged ``stopwords.words()``-union stand-in. Both are locked so a list
edit that changes tokenizer OUTPUT fails loudly.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_search_ray.functions.stopwords_multi import (
    MULTILINGUAL_STOPWORDS,
    _ascii_words,
)
from ocr_search_ray.functions.tokenizer import ENGLISH_STOPWORDS, Tokenizer

MIXED = ("The quick search engine und der alte Mann que la vie des gens "
         "och det var en dag")


def test_union_is_superset_and_ascii_only():
    assert ENGLISH_STOPWORDS <= MULTILINGUAL_STOPWORDS
    assert all(w.isascii() for w in MULTILINGUAL_STOPWORDS)
    # the routing fact the packaging relies on: non-ASCII entries can never
    # match a token that reaches the filter, so dropping them is lossless
    assert _ascii_words("für été tres tres") == frozenset({"tres"})


def test_golden_default_english_mode():
    freqs = Tokenizer().term_freqs(MIXED)
    # German/French/Swedish function words SURVIVE the English-only filter
    assert freqs == {
        "quick": 1, "search": 1, "engine": 1, "und": 1, "der": 1,
        "alte": 1, "mann": 1, "que": 1, "la": 1, "vie": 1, "des": 1,
        "gens": 1, "och": 1, "det": 1, "var": 1, "en": 1, "dag": 1,
    }


def test_golden_multilingual_mode():
    freqs = Tokenizer(stopwords=MULTILINGUAL_STOPWORDS).term_freqs(MIXED)
    # the same sentence with the union: every function word drops, content
    # words stay
    assert freqs == {
        "quick": 1, "search": 1, "engine": 1, "alte": 1, "mann": 1,
        "vie": 1, "gens": 1, "dag": 1,
    }


def test_tokenize_pages_multilingual_flag():
    from ocr_search_ray.stages.tokenize import TokenizePages

    batch = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "text": pa.array([MIXED]),
        }
    )
    default_terms = set(
        TokenizePages()(batch).column("term").to_pylist()
    )
    multi_terms = set(
        TokenizePages(stopwords="multilingual")(batch).column("term").to_pylist()
    )
    assert "und" in default_terms and "und" not in multi_terms
    assert multi_terms < default_terms
    assert {"quick", "search", "engine"} <= multi_terms


def test_nltk_union_loader_guarded():
    import pytest

    from ocr_search_ray.functions.stopwords_multi import nltk_stopword_union

    try:
        union = nltk_stopword_union()
    except (ImportError, LookupError):
        pytest.skip("nltk corpus not installed (expected in this sandbox)")
    assert ENGLISH_STOPWORDS <= union
