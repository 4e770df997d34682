"""Tokenize + stem, reproducing the reference tokenizer chain in-process.

Reference chain (ocr_search ``src/Tokenizer/Tokenizer.class.js:28-75`` →
``src/py/tokenize_and_stem.py:24-66``), executed there as ONE fresh python3
subprocess per page (its single biggest inefficiency — SURVEY.md ST1). Here the
whole chain is a pure in-process function so a Ray actor pool can run it once
per batch with all state (stopwords, lemma tables, segmenter) loaded once per
worker:

1. pre-clean (textclean.preclean — strip chars, trim ASCII spaces, lowercase)
2. every ``string.punctuation`` char → space        (tokenize_and_stem.py:27-28)
3. whitespace word-split                            (:33 — word_tokenize; after
   punctuation removal its effect on our inputs is whitespace splitting; CJK
   runs stay intact as single tokens, matching NLTK's behavior)
4. ASCII / non-ASCII routing                        (:36-43)
5. English filter: len>1 AND has-alpha AND not-stopword   (:42)
6. double lemmatize: verb pass then noun pass       (:46-47)
7. CJK: keep only U+4E00–U+9FFF chars (all non-ASCII tokens concatenated into
   ONE string — separate runs merge, exactly as the reference does)   (:51)
8. segment CJK (:52 — jieba.cut_for_search when importable; deterministic
   unigram+bigram fallback otherwise, locked by golden fixtures)
9. count term frequencies                           (:58-63)

Stopword list: the standard English stopword list published with NLTK (public
data). The reference calls ``stopwords.words()`` with no language argument,
which concatenates every downloaded language list; this engine scopes to
English by default (configurable) and documents the divergence.
"""

from __future__ import annotations

import string
from collections import Counter

from .lemmatizer import lemmatize_double
from .textclean import preclean

# The NLTK English stopword list (public corpus data, reproduced as plain data).
ENGLISH_STOPWORDS: frozenset[str] = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your yours
yourself yourselves he him his himself she she's her hers herself it it's its
itself they them their theirs themselves what which who whom this that that'll
these those am is are was were be been being have has had having do does did
doing a an the and but if or because as until while of at by for with about
against between into through during before after above below to from up down
in out on off over under again further then once here there when where why how
all any both each few more most other some such no nor not only own same so
than too very s t can will just don don't should should've now d ll m o re ve
y ain aren aren't couldn couldn't didn didn't doesn doesn't hadn hadn't hasn
hasn't haven haven't isn isn't ma mightn mightn't mustn mustn't needn needn't
shan shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
wouldn't
""".split())

_PUNCT_TO_SPACE = str.maketrans({c: " " for c in string.punctuation})

_CJK_LO, _CJK_HI = 0x4E00, 0x9FFF


def _is_pure_ascii(token: str) -> bool:
    """ASCII detection (tokenize_and_stem.py:15-21 semantics)."""
    return token.isascii()


def _segment_cjk_fallback(text: str) -> list[str]:
    """Deterministic dictionary-free CJK segmentation.

    Search-mode-style output without jieba's dictionary: every unigram plus
    every overlapping bigram, in reading order. (jieba.cut_for_search emits
    words plus their sub-ngrams; without a lexicon, unigrams+bigrams are the
    deterministic analogue. Golden fixtures lock this choice.)
    """
    n = len(text)
    if n == 0:
        return []
    if n == 1:
        return [text]
    out: list[str] = []
    for i in range(n):
        out.append(text[i])
        if i + 1 < n:
            out.append(text[i : i + 2])
    return out


try:  # pragma: no cover - jieba absent in this environment
    import jieba as _jieba  # type: ignore

    def _segment_cjk(text: str) -> list[str]:
        return [w for w in _jieba.cut_for_search(text)]
except ImportError:
    _segment_cjk = _segment_cjk_fallback


class Tokenizer:
    """Stateful tokenizer: build once per worker, call per string.

    ``stopwords`` and the segmenter are constructor state so a Ray actor pool
    pays setup once per actor (SURVEY.md ST1), unlike the reference's
    per-string subprocess.
    """

    # word→result memo cap; Zipf vocabularies plateau far below this, the cap
    # only bounds adversarial corpora (random strings) on long-lived workers
    _CACHE_MAX = 1_000_000

    def __init__(
        self,
        stopwords: frozenset[str] = ENGLISH_STOPWORDS,
        segment_cjk=None,
    ) -> None:
        self.stopwords = stopwords
        self.segment_cjk = segment_cjk or _segment_cjk
        # memo for the English word path: word → lemmatized term, or None when
        # the filter drops the word. Pure function of the word, so caching is
        # exact; per-worker state paid once (SURVEY.md ST1 posture).
        self._eng_cache: dict[str, str | None] = {}

    def _eng_term(self, w: str) -> str | None:
        """Filter+lemmatize one ASCII word (tokenize_and_stem.py:42,46-47)."""
        cache = self._eng_cache
        try:
            return cache[w]
        except KeyError:
            pass
        if len(w) > 1 and any(c.isalpha() for c in w) and w not in self.stopwords:
            term = lemmatize_double(w)
        else:
            term = None
        if len(cache) >= self._CACHE_MAX:
            cache.clear()
        cache[w] = term
        return term

    def terms(self, raw_text: str) -> list[str]:
        """The ordered term list for a raw page text (before counting)."""
        text = preclean(raw_text)
        text = text.translate(_PUNCT_TO_SPACE)
        words = text.split()

        eng_terms: list[str] = []
        cjk_chars: list[str] = []
        for w in words:
            if not _is_pure_ascii(w):
                # all non-ASCII tokens are concatenated into ONE string before
                # the CJK-range filter — separate runs merge (reference :37-40,51)
                cjk_chars.extend(c for c in w if _CJK_LO <= ord(c) <= _CJK_HI)
            else:
                term = self._eng_term(w)
                if term is not None:
                    eng_terms.append(term)
        cjk_terms = self.segment_cjk("".join(cjk_chars))
        return eng_terms + list(cjk_terms)

    def term_freqs(self, raw_text: str) -> dict[str, int]:
        """TermFreqDict: term → occurrences (tokenize_and_stem.py:58-63).

        Fast path for pure-ASCII pages: count distinct WORDS first (C-level
        Counter), then map each distinct word through the memoized English
        path once. Counting commutes with the per-word map, so the result is
        identical to the ordered path; the CJK pipeline is order-sensitive
        (cross-token bigrams) and keeps the exact ordered walk."""
        text = preclean(raw_text)
        if text.isascii():
            text = text.translate(_PUNCT_TO_SPACE)
            out: dict[str, int] = {}
            eng_term = self._eng_term
            for w, c in Counter(text.split()).items():
                term = eng_term(w)
                if term is not None:
                    out[term] = out.get(term, 0) + c
            return out
        return dict(Counter(self.terms(raw_text)))


_DEFAULT = Tokenizer()


def tokenize(raw_text: str) -> dict[str, int]:
    """Module-level convenience using the default tokenizer."""
    return _DEFAULT.term_freqs(raw_text)
