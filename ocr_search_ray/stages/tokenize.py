"""Tokenization stage: page rows → exploded posting rows (doc_id, term, tf).

The reference spawns ONE fresh ``python3`` + NLTK/jieba import per page
(``src/Tokenizer/Tokenizer.class.js:40`` — SURVEY.md ST1, its biggest
inefficiency). Here tokenization is a **stateful actor-pool stage**: the
``TokenizePages`` callable class builds the tokenizer (stopword set, lemma
tables, CJK segmenter) once per actor in ``__init__`` and streams batches
through ``__call__``.

The per-page ``termFreqDict`` (tokenize_and_stem.py:58-63) is a per-row local
aggregate — no shuffle — and is exploded directly into posting rows so every
downstream groupby is native Arrow (SURVEY.md §1.4).

Usage:
    pages.map_batches(TokenizePages, concurrency=N, batch_size=512,
                      batch_format="pyarrow", zero_copy_batch=True)
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.tokenizer import Tokenizer
from ..functions.watchdog import BatchWatchdog, WatchdogTimeout
from ..schemas import POSTINGS, assert_schema

DEFAULT_TOKENIZE_TIMEOUT_S = 60.0  # reference: AppConfig.const.js:11-19

# Arm the per-row timer only for pages at least this large: the engine's
# tokenizer is linear (~30 ns/char), so a sub-100KB page finishes in ms and
# can never reach the 60 s budget — gating keeps the hot path syscall-free
# (arming everywhere measured ~20% off end-to-end ingest throughput).
WATCHDOG_ARM_MIN_CHARS = 100_000


class TokenizePages:
    """Actor-pool callable: PAGES batches → POSTINGS batches.

    ``timeout_s``: per-ROW watchdog (reference: 60 s tokenize budget,
    resolve-empty-and-continue) — a page whose tokenization expires
    contributes no postings, exactly like the reference's timeout path.
    """

    def __init__(self, *, timeout_s: float | None = DEFAULT_TOKENIZE_TIMEOUT_S,
                 stopwords=None, segment_cjk=None) -> None:
        # once-per-actor state (the reference pays this per page).
        # ``stopwords``: the reference's ``stopwords.words()`` (no argument)
        # unions EVERY downloaded NLTK language list. Three modes:
        #   None          → English list (per-corpus default; SURVEY.md O10)
        #   "multilingual"→ the packaged union (functions/stopwords_multi —
        #                   the ASCII-effective content of the reference's
        #                   union; only ASCII tokens ever reach the filter)
        #   iterable      → caller-supplied (e.g. nltk_stopword_union() for
        #                   byte-parity with a specific NLTK install)
        kwargs = {}
        if stopwords == "multilingual":
            from ..functions.stopwords_multi import MULTILINGUAL_STOPWORDS

            kwargs["stopwords"] = MULTILINGUAL_STOPWORDS
        elif stopwords is not None:
            kwargs["stopwords"] = frozenset(stopwords)
        if segment_cjk is not None:
            kwargs["segment_cjk"] = segment_cjk
        self.tokenizer = Tokenizer(**kwargs)
        self.timeout_s = timeout_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()

        out_doc: list[str] = []
        out_term: list[str] = []
        out_tf: list[int] = []
        with BatchWatchdog(self.timeout_s,
                           arm_min_hint=WATCHDOG_ARM_MIN_CHARS) as wd:
            for did, text in zip(doc_ids, texts):
                if not text:
                    continue  # empty/error pages → no postings ({} in ref)
                try:
                    freqs = wd.run(self.tokenizer.term_freqs, text,
                                   cost_hint=len(text))
                except WatchdogTimeout:
                    continue  # resolve empty, keep going (skip-don't-fail)
                for term, tf in freqs.items():
                    out_doc.append(did)
                    out_term.append(term)
                    out_tf.append(tf)

        table = pa.table(
            {
                "doc_id": pa.array(out_doc, pa.string()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )
        return assert_schema(table, POSTINGS, "tokenize")


_WORKER_TOKENIZER: TokenizePages | None = None


def _tokenize_task(batch: pa.Table) -> pa.Table:
    """Task-pool variant with once-per-worker-process state: Ray reuses
    worker processes across tasks, so a module-level cache gives the same
    load-once semantics as an actor pool without pinning a fixed pool size —
    the right trade when the state is cheap (compiled tables, not models)."""
    global _WORKER_TOKENIZER
    if _WORKER_TOKENIZER is None:
        _WORKER_TOKENIZER = TokenizePages()
    return _WORKER_TOKENIZER(batch)


def tokenize_pages(pages, *, concurrency: int | None = None,
                   batch_size: int = 512, stopwords=None, segment_cjk=None):
    """Attach the tokenize stage to a PAGES dataset.

    ``concurrency=None`` (default) → elastic task pool with per-worker cached
    state; an integer → fixed actor pool of that size (use when the tokenizer
    backend is heavyweight, e.g. real jieba/nltk models). ``stopwords`` /
    ``segment_cjk`` override the tokenizer backend per TokenizePages."""
    projected = pages.select_columns(["doc_id", "text"])
    if concurrency is None and stopwords is None and segment_cjk is None:
        return projected.map_batches(
            _tokenize_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    if concurrency is None:
        return projected.map_batches(
            TokenizePages(stopwords=stopwords, segment_cjk=segment_cjk),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return projected.map_batches(
        TokenizePages,
        fn_constructor_kwargs={"stopwords": stopwords,
                               "segment_cjk": segment_cjk},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
