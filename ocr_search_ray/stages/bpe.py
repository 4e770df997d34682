"""Byte-pair-encoding tokenizer training + application, Ray-Data-native.

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") trains on the WORD-FREQUENCY table, not the corpus: the only
corpus-sized work is ONE exchange (word counts, with per-batch partial
combine so hot words collapse to one row per batch before the shuffle).
The merge loop itself runs over the bounded word-TYPE table — exactly how
real trainers (subword-nmt, SentencePiece) are shaped, because word types
grow ~Heaps-law sublinearly and are further capped by a frequency floor.

Scale contract (100 TB):
- ``word_frequencies``: per-batch Arrow group_by partials, then one
  int-key cluster exchange (``cluster_apply`` — crc32 key hash, equal keys
  never split). No string-key sort, no driver collect.
- ``bpe_train``: the ONLY driver materialization is the candidate type
  table, hard-capped at ``max_types`` rows via ``topk_rows`` (per-block
  heads + one small reduce — no sort exchange). At web scale the cap IS
  the algorithm (a frequency floor over types), not a concession: merges
  learned from the top types are the standard definition of corpus BPE.
- ``bpe_encode``: merges broadcast once (``ray.put``), applied by an actor
  pool with a per-actor word→tokens memo (the tokenizer-stage pattern,
  SURVEY.md ST1) — Zipf makes the memo hit rate ~1 after warmup.

Merge semantics (pinned by tests/test_bpe.py):
- pair counts include overlaps ("aaaa" contributes THREE (a,a) pairs);
- ties break toward the lexicographically smallest (left, right) pair;
- a chosen merge replaces all non-overlapping occurrences left-to-right;
- encoding replays merges by ascending rank (all occurrences per step),
  which reproduces the training segmentation for in-vocabulary words.

No reference analogue (beyond-reference training-data op; the reference's
tokenizer chain is SURVEY.md O8/O10/O11 and is NOT touched here).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .relational import cluster_apply, topk_rows


def word_frequencies(ds, text_col: str = "text"):
    """(word, count) over whitespace-split words — one exchange, exact.

    Per-batch partial combine first: an Arrow ``group_by`` collapses each
    batch to its distinct words, so the exchange moves type-rows, not
    token-rows (the standard combiner argument; hot words cost one row per
    map block)."""

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.utf8_split_whitespace(batch.column(text_col)))
        words = words.filter(pc.greater(pc.utf8_length(words), 0))
        g = pa.table({"word": words}).group_by("word").aggregate(
            [("word", "count")])
        return pa.table({
            "word": g.column("word"),
            "cnt": g.column("word_count").cast(pa.int64()),
        })

    def reduce_block(block: pa.Table) -> pa.Table:
        g = block.group_by("word").aggregate([("cnt", "sum")])
        return pa.table({
            "word": g.column("word"),
            "count": g.column("cnt_sum").cast(pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return cluster_apply(partials, ["word"], reduce_block)


def _apply_merge(syms: tuple, left: str, right: str) -> tuple:
    """Replace non-overlapping (left, right) occurrences, left-to-right."""
    out = []
    i, n = 0, len(syms)
    merged = left + right
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(word_freqs, n_merges: int, *, max_types: int = 65536
              ) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (word, count) dataset.

    Returns (merge_rank, lhs, rhs, pair_count) — rank 1 is the first merge;
    pair_count is the global pair frequency that won the rank (overlap
    counting, weighted by word count). Driver bound: EXACTLY the capped
    type table (≤ ``max_types`` rows, enforced by ``topk_rows`` before any
    collect); the loop is O(n_merges × types × word_len) driver CPU over
    that bounded table, zero further cluster traffic."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    capped = topk_rows(
        word_freqs, [("count", "descending"), ("word", "ascending")],
        max_types)
    rows = capped.take_all()  # bounded: <= max_types rows by construction
    vocab: dict[tuple, int] = {}
    for r in rows:
        vocab[tuple(r["word"])] = vocab.get(tuple(r["word"]), 0) + int(
            r["count"])

    ranks, lhss, rhss, counts = [], [], [], []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        (left, right), won = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ranks.append(rank)
        lhss.append(left)
        rhss.append(right)
        counts.append(won)
        nxt: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            m = _apply_merge(syms, left, right)
            nxt[m] = nxt.get(m, 0) + cnt
        vocab = nxt

    return pa.table({
        "merge_rank": pa.array(ranks, pa.int32()),
        "lhs": pa.array(lhss, pa.string()),
        "rhs": pa.array(rhss, pa.string()),
        "pair_count": pa.array(counts, pa.int64()),
    })


class _BpeEncoder:
    """Actor-pool stage: merges fetched once per actor, per-word memo."""

    def __init__(self, merges, text_col: str = "text"):
        import ray

        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        # rank per pair; ascending rank = application order
        self._ranks = {(l, r): k for k, l, r in merges}
        self._text_col = text_col
        self._memo: dict[str, tuple] = {}

    def _encode(self, word: str) -> tuple:
        toks = self._memo.get(word)
        if toks is None:
            syms = tuple(word)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    rk = self._ranks.get((syms[i], syms[i + 1]))
                    if rk is not None and (best is None or rk < best[0]):
                        best = (rk, syms[i], syms[i + 1])
                if best is None:
                    break
                syms = _apply_merge(syms, best[1], best[2])
            self._memo[word] = toks = syms
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = pc.utf8_split_whitespace(
            batch.column(self._text_col)).to_pylist()
        n_words, n_tokens = [], []
        for words in docs:
            words = [w for w in words if w]
            n_words.append(len(words))
            n_tokens.append(sum(len(self._encode(w)) for w in words))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })


def bpe_encode(ds, merges_table: pa.Table, *, text_col: str = "text",
               concurrency: int = 2, batch_size: int = 256):
    """Apply learned merges: (doc_id, n_words, n_tokens) per document.

    The merge table is broadcast ONCE (``ray.put``; actors fetch in
    ``__init__``), never re-shipped per batch. Zero exchanges — a pure
    actor-pool map, so it composes with any upstream without reshuffling."""
    import ray

    merges = list(zip(
        merges_table.column("merge_rank").to_pylist(),
        merges_table.column("lhs").to_pylist(),
        merges_table.column("rhs").to_pylist(),
    ))
    ref = ray.put(merges)
    return ds.map_batches(
        _BpeEncoder,
        fn_constructor_kwargs={"merges": ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
