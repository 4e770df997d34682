"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting — first-class training-data-pipeline stages.

All numeric outputs are exact integers (ratios left to consumers) so the
relational oracles compare integers, not floats.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.minhash import fingerprint
from ..functions.tokenizer import ENGLISH_STOPWORDS

# Tiny per-language function-word profiles (public-knowledge high-frequency
# words) for the n-gram/stopword-profile language heuristic.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is was for on are with as at be this have it".split()),
    "de": frozenset("der die das und ist von mit den nicht ein eine zu auf für".split()),
    "es": frozenset("el la los las de y en que es un una por con para del".split()),
    "fr": frozenset("le la les de et est un une que dans pour qui sur avec pas".split()),
}

_RE_TOKEN = re.compile(r"[a-z]+|[0-9]+")  # BPE-ish: letter runs / digit runs
_CJK = re.compile(r"[一-鿿]")


def detect_lang(text: str) -> str:
    """Deterministic heuristic language ID: CJK char ratio first, then
    function-word profile voting (ties broken by profile name order)."""
    if not text:
        return "unknown"
    cjk = len(_CJK.findall(text))
    if cjk * 10 >= len(text):  # ≥10% CJK chars
        return "zh"
    tokens = text.lower().split()
    if not tokens:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang in sorted(_LANG_PROFILES):
        hits = sum(1 for t in tokens if t in _LANG_PROFILES[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits else "unknown"


def lang_id(documents, *, id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, pred_lang)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pred_lang": pa.array([detect_lang(t or "") for t in texts],
                                      pa.string()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def quality_stats(documents, *, id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, n_chars, n_tokens, n_stopwords, n_types, sum_token_len).

    The classic length/stopword-ratio quality signals as exact counters
    (ratios = n_stopwords/n_tokens etc. are consumer-side division).
    Tokens = single-space split, empty tokens excluded (SQL: len(t) > 0).
    """

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        n_chars, n_tokens, n_stop, n_types, sum_len = [], [], [], [], []
        for t in texts:
            t = t or ""
            toks = [w for w in t.split(" ") if w]
            n_chars.append(len(t))
            n_tokens.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in ENGLISH_STOPWORDS))
            n_types.append(len(set(toks)))
            sum_len.append(sum(len(w) for w in toks))
        return pa.table(
            {
                id_col: ids,
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "sum_token_len": pa.array(sum_len, pa.int64()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def quality_filter(documents, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_tokens: int = 25, max_tokens: int = 10_000,
                   mean_len_bounds: tuple[int, int] = (3, 10),
                   stop_ratio_min: tuple[int, int] = (1, 25),
                   ttr_min: tuple[int, int] = (3, 10)):
    """→ (doc_id, keep, reasons): the Gopher-style composite quality gate
    (Rae et al. 2021 §A1.1), integer-exact.

    Every ratio rule is evaluated as a cross-multiplied integer
    comparison (``n_stopwords * den >= n_tokens * num`` etc.) so the
    verdicts — and the deterministic comma-joined ``reasons`` string —
    are bit-reproducible and SQL-replayable with no float boundary risk.
    Rules, in reasons order: too_short, too_long, mean_len (mean token
    length outside [lo, hi]), stopword_ratio (< num/den), ttr
    (type-token ratio < num/den — the repetition guard).

    Zero exchanges: a vectorized verdict map over the ``quality_stats``
    counters. Consumers filter on ``keep`` or audit the drop mix by
    grouping ``reasons``.
    """

    ml_lo, ml_hi = mean_len_bounds
    sr_num, sr_den = stop_ratio_min
    ttr_num, ttr_den = ttr_min

    def verdict(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nt = batch.column("n_tokens")
        sl = batch.column("sum_token_len")
        ns = batch.column("n_stopwords")
        ty = batch.column("n_types")
        too_short = pc.less(nt, min_tokens)
        too_long = pc.greater(nt, max_tokens)
        mean_len_bad = pc.or_(
            pc.less(sl, pc.multiply(nt, ml_lo)),
            pc.greater(sl, pc.multiply(nt, ml_hi)),
        )
        stop_bad = pc.less(pc.multiply(ns, sr_den), pc.multiply(nt, sr_num))
        ttr_bad = pc.less(pc.multiply(ty, ttr_den), pc.multiply(nt, ttr_num))
        fails = [
            ("too_short", too_short), ("too_long", too_long),
            ("mean_len", mean_len_bad), ("stopword_ratio", stop_bad),
            ("ttr", ttr_bad),
        ]
        keep = pc.invert(
            pc.or_(pc.or_(pc.or_(too_short, too_long), mean_len_bad),
                   pc.or_(stop_bad, ttr_bad))
        )
        # null-free accumulation: pyarrow's binary_join_element_wise with
        # null_handling="skip" DROPS all-null rows (length changes! —
        # observed on 16.1), so the reasons string is built by pairwise
        # concat of empty-string-filled parts instead
        empty = pa.scalar("", pa.string())
        reasons = None
        for label, flag in fails:
            lbl = pc.if_else(flag, pa.scalar(label, pa.string()), empty)
            if reasons is None:
                reasons = lbl
                continue
            sep = pc.if_else(
                pc.and_(pc.not_equal(reasons, ""), flag),
                pa.scalar(",", pa.string()), empty,
            )
            reasons = pc.binary_join_element_wise(reasons, sep, lbl, "")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "keep": keep,
                "reasons": reasons,
            }
        )

    return quality_stats(
        documents, id_col=id_col, text_col=text_col
    ).map_batches(verdict, batch_format="pyarrow")


def token_counts(documents, *, id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, n_ws_tokens, n_re_tokens): whitespace tokens and
    regex-tokenizer tokens ([a-z]+|[0-9]+ runs — the BPE-ish pre-split)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_ws_tokens": pa.array(
                    [len([w for w in (t or "").split(" ") if w]) for t in texts],
                    pa.int64(),
                ),
                "n_re_tokens": pa.array(
                    [len(_RE_TOKEN.findall((t or "").lower())) for t in texts],
                    pa.int64(),
                ),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def fingerprints(documents, *, k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text"):
    """→ (doc_id, fingerprint): min-md5-shingle document fingerprint."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(
                    [fingerprint(t or "", k) for t in texts], pa.string()
                ),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def approx_distinct(ds, col: str, *, precision: int = 12):
    """→ single row (estimate:int64, n_registers:int64): HyperLogLog
    distinct count (Flajolet et al. 2007) — THE sketch for cardinality at
    10^12 rows, where exact distinct needs a full exchange
    (``term_stats``-style) and a sketch needs 2^precision bytes total.

    Per batch: md5 each value, first ``precision`` hash bits pick a
    register, the register keeps max leading-zero rank of the rest (pure
    numpy). Registers merge by ELEMENTWISE MAX — order-free and
    idempotent — via one tiny exchange (one 2^precision-byte row per
    batch); the driver sees a single merged register row. Standard bias
    correction + small-range (linear counting) correction applied.
    Deterministic (md5) — same data → same estimate, any partitioning.
    Typical error 1.04/sqrt(2^precision) ≈ 1.6% at the default.
    """
    import hashlib

    import numpy as np

    m = 1 << precision

    def batch_registers(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        vals = batch.column(col).to_pylist()
        for v in vals:
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "big")
            idx = h >> (64 - precision)
            rest = h & ((1 << (64 - precision)) - 1)
            # rank = leading zeros of the remaining 64-p bits, +1
            rank = (64 - precision) - rest.bit_length() + 1
            if rank > regs[idx]:
                regs[idx] = rank
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def block_merge(block: pa.Table) -> pa.Table:
        import numpy as np

        merged = np.zeros(m, dtype=np.uint8)
        for b in block.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    from .relational import cluster_apply

    parts = ds.select_columns([col]).map_batches(
        batch_registers, batch_format="pyarrow"
    )
    # constant key → all register rows co-locate; block-local max-merge
    merged_rows = cluster_apply(
        parts.map_batches(
            lambda t: t.append_column(
                "k", pa.repeat(pa.scalar(0, pa.int32()), t.num_rows)),
            batch_format="pyarrow",
        ),
        ["k"],
        lambda b: block_merge(b),
    ).take_all()

    import numpy as np

    regs = np.zeros(m, dtype=np.uint8)
    for r in merged_rows:
        regs = np.maximum(regs, np.frombuffer(r["regs"], dtype=np.uint8))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return pa.table(
        {
            "estimate": pa.array([int(round(est))], pa.int64()),
            "n_registers": pa.array([m], pa.int64()),
        }
    )


def winnowing_fingerprints(documents, *, k: int = 3, window: int = 4,
                           id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, gram_hash, pos): winnowing fingerprint sets (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS rolling-hash scheme the brief's
    "document fingerprinting" names).

    Per doc: md5 over each word k-gram, slide a ``window``-wide window over
    the hash sequence, select each window's MINIMUM (rightmost position on
    ties), deduplicate selections. Guarantee: any shared word run of length
    ≥ window + k − 1 produces a shared fingerprint; expected density
    2/(window+1). Positions are 1-based (SQL parity). Batch-local — no
    shuffle; downstream plagiarism/near-dup joins group on gram_hash.
    """
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_h, out_p = [], [], []
        for did, t in zip(ids, texts):
            words = (t or "").split(" ")
            n = len(words) - k + 1
            if n < 1:
                continue
            hs = [
                hashlib.md5(" ".join(words[i:i + k]).encode()).hexdigest()
                for i in range(n)
            ]
            picked: set[tuple[str, int]] = set()
            for j in range(max(0, n - window + 1)):
                win = hs[j:j + window]
                m = min(win)
                pos = max(i for i in range(j, j + len(win)) if hs[i] == m)
                picked.add((m, pos + 1))  # 1-based
            for h, p in sorted(picked, key=lambda x: x[1]):
                out_id.append(did)
                out_h.append(h)
                out_p.append(p)
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "gram_hash": pa.array(out_h, pa.string()),
                "pos": pa.array(out_p, pa.int64()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def vocab_stats(postings):
    """→ single row (n_terms, n_postings, total_tf) — corpus-level vocabulary
    statistics from a POSTINGS dataset (two-phase: batch partials, then sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "n_postings": pa.array([batch.num_rows], pa.int64()),
                "total_tf": pa.array(
                    [pc.sum(batch.column("tf")).as_py() or 0], pa.int64()
                ),
            }
        )

    parts = postings.map_batches(partial, batch_format="pyarrow").take_all()
    # distinct-term count via the int-key term_stats exchange (one row per
    # term) — not a string-key unique() over the posting stream
    from .index import term_stats

    n_terms = term_stats(postings).count()
    return pa.table(
        {
            "n_terms": pa.array([n_terms], pa.int64()),
            "n_postings": pa.array([sum(r["n_postings"] for r in parts)], pa.int64()),
            "total_tf": pa.array([sum(r["total_tf"] for r in parts)], pa.int64()),
        }
    )


def bigram_familiarity(documents, *, id_col: str = "doc_id",
                       text_col: str = "text"):
    """→ (doc_id, n_bigrams, familiarity_sum): corpus-LM quality signal.

    The CCNet-style "does this document look like the corpus" score,
    integer-exact: train a bigram count model ON the corpus itself, then
    score every document by the summed corpus frequency of its bigrams
    (garbled / boilerplate-mangled docs sit in the rare-bigram tail;
    consumers divide familiarity_sum / n_bigrams for the per-doc mean or
    bucket on it for filtering). Tokens = single-space split, empties
    excluded — the ``ngram_counts`` convention.

    Scale shape: one tokenize pass emits per-(doc, bigram) occurrence
    partials; ONE int-key exchange on the bigram string co-locates each
    bigram's rows, so its corpus count is a block-local Arrow group_by
    and joins back to the same block's rows with no second shuffle of
    the model — the "train + score without broadcasting the model"
    plan. A second exchange regroups per-doc partials. Hot bigrams (the
    Zipf head) co-locate like hot terms in the postings index — the
    same skew profile the index build already carries. Every doc emits
    a sentinel row so zero-bigram docs (< 2 tokens) surface with exact
    zeros. No driver state.
    """
    from .relational import cluster_apply

    def doc_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_id: list = []
        out_ng: list[str] = []
        out_occ: list[int] = []
        ids = batch.column(id_col).to_pylist()
        for did, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = [w for w in (t or "").split(" ") if w]
            counts: Counter = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            # sentinel: every doc appears even with zero bigrams. The key
            # is per-doc unique (no space → can't equal a real bigram, and
            # even a pathological collision is harmless: occ=0 contributes
            # 0 to the group's count and 0 to every sum) so sentinels
            # hash-spread instead of piling into one hot "" partition.
            out_id.append(did)
            out_ng.append("\x00" + str(did))
            out_occ.append(0)
            out_id.extend([did] * len(counts))
            out_ng.extend(counts.keys())
            out_occ.extend(counts.values())
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "ngram": pa.array(out_ng, pa.string()),
                "occ": pa.array(out_occ, pa.int64()),
            }
        )

    def block_score(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # all rows of each bigram are in this block: corpus count = local sum
        cnt = block.group_by("ngram").aggregate([("occ", "sum")])
        cnt = cnt.rename_columns(["ngram", "c"])
        j = block.join(cnt, keys="ngram")
        fam = pc.multiply(j.column("occ"), j.column("c"))
        per = j.append_column("fam", fam).group_by(id_col).aggregate(
            [("occ", "sum"), ("fam", "sum")]
        )
        return pa.table(
            {
                id_col: per.column(id_col),
                "n_part": per.column("occ_sum").cast(pa.int64()),
                "fam_part": per.column("fam_sum").cast(pa.int64()),
            }
        )

    def block_total(block: pa.Table) -> pa.Table:
        agg = block.group_by(id_col).aggregate(
            [("n_part", "sum"), ("fam_part", "sum")]
        )
        return pa.table(
            {
                id_col: agg.column(id_col),
                "n_bigrams": agg.column("n_part_sum").cast(pa.int64()),
                "familiarity_sum": agg.column("fam_part_sum").cast(pa.int64()),
            }
        )

    partials = documents.select_columns([id_col, text_col]).map_batches(
        doc_partials, batch_format="pyarrow"
    )
    scored = cluster_apply(partials, ["ngram"], block_score)
    return cluster_apply(scored, [id_col], block_total)


def ngram_counts(documents, *, n: int = 2, min_count: int = 1,
                 id_col: str = "doc_id", text_col: str = "text"):
    """→ (ngram, count): corpus-wide word n-gram frequencies.

    Per-batch partial counts (one row per distinct n-gram per batch — the
    combiner collapses the Zipf head before the exchange), exact sums via
    the int-key exchange. Tokens = single-space split, empties excluded.
    """
    from collections import Counter

    from .relational import cluster_apply

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = [w for w in (t or "").split(" ") if w]
            for i in range(len(toks) - n + 1):
                counts[" ".join(toks[i:i + n])] += 1
        return pa.table(
            {
                "ngram": pa.array(list(counts), pa.string()),
                "c_part": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def block_sum(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = block.group_by("ngram").aggregate([("c_part", "sum")])
        out = pa.table(
            {"ngram": agg.column("ngram"),
             "count": agg.column("c_part_sum").cast(pa.int64())}
        )
        return out.filter(pc.greater_equal(out.column("count"), min_count))

    partials = documents.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return cluster_apply(partials, ["ngram"], block_sum)


def collocations(documents, *, min_count: int = 3, scale: int = 10**9,
                 id_col: str = "doc_id", text_col: str = "text"):
    """→ (w1, w2, pair_n, w1_n, w2_n, lift_scaled): corpus bigram
    collocations scored by integer-scaled PMI lift (Church & Hanks 1990
    association ratio): lift_scaled = ((scale·pair_n) // w1_n) // w2_n.
    Ranking by that ratio ranks by PMI (the NW²/NB normalization is a
    constant across pairs, and floor division preserves order up to the
    quantization the scale makes explicit); keeping the raw integer
    counts alongside lets callers recompute any PMI variant exactly.

    Scale shape: both count tables come from ``ngram_counts``'s
    combiner-collapsed partial-sum plan (one row per distinct gram per
    batch crosses the exchange — the Zipf head collapses block-locally);
    the pair table is min_count-pruned BEFORE the two unigram-attach
    ``cluster_join`` passes, so the joins move only surviving pairs.
    All-integer lattice → a DuckDB oracle replays it bit-exactly
    (a // b // c == a // (b·c) for positive ints, both sides
    left-associative floor). Overflow bound: scale·pair_n must fit
    int64 — pair_n < 9.2·10^9 at the default scale; raise min_count /
    lower scale past that (hot "of the"-class pairs at 10^13-token
    corpora), the counts themselves never overflow.
    """
    import pyarrow.compute as pc

    from .relational import cluster_join

    big = ngram_counts(documents, n=2, min_count=min_count,
                       id_col=id_col, text_col=text_col)
    # uni feeds BOTH attach joins — pin it or each join re-runs the
    # count (and re-scans documents) from scratch. documents itself is
    # scanned twice (bigram + unigram pass) by design: the scans stream
    # and the alternative (materializing the text column) costs more.
    uni = ngram_counts(
        documents, n=1, id_col=id_col, text_col=text_col
    ).materialize()

    def split_pair(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("ngram"), " ")
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "pair_n": batch.column("count"),
            }
        )

    pairs = big.map_batches(split_pair, batch_format="pyarrow")
    with_c1 = cluster_join(
        pairs,
        uni.map_batches(
            lambda b: pa.table(
                {"w1": b.column("ngram"), "w1_n": b.column("count")}
            ),
            batch_format="pyarrow",
        ),
        ["w1"],
        left_types={"w1": pa.string(), "w2": pa.string(),
                    "pair_n": pa.int64()},
        right_types={"w1_n": pa.int64()},
    )
    with_both = cluster_join(
        with_c1,
        uni.map_batches(
            lambda b: pa.table(
                {"w2": b.column("ngram"), "w2_n": b.column("count")}
            ),
            batch_format="pyarrow",
        ),
        ["w2"],
        left_types={"w1": pa.string(), "w2": pa.string(),
                    "pair_n": pa.int64(), "w1_n": pa.int64()},
        right_types={"w2_n": pa.int64()},
    )

    def score(batch: pa.Table) -> pa.Table:
        lift = pc.divide(
            pc.divide(
                pc.multiply(batch.column("pair_n"), scale),
                batch.column("w1_n"),
            ),
            batch.column("w2_n"),
        )
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "pair_n": batch.column("pair_n"),
                "w1_n": batch.column("w1_n"),
                "w2_n": batch.column("w2_n"),
                "lift_scaled": lift.cast(pa.int64()),
            }
        )

    return with_both.map_batches(score, batch_format="pyarrow")


def domain_ngrams(pages, *, n: int = 2, k: int = 5,
                  url_col: str = "url", text_col: str = "text"):
    """→ (domain, ngram, count): per-domain top-k word n-grams under
    (count desc, ngram asc) — the domain-conditional companion to
    ``ngram_counts`` (per-host boilerplate phrases surface here long
    before they dominate the global counts; the standard crawl-audit
    signal behind per-domain boilerplate filters).

    Two exchanges: per-batch (domain, gram) partial counts (the batch
    combiner collapses each host's repeated phrases to one row per
    batch) → one (domain, ngram)-key sum, then ``grouped_topk`` on the
    domain — only k rows per domain survive the block walk, so hot hosts
    never skew downstream. SQL analogue: row_number() OVER (PARTITION BY
    domain ORDER BY count DESC, ngram) <= k.
    """
    from collections import Counter
    from urllib.parse import urlsplit

    from .relational import cluster_apply, grouped_topk

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        urls = batch.column(url_col).to_pylist()
        for u, t in zip(urls, batch.column(text_col).to_pylist()):
            dom = urlsplit(u).netloc
            toks = [w for w in (t or "").split(" ") if w]
            for i in range(len(toks) - n + 1):
                counts[(dom, " ".join(toks[i:i + n]))] += 1
        keys = list(counts)
        return pa.table(
            {
                "domain": pa.array([d for d, _ in keys], pa.string()),
                "ngram": pa.array([g for _, g in keys], pa.string()),
                "c_part": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def block_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by(["domain", "ngram"]).aggregate(
            [("c_part", "sum")]
        )
        return pa.table(
            {"domain": agg.column("domain"), "ngram": agg.column("ngram"),
             "count": agg.column("c_part_sum").cast(pa.int64())}
        )

    sums = cluster_apply(
        pages.select_columns([url_col, text_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["domain", "ngram"], block_sum,
    )
    return grouped_topk(
        sums, ["domain"],
        [("count", "descending"), ("ngram", "ascending")], k,
    )


def domain_cap(docs, cap: int, *, url_col: str = "url"):
    """→ input rows, at most ``cap`` per registrable host — per-domain
    frequency capping, the standard web-corpus skew guard (a handful of
    hot hosts otherwise dominate a crawl-derived training set).

    Deterministic keep rule: the first ``cap`` rows per domain under url
    ascending (SQL: row_number() OVER (PARTITION BY domain ORDER BY url)
    <= cap). One int-key exchange on the domain via ``grouped_topk`` —
    a hot domain's rows co-locate, but only ``cap`` survive the block
    walk, so nothing downstream sees the skew. Input should be one row
    per document (e.g. pages filtered to page_idx = 1 — page indices are
    1-based, the reference convention); rows pass through unchanged plus
    a ``domain`` column.
    """
    from urllib.parse import urlsplit

    from .relational import grouped_topk

    def add_domain(batch: pa.Table) -> pa.Table:
        domains = [urlsplit(u).netloc
                   for u in batch.column(url_col).to_pylist()]
        return batch.append_column("domain", pa.array(domains, pa.string()))

    with_domain = docs.map_batches(add_domain, batch_format="pyarrow")
    return grouped_topk(with_domain, ["domain"], [(url_col, "ascending")],
                        cap)


def domain_stats(pages, *, url_col: str = "url", n_salts: int = 64):
    """→ (domain, n_pages, n_urls): per-domain volume — the skew monitor for
    hot domains (SURVEY.md §4).

    Salted two-level distinct: a hot domain's url set must never sit in one
    block, so the first exchange keys on (domain, salt = crc32(url) mod
    ``n_salts``) — each block deduplicates only its salt's slice (≤ |urls| /
    n_salts of the hottest domain) — and the second exchange sums the
    per-salt counts per domain. A url always maps to one salt, so the salt
    slices partition the url set and the distinct counts add exactly."""
    import zlib
    from urllib.parse import urlsplit

    from .relational import cluster_apply

    def partial(batch: pa.Table) -> pa.Table:
        # one flat row per DISTINCT url in the batch with its page count —
        # no nested lists cross the exchange
        counts: dict[tuple[str, str], int] = {}
        for u in batch.column(url_col).to_pylist():
            key = (urlsplit(u).netloc, u)
            counts[key] = counts.get(key, 0) + 1
        keys = sorted(counts)
        return pa.table(
            {
                "domain": pa.array([k[0] for k in keys], pa.string()),
                "url": pa.array([k[1] for k in keys], pa.string()),
                "salt": pa.array(
                    [zlib.crc32(k[1].encode()) % n_salts for k in keys],
                    pa.int32(),
                ),
                "n_part": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    def block_salt_merge(block: pa.Table) -> pa.Table:
        """Per (domain, salt): distinct urls of this salt slice + page sum."""
        rows: dict[tuple[str, int], tuple[int, set]] = {}
        for d, s, u, npart in zip(
            block.column("domain").to_pylist(),
            block.column("salt").to_pylist(),
            block.column("url").to_pylist(),
            block.column("n_part").to_pylist(),
        ):
            n, urls = rows.get((d, s), (0, set()))
            urls.add(u)
            rows[(d, s)] = (n + npart, urls)
        keys = sorted(rows)
        return pa.table(
            {
                "domain": pa.array([k[0] for k in keys], pa.string()),
                "pages_part": pa.array([rows[k][0] for k in keys], pa.int64()),
                "urls_part": pa.array(
                    [len(rows[k][1]) for k in keys], pa.int64()
                ),
            }
        )

    def block_domain_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by("domain").aggregate(
            [("pages_part", "sum"), ("urls_part", "sum")]
        )
        return pa.table(
            {
                "domain": agg.column("domain"),
                "n_pages": agg.column("pages_part_sum").cast(pa.int64()),
                "n_urls": agg.column("urls_part_sum").cast(pa.int64()),
            }
        )

    partials = pages.select_columns([url_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    salted = cluster_apply(partials, ["domain", "salt"], block_salt_merge)
    return cluster_apply(salted, ["domain"], block_domain_sum)


def repetition_stats(documents, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ (doc_id, n_words, n_distinct_words, top_word_count,
    dup_word_chars, n_2grams, n_distinct_2grams, top_2gram_count).

    The Gopher-family repetition signals (most-common-word fraction,
    duplicate-word character fraction, top-bigram fraction) as EXACT
    integer counters — ratios are consumer-side division, so the oracle
    compares integers, never float ops. Words = non-empty single-space
    split; bigrams = adjacent word pairs; ``dup_word_chars`` = total
    characters occupied by words whose count > 1 (len(word) × count).

    Scale: per-batch Counter pass, no shuffle, no state.
    """
    from collections import Counter

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        cols: dict[str, list[int]] = {
            k: [] for k in (
                "n_words", "n_distinct_words", "top_word_count",
                "dup_word_chars", "n_2grams", "n_distinct_2grams",
                "top_2gram_count",
            )
        }
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            wc = Counter(words)
            bigrams = [
                words[i] + " " + words[i + 1]
                for i in range(len(words) - 1)
            ]
            bc = Counter(bigrams)
            cols["n_words"].append(len(words))
            cols["n_distinct_words"].append(len(wc))
            cols["top_word_count"].append(max(wc.values(), default=0))
            cols["dup_word_chars"].append(
                sum(len(w) * c for w, c in wc.items() if c > 1)
            )
            cols["n_2grams"].append(len(bigrams))
            cols["n_distinct_2grams"].append(len(bc))
            cols["top_2gram_count"].append(max(bc.values(), default=0))
        return pa.table(
            {id_col: ids,
             **{k: pa.array(v, pa.int64()) for k, v in cols.items()}}
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def substring_search(documents, pattern: str, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ (doc_id): documents whose text CONTAINS ``pattern`` — SQL
    ``LIKE '%pattern%'`` via the trigram-index plan (pg_trgm / code
    search): in the indexed regime the corpus text is NEVER scanned for a
    query; this operator models that flow end to end with the index side
    built inline (swap step 1 for a prebuilt ``build_index`` layout over
    (tri, doc_id) rows to go fully on-disk — same machinery as the term
    index, tri ≙ term):

    1. each batch emits one (doc_id) row per PATTERN trigram it contains
       (vectorized ``match_substring`` per pattern trigram — only the
       pattern's own trigrams ever leave the scan, no text, no full
       trigram fan-out);
    2. one int-key exchange counts trigram hits per doc — docs hitting
       ALL pattern trigrams are candidates (complete: containing the
       string implies containing every trigram);
    3. candidates join BACK to the documents side (``cluster_join``
       inner — candidate-sized, no broadcast, no driver collect) and an
       exact vectorized ``match_substring`` removes trigram false
       positives.

    Patterns shorter than 3 chars fall back to the direct parallel scan.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply, cluster_join

    tris = sorted({pattern[i:i + 3] for i in range(len(pattern) - 2)})

    if not tris:
        def scan(batch: pa.Table) -> pa.Table:
            keep = batch.filter(
                pc.match_substring(batch.column(text_col), pattern))
            return pa.table({id_col: keep.column(id_col)})

        return documents.select_columns([id_col, text_col]).map_batches(
            scan, batch_format="pyarrow"
        )

    n_tris = len(tris)

    def emit_hits(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        ids = batch.column(id_col)
        parts = [
            pa.table({id_col: ids.filter(pc.match_substring(text, t))})
            for t in tris
        ]
        return pa.concat_tables(parts).combine_chunks()

    hits = documents.select_columns([id_col, text_col]).map_batches(
        emit_hits, batch_format="pyarrow"
    )

    def block_intersect(block: pa.Table) -> pa.Table:
        one = pa.repeat(pa.scalar(1, pa.int64()), block.num_rows)
        agg = block.append_column("one", one).group_by([id_col]).aggregate(
            [("one", "sum")]
        )
        full = agg.filter(pc.equal(agg.column("one_sum"), n_tris))
        return pa.table({id_col: full.column(id_col)})

    candidates = cluster_apply(hits, [id_col], block_intersect)

    id_type = pa.int64()
    joined = cluster_join(
        candidates, documents.select_columns([id_col, text_col]),
        [id_col],
        left_types={id_col: id_type},
        right_types={text_col: pa.string()},
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.match_substring(batch.column(text_col), pattern))
        return pa.table({id_col: keep.column(id_col)})

    return joined.map_batches(verify, batch_format="pyarrow")


def vocab_overlap(pages, *, url_col: str = "url", text_col: str = "text",
                  max_hosts_per_term: int = 10_000):
    """→ (host1, host2, n_shared, n_union, jaccard): per-host-pair
    vocabulary overlap — |V(a) ∩ V(b)| and Jaccard over the hosts'
    DISTINCT token sets, the crawl-audit signal behind mirror-site /
    syndication detection (two hosts sharing most of their vocabulary
    are serving the same content farm).

    Pair semantics: host1 < host2 lexicographically; pairs sharing zero
    terms do not appear (their Jaccard is 0 by convention on both
    sides). ``jaccard`` is the ONE pinned IEEE division
    inter / (|A| + |B| − inter) over exact int64 counts, so the oracle
    hash-compare is exact.

    Scale shape: a term shared by d hosts emits d·(d−1)/2 pairs —
    ``max_hosts_per_term`` drops stopword-like apex terms (the
    ``cocitation_counts.max_out`` / shingle-df-cap guard; a term on
    every host carries no overlap signal anyway). Physical plan: batch
    combiner dedups (host, term) per batch → ONE term-key
    ``cluster_apply`` (global distinct + triu pair emission,
    block-local numpy) → pair-key count; host vocab sizes are one
    host-key exchange over the SAME distinct stream, attached by two
    host-key ``cluster_join``s — never broadcast (hosts are
    corpus-sized on a real crawl). 5 int-key exchanges total, all on
    projected columns.
    """
    from urllib.parse import urlsplit

    import numpy as np

    from .relational import cluster_apply, cluster_join

    def partial(batch: pa.Table) -> pa.Table:
        seen: set = set()
        for u, t in zip(batch.column(url_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            dom = urlsplit(u).netloc
            for w in (t or "").split(" "):
                if w:
                    seen.add((dom, w))
        return pa.table(
            {"host": pa.array([h for h, _ in seen], pa.string()),
             "term": pa.array([w for _, w in seen], pa.string())}
        )

    distinct = cluster_apply(
        pages.select_columns([url_col, text_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["term"],
        lambda blk: blk.group_by(["term", "host"]).aggregate([]),
    )
    # the distinct stream feeds BOTH the pair emission and the vocab
    # sizes; pin it so a fresh-ingest caller doesn't re-run the corpus
    # scan per consumer (the multi-scan materialize rule).
    distinct = distinct.materialize()

    def pairs(block: pa.Table) -> pa.Table:
        tbl = block.sort_by([("term", "ascending"), ("host", "ascending")])
        terms = tbl.column("term").to_numpy(zero_copy_only=False)
        hosts = tbl.column("host").to_numpy(zero_copy_only=False)
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(terms)]))
        o1: list = []
        o2: list = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            g = hi - lo
            if g < 2 or g > max_hosts_per_term:
                continue
            i, j = np.triu_indices(g, k=1)
            grp = hosts[lo:hi]
            o1.append(grp[i])
            o2.append(grp[j])
        if not o1:
            return pa.table(
                {"host1": pa.array([], pa.string()),
                 "host2": pa.array([], pa.string())}
            )
        return pa.table(
            {"host1": pa.array(np.concatenate(o1), pa.string()),
             "host2": pa.array(np.concatenate(o2), pa.string())}
        )

    def count_pairs(block: pa.Table) -> pa.Table:
        agg = block.group_by(["host1", "host2"]).aggregate([([], "count_all")])
        return pa.table(
            {"host1": agg.column("host1"), "host2": agg.column("host2"),
             "n_shared": agg.column("count_all").cast(pa.int64())}
        )

    inter = cluster_apply(
        distinct.map_batches(pairs, batch_format="pyarrow"),
        ["host1", "host2"], count_pairs,
    )

    def count_hosts(block: pa.Table) -> pa.Table:
        agg = block.group_by(["host"]).aggregate([([], "count_all")])
        return pa.table(
            {"host": agg.column("host"),
             "n_vocab": agg.column("count_all").cast(pa.int64())}
        )

    sizes = cluster_apply(distinct, ["host"], count_hosts)

    def rename_for(side: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([side, f"n_{side}"])

        return f

    joined = cluster_join(
        cluster_join(
            inter,
            sizes.map_batches(rename_for("host1"), batch_format="pyarrow"),
            ["host1"],
            left_types={"host1": pa.string(), "host2": pa.string(),
                        "n_shared": pa.int64()},
            right_types={"n_host1": pa.int64()},
        ),
        sizes.map_batches(rename_for("host2"), batch_format="pyarrow"),
        ["host2"],
        left_types={"host1": pa.string(), "host2": pa.string(),
                    "n_shared": pa.int64(), "n_host1": pa.int64()},
        right_types={"n_host2": pa.int64()},
    )

    def finish(batch: pa.Table) -> pa.Table:
        inter_np = batch.column("n_shared").to_numpy(zero_copy_only=False)
        na = batch.column("n_host1").to_numpy(zero_copy_only=False)
        nb = batch.column("n_host2").to_numpy(zero_copy_only=False)
        union = na + nb - inter_np
        jac = inter_np.astype(np.float64) / union.astype(np.float64)
        return pa.table(
            {"host1": batch.column("host1"),
             "host2": batch.column("host2"),
             "n_shared": pa.array(inter_np, pa.int64()),
             "n_union": pa.array(union, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def char_profile(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document byte/character frequency profile for pure-ASCII
    documents: total byte count, distinct-byte count, the modal byte's
    count and the modal character itself (smallest byte on ties) — the
    encoding-damage / low-entropy screen (mojibake and binary spill
    produce degenerate profiles). Non-ASCII documents are excluded (for
    them bytes ≠ characters; the SQL mirror's per-CHARACTER split only
    matches on ASCII, where the two coincide).

    Physical plan: ZERO exchanges — one stateless vectorized map. Per
    batch the string column's Arrow data buffer is viewed as one uint8
    array (zero-copy), a doc index is repeated from the offsets, and a
    single ``np.bincount`` over ``doc_idx·256 + byte`` builds every
    document's 256-bin histogram at once; distinct/max/argmax are
    row-wise numpy reductions over the (n_docs, 256) view. No Python
    loop touches a row.

    → (doc_id, n_bytes:int64, n_distinct:int64, top_count:int64,
       top_char:string).
    """
    import numpy as np

    def profile(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        txt = batch.column(text_col).combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            if txt.num_chunks == 0:
                txt = pa.array([], pa.string())
            else:
                txt = (txt.chunk(0) if txt.num_chunks == 1
                       else pa.concat_arrays(txt.chunks))
        empty = pa.table(
            {id_col: ids.slice(0, 0),
             "n_bytes": pa.array([], pa.int64()),
             "n_distinct": pa.array([], pa.int64()),
             "top_count": pa.array([], pa.int64()),
             "top_char": pa.array([], pa.string())}
        )
        n = len(txt)
        if n == 0:
            return empty
        if pa.types.is_large_string(txt.type):
            off_np = np.frombuffer(txt.buffers()[1], dtype=np.int64)
        else:
            off_np = np.frombuffer(txt.buffers()[1], dtype=np.int32)
        off_np = off_np[txt.offset: txt.offset + n + 1].astype(np.int64)
        data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
        lens = np.diff(off_np)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        sub = data[off_np[0]: off_np[-1]]
        keys = doc_idx * 256 + sub.astype(np.int64)
        hist = np.bincount(keys, minlength=n * 256).reshape(n, 256)
        nonzero = hist > 0
        ascii_ok = ~nonzero[:, 128:].any(axis=1)
        keep = ascii_ok & (lens > 0)
        if not keep.any():
            return empty
        h = hist[keep]
        top_idx = h.argmax(axis=1)  # first max = smallest byte on ties
        return pa.table(
            {id_col: ids.filter(pa.array(keep)),
             "n_bytes": pa.array(lens[keep], pa.int64()),
             "n_distinct": pa.array(
                 nonzero[keep].sum(axis=1).astype(np.int64), pa.int64()),
             "top_count": pa.array(
                 h[np.arange(len(h)), top_idx].astype(np.int64),
                 pa.int64()),
             "top_char": pa.array([chr(b) for b in top_idx], pa.string())}
        )

    return ds.map_batches(profile, batch_format="pyarrow")
