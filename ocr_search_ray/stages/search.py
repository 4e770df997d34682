"""Query path: tokenize query → posting lookup → score merge → rank → top-k.

Re-expresses the reference search flow (``src/ApiServer/ApiHandler.const.js:
19-46`` → ``src/TermMatcher/TermMatcher.class.js:25-53``):

- query is tokenized with the SAME tokenizer as ingest (identical
  normalization — ApiHandler.const.js:31);
- per query term, hits score = tf (TermMatcher.class.js:34);
- a doc hit by several query terms keeps the MAX score, not the sum
  (TermMatcher.class.js:40-51 — SURVEY.md A3);
- rank by score desc (K1), truncate to ``max_return`` (K2, default 20,
  AppConfig.const.js:22). Ties are broken by ``doc_id`` asc — the reference
  leaves tie order unspecified (JS sort is stable on Mongo's unspecified
  order); the engine declares one for determinism (SURVEY.md K4).

Physical plan (SURVEY.md J1): the query-term set is tiny → vectorized
``is_in`` filter over the posting table (predicate pushdown when reading the
bucketed Parquet index), then a DISTRIBUTED top-k over the hit set (scores
are final after the max-merge, so ranking commutes with the collect) — only
the ≤ ``max_return`` winners reach the driver, even for a hot term whose
df is corpus-scale — and those ids broadcast via ``ray.put`` into a
``map_batches`` lookup over ``pages`` — a broadcast hash join, never an
all-to-all shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenizer import Tokenizer

DEFAULT_MAX_RETURN = 20

_RESULT_COLUMNS = ["url", "page_idx", "img_path", "doc_id", "score"]


def validate_query(search_term, max_return) -> None:
    """Argument validation (ApiHandler.const.js:21-24 semantics)."""
    if not isinstance(search_term, str):
        raise ValueError("searchTerm must be a string")
    if not (isinstance(max_return, int) and max_return >= 1):
        raise ValueError("maxReturn must be a positive integer")


def score_hits(postings, query_terms: list[str]):
    """Posting semi-join + max-merge: → (doc_id, score) dataset.

    The max-merge runs through the int-key ``cluster_apply`` exchange, not
    a Ray groupby on the raw string doc_id — a hot query term's hit set is
    df(term) rows (millions on a web corpus), exactly where string-key
    boundary search degrades (CLAUDE.md)."""
    from .relational import cluster_apply

    terms_arr = pa.array(sorted(set(query_terms)), pa.string())

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("term"), value_set=terms_arr)
        hits = batch.filter(mask)
        return pa.table(
            {"doc_id": hits.column("doc_id"), "score": hits.column("tf")}
        )

    def _block_max(block: pa.Table) -> pa.Table:
        agg = block.group_by("doc_id").aggregate([("score", "max")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "score": agg.column("score_max").cast(pa.int64()),
            }
        )

    return cluster_apply(
        postings.map_batches(_filter, batch_format="pyarrow"),
        ["doc_id"],
        _block_max,
    )


def topk_hits(hits, k: int, score_type: "pa.DataType" = None) -> pa.Table:
    """Distributed top-k over the (doc_id, score) hit dataset BEFORE any
    driver collect → typed Arrow table of ≤ ``k`` rows.

    Scores are FINAL after the max-merge (TermMatcher.class.js:40-51
    semantics), so ranking commutes with the collect: per-block top-k
    under the total order (score desc, doc_id asc), a one-block reduce of
    the ≤ blocks×k winners (worker-side, never the driver), then a driver
    collect of ≤ ``k`` rows. A hot query term — df("the")-scale at 10^12
    docs — streams through the block walk; the driver holds O(k) rows,
    period. Global top-k is exact: it is a subset of the union of
    per-block top-k under the same total order.
    """
    import pyarrow.compute as pc

    def block_topk(block: pa.Table) -> pa.Table:
        if block.num_rows <= k:
            return block
        idx = pc.sort_indices(
            block,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        return block.take(idx[:k])

    winners = (
        hits.map_batches(block_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    )
    rows = winners.take_all()  # ≤ k rows — bounded by construction
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "score": pa.array([r["score"] for r in rows],
                              score_type or pa.int64()),
        }
    )


def join_pages(hits_table: pa.Table, pages):
    """Broadcast hash join of the (small) hit set against the pages table —
    vectorized: an ``is_in`` filter then a block-local Arrow join per
    batch. The pages scan is the corpus-sized side; no per-row Python
    runs on it."""
    import ray

    hits_ref = ray.put(hits_table)

    def _lookup(batch: pa.Table) -> pa.Table:
        hits = ray.get(hits_ref)
        keep = batch.filter(
            pc.is_in(batch.column("doc_id"),
                     value_set=hits.column("doc_id").combine_chunks())
        )
        return keep.join(hits, keys=["doc_id"], join_type="inner")

    return pages.map_batches(_lookup, batch_format="pyarrow")


def search(postings, pages, query: str, max_return: int = DEFAULT_MAX_RETURN,
           tokenizer: Tokenizer | None = None) -> pa.Table:
    """Full query path; returns the top-k result as a (small) Arrow table."""
    validate_query(query, max_return)
    tok = tokenizer or Tokenizer()
    query_terms = list(tok.term_freqs(query).keys())
    if not query_terms:
        return pa.table({c: [] for c in _RESULT_COLUMNS})

    hits = score_hits(postings, query_terms)
    # distributed top-k BEFORE the collect: only ≤ max_return winners ever
    # reach the driver, which is the broadcast side of the pages join
    hits_table = topk_hits(hits, max_return)
    if hits_table.num_rows == 0:
        return pa.table({c: [] for c in _RESULT_COLUMNS})
    scored_pages = join_pages(hits_table, pages)
    # ≤ max_return rows by construction (one page row per hit id) — rank
    # locally with an Arrow sort; a Ray .sort() here would be a pointless
    # exchange barrier over k rows
    out = pa.Table.from_pandas(scored_pages.to_pandas(), preserve_index=False)
    out = out.take(pc.sort_indices(
        out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )[:max_return])
    return out.select(_RESULT_COLUMNS)


def expanded_search(postings, pages, correlations, query: str,
                    max_return: int = DEFAULT_MAX_RETURN,
                    tokenizer: Tokenizer | None = None,
                    *, num_neighbors: int = 5) -> pa.Table:
    """Correlation-expanded search — the reference's DISABLED query path
    (``src/TermMatcher/TermMatcher.class.js:55-80``, commented out behind
    the "workaround: disable term-correlation computation" note), composed
    from the engine's ``closest_terms`` + ``search`` ingredients:

    1. each query term expands to its top-``num_neighbors`` correlated
       terms (``findClosestTerms`` intent — tcr desc, deterministic term2
       tiebreak);
    2. the expansion set is the originals at weight 1 unioned with the
       neighbors at their tcr (``{term, tcr: 1}`` + spread — reference
       line 62);
    3. a hit scores ``tcr * tf`` (line 72);
    4. per-doc merge keeps the MAX score. The commented code concatenates
       raw hit lists (one doc could appear once per expanded term — and
       its `new Set` dedup is a no-op on objects); the engine applies the
       enabled path's A3 max-merge, consistent with ``closest_terms``'s
       documented intended-semantics treatment. Ranking/truncation as K1/K2.

    ``correlations``: the symmetric (term1, term2, tcr) dataset from
    ``stages.correlate.term_correlations``.

    Scale shape: the anchor filter + per-anchor top-k runs distributed
    (``grouped_topk`` — one exchange over the ≤ |query terms| anchor
    slice); only the ≤ |query|×num_neighbors expansion weights reach the
    driver (query-bounded, like the query terms themselves); scoring is a
    broadcast ``index_in`` lookup over the posting stream, max-merge rides
    the int-key exchange, distributed top-k before any collect.
    """
    from .relational import cluster_apply, grouped_topk

    validate_query(query, max_return)
    tok = tokenizer or Tokenizer()
    query_terms = sorted(tok.term_freqs(query).keys())
    if not query_terms:
        return pa.table({c: [] for c in _RESULT_COLUMNS})

    qt_arr = pa.array(query_terms, pa.string())

    def _anchored(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("term1"),
                                     value_set=qt_arr))

    neighbors = grouped_topk(
        correlations.map_batches(_anchored, batch_format="pyarrow"),
        ["term1"],
        [("tcr", "descending"), ("term2", "ascending")],
        num_neighbors,
    ).take_all()  # ≤ |query| × num_neighbors rows — query-bounded

    weights: dict[str, float] = {t: 1.0 for t in query_terms}
    for r in neighbors:
        t, tcr = r["term2"], float(r["tcr"])
        if tcr > weights.get(t, 0.0):
            weights[t] = tcr
    exp_terms = pa.array(sorted(weights), pa.string())
    exp_tcr = pa.array([weights[t] for t in sorted(weights)], pa.float64())

    def _score(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("term"), value_set=exp_terms)
        hits = batch.filter(pc.is_valid(idx))
        tcr = pc.take(exp_tcr, pc.index_in(hits.column("term"),
                                           value_set=exp_terms))
        # one multiply per row; max-merge is order-free → float-exact
        score = pc.multiply(tcr, pc.cast(hits.column("tf"), pa.float64()))
        return pa.table({"doc_id": hits.column("doc_id"), "score": score})

    def _block_max(block: pa.Table) -> pa.Table:
        agg = block.group_by("doc_id").aggregate([("score", "max")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "score": agg.column("score_max").cast(pa.float64()),
            }
        )

    doc_scores = cluster_apply(
        postings.map_batches(_score, batch_format="pyarrow"),
        ["doc_id"],
        _block_max,
    )
    hits_table = topk_hits(doc_scores, max_return, score_type=pa.float64())
    if hits_table.num_rows == 0:
        return pa.table({c: [] for c in _RESULT_COLUMNS})
    out = pa.Table.from_pandas(
        join_pages(hits_table, pages).to_pandas(), preserve_index=False
    )
    out = out.take(pc.sort_indices(
        out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )[:max_return])
    return out.select(_RESULT_COLUMNS)


def bm25_search(postings, pages, query: str,
                max_return: int = DEFAULT_MAX_RETURN,
                tokenizer: Tokenizer | None = None,
                *, k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """BM25-ranked search — the modern scorer on the same physical plan as
    :func:`search` (the reference ranks by raw tf; SURVEY.md A3 notes the
    max-merge; BM25 SUMS per-term contributions, the standard semantics).

    Scores are quantized to int64 units (``trunc(bm25 · 10^9)``) BEFORE
    the per-doc sum, so the aggregation is order-free and the relational
    oracle compares integers — float summation order never matters.

    Physical plan: postings filter to the query terms (df per term falls
    out of the filtered rows — df(t) = that term's row count, reduced as
    per-block partials into a ≤|query|-entry driver dict and broadcast
    back, NOT a grouped exchange + join: df's key space is query-bounded,
    so two all-to-alls would buy nothing); per-doc lengths come from the
    FULL posting stream via one grouped exchange joined to the hit rows
    (dl's key space IS corpus-scaled — at deployment scale dl is a
    precomputed column; here it is derived); per-doc integer sums ride
    the int-key exchange; distributed top-k BEFORE any collect; pages
    point-lookup for ≤ ``max_return`` ids.
    """
    from .relational import cluster_apply, cluster_join, grouped_agg

    validate_query(query, max_return)
    tok = tokenizer or Tokenizer()
    query_terms = sorted(tok.term_freqs(query).keys())
    if not query_terms:
        return pa.table({c: [] for c in _RESULT_COLUMNS})

    # postings feeds THREE scans (total_tf, term filter, dl aggregate) and
    # pages two (count, hit join). Ray re-executes a lazy lineage per
    # consumer — with a fresh-ingest input that multiplies the whole
    # extract+tokenize chain — so pin both once (object-store-resident,
    # spillable; a parquet-backed input pins only its read).
    postings = postings.materialize()
    pages = pages.materialize()

    n_docs = float(pages.count())

    def tf_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"t": pa.array([pc.sum(batch.column("tf")).as_py() or 0],
                           pa.int64())}
        )

    total_tf = sum(
        r["t"] for r in postings.map_batches(
            tf_partial, batch_format="pyarrow").take_all()
    )
    avgdl = float(total_tf) / n_docs

    terms_arr = pa.array(query_terms, pa.string())

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("term"), value_set=terms_arr)
        return batch.filter(mask)

    hits_tf = postings.map_batches(_filter, batch_format="pyarrow")
    # two consumers below (df partials, dl-join scoring) — materialize so
    # the postings filter (a full corpus scan) runs once
    hits_tf = hits_tf.materialize()

    # df per query term: per-block partial counts → driver dict of
    # ≤ |query_terms| entries (bounded by the QUERY, not the corpus — a
    # hot term contributes one int per block, never its hit rows)
    def df_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("term").aggregate([("tf", "count")])

    df: dict[str, int] = {}
    for r in hits_tf.map_batches(
            df_partial, batch_format="pyarrow").take_all():
        df[r["term"]] = df.get(r["term"], 0) + r["tf_count"]
    df_arr = pa.array([float(df.get(t, 0)) for t in query_terms],
                      pa.float64())

    dl_table = grouped_agg(postings, ["doc_id"], [("dl", "tf", "sum")])
    with_dl = cluster_join(
        hits_tf, dl_table, ["doc_id"],
        left_types={"doc_id": pa.string(), "term": pa.string(),
                    "tf": pa.int64()},
        right_types={"dl": pa.int64()},
    )

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def score_units(batch: pa.Table) -> pa.Table:
        nd = pa.scalar(n_docs, pa.float64())
        dfd = pc.take(
            df_arr, pc.index_in(batch.column("term"), value_set=terms_arr)
        )
        tfd = pc.cast(batch.column("tf"), pa.float64())
        dld = pc.cast(batch.column("dl"), pa.float64())
        idf = pc.ln(
            pc.add(
                pc.divide(pc.add(pc.subtract(nd, dfd), 0.5),
                          pc.add(dfd, 0.5)),
                1.0,
            )
        )
        denom = pc.add(
            tfd,
            pc.multiply(
                k1,
                pc.add(one_minus_b,
                       pc.multiply(b, pc.divide(dld, avgdl))),
            ),
        )
        bm25 = pc.multiply(idf, pc.divide(pc.multiply(tfd, k1p1), denom))
        units = pc.cast(
            pc.trunc(pc.multiply(bm25, 1000000000.0)), pa.int64()
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "score": units}
        )

    def _block_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by("doc_id").aggregate([("score", "sum")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "score": agg.column("score_sum").cast(pa.int64()),
            }
        )

    doc_scores = cluster_apply(
        with_dl.map_batches(score_units, batch_format="pyarrow"),
        ["doc_id"],
        _block_sum,
    )
    hits_table = topk_hits(doc_scores, max_return)
    if hits_table.num_rows == 0:
        return pa.table({c: [] for c in _RESULT_COLUMNS})
    out = pa.Table.from_pandas(
        join_pages(hits_table, pages).to_pandas(), preserve_index=False
    )
    out = out.take(pc.sort_indices(
        out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )[:max_return])
    return out.select(_RESULT_COLUMNS)


def rrf_fuse(ranked: "list[pa.Table]", names: list[str], *,
             k: int = 60, scale: int = 10**9) -> pa.Table:
    """Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    two or more ranked result lists — the standard zero-training way to
    combine scorers whose scales don't compare (raw-tf vs BM25 here; the
    reference has a single scorer, this is the beyond-reference ensemble
    step). Exact integer lattice: each list contributes
    ``scale // (k + rank)`` with 1-based ranks under (score desc, doc_id
    asc) — k=60 per the paper — so a DuckDB oracle replays it bitwise.

    Inputs are ALREADY top-k-bounded search results (≤ max_return rows
    each, the documented query-path driver bound), so fusing is a
    driver-side merge of answer-sized lists — the same collect class as
    the final ranking step it follows. Docs absent from a list get no
    contribution from it (their rank column is null).

    → (doc_id, rank_<name>..., rrf_units), one row per doc in any list.
    """
    import pyarrow.compute as pc

    rank_maps: list[dict] = []
    for tbl in ranked:
        idx = pc.sort_indices(
            tbl, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        ids = tbl.column("doc_id").take(idx).to_pylist()
        rank_maps.append({d: r + 1 for r, d in enumerate(ids)})

    all_ids = sorted(set().union(*[m.keys() for m in rank_maps]))
    cols: dict = {"doc_id": pa.array(all_ids, pa.string())}
    for name, m in zip(names, rank_maps):
        cols[f"rank_{name}"] = pa.array(
            [m.get(d) for d in all_ids], pa.int64()
        )
    cols["rrf_units"] = pa.array(
        [sum(scale // (k + m[d]) for m in rank_maps if d in m)
         for d in all_ids],
        pa.int64(),
    )
    return pa.table(cols)
