"""Term-term cosine correlation + nearest terms (SURVEY.md A4, A5, K3).

Reference semantics (``src/DbInterface/DbInterface.class.js:433-469``):
    tcr(t1, t2) = Σ_{d ∈ docs(t1)∩docs(t2)} tf(d,t1)·tf(d,t2)
                  / (‖v1‖ or 1) / (‖v2‖ or 1)
with each norm FLOORED AT 1 when zero (the JS ``|| 1`` at :461-462), and the
two divisions applied sequentially in that order (kept here so results are
bit-identical with any IEEE-754 re-implementation). Pairs are materialized in
BOTH orders (:189-218). The reference disables this stage in its live path
(:149-151); the engine builds it as an optional stage with an explicit df
guard.

Physical plan: instead of a postings self-join on doc_id (quadratic shuffle),
per-doc pair products are emitted inside a ``groupby(doc_id).map_groups``
(bounded by terms-per-doc), then summed with ``groupby(term1, term2)``; the
per-term norm table (small after the df guard) is broadcast via ``ray.put``
into the finalize map — no second shuffle (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import TERM_CORRELATIONS, assert_schema
from .relational import cluster_apply


def _block_pair_products(block: pa.Table) -> pa.Table:
    """All ordered pairs term1 < term2 within each doc of a clustered block,
    with tf products. The block arrives via ``cluster_apply(["doc_id"])`` so
    every doc's postings are complete within it; runs are made contiguous by
    a block-local Arrow sort."""
    block = block.sort_by([("doc_id", "ascending"), ("term", "ascending")])
    doc_ids = block.column("doc_id").to_pylist()
    terms = block.column("term").to_pylist()
    tfs = block.column("tf").to_pylist()
    t1s: list[str] = []
    t2s: list[str] = []
    prods: list[int] = []
    i, n = 0, len(doc_ids)
    while i < n:
        j = i
        while j < n and doc_ids[j] == doc_ids[i]:
            j += 1
        for a in range(i, j):
            for b in range(a + 1, j):
                t1s.append(terms[a])
                t2s.append(terms[b])
                prods.append(tfs[a] * tfs[b])
        i = j
    return pa.table(
        {
            "term1": pa.array(t1s, pa.string()),
            "term2": pa.array(t2s, pa.string()),
            "dot_part": pa.array(prods, pa.int64()),
        }
    )


def _block_pair_sums(block: pa.Table) -> pa.Table:
    """Exact per-pair dot sums within a clustered block (Arrow group_by)."""
    agg = block.group_by(["term1", "term2"]).aggregate([("dot_part", "sum")])
    return pa.table(
        {
            "term1": agg.column("term1"),
            "term2": agg.column("term2"),
            "sum(dot_part)": agg.column("dot_part_sum"),
        }
    )


def _norms_sq(postings):
    """→ (term, nsq = Σ tf²) DATASET — two-phase: batch-local partial sums,
    then ONE int-key exchange (``cluster_apply``; never a string-key groupby
    — CLAUDE.md pathology). Stays distributed: at web scale the per-term
    norm table is vocabulary-sized and must not land on the driver."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("tf"), batch.column("tf"))
        t = pa.table({"term": batch.column("term"), "sq": sq})
        return t.group_by("term").aggregate([("sq", "sum")]).rename_columns(
            ["term", "sq_part"]
        )

    def block_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by("term").aggregate([("sq_part", "sum")])
        return pa.table(
            {
                "term": agg.column("term"),
                "nsq": agg.column("sq_part_sum").cast(pa.int64()),
            }
        )

    return cluster_apply(
        postings.map_batches(partial, batch_format="pyarrow"),
        ["term"],
        block_sum,
    )


def filter_terms(postings, terms: set[str]):
    """Restrict postings to a term subset (the df guard's companion)."""
    terms_arr = pa.array(sorted(terms), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("term"), value_set=terms_arr))

    return postings.map_batches(f, batch_format="pyarrow")


def term_correlations(postings, *, terms: set[str] | None = None,
                      min_df: int | None = 2):
    """→ TERM_CORRELATIONS dataset, both pair orders, zero-dot pairs omitted.

    Guards (at web scale the unrestricted pair space is quadratic in
    vocabulary — the reference's posture is the stage disabled by default):

    - ``min_df`` (DEFAULT 2): drop terms with document frequency below it
      before pair emission, applied via a distributed ``cluster_join``
      against ``term_stats`` — hapax terms can't co-occur twice, so df<2
      terms only inflate the pair space. Pass ``min_df=None`` for the
      unguarded full product (small corpora / tests only).
    - ``terms``: explicit small restriction set (broadcast filter).

    Fully distributed: norms are a dataset (``_norms_sq``) attached to the
    pair table with two ``cluster_join`` exchanges — no driver-side dict at
    any vocabulary size. The tcr kernel is vectorized with the reference's
    exact IEEE op order (sqrt, two sequential divisions, zero-norm → 1).

    The postings input and the guarded postings are each consumed by
    MULTIPLE downstream branches (stats + join left; norms + pair
    emission). Ray datasets re-execute their lineage per consumer, so both
    are ``materialize()``d — pinned to the object store (which spills),
    one upstream execution instead of four. A production run feeds this
    stage from the persisted postings parquet, where the pin is free.
    """
    import pyarrow.compute as pc

    from .index import term_stats
    from .relational import cluster_join

    if terms is not None:
        postings = filter_terms(postings, terms)
    if min_df is not None and min_df > 1:
        postings = postings.materialize()  # consumed by stats + guard
        stats = term_stats(postings).materialize()
        if stats.count() <= 200_000:
            # small measured vocabulary → broadcast the kept-term set
            # (one cheap filter map, no extra exchange)
            kept = {
                r["term"] for r in stats.take_all() if r["df"] >= min_df
            }
            postings = filter_terms(postings, kept)
        else:
            df_table = stats.map_batches(
                lambda t: t.select(["term", "df"]), batch_format="pyarrow"
            )
            guarded = cluster_join(
                postings, df_table, ["term"],
                left_types={"doc_id": pa.string(), "term": pa.string(),
                            "tf": pa.int64()},
                right_types={"df": pa.int64()},
            )
            postings = guarded.map_batches(
                lambda b: b.filter(
                    pc.greater_equal(b.column("df"), min_df)
                ).select(["doc_id", "term", "tf"]),
                batch_format="pyarrow",
            )
    postings = postings.materialize()  # consumed by norms + pair emission

    norms = _norms_sq(postings).materialize()
    pairs = cluster_apply(postings, ["doc_id"], _block_pair_products)
    dots = cluster_apply(pairs, ["term1", "term2"], _block_pair_sums)

    def _tcr_from_nsq(batch: pa.Table, nsq1, nsq2) -> pa.Table:
        dot = pc.cast(batch.column("sum(dot_part)"), pa.float64())
        la = pc.sqrt(pc.cast(nsq1, pa.float64()))
        lb = pc.sqrt(pc.cast(nsq2, pa.float64()))
        one = pa.scalar(1.0, pa.float64())
        la = pc.if_else(pc.equal(la, 0.0), one, la)
        lb = pc.if_else(pc.equal(lb, 0.0), one, lb)
        # sequential divisions, reference order (DbInterface :461-462)
        tcr = pc.divide(pc.divide(dot, la), lb)
        # both orders, as the reference upserts (term1,term2)+(term2,term1)
        t1, t2 = batch.column("term1"), batch.column("term2")
        fwd = pa.table({"term1": t1, "term2": t2, "tcr": tcr})
        rev = pa.table({"term1": t2, "term2": t1, "tcr": tcr})
        table = pa.concat_tables([fwd, rev]).combine_chunks()
        return assert_schema(table, TERM_CORRELATIONS, "term_correlations")

    # attach ‖v1‖², ‖v2‖²: norms is materialized, so its size is known for
    # free — broadcast the (small) guarded vocabulary as a dict, or run two
    # distributed cluster_join exchanges when it is genuinely large. Same
    # result either way; the switch only trades exchange latency for
    # broadcast memory.
    if norms.count() <= 200_000:
        import ray

        norms_ref = ray.put(
            {r["term"]: r["nsq"] for r in norms.take_all()}
        )

        def finalize_broadcast(batch: pa.Table) -> pa.Table:
            nsq = ray.get(norms_ref)

            def lut_for(col) -> pa.Array:
                enc = pc.dictionary_encode(col.combine_chunks())
                lut = pa.array(
                    [nsq.get(t, 0) for t in enc.dictionary.to_pylist()],
                    pa.int64(),
                )
                return lut.take(enc.indices)

            return _tcr_from_nsq(batch, lut_for(batch.column("term1")),
                                 lut_for(batch.column("term2")))

        return dots.map_batches(finalize_broadcast, batch_format="pyarrow")

    with_n1 = cluster_join(
        dots,
        norms.map_batches(
            lambda t: t.rename_columns(["term1", "nsq1"]),
            batch_format="pyarrow",
        ),
        ["term1"],
        left_types={"term1": pa.string(), "term2": pa.string(),
                    "sum(dot_part)": pa.int64()},
        right_types={"nsq1": pa.int64()},
    )
    with_n2 = cluster_join(
        with_n1,
        norms.map_batches(
            lambda t: t.rename_columns(["term2", "nsq2"]),
            batch_format="pyarrow",
        ),
        ["term2"],
        left_types={"term1": pa.string(), "term2": pa.string(),
                    "sum(dot_part)": pa.int64(), "nsq1": pa.int64()},
        right_types={"nsq2": pa.int64()},
    )

    def finalize_joined(batch: pa.Table) -> pa.Table:
        return _tcr_from_nsq(batch, batch.column("nsq1"),
                             batch.column("nsq2"))

    return with_n2.map_batches(finalize_joined, batch_format="pyarrow")


def _block_doc_pairs(block: pa.Table) -> pa.Table:
    """All ordered doc pairs doc1 < doc2 within each TERM of a clustered
    block, with tf products — the document-axis transpose of
    ``_block_pair_products``. The block arrives via ``cluster_apply(["term"])``
    so every term's postings are complete within it; runs are made contiguous
    by a block-local Arrow sort, and pair emission is numpy-vectorized per
    run (``triu_indices``), bounded by the caller's ``max_df`` ceiling."""
    import numpy as np

    block = block.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    n = block.num_rows
    empty = pa.table(
        {
            "doc1": pa.array([], pa.string()),
            "doc2": pa.array([], pa.string()),
            "dot_part": pa.array([], pa.int64()),
        }
    )
    if n < 2:
        return empty
    import pyarrow.compute as pc

    terms = block.column("term").combine_chunks()
    neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
    boundary = np.concatenate(([True], neq.to_numpy(zero_copy_only=False)))
    run_starts = np.flatnonzero(boundary)
    run_ends = np.append(run_starts[1:], n)
    i_parts: list[np.ndarray] = []
    j_parts: list[np.ndarray] = []
    for s, e in zip(run_starts, run_ends):
        m = int(e - s)
        if m < 2:
            continue
        iu, ju = np.triu_indices(m, 1)
        i_parts.append(iu + s)
        j_parts.append(ju + s)
    if not i_parts:
        return empty
    i_idx = np.concatenate(i_parts)
    j_idx = np.concatenate(j_parts)
    docs = block.column("doc_id").combine_chunks()
    tfs = block.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc1": pc.take(docs, pa.array(i_idx, pa.int64())),
            "doc2": pc.take(docs, pa.array(j_idx, pa.int64())),
            "dot_part": pa.array(tfs[i_idx] * tfs[j_idx], pa.int64()),
        }
    )


def doc_similarity(postings, *, min_df: int = 2, max_df: int = 100,
                   k: int = 3):
    """Per-document top-``k`` nearest neighbors by tf-cosine over shared
    terms → (doc_id, neighbor, sim) — sparse all-pairs document similarity
    (Bayardo et al., WWW'07) as the document-axis transpose of
    ``term_correlations``; complements the dense-embedding ANN family with
    a lexical neighbor search needing no model.

    Guards (the 100-TB posture): pair fan-out per term is O(df²), so terms
    outside ``min_df <= df <= max_df`` are pruned BEFORE pair emission —
    df<2 terms cannot link two documents, and df>``max_df`` terms are
    stopword-like (uninformative for similarity; the standard all-pairs
    kernel bound). Per-term pair cost is thus ≤ max_df²/2 regardless of
    corpus size; norms are computed over the SAME kept-term vectors so the
    cosine is exact for the pruned space.

    Physical plan: one ``cluster_apply(["term"])`` exchange emits pair
    partials (numpy triu per term run), one ``cluster_apply(["doc1","doc2"])``
    exchange sums dots, per-doc Σtf² norms reduce through their own int-key
    exchange and attach via the measured-size broadcast/cluster_join switch
    (same policy as ``term_correlations``); the final per-doc top-k is one
    ``grouped_topk`` — no global sort, no driver materialization at any
    corpus size. IEEE op order matches the oracle: (dot / ‖v1‖) / ‖v2‖ with
    ‖·‖ of the LOWER doc_id first.
    """
    import pyarrow.compute as pc

    from .index import term_stats
    from .relational import cluster_apply, cluster_join, grouped_topk

    postings = postings.materialize()  # consumed by stats + guard
    stats = term_stats(postings).materialize()
    if stats.count() <= 200_000:
        kept = {
            r["term"] for r in stats.take_all()
            if min_df <= r["df"] <= max_df
        }
        gp = filter_terms(postings, kept)
    else:
        df_table = stats.map_batches(
            lambda t: t.select(["term", "df"]), batch_format="pyarrow"
        )
        joined = cluster_join(
            postings, df_table, ["term"],
            left_types={"doc_id": pa.string(), "term": pa.string(),
                        "tf": pa.int64()},
            right_types={"df": pa.int64()},
        )
        gp = joined.map_batches(
            lambda b: b.filter(
                pc.and_(pc.greater_equal(b.column("df"), min_df),
                        pc.less_equal(b.column("df"), max_df))
            ).select(["doc_id", "term", "tf"]),
            batch_format="pyarrow",
        )
    gp = gp.materialize()  # consumed by norms + pair emission

    def norm_partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("tf"), batch.column("tf"))
        t = pa.table({"doc_id": batch.column("doc_id"), "sq": sq})
        return t.group_by("doc_id").aggregate([("sq", "sum")]).rename_columns(
            ["doc_id", "sq_part"]
        )

    def norm_block(block: pa.Table) -> pa.Table:
        agg = block.group_by("doc_id").aggregate([("sq_part", "sum")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "nsq": agg.column("sq_part_sum").cast(pa.int64()),
            }
        )

    norms = cluster_apply(
        gp.map_batches(norm_partial, batch_format="pyarrow"),
        ["doc_id"], norm_block,
    ).materialize()

    pairs = cluster_apply(gp, ["term"], _block_doc_pairs)

    def pair_sums(block: pa.Table) -> pa.Table:
        agg = block.group_by(["doc1", "doc2"]).aggregate([("dot_part", "sum")])
        return pa.table(
            {
                "doc1": agg.column("doc1"),
                "doc2": agg.column("doc2"),
                "dot": agg.column("dot_part_sum").cast(pa.int64()),
            }
        )

    dots = cluster_apply(pairs, ["doc1", "doc2"], pair_sums)

    def _sim_both_orders(batch: pa.Table, nsq1, nsq2) -> pa.Table:
        dot = pc.cast(batch.column("dot"), pa.float64())
        l1 = pc.sqrt(pc.cast(nsq1, pa.float64()))
        l2 = pc.sqrt(pc.cast(nsq2, pa.float64()))
        # kept vectors have tf >= 1 on at least one term → norms > 0;
        # sequential divisions, lower-doc_id norm first (oracle op order)
        sim = pc.divide(pc.divide(dot, l1), l2)
        d1, d2 = batch.column("doc1"), batch.column("doc2")
        fwd = pa.table({"doc_id": d1, "neighbor": d2, "sim": sim})
        rev = pa.table({"doc_id": d2, "neighbor": d1, "sim": sim})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    if norms.count() <= 200_000:
        import ray

        norms_ref = ray.put({r["doc_id"]: r["nsq"] for r in norms.take_all()})

        def finalize_broadcast(batch: pa.Table) -> pa.Table:
            nsq = ray.get(norms_ref)

            def lut_for(col) -> pa.Array:
                enc = pc.dictionary_encode(col.combine_chunks())
                lut = pa.array(
                    [nsq.get(d, 0) for d in enc.dictionary.to_pylist()],
                    pa.int64(),
                )
                return lut.take(enc.indices)

            return _sim_both_orders(batch, lut_for(batch.column("doc1")),
                                    lut_for(batch.column("doc2")))

        sym = dots.map_batches(finalize_broadcast, batch_format="pyarrow")
    else:
        with_n1 = cluster_join(
            dots,
            norms.map_batches(
                lambda t: t.rename_columns(["doc1", "nsq1"]),
                batch_format="pyarrow",
            ),
            ["doc1"],
            left_types={"doc1": pa.string(), "doc2": pa.string(),
                        "dot": pa.int64()},
            right_types={"nsq1": pa.int64()},
        )
        with_n2 = cluster_join(
            with_n1,
            norms.map_batches(
                lambda t: t.rename_columns(["doc2", "nsq2"]),
                batch_format="pyarrow",
            ),
            ["doc2"],
            left_types={"doc1": pa.string(), "doc2": pa.string(),
                        "dot": pa.int64(), "nsq1": pa.int64()},
            right_types={"nsq2": pa.int64()},
        )
        sym = with_n2.map_batches(
            lambda b: _sim_both_orders(b, b.column("nsq1"),
                                       b.column("nsq2")),
            batch_format="pyarrow",
        )

    return grouped_topk(
        sym, ["doc_id"], [("sim", "descending"), ("neighbor", "ascending")], k
    )


def closest_terms(correlations, num: int = 5):
    """Per-term top-``num`` neighbors by tcr desc, term2 asc (SURVEY.md K3 —
    implementing the reference's *intended* semantics; its ``.slice`` on a
    mapped object at DbInterface.class.js:419 is a documented bug).

    One ``grouped_topk`` pass: cluster by ``term1``, block-local sort,
    head of each run."""
    from .relational import grouped_topk

    return grouped_topk(
        correlations, ["term1"],
        [("tcr", "descending"), ("term2", "ascending")], num,
    )
