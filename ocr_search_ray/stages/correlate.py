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

import math

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


def _norms_sq(postings) -> dict[str, int]:
    """term → Σ tf² (driver-side dict; small after any df restriction)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("tf"), batch.column("tf"))
        t = pa.table({"term": batch.column("term"), "sq": sq})
        return t.group_by("term").aggregate([("sq", "sum")]).rename_columns(
            ["term", "sq_part"]
        )

    agg = (
        postings.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("sq_part")
        .take_all()
    )
    return {r["term"]: r["sum(sq_part)"] for r in agg}


def filter_terms(postings, terms: set[str]):
    """Restrict postings to a term subset (the df guard's companion)."""
    terms_arr = pa.array(sorted(terms), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("term"), value_set=terms_arr))

    return postings.map_batches(f, batch_format="pyarrow")


def term_correlations(postings, *, terms: set[str] | None = None):
    """→ TERM_CORRELATIONS dataset, both pair orders, zero-dot pairs omitted.

    ``terms``: optional restriction set (df-guard); at web scale the
    unrestricted pair space is quadratic in vocabulary — callers must guard
    (the reference's posture: stage disabled by default).
    """
    import ray

    if terms is not None:
        postings = filter_terms(postings, terms)

    norms_ref = ray.put(_norms_sq(postings))
    pairs = cluster_apply(postings, ["doc_id"], _block_pair_products)
    dots = cluster_apply(pairs, ["term1", "term2"], _block_pair_sums)

    def finalize(batch: pa.Table) -> pa.Table:
        norms = ray.get(norms_ref)
        t1 = batch.column("term1").to_pylist()
        t2 = batch.column("term2").to_pylist()
        dot = batch.column("sum(dot_part)").to_pylist()
        out1: list[str] = []
        out2: list[str] = []
        tcrs: list[float] = []
        for a, b, d in zip(t1, t2, dot):
            la = math.sqrt(norms.get(a, 0)) or 1.0
            lb = math.sqrt(norms.get(b, 0)) or 1.0
            tcr = d / la / lb  # sequential divisions, reference order
            # both orders, as the reference upserts (term1,term2)+(term2,term1)
            out1.extend((a, b))
            out2.extend((b, a))
            tcrs.extend((tcr, tcr))
        table = pa.table(
            {
                "term1": pa.array(out1, pa.string()),
                "term2": pa.array(out2, pa.string()),
                "tcr": pa.array(tcrs, pa.float64()),
            }
        )
        return assert_schema(table, TERM_CORRELATIONS, "term_correlations")

    return dots.map_batches(finalize, batch_format="pyarrow")


def closest_terms(correlations, num: int = 5):
    """Per-term top-``num`` neighbors by tcr desc, term2 asc (SURVEY.md K3 —
    implementing the reference's *intended* semantics; its ``.slice`` on a
    mapped object at DbInterface.class.js:419 is a documented bug).

    Per-group top-k over a large string key domain → cluster by ``term1``
    and take the head of each run after one block-local Arrow sort."""

    def block_topk(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [("term1", "ascending"), ("tcr", "descending"), ("term2", "ascending")]
        )
        t1 = block.column("term1").to_pylist()
        keep: list[int] = []
        run_start = 0
        for i in range(len(t1) + 1):
            if i == len(t1) or (i > 0 and t1[i] != t1[i - 1]):
                keep.extend(range(run_start, min(run_start + num, i)))
                run_start = i
        return block.take(pa.array(keep, pa.int64()))

    return cluster_apply(correlations, ["term1"], block_topk)
