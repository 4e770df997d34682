"""Training-data curation: quality filter → exact dedup → near-dup removal.

The end-to-end composition a large-scale training-data pipeline runs over a
raw document table (the engine's headline beyond-reference use case):

1. quality gate — exact counters from ``textstats.quality_stats``; rules are
   integer comparisons (ratio rules via cross-multiplication) so the oracle
   compares exactly,
2. exact dedup — keep only each text's representative (min doc_id,
   ``dedup.exact_dedup``),
3. near-dup removal — drop the higher id of every verified MinHash-LSH pair
   (``dedup.minhash_lsh_pairs``).

The gates are computed independently over the full corpus and intersected
(deterministic, order-free semantics — a doc survives iff it passes ALL
gates). Only the DROP sets are collected and broadcast — exact-dup
non-representatives and LSH losers are both duplicate-sized (a small
fraction of a real corpus), whereas the keep-set is corpus-sized and must
never land on the driver. The corpus side streams through one final
vectorized anti-filter.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import exact_dup_losers, minhash_lsh_pairs
from ..stages.textstats import quality_stats

DEFAULT_RULES = {
    "min_tokens": 30,
    "min_chars": 150,
    "max_stopword_pct": 60,  # 100*n_stopwords <= pct*n_tokens
}


def curate(documents, *, min_tokens: int = DEFAULT_RULES["min_tokens"],
           min_chars: int = DEFAULT_RULES["min_chars"],
           max_stopword_pct: int = DEFAULT_RULES["max_stopword_pct"],
           neardup_min_jaccard_pct: int = 50):
    """→ (doc_id, n_chars, n_tokens) for every surviving document."""
    import ray

    stats = quality_stats(documents)

    def quality_ok(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("n_tokens"), min_tokens),
                pc.greater_equal(batch.column("n_chars"), min_chars),
            ),
            pc.less_equal(
                pc.multiply(batch.column("n_stopwords"), 100),
                pc.multiply(batch.column("n_tokens"), max_stopword_pct),
            ),
        )
        return batch.filter(keep).select(["doc_id", "n_chars", "n_tokens"])

    passing = stats.map_batches(quality_ok, batch_format="pyarrow")

    # drop sets (both duplicate-sized): exact-dup non-representatives and
    # the higher id of each verified near-dup pair
    drops = {
        r["doc_id"] for r in exact_dup_losers(documents).take_all()
    } | {
        r["doc_id2"]
        for r in minhash_lsh_pairs(
            documents, min_jaccard_pct=neardup_min_jaccard_pct
        ).take_all()
    }
    drops_ref = ray.put(pa.array(sorted(drops)) if drops else None)

    def final_filter(batch: pa.Table) -> pa.Table:
        drop_arr = ray.get(drops_ref)
        if drop_arr is None:
            return batch
        mask = pc.invert(
            pc.is_in(batch.column("doc_id"),
                     value_set=drop_arr.cast(batch.column("doc_id").type))
        )
        return batch.filter(mask)

    return passing.map_batches(final_filter, batch_format="pyarrow")
