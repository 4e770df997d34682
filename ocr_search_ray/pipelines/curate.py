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
gates). The DROP sets — exact-dup non-representatives and LSH losers —
stay DATASETS end to end and apply via one ``cluster_join(how="anti")``
exchange: at web dup rates (30-50% of a real crawl) the drop sets are
corpus-scale, so neither they nor the keep-set may ever land on the
driver. Zero driver state on this path (the LSH verify's single merged
bloom-bitmap row is the only bounded exception).
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

    # drop sets stay datasets: exact-dup non-representatives ∪ the higher
    # id of each verified near-dup pair, applied with a distributed anti
    # join (one exchange) — never a driver collect, never a broadcast
    from ..stages.relational import cluster_join

    id_type = dict(
        zip(documents.schema().names, documents.schema().types)
    )["doc_id"]
    lsh_losers = minhash_lsh_pairs(
        documents, min_jaccard_pct=neardup_min_jaccard_pct
    ).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id2")}),
        batch_format="pyarrow",
    )
    drops_ds = exact_dup_losers(documents).union(lsh_losers)

    return cluster_join(
        passing, drops_ds, ["doc_id"],
        left_types={"doc_id": id_type, "n_chars": pa.int64(),
                    "n_tokens": pa.int64()},
        right_types={},
        how="anti",
    )
