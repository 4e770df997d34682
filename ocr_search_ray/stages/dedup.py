"""Deduplication operators over a documents-style table.

First-class training-data-pipeline operators (no reference counterpart —
SURVEY.md §2.7 notes the reference has exact upsert-dedup only, which lives
in ``stages.diff.keep_latest``):

- ``exact_dedup``        — hash-partition on sha256(text), keep min(id)
- ``minhash_signatures`` — per-doc MinHash signature rows
- ``minhash_lsh_pairs``  — banded LSH candidate pairs, verified by true
                           shingle Jaccard (the scalable near-dup path:
                           candidates come from a bucket groupby, never an
                           all-pairs scan)
- ``ngram_jaccard_pairs``— exact all-pairs Jaccard via a shared-shingle
                           groupby (inverted-index join: pairs emitted only
                           for docs sharing ≥1 shingle — never a cartesian
                           product)
- ``simhash_signatures`` — 64-bit SimHash per doc (pairs via hamming radius)

All outputs carry exact-integer evidence columns (inter, uni) so oracles
compare integers, not floating division.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.minhash import (
    lsh_bands,
    minhash_signature,
    shingles,
    simhash64,
)
from ..functions.tokenizer import Tokenizer
from .relational import cluster_apply


def exact_dedup(documents, *, id_col: str = "doc_id", text_col: str = "text"):
    """→ (text_sha256, rep_id, n_dups): one row per distinct text; the
    representative is the minimum id (deterministic). Two-phase shape: the
    sha256 is computed batch-local, the groupby shuffles digests, not text."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import sha256_hex_column

        return pa.table(
            {
                "text_sha256": sha256_hex_column(batch.column(text_col)),
                id_col: batch.column(id_col),
            }
        )

    def block_summarize(block: pa.Table) -> pa.Table:
        agg = block.group_by("text_sha256").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return pa.table(
            {
                "text_sha256": agg.column("text_sha256"),
                "rep_id": agg.column(f"{id_col}_min"),
                "n_dups": agg.column(f"{id_col}_count").cast(pa.int64()),
            }
        )

    return cluster_apply(
        documents.map_batches(hash_batch, batch_format="pyarrow"),
        ["text_sha256"],
        block_summarize,
    )


def exact_dup_losers(documents, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ (doc_id): every NON-representative exact duplicate (all ids of a
    distinct-text group except the min). The output is duplicate-sized —
    a small fraction of a real corpus — which is what makes it the correct
    side to broadcast in curation (the keep-set is corpus-sized)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import sha256_hex_column

        return pa.table(
            {
                "text_sha256": sha256_hex_column(batch.column(text_col)),
                id_col: batch.column(id_col),
            }
        )

    def block_losers(block: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        block = block.sort_by(
            [("text_sha256", "ascending"), (id_col, "ascending")]
        )
        n = block.num_rows
        if n == 0:
            return block.select([id_col])
        # a loser is any row whose digest equals its predecessor's (the
        # run head after the sort is the min-id representative)
        col = block.column("text_sha256").combine_chunks()
        same = pc.equal(col.slice(1), col.slice(0, n - 1))
        mask = np.concatenate(
            ([False], same.to_numpy(zero_copy_only=False))
        )
        return block.filter(pa.array(mask)).select([id_col])

    return cluster_apply(
        documents.map_batches(hash_batch, batch_format="pyarrow"),
        ["text_sha256"],
        block_losers,
    )


class _SignatureBatcher:
    """Actor-pool callable computing shingle sets + MinHash per row."""

    def __init__(self, k: int = 3, num_hashes: int = 16) -> None:
        self.k = k
        self.num_hashes = num_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_i: list[int] = []
        out_mh: list[str] = []
        for did, text in zip(ids, texts):
            sig = minhash_signature(shingles(text or "", self.k), self.num_hashes)
            for i, mh in enumerate(sig):
                out_id.append(did)
                out_i.append(i)
                out_mh.append(mh)
        return pa.table(
            {
                "doc_id": pa.array(out_id, batch.column("doc_id").type),
                "i": pa.array(out_i, pa.int32()),
                "mh": pa.array(out_mh, pa.string()),
            }
        )


def minhash_signatures(documents, *, k: int = 3, num_hashes: int = 16,
                       concurrency: int | None = None):
    """→ (doc_id, i, mh): exploded MinHash signatures (docs with <k words
    emit no rows, matching the SQL formulation)."""
    return documents.select_columns(["doc_id", "text"]).map_batches(
        _SignatureBatcher(k, num_hashes),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def minhash_lsh_pairs(documents, *, k: int = 3, num_hashes: int = 16,
                      band_rows: int = 4, min_jaccard_pct: int = 50,
                      concurrency: int | None = None):
    """Banded-LSH near-dup pairs, verified exactly.

    1. per-doc signature + band keys (batch-local, no shuffle)
    2. groupby(band_idx, band_sig) → candidate pairs, distinct
    3. verify true shingle Jaccard ≥ min_jaccard_pct/100 **collect-free**:
       the candidate pair table STAYS a dataset end to end — at web dup
       rates (30-50% of a crawl) candidates are corpus-scale and must
       never be driver state. The corpus restricts to candidate docs via
       ``bloom_semi_join`` (stateless bloom probe + exact semi — the only
       driver state anywhere is the one merged bloom-bitmap row), |∩| is
       computed by JOINING the pair table against each side's exploded
       distinct shingles (pairs × shingles-of-doc1, then a semi on
       (doc_id2, sh)) — pair emission is driven BY the pair table, so a
       hot shingle can never blow up the pair space — and per-doc sizes
       attach via two more ``cluster_join`` exchanges (the
       ``ngram_jaccard_pairs`` plan, candidate-restricted).

    → (doc_id1, doc_id2, inter, uni) with 100*inter >= min_jaccard_pct*uni.

    ``min_jaccard_pct`` must be > 0: the collect-free verify computes |∩|
    from a pair-shingle join, so zero-overlap candidates never produce an
    intersection row and a threshold of 0 (which would accept them) cannot
    be honored.
    """
    if min_jaccard_pct <= 0:
        raise ValueError(
            "min_jaccard_pct must be > 0 (zero-overlap pairs are not "
            "representable by the collect-free verify plan)")

    def band_rows_fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_b, out_sig = [], [], []
        for did, text in zip(ids, texts):
            sig = minhash_signature(shingles(text or "", k), num_hashes)
            if not sig:
                continue
            for b, bsig in enumerate(lsh_bands(sig, band_rows)):
                out_id.append(did)
                out_b.append(b)
                # band key ships as the md5 of the band signature: band
                # sigs are near-unique per doc (dictionary encoding can't
                # help), so the digest cuts this op's one all-to-all ~4×.
                # Equality is preserved; an md5 collision merely ADDS a
                # candidate pair, which the exact verify then gates.
                out_sig.append(hashlib.md5(bsig.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, batch.column("doc_id").type),
                "band": pa.array(out_b, pa.int32()),
                "band_sig": pa.array(out_sig, pa.string()),
            }
        )

    def block_emit_pairs(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [("band", "ascending"), ("band_sig", "ascending"),
             ("doc_id", "ascending")]
        )
        bands = block.column("band").to_pylist()
        sigs = block.column("band_sig").to_pylist()
        ids = block.column("doc_id").to_pylist()
        a_out, b_out = [], []
        i, n = 0, len(ids)
        while i < n:
            j = i
            while j < n and bands[j] == bands[i] and sigs[j] == sigs[i]:
                j += 1
            for x in range(i, j):
                for y in range(x + 1, j):
                    a_out.append(ids[x])
                    b_out.append(ids[y])
            i = j
        return pa.table(
            {
                "doc_id1": pa.array(a_out, block.column("doc_id").type),
                "doc_id2": pa.array(b_out, block.column("doc_id").type),
            }
        )

    candidates = cluster_apply(
        documents.select_columns(["doc_id", "text"])
        .map_batches(band_rows_fn, batch_format="pyarrow",
                     batch_size=256, concurrency=concurrency),
        ["band", "band_sig"],
        block_emit_pairs,
    )
    # materialized: two consumers (bloom keys, the fused exchange below)
    # would otherwise each re-run the banding exchange. Candidate-sized
    # blocks pinned in the distributed object store (spillable) — NOT
    # driver heap. Cross-band duplicate pairs survive here; they dedup
    # inside the fused exchange (same doc_id1 key → same block).
    candidates = candidates.materialize()

    # --- collect-free verify: every side stays a dataset ---
    from .relational import bloom_prefilter, cluster_apply as _capply
    from .relational import cluster_join, grouped_agg

    schema = documents.schema()
    types = dict(zip(schema.names, schema.types))
    id_type, text_type = types["doc_id"], types["text"]

    def both_sides(batch: pa.Table) -> pa.Table:
        ids = pa.chunked_array(
            [batch.column("doc_id1"), batch.column("doc_id2")]
        )
        return pa.table({"doc_id": ids})

    # corpus → candidate docs: bloom prefilter only, no exact semi — the
    # pair-table joins below are already an exact gate, so a bloom false
    # positive merely wastes one doc's shingle explode (dropped at the
    # joins), never changes the answer. Saves a full candidate exchange.
    cand_docs = bloom_prefilter(
        documents.select_columns(["doc_id", "text"]),
        candidates.map_batches(both_sides, batch_format="pyarrow"),
        "doc_id",
    ).materialize()  # candidate docs: reused by shingle + size explodes

    def shingle_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, sh, n_sh) — the per-doc distinct-shingle count rides
        every row so doc2's size reaches the pair through the marker join
        (no separate size-attach exchange)."""
        out_id, out_sh, out_n = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            shs = shingles(text or "", k)
            for s in shs:
                out_id.append(did)
                out_sh.append(s)
                out_n.append(len(shs))
        return pa.table(
            {
                "doc_id": pa.array(out_id, id_type),
                "sh": pa.array(out_sh, pa.string()),
                "n_sh": pa.array(out_n, pa.int64()),
            }
        )

    shing = cand_docs.map_batches(shingle_rows, batch_format="pyarrow")

    # |∩| per pair WITHOUT enumerating shingle groups: ONE fused exchange
    # on doc_id1 dedups the cross-band pair duplicates AND attaches
    # doc1's shingles (inner join — pairs × |sh(doc1)| rows, linear in
    # doc length, never quadratic in a shingle's df); then a LEFT join
    # marks shingles doc2 also has, and one grouped pass yields n1 = rows
    # per pair AND inter = marked rows per pair.
    def align_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id1": batch.column("doc_id1").cast(id_type),
                "doc_id2": batch.column("doc_id2").cast(id_type),
                "sh": pa.nulls(batch.num_rows, pa.string()),
                "__vside": pa.repeat(pa.scalar(0, pa.int8()),
                                     batch.num_rows),
            }
        )

    def align_sh1(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id1": batch.column("doc_id").cast(id_type),
                "doc_id2": pa.nulls(batch.num_rows, id_type),
                "sh": batch.column("sh"),
                "__vside": pa.repeat(pa.scalar(1, pa.int8()),
                                     batch.num_rows),
            }
        )

    def block_dedup_join(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = block.column("__vside")
        pairs = (
            block.filter(pc.equal(side, 0))
            .select(["doc_id1", "doc_id2"])
            .group_by(["doc_id1", "doc_id2"]).aggregate([])
        )
        sh1 = block.filter(pc.equal(side, 1)).select(["doc_id1", "sh"])
        return pairs.join(sh1, keys=["doc_id1"], join_type="inner")

    with_sh = _capply(
        candidates.map_batches(align_pair, batch_format="pyarrow").union(
            shing.map_batches(align_sh1, batch_format="pyarrow")
        ),
        ["doc_id1"],
        block_dedup_join,
    )

    def mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id2": t.column("doc_id"),
                "sh": t.column("sh"),
                "m": pa.repeat(pa.scalar(1, pa.int64()), t.num_rows),
                "n2": t.column("n_sh"),
            }
        )

    matched = cluster_join(
        with_sh,
        shing.map_batches(mark, batch_format="pyarrow"),
        ["doc_id2", "sh"],
        left_types={"doc_id1": id_type, "doc_id2": id_type,
                    "sh": pa.string()},
        right_types={"m": pa.int64(), "n2": pa.int64()},
        how="left",
    )
    # n2 = max over the pair's matched rows (every matched row carries
    # doc2's size; pairs with ZERO matches get null n2 and are dropped —
    # they can never pass the threshold since inter = 0 < pct·uni)
    with_n2 = grouped_agg(
        matched, ["doc_id1", "doc_id2"],
        [("n1", "sh", "count"), ("inter", "m", "sum"),
         ("n2", "n2", "max")],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a pair with zero shared shingles sums m over all-null -> null
        inter = pc.fill_null(batch.column("inter"), 0)
        uni = pc.subtract(pc.add(batch.column("n1"), batch.column("n2")),
                          inter)
        keep = pc.and_(
            pc.greater(uni, 0),
            pc.greater_equal(
                pc.multiply(inter, 100), pc.multiply(uni, min_jaccard_pct)
            ),
        )
        out = pa.table(
            {
                "doc_id1": batch.column("doc_id1"),
                "doc_id2": batch.column("doc_id2"),
                "inter": pc.cast(inter, pa.int64()),
                "uni": pc.cast(uni, pa.int64()),
            }
        )
        return out.filter(keep)

    return with_n2.map_batches(finalize, batch_format="pyarrow")


def _shingle_pair_stats(documents, *, k: int, max_shingle_df: int | None):
    """Shared machinery of the exact shingle-overlap pair family
    (``ngram_jaccard_pairs`` / ``containment_pairs``): explode distinct
    shingles → groupby(shingle) → pair hits → sum = |∩|; per-doc shingle
    counts attached with distributed ``cluster_join`` passes — nothing
    corpus-sized ever reaches the driver.

    ``max_shingle_df``: a shingle shared by d docs emits d·(d−1)/2 pairs —
    a single stop-phrase 3-gram shared by 10^6 docs would emit 5·10^11
    pairs. Groups larger than the cap are DROPPED (the standard df-threshold
    trade: pairs whose only shared shingles are ubiquitous boilerplate lose
    those hits, slightly undercounting |∩| for them). Set ``None`` for the
    exact unbounded product (small corpora / oracle tests); the default
    never binds below 10k-document shingle collisions.

    → (doc_id1, doc_id2, sum(hit) = |∩|, n1, n2) dataset.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh = [], []
        for did, text in zip(ids, texts):
            for s in shingles(text or "", k):
                out_id.append(did)
                out_sh.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, batch.column("doc_id").type),
                "sh": pa.array(out_sh, pa.string()),
            }
        )

    exploded = documents.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )

    def block_pair_hits(block: pa.Table) -> pa.Table:
        block = block.sort_by([("sh", "ascending"), ("doc_id", "ascending")])
        shs = block.column("sh").to_pylist()
        ids = block.column("doc_id").to_pylist()
        a_out, b_out = [], []
        i, n = 0, len(ids)
        while i < n:
            j = i
            while j < n and shs[j] == shs[i]:
                j += 1
            if max_shingle_df is None or j - i <= max_shingle_df:
                for x in range(i, j):
                    for y in range(x + 1, j):
                        a_out.append(ids[x])
                        b_out.append(ids[y])
            i = j
        return pa.table(
            {
                "doc_id1": pa.array(a_out, block.column("doc_id").type),
                "doc_id2": pa.array(b_out, block.column("doc_id").type),
                "hit": pa.array([1] * len(a_out), pa.int64()),
            }
        )

    def block_hit_sums(block: pa.Table) -> pa.Table:
        agg = block.group_by(["doc_id1", "doc_id2"]).aggregate([("hit", "sum")])
        return pa.table(
            {
                "doc_id1": agg.column("doc_id1"),
                "doc_id2": agg.column("doc_id2"),
                "sum(hit)": agg.column("hit_sum"),
            }
        )

    inter_counts = cluster_apply(
        cluster_apply(exploded, ["sh"], block_pair_hits),
        ["doc_id1", "doc_id2"],
        block_hit_sums,
    )

    def size_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, batch.column("doc_id").type),
                "n_sh": pa.array(
                    [len(shingles(t or "", k)) for t in texts], pa.int64()
                ),
            }
        )

    # per-doc shingle counts attached DISTRIBUTED (two int-key join
    # exchanges over the pair table) — at 10^12 docs the size table is
    # corpus-sized and must never be a driver dict
    from .relational import cluster_join

    id_type = dict(
        zip(documents.schema().names, documents.schema().types)
    )["doc_id"]
    sizes_ds = documents.select_columns(["doc_id", "text"]).map_batches(
        size_rows, batch_format="pyarrow"
    )
    with_n1 = cluster_join(
        inter_counts,
        sizes_ds.map_batches(
            lambda t: t.rename_columns(["doc_id1", "n1"]),
            batch_format="pyarrow",
        ),
        ["doc_id1"],
        left_types={"doc_id1": id_type, "doc_id2": id_type,
                    "sum(hit)": pa.int64()},
        right_types={"n1": pa.int64()},
    )
    with_n2 = cluster_join(
        with_n1,
        sizes_ds.map_batches(
            lambda t: t.rename_columns(["doc_id2", "n2"]),
            batch_format="pyarrow",
        ),
        ["doc_id2"],
        left_types={"doc_id1": id_type, "doc_id2": id_type,
                    "sum(hit)": pa.int64(), "n1": pa.int64()},
        right_types={"n2": pa.int64()},
    )
    return with_n2


def ngram_jaccard_pairs(documents, *, k: int = 3, min_jaccard_pct: int = 20,
                        max_shingle_df: int | None = 10_000):
    """Exact Jaccard pairs over the shared-shingle inverted index (see
    ``_shingle_pair_stats`` for the physical plan and the df cap).

    → (doc_id1, doc_id2, inter, uni) with 100*inter >= min_jaccard_pct*uni.
    """
    stats = _shingle_pair_stats(documents, k=k, max_shingle_df=max_shingle_df)

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        inter = batch.column("sum(hit)")
        uni = pc.subtract(
            pc.add(batch.column("n1"), batch.column("n2")), inter
        )
        keep = pc.and_(
            pc.greater(uni, 0),
            pc.greater_equal(
                pc.multiply(inter, 100), pc.multiply(uni, min_jaccard_pct)
            ),
        )
        out = pa.table(
            {
                "doc_id1": batch.column("doc_id1"),
                "doc_id2": batch.column("doc_id2"),
                "inter": pc.cast(inter, pa.int64()),
                "uni": pc.cast(uni, pa.int64()),
            }
        )
        return out.filter(keep)

    return stats.map_batches(finalize, batch_format="pyarrow")


def containment_pairs(documents, *, k: int = 3, min_containment_pct: int = 80,
                      max_shingle_df: int | None = 10_000):
    """Exact shingle CONTAINMENT pairs (Broder 1997's asymmetric resemblance
    companion): keep pairs where the smaller document's shingle set is
    ≥ ``min_containment_pct`` contained in the overlap —
    100·|A∩B| ≥ pct·min(|A|, |B|). Catches partial duplication Jaccard
    misses (a page quoted whole inside a much larger one scores
    containment ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0). Same inverted-index plan
    and df cap as ``ngram_jaccard_pairs`` (``_shingle_pair_stats``);
    integer-exact throughout.

    → (doc_id1, doc_id2, inter, n1, n2).
    """
    stats = _shingle_pair_stats(documents, k=k, max_shingle_df=max_shingle_df)

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        inter = batch.column("sum(hit)")
        n1, n2 = batch.column("n1"), batch.column("n2")
        smaller = pc.min_element_wise(n1, n2)
        keep = pc.greater_equal(
            pc.multiply(inter, 100),
            pc.multiply(smaller, min_containment_pct),
        )
        out = pa.table(
            {
                "doc_id1": batch.column("doc_id1"),
                "doc_id2": batch.column("doc_id2"),
                "inter": pc.cast(inter, pa.int64()),
                "n1": pc.cast(n1, pa.int64()),
                "n2": pc.cast(n2, pa.int64()),
            }
        )
        return out.filter(keep)

    return stats.map_batches(finalize, batch_format="pyarrow")


def neardup_pairs_auto(documents, *, k: int = 3, min_jaccard_pct: int = 30,
                       max_exact_docs: int = 100_000, num_hashes: int = 16,
                       band_rows: int = 4):
    """ENFORCED measured-size switch between the two near-dup pair
    generators (identical ``(doc_id1, doc_id2, inter, uni)`` schema):

    - ≤ ``max_exact_docs``: ``ngram_jaccard_pairs`` — exact, but its
      shared-shingle candidate space carries O(candidate²)-per-shingle
      risk that only the df cap bounds;
    - past the bound: ``minhash_lsh_pairs`` — banded LSH candidates with
      the same exact collect-free Jaccard verify (≈0.99+ recall at the
      default banding for ≥ min_jaccard_pct pairs).

    Like ``embedding_neardup_pairs``' broadcast bound, the switch is
    measured HERE, not a caller convention (VERDICT r4 #6): callers
    composing curation pipelines cannot accidentally run the
    all-candidate plan on a corpus-scale input. ``documents`` should be
    materialized (both callers in ``pipelines/queries.py`` are) so
    ``count()`` is a metadata read."""
    if documents.count() > max_exact_docs:
        return minhash_lsh_pairs(
            documents, k=k, min_jaccard_pct=min_jaccard_pct,
            num_hashes=num_hashes, band_rows=band_rows,
        )
    return ngram_jaccard_pairs(
        documents, k=k, min_jaccard_pct=min_jaccard_pct
    )


class _SimhashBatcher:
    def __init__(self) -> None:
        self.tokenizer = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sims = [
            simhash64(self.tokenizer.term_freqs(t or "")) for t in texts
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, batch.column("doc_id").type),
                # two's-complement into int64 for Arrow friendliness
                "simhash": pa.array(
                    [s - (1 << 64) if s >= (1 << 63) else s for s in sims],
                    pa.int64(),
                ),
            }
        )


def simhash_signatures(documents, *, concurrency: int | None = None):
    """→ (doc_id, simhash:int64) — tokenizer-weighted 64-bit SimHash."""
    return documents.select_columns(["doc_id", "text"]).map_batches(
        _SimhashBatcher(), batch_format="pyarrow", batch_size=256,
        concurrency=concurrency,
    )


def simhash_neardup_pairs(documents, *, radius: int = 3, n_chunks: int = 4,
                          band_chunks: int = 1,
                          concurrency: int | None = None):
    """SimHash near-dup pairs within a hamming radius.

    Combination banding (pigeonhole): each 64-bit signature splits into
    ``n_chunks`` chunks of 64//n_chunks bits; a band is any combination of
    ``band_chunks`` chunks, keyed by the concatenated chunk values. With
    ``radius <= n_chunks - band_chunks``, r bit errors spoil at most r
    chunks, so some band survives intact on both sides — clustering on
    (band, band_key) finds ALL pairs within the radius: complete recall,
    no all-pairs scan. Candidates are verified exactly with a popcount.

    Scale knob: ``band_chunks=1`` gives n_chunks bands over 2^(64/n) keys
    (4 rows/doc, 65k buckets at the default — fine to ~10^8 docs);
    ``n_chunks=5, band_chunks=2`` gives C(5,2)=10 bands over ~2^24 keys —
    the same recall guarantee with ~256× smaller buckets, the right trade
    at 10^10+ docs where per-bucket pair emission is the quadratic risk.

    → (doc_id1, doc_id2, hamming:int64), doc_id1 < doc_id2, hamming <= radius.
    """
    from itertools import combinations

    if radius > n_chunks - band_chunks:
        raise ValueError(
            f"radius {radius} needs n_chunks - band_chunks >= radius "
            f"(got {n_chunks} - {band_chunks}): pigeonhole recall "
            "guarantee would not hold"
        )
    sigs = simhash_signatures(documents, concurrency=concurrency)
    bits_per = 64 // n_chunks
    mask = (1 << bits_per) - 1
    combos = list(combinations(range(n_chunks), band_chunks))

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sims = batch.column("simhash").to_pylist()
        out_id, out_b, out_k, out_s = [], [], [], []
        for did, s in zip(ids, sims):
            u = s & ((1 << 64) - 1)  # back to unsigned
            vals = [(u >> (c * bits_per)) & mask for c in range(n_chunks)]
            for b, combo in enumerate(combos):
                key = 0
                for c in combo:
                    key = (key << bits_per) | vals[c]
                out_id.append(did)
                out_b.append(b)
                out_k.append(key)
                out_s.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, batch.column("doc_id").type),
                "band": pa.array(out_b, pa.int32()),
                "band_key": pa.array(out_k, pa.int64()),
                "simhash": pa.array(out_s, pa.int64()),
            }
        )

    def block_candidate_pairs(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [("band", "ascending"), ("band_key", "ascending"),
             ("doc_id", "ascending")]
        )
        bands = block.column("band").to_pylist()
        vals = block.column("band_key").to_pylist()
        ids = block.column("doc_id").to_pylist()
        sims = block.column("simhash").to_pylist()
        a_out, b_out, h_out = [], [], []
        i, n = 0, len(ids)
        while i < n:
            j = i
            while j < n and bands[j] == bands[i] and vals[j] == vals[i]:
                j += 1
            for x in range(i, j):
                for y in range(x + 1, j):
                    if ids[x] == ids[y]:
                        continue
                    h = bin((sims[x] ^ sims[y]) & ((1 << 64) - 1)).count("1")
                    if h <= radius:
                        a_out.append(min(ids[x], ids[y]))
                        b_out.append(max(ids[x], ids[y]))
                        h_out.append(h)
            i = j
        return pa.table(
            {
                "doc_id1": pa.array(a_out, block.column("doc_id").type),
                "doc_id2": pa.array(b_out, block.column("doc_id").type),
                "hamming": pa.array(h_out, pa.int64()),
            }
        )

    candidates = cluster_apply(
        sigs.map_batches(explode_bands, batch_format="pyarrow"),
        ["band", "band_key"],
        block_candidate_pairs,
    )
    # a pair can agree on several chunks → distinct
    return cluster_apply(
        candidates,
        ["doc_id1", "doc_id2"],
        lambda block: block.group_by(["doc_id1", "doc_id2"])
        .aggregate([("hamming", "min")])
        .rename_columns(["doc_id1", "doc_id2", "hamming"]),
    )


def span_dedup(documents, *, window: int = 8, id_col: str = "doc_id",
               text_col: str = "text"):
    """C4-style global exact span dedup → (doc_id, text_clean, n_spans,
    n_dropped).

    Documents are cut into consecutive ``window``-word spans (the last span
    may be short — C4's three-sentence unit re-expressed over the word
    stream); every span that appeared earlier in the corpus — in ANY
    document, ordered by (doc_id, span_idx) — is removed, and each doc is
    reassembled from its surviving spans (' '-joined).

    Scale shape (hot-key-safe keep-first):

    1. span fan-out is a per-batch pass (inner joins are C-speed);
    2. a batch-local combiner decides losers early: within a batch only the
       first occurrence of each span survives to the global exchange, so a
       boilerplate span shared by every doc ships ONE row per batch, not
       one per doc (the Zipf head collapses before the all-to-all, exactly
       like ``ngram_counts``);
    3. one int-key exchange on span_text picks the global winner per span
       (min (doc_id, span_idx)); block-local grouping on the REAL span text
       keeps hash collisions safe;
    4. one exchange on doc_id reassembles docs from (span_idx, keep) runs.

    No whole-corpus collect; driver state is O(1).
    """

    def spans_fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_idx, out_text = [], [], []
        # batch-local winner per span = min (doc_id, span_idx) — the same
        # total order the global pick uses, so a local loser can never be
        # the global winner
        best: dict[str, int] = {}
        for d, t in zip(ids, texts):
            words = [w for w in (t or "").split(" ") if w]
            for s in range(0, (len(words) + window - 1) // window):
                st = " ".join(words[s * window:(s + 1) * window])
                i = len(out_id)
                out_id.append(d)
                out_idx.append(s)
                out_text.append(st)
                b = best.get(st)
                if b is None or (d, s) < (out_id[b], out_idx[b]):
                    best[st] = i
        winners_idx = set(best.values())
        out_keep = [i in winners_idx for i in range(len(out_id))]
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "span_idx": pa.array(out_idx, pa.int64()),
                "span_text": pa.array(out_text, pa.string()),
                "local_keep": pa.array(out_keep, pa.bool_()),
            }
        )

    spans = documents.select_columns([id_col, text_col]).map_batches(
        spans_fn, batch_format="pyarrow"
    )

    import pyarrow.compute as pc

    winners = spans.filter(expr="local_keep == True")
    losers = spans.filter(expr="local_keep == False")

    def block_pick_global(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [("span_text", "ascending"), (id_col, "ascending"),
             ("span_idx", "ascending")]
        )
        texts = block.column("span_text").to_pylist()
        first = [
            i == 0 or texts[i] != texts[i - 1] for i in range(len(texts))
        ]
        return pa.table(
            {
                id_col: block.column(id_col),
                "span_idx": block.column("span_idx"),
                "span_text": block.column("span_text"),
                "keep": pa.array(first, pa.bool_()),
            }
        )

    decided = cluster_apply(
        winners.drop_columns(["local_keep"]), ["span_text"],
        block_pick_global,
    )

    def mark_dropped(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "span_idx": batch.column("span_idx"),
                "span_text": batch.column("span_text"),
                "keep": pa.array([False] * batch.num_rows, pa.bool_()),
            }
        )

    all_spans = decided.union(
        losers.drop_columns(["local_keep"]).map_batches(
            mark_dropped, batch_format="pyarrow"
        )
    )

    def block_rebuild(block: pa.Table) -> pa.Table:
        """Vectorized doc rebuild: per-doc span/drop counts in one grouped
        pass; kept spans gathered with Arrow's order-preserving list
        aggregation (single-threaded group_by accumulates in encounter
        order of the span_idx-sorted block) and joined with one
        ``binary_join``. No per-row Python."""
        import pyarrow.compute as pc

        block = block.sort_by(
            [(id_col, "ascending"), ("span_idx", "ascending")]
        )
        stats = block.group_by(id_col, use_threads=False).aggregate(
            [("keep", "count"), ("keep", "sum")]
        )
        kept = block.filter(block.column("keep"))
        texts = kept.group_by(id_col, use_threads=False).aggregate(
            [("span_text", "list")]
        )
        ttab = pa.table(
            {
                id_col: texts.column(id_col),
                "text_clean": pc.binary_join(
                    texts.column("span_text_list"), " "
                ),
            }
        )
        out = stats.join(ttab, keys=[id_col], join_type="left outer")
        n_spans = out.column("keep_count").cast(pa.int64())
        n_kept = pc.fill_null(out.column("keep_sum"), 0).cast(pa.int64())
        return pa.table(
            {
                id_col: out.column(id_col),
                "text_clean": pc.fill_null(out.column("text_clean"), ""),
                "n_spans": n_spans,
                "n_dropped": pc.subtract(n_spans, n_kept),
            }
        )

    rebuilt = cluster_apply(all_spans, [id_col], block_rebuild)

    # docs with zero words never emit spans — surface them with empty output.
    # fill_null: count_substring_regex(null) is null, and a null mask row
    # would be DROPPED by filter — null-text docs must surface here too
    # (one-row-per-doc contract)
    def empties(batch: pa.Table) -> pa.Table:
        n_words = pc.fill_null(
            pc.count_substring_regex(batch.column(text_col), "[^ ]+"), 0
        )
        keep = batch.filter(pc.equal(n_words, 0))
        zero = pa.array([0] * keep.num_rows, pa.int64())
        return pa.table(
            {
                id_col: keep.column(id_col),
                "text_clean": pa.array([""] * keep.num_rows, pa.string()),
                "n_spans": zero,
                "n_dropped": zero,
            }
        )

    empty_docs = documents.select_columns([id_col, text_col]).map_batches(
        empties, batch_format="pyarrow"
    )
    return rebuilt.union(empty_docs)


def dup_spans(documents, *, window: int = 4, min_count: int = 2,
              id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicated-substring spans at fixed window granularity →
    (doc_id, span_start, span_end): word indices, end exclusive, of every
    maximal span covered by ``window``-word substrings occurring ≥
    ``min_count`` times in the corpus (within OR across documents).

    The windowed re-expression of Lee et al. 2022's exact substring dedup
    ("Deduplicating Training Data Makes Language Models Better"): their
    suffix array finds duplicated substrings ≥ a length floor; overlapping
    fixed-width windows at stride 1 find the same regions at window
    granularity with pipeline-shaped cost — O(corpus tokens) window rows
    instead of a global suffix-array build, the honest distributed trade.
    Unlike ``span_dedup`` (C4's DISJOINT spans, keep-first), spans here
    overlap and the output marks ALL duplicated regions (consumer decides
    cut vs drop).

    Scale shape:

    1. window fan-out is a per-batch pass (stride 1);
    2. ONE window-key exchange; block-local count over the REAL window
       string (cluster_apply contract — collision-safe) keeps only rows of
       windows meeting ``min_count``; survivors are the rare tail, so the
       second exchange moves hit rows only;
    3. ONE doc-key exchange: per-doc sorted starts, vectorized
       gaps-and-islands (break when the start gap exceeds ``window`` —
       overlap or touch merges) → maximal spans.

    No driver collect; output is O(duplicated regions).
    """
    import numpy as np

    def windows_fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_start, out_win = [], [], []
        for d, t in zip(ids, texts):
            words = [w for w in (t or "").split(" ") if w]
            for s in range(len(words) - window + 1):
                out_id.append(d)
                out_start.append(s)
                out_win.append(" ".join(words[s:s + window]))
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "start": pa.array(out_start, pa.int64()),
                "win": pa.array(out_win, pa.string()),
            }
        )

    occurrences = documents.select_columns([id_col, text_col]).map_batches(
        windows_fn, batch_format="pyarrow"
    )

    def keep_dups(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        counts = block.group_by("win").aggregate([("win", "count")])
        dup = counts.filter(
            pc.greater_equal(counts.column("win_count"), min_count)
        ).column("win")
        mask = pc.is_in(block.column("win"),
                        value_set=dup.combine_chunks())
        return block.filter(mask).select([id_col, "start"])

    hits = cluster_apply(occurrences, ["win"], keep_dups)

    def islands(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [(id_col, "ascending"), ("start", "ascending")]
        )
        n = block.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], block.column(id_col).type),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                }
            )
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        starts = block.column("start").to_numpy(zero_copy_only=False)
        brk = np.r_[True,
                    (ids[1:] != ids[:-1])
                    | ((starts[1:] - starts[:-1]) > window)]
        b_idx = np.flatnonzero(brk)
        e_idx = np.r_[b_idx[1:], n] - 1
        return pa.table(
            {
                id_col: block.column(id_col).take(
                    pa.array(b_idx, pa.int64())),
                "span_start": pa.array(starts[b_idx], pa.int64()),
                "span_end": pa.array(starts[e_idx] + window, pa.int64()),
            }
        )

    return cluster_apply(hits, [id_col], islands)


# ------------------------------------------------------- decontamination


def _shingle_h128(s: str) -> tuple[int, int]:
    """FULL md5 digest as a (hi, lo) uint64 pair — the membership test
    compares all 128 bits, so decontamination is exact up to full-md5
    collisions (cryptographically negligible; a 64-bit prefix alone would
    hit birthday collisions near 2^32 distinct shingles, reachable at
    corpus scale)."""
    d = hashlib.md5(s.encode("utf-8")).digest()
    return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big"))


def bench_ngram_hashes(benchmark, *, k: int = 3, text_col: str = "text",
                       max_ngrams: int = 50_000_000):
    """Distinct word-``k``-gram md5 digests of the benchmark side as two
    parallel uint64 numpy arrays ``(hi, lo)``, lexicographically sorted by
    (hi, lo).

    Scale shape: the benchmark side of a decontamination pass is small by
    definition (eval suites are 10^3–10^6 documents against a 10^12-row
    corpus), so its distinct n-gram set is the canonical broadcast-side
    lookup — per-batch distinct dataset-side, then a STREAMED driver union
    (``iter_batches``, never ``take_all``) guarded by ``max_ngrams``. At
    real scale the array would become a Bloom filter at the same plumbing
    point; exactness here keeps the relational oracle exact.
    """
    import numpy as np

    def batch_hashes(batch: pa.Table) -> pa.Table:
        seen: set[tuple[int, int]] = set()
        for text in batch.column(text_col).to_pylist():
            for s in shingles(text or "", k):
                seen.add(_shingle_h128(s))
        ordered = sorted(seen)
        return pa.table(
            {"hi": pa.array([h for h, _ in ordered], pa.uint64()),
             "lo": pa.array([l for _, l in ordered], pa.uint64())}
        )

    hashes = benchmark.select_columns([text_col]).map_batches(
        batch_hashes, batch_format="pyarrow"
    )
    acc: set[tuple[int, int]] = set()
    for b in hashes.iter_batches(batch_format="pyarrow"):
        acc.update(zip(b.column("hi").to_pylist(), b.column("lo").to_pylist()))
        if len(acc) > max_ngrams:
            raise ValueError(
                f"benchmark n-gram set exceeds max_ngrams={max_ngrams}; "
                "the benchmark side must be the small side — raise the cap "
                "only with driver memory to match"
            )
    ordered = sorted(acc)
    return (np.array([h for h, _ in ordered], dtype=np.uint64),
            np.array([l for _, l in ordered], dtype=np.uint64))


def decontaminate(documents, benchmark, *, k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", max_bench_ngrams: int = 50_000_000):
    """Benchmark decontamination: flag corpus documents sharing any word
    ``k``-gram with a held-out benchmark set (the GPT-3 appendix-C /
    Dolma-style n-gram overlap check).

    → (id_col, n_sh, bench_hits, contaminated) — one row per corpus doc;
    ``n_sh`` = distinct shingles of the doc, ``bench_hits`` = how many of
    them appear anywhere in the benchmark, ``contaminated`` = hits > 0.
    Exact integer evidence columns, so the DuckDB oracle compares counts,
    not floats. Membership compares the FULL 128-bit md5 of each shingle
    (hi searched, lo verified within the hi run), so the oracle's raw
    string comparison and this check agree up to full-md5 collisions only.

    Scale shape: benchmark hash set broadcast once (``ray.put`` of two
    sorted uint64 arrays; see :func:`bench_ngram_hashes`), corpus side
    streamed — one ``map_batches`` pass, membership tested via vectorized
    binary search (``np.searchsorted``), no shuffle, no corpus-sized
    driver state.
    """
    import numpy as np
    import ray

    bench = bench_ngram_hashes(
        benchmark, k=k, text_col=text_col, max_ngrams=max_bench_ngrams
    )
    bench_ref = ray.put(bench)

    def flag(batch: pa.Table) -> pa.Table:
        ref_hi, ref_lo = ray.get(bench_ref)  # zero-copy plasma, cached/node
        n = ref_hi.shape[0]
        out_nsh, out_hits = [], []
        for text in batch.column(text_col).to_pylist():
            shs = shingles(text or "", k)
            if shs and n:
                pairs = [_shingle_h128(s) for s in shs]
                hv_hi = np.fromiter(
                    (h for h, _ in pairs), dtype=np.uint64, count=len(pairs)
                )
                hv_lo = np.fromiter(
                    (l for _, l in pairs), dtype=np.uint64, count=len(pairs)
                )
                left = np.searchsorted(ref_hi, hv_hi, side="left")
                right = np.searchsorted(ref_hi, hv_hi, side="right")
                # hi runs are length ≤ 1 except for rare hi-prefix
                # collisions — vectorize the common case, loop the rest
                single = right - left == 1
                hit_mask = single & (
                    ref_lo[np.minimum(left, n - 1)] == hv_lo
                )
                hits = int(np.count_nonzero(hit_mask))
                for i in np.nonzero(right - left > 1)[0]:
                    if hv_lo[i] in ref_lo[left[i]:right[i]]:
                        hits += 1
            else:
                hits = 0
            out_nsh.append(len(shs))
            out_hits.append(hits)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_sh": pa.array(out_nsh, pa.int64()),
                "bench_hits": pa.array(out_hits, pa.int64()),
                "contaminated": pa.array([h > 0 for h in out_hits], pa.bool_()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow"
    )


def _lev_le1(a: str, b: str) -> bool:
    """True iff levenshtein(a, b) <= 1 (one-pass, no DP)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def editdist1_pairs(ds, *, id_col: str = "doc_id", col: str = "url",
                    max_len: int = 64, max_key_df: int = 1000):
    """All pairs at levenshtein distance ≤ 1 — SymSpell-style deletion-
    variant blocking (Garbe's symmetric delete): two strings within one
    edit ALWAYS share a key in {s} ∪ del1(s) (equal → s; substitution at
    i → both i-deletions equal; ins/del → the shorter string IS a
    deletion of the longer), so candidates come from one groupby instead
    of a cross join; each candidate pair is verified with the exact
    one-pass ≤1 check.

    Candidate generation is VECTORIZED: one ``utf8_replace_slice`` kernel
    call per character position (≤ ``max_len``, not per row); strings
    longer than ``max_len`` raise — callers with long columns must key on
    a bounded prefix themselves. ``max_key_df`` drops degenerate hub keys
    (a key shared by d strings emits d²/2 candidates) — the same guard as
    ``ngram_jaccard_pairs``; at the default it never binds below 1000
    same-variant collisions.

    Physical plan: explode (one map) → key-group candidate+verify (one
    ``cluster_apply``: pairs generated AND verified block-locally, the
    carried strings arrive dictionary-encoded) → global pair distinct
    (one ``cluster_apply`` group_by). Nothing driver-resident.

    → (id1:int64, id2:int64, dist:int64) with id1 < id2, dist ∈ {0, 1}.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        s = batch.column(col).cast(pa.string())
        lens = pc.utf8_length(s)
        if batch.num_rows and pc.max(lens).as_py() > max_len:
            raise ValueError(
                f"editdist1_pairs: {col} exceeds max_len={max_len}"
            )
        outs = [pa.table({"key": s, id_col: ids, "s": s})]
        max_here = pc.max(lens).as_py() if batch.num_rows else 0
        for i in range(max_here or 0):
            mask = pc.greater(lens, i)
            sub_s = s.filter(mask)
            outs.append(
                pa.table(
                    {
                        "key": pc.utf8_replace_slice(
                            sub_s, start=i, stop=i + 1, replacement=""
                        ),
                        id_col: ids.filter(mask),
                        "s": sub_s,
                    }
                )
            )
        return pa.concat_tables(outs).combine_chunks()

    def pairs_in_block(block: pa.Table) -> pa.Table:
        srt = block.sort_by([("key", "ascending"), (id_col, "ascending")])
        keys = srt.column("key").to_pylist()
        ids = srt.column(id_col).to_pylist()
        ss = srt.column("s").to_pylist()
        o1, o2, od = [], [], []
        n = len(keys)
        i = 0
        while i < n:
            j = i
            while j < n and keys[j] == keys[i]:
                j += 1
            if j - i <= max_key_df:
                for x in range(i, j):
                    for y in range(x + 1, j):
                        if ids[x] == ids[y]:
                            continue
                        if _lev_le1(ss[x], ss[y]):
                            a, b = ids[x], ids[y]
                            if a > b:
                                a, b = b, a
                            o1.append(a)
                            o2.append(b)
                            od.append(0 if ss[x] == ss[y] else 1)
            i = j
        return pa.table(
            {"id1": pa.array(o1, pa.int64()),
             "id2": pa.array(o2, pa.int64()),
             "dist": pa.array(od, pa.int64())}
        )

    cand = cluster_apply(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["key"], pairs_in_block,
    )
    # a pair can match through several shared keys → global distinct
    return cluster_apply(
        cand, ["id1", "id2"],
        lambda blk: blk.group_by(["id1", "id2"]).aggregate(
            [("dist", "min")]
        ).rename_columns(["id1", "id2", "dist"]),
    )


def novelty_counts(documents, *, k: int = 3):
    """Per-document content novelty: how many of a document's word-k-gram
    shingles appear in NO lower-numbered document (corpus-first shingles,
    ownership by min doc_id — the deterministic tie-break). The novelty
    ratio n_novel/n_shingles is the classic "marginal new content" signal
    for curation ordering; kept as exact integers (ratios are
    consumer-side, the repo convention).

    Physical plan: shingle explode (one map; distinct-per-doc via the
    shared ``shingles`` generator), then per-shingle min (``grouped_agg``
    on the shingle key — dictionary-encoded on the wire), a count of
    firsts per owner doc, a per-doc total count, and one left
    ``cluster_join`` — 4 int-key exchanges, nothing driver-resident.

    → (doc_id, n_shingles:int64, n_novel:int64), docs with ≥ k words.
    """
    import pyarrow.compute as pc

    from .relational import cluster_join, grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh = [], []
        for did, text in zip(ids, texts):
            for s in shingles(text or "", k):
                out_id.append(did)
                out_sh.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "sh": pa.array(out_sh, pa.string()),
            }
        )

    exploded = documents.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()  # feeds firsts AND totals

    firsts = grouped_agg(exploded, ["sh"], [("first_doc", "doc_id", "min")])
    nov = grouped_agg(
        firsts.map_batches(
            lambda b: pa.table({"doc_id": b.column("first_doc")}),
            batch_format="pyarrow",
        ),
        ["doc_id"], [("n_novel", "doc_id", "count")],
    )
    tot = grouped_agg(exploded, ["doc_id"],
                      [("n_shingles", "doc_id", "count")])
    joined = cluster_join(
        tot, nov, ["doc_id"],
        left_types={"doc_id": pa.int64(), "n_shingles": pa.int64()},
        right_types={"n_novel": pa.int64()},
        how="left",
    )
    return joined.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "n_shingles": b.column("n_shingles"),
             "n_novel": pc.fill_null(b.column("n_novel"), 0)}
        ),
        batch_format="pyarrow",
    )
