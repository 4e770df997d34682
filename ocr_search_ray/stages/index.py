"""Inverted-index build: postings → sorted posting table + per-term stats.

The reference's index is the Mongo ``term_freqs`` collection, written one
upsert per (docId, term) (``src/DbInterface/DbInterface.class.js:366-381``);
its implicit "index" is Mongo's key lookup. The Ray-Data re-expression
(SURVEY.md A2) is the wide shuffle of the pipeline:

- **posting table**: postings sorted by ``(term, doc_id)`` — a declared
  deterministic order (the reference leaves Mongo order unspecified;
  SURVEY.md K4) — written as hash-bucketed Parquet so query-time term lookups
  prune to a bucket + row-group predicate pushdown.
- **term stats** (df, cf): computed with a two-phase aggregate — a partial
  per-batch combine inside ``map_batches`` (no shuffle) followed by a small
  ``groupby("term").sum`` over partials. At 10^12-row scale the partial pass
  shrinks the shuffle input from one row per (doc, term) to one row per
  (batch, term); hot terms (Zipf head) are thereby pre-combined — the salting
  analogue for aggregation skew (SURVEY.md §4, §7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import TERM_STATS, assert_schema

N_BUCKETS_DEFAULT = 64


def _partial_term_stats(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per distinct term in the batch."""
    agg = batch.group_by("term").aggregate([("doc_id", "count"), ("tf", "sum")])
    return agg.rename_columns(["term", "df_part", "cf_part"])


def term_stats(postings) -> "object":
    """TERM_STATS dataset via two-phase (combine → exchange) aggregation.

    The final exchange runs through ``cluster_apply`` (int-key; see
    relational.py) rather than a string-key groupby."""
    from .relational import cluster_apply

    partials = postings.map_batches(_partial_term_stats, batch_format="pyarrow")

    def _block_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by("term").aggregate(
            [("df_part", "sum"), ("cf_part", "sum")]
        )
        table = pa.table(
            {
                "term": agg.column("term"),
                "df": agg.column("df_part_sum").cast(pa.int64()),
                "cf": agg.column("cf_part_sum").cast(pa.int64()),
            }
        )
        return assert_schema(table, TERM_STATS, "term_stats")

    return cluster_apply(partials, ["term"], _block_sum)


def term_bucket(term: str, n_buckets: int = N_BUCKETS_DEFAULT) -> int:
    """Bucket assignment for one term — the SAME pure function on the build
    and query side (pipelines/query.py prunes partition dirs with it).
    crc32 is deterministic across platforms/processes and ~20× cheaper than a
    cryptographic hash; bucket skew only needs uniformity, not security."""
    import zlib

    return zlib.crc32(term.encode()) % n_buckets


def add_term_bucket(postings, n_buckets: int = N_BUCKETS_DEFAULT):
    """Attach the hash-bucket partition key used for the posting-table layout.

    Terms repeat heavily (Zipf), so each batch hashes its DISTINCT terms once
    and maps the full column through an Arrow dictionary — no per-row Python
    hash in the hot path."""
    import zlib

    def _bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        encoded = pc.dictionary_encode(batch.column("term").combine_chunks())
        dictionary = encoded.dictionary
        lut = pa.array(
            [zlib.crc32(t.encode()) % n_buckets for t in dictionary.to_pylist()],
            pa.int32(),
        )
        buckets = lut.take(encoded.indices)
        # ship BOTH string columns dictionary-encoded through the exchange:
        # terms are Zipf-repeated and a page's ~20 postings share one 64-hex
        # doc_id, so the encoded block is ~10-20x smaller on the wire (the
        # all-to-all is the pipeline's only corpus-sized byte mover).
        # Ray 2.49's sort handles per-block dictionaries (pinned by
        # tests/test_query_index.py); the reduce side decodes before the
        # bucket-local sort, so the written layout is unchanged.
        return pa.table(
            {
                "doc_id": pc.dictionary_encode(
                    batch.column("doc_id").combine_chunks()),
                "term": encoded,
                "tf": batch.column("tf"),
                "term_bucket": buckets,
            }
        )

    return postings.map_batches(_bucket, batch_format="pyarrow")


def _sort_group(group: pa.Table) -> pa.Table:
    # decode the exchange's dictionary columns back to plain strings (the
    # bytes already crossed the wire encoded; files stay plain)
    #
    # NOTE (r5, measured): a rank-based variant — unify the per-map-task
    # dictionaries, sort each dictionary once, sort rows as int32 ranks —
    # microbenches 3.2× faster on a 4-chunk group but REGRESSES the real
    # 16-cpu leg 20–40% (alternating A/B: 37.6/39.3k docs/s here vs
    # 26.4/32.3k): after the exchange a bucket group carries ~64 chunks
    # with ~64 distinct dictionaries, and ChunkedArray.unify_dictionaries
    # remaps every code through a string hash probe of its dictionary —
    # more expensive than the cast-and-sort it was meant to avoid. Keep
    # the straightforward decode + composite sort_by.
    cols = {}
    for name in group.column_names:
        col = group.column(name)
        if pa.types.is_dictionary(col.type):
            col = col.cast(pa.string())
        cols[name] = col
    return pa.table(cols).sort_by(
        [("term", "ascending"), ("doc_id", "ascending")]
    )


def build_index(postings, out_dir: str | None = None, n_buckets: int = N_BUCKETS_DEFAULT):
    """Build the posting index in the declared ``(term, doc_id)`` order.

    With ``out_dir``: attach the bucket key, shuffle ONCE on the int32
    ``term_bucket`` key (``groupby`` — the range exchange over an integer
    key is cheap to partition; a composite-string sort key makes Ray's
    boundary search convert whole string columns per boundary), Arrow-sort
    each bucket by ``(term, doc_id)``, and write Parquet partitioned by
    ``term_bucket``. Every output file is fully sorted, so query-time
    lookups prune by bucket dir AND by row-group term statistics. The
    bucket is a pure function of the term (crc32), so layout is
    deterministic and the query side recomputes it locally.

    Without ``out_dir``: return the globally sorted dataset (small/in-memory
    consumers, deterministic comparisons).
    """
    if out_dir is None:
        return postings.sort(["term", "doc_id"])
    bucketed = add_term_bucket(postings, n_buckets)
    per_bucket = bucketed.groupby("term_bucket").map_groups(
        _sort_group, batch_format="pyarrow"
    )
    # zstd: ~2x smaller than snappy on hex ids at equal write CPU (measured)
    per_bucket.write_parquet(out_dir, partition_cols=["term_bucket"],
                             compression="zstd")
    return per_bucket


def doc_bucket(doc_id: str, n_buckets: int = N_BUCKETS_DEFAULT) -> int:
    """Bucket assignment for a doc_id — same pure-crc32 recipe as
    ``term_bucket``, used by the pages point-lookup layout."""
    import zlib

    return zlib.crc32(doc_id.encode()) % n_buckets


def write_pages_indexed(pages, out_dir: str,
                        n_buckets: int = N_BUCKETS_DEFAULT):
    """Write the pages table in a point-lookup layout: partitioned by
    ``doc_bucket = crc32(doc_id) % n_buckets``.

    Reference parity: the ``docs`` collection is read by ``_id`` when a
    query's posting hits join back to page records
    (``DbInterface.class.js:301-327``) — Mongo's key lookup. sha256 ids
    have no range locality, so parquet min/max stats can never prune a
    flat layout; the hash-bucket dir IS the index: a query with k hit ids
    opens ≤ k bucket dirs + a pushed-down ``doc_id IN`` row filter
    (``pipelines.query.search_index`` detects this layout automatically).
    """
    import zlib

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        buckets = pa.array(
            [zlib.crc32(d.encode()) % n_buckets for d in ids], pa.int32()
        )
        return batch.append_column("doc_bucket", buckets)

    pages.map_batches(bucketize, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["doc_bucket"], compression="zstd"
    )


def merge_into_index(new_postings, index_dir: str,
                     n_buckets: int = N_BUCKETS_DEFAULT) -> dict:
    """Incremental index maintenance: merge new postings into an existing
    ``build_index`` layout without a full rebuild.

    Reference parity: the reference keeps ``term_freqs`` current between
    sync cycles with per-(docId, term) upserts
    (``DbInterface.class.js:366-381``); with an immutable sorted-parquet
    layout the analogue is a BUCKET-LOCAL merge. New postings bucket with
    the same pure crc32 function as the build; only buckets that receive
    rows are touched — each affected bucket reads its existing files,
    concatenates the new rows, re-sorts ``(term, doc_id)`` and rewrites
    atomically (tmp dir + rename) in a parallel Ray task. Untouched
    buckets are never read: cost ∝ affected-bucket bytes, not the corpus.

    Contract: incoming rows are NEW (doc_id, term) pairs — updating or
    deleting an existing document is delete-then-merge
    (``pipelines.compact``), mirroring the reference's modified-file path
    (delete + re-add). Returns counters.
    """
    import glob as _glob
    import os
    import shutil
    import tempfile

    import ray

    from ..state.atomic import recover_all

    # heal buckets left aside by a crashed previous merge — including
    # buckets this merge won't touch (their per-bucket recovery would
    # otherwise wait for the next merge that happens to hit them)
    recover_all(index_dir, "term_bucket=*")

    staging = tempfile.mkdtemp(prefix="osr-merge-", dir="/tmp")
    try:
        add_term_bucket(new_postings, n_buckets).write_parquet(
            staging, partition_cols=["term_bucket"], compression="zstd"
        )

        @ray.remote
        def merge_bucket(bucket_dir: str, new_dir: str) -> int:
            import os
            import shutil

            import pyarrow.parquet as pq2

            from ocr_search_ray.state.atomic import (
                recover_aside,
                swap_dir_in,
            )

            # heal a crashed predecessor BEFORE reading the bucket as
            # merge input (else its rows would silently vanish)
            recover_aside(bucket_dir)
            new_rows = pq2.read_table(
                new_dir, columns=["doc_id", "term", "tf"])
            # staging was written from the dictionary-encoded exchange
            # schema — normalize to the plain-string layout schema
            new_rows = pa.table(
                {
                    n: (new_rows.column(n).cast(pa.string())
                        if pa.types.is_dictionary(new_rows.column(n).type)
                        else new_rows.column(n))
                    for n in new_rows.column_names
                }
            )
            parts = [new_rows]
            if os.path.isdir(bucket_dir):
                parts.append(pq2.read_table(
                    bucket_dir, columns=["doc_id", "term", "tf"]))
            merged = pa.concat_tables(parts).sort_by(
                [("term", "ascending"), ("doc_id", "ascending")]
            )
            tmp = bucket_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq2.write_table(merged, os.path.join(tmp, "part-0.parquet"),
                            compression="zstd")
            # crash-safe swap (aside + recovery): the bucket is never
            # simply missing, and readers never see old+new mixed
            # (duplicate posting rows would double-count tf)
            swap_dir_in(tmp, bucket_dir)
            return new_rows.num_rows

        futures = []
        affected = sorted(_glob.glob(os.path.join(staging, "term_bucket=*")))
        for new_dir in affected:
            part = os.path.basename(new_dir)
            futures.append(
                merge_bucket.remote(os.path.join(index_dir, part), new_dir))
        merged_rows = sum(ray.get(futures))
        return {"buckets_affected": len(affected),
                "buckets_total": n_buckets,
                "rows_merged": merged_rows}
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def posting_lists(postings):
    """Grouped posting-list form of the index (SURVEY.md §1.4): one row per
    term with the doc_ids and tfs as JSON arrays ordered by doc_id — the
    Dataset analogue of the reference's per-term Mongo lookup result
    (``getDocsByTerm``, DbInterface.class.js:301-327). JSON strings (not
    Arrow lists) so cross-engine value comparison is bytewise.
    """
    import json

    from .relational import cluster_apply

    def block_lists(block: pa.Table) -> pa.Table:
        block = block.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        terms = block.column("term").to_pylist()
        docs = block.column("doc_id").to_pylist()
        tfs = block.column("tf").to_pylist()
        out_t, out_d, out_f, out_df = [], [], [], []
        i, n = 0, len(terms)
        while i < n:
            j = i
            while j < n and terms[j] == terms[i]:
                j += 1
            out_t.append(terms[i])
            # compact separators == DuckDB to_json array format, bytewise
            out_d.append(json.dumps(docs[i:j], separators=(",", ":")))
            out_f.append(json.dumps(tfs[i:j], separators=(",", ":")))
            out_df.append(j - i)
            i = j
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_ids_json": pa.array(out_d, pa.string()),
                "tfs_json": pa.array(out_f, pa.string()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    return cluster_apply(postings, ["term"], block_lists)


def tfidf_weights(postings, pages):
    """→ (doc_id, term, tfidf): tf·ln(N/df) per posting (N = page rows).

    Web vocabulary is hapax-dominated — at 10^12 docs the df table is
    billions of rows, so it is NOT broadcast. Postings and per-term df meet
    through ONE int-key exchange (``cluster_join`` on the term hash — the
    same partitioning idea as the posting-table ``term_bucket`` layout) and
    join block-locally in Arrow. The weight kernel is vectorized
    (pyarrow.compute), no per-row Python. Float ops are two-operand
    (double(tf) × ln(double(N)/double(df))) so any IEEE re-implementation
    reproduces them bitwise.
    """
    from .relational import cluster_join

    # postings feeds two scans (df stats, join left) — pin once so a lazy
    # fresh-ingest input doesn't re-run its whole chain per consumer
    postings = postings.materialize()
    n_docs = float(pages.count())
    df_table = term_stats(postings).map_batches(
        lambda t: t.select(["term", "df"]), batch_format="pyarrow"
    )
    joined = cluster_join(
        postings, df_table, ["term"],
        left_types={"doc_id": pa.string(), "term": pa.string(),
                    "tf": pa.int64()},
        right_types={"df": pa.int64()},
    )

    def weigh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idf = pc.ln(pc.divide(pa.scalar(n_docs, pa.float64()),
                              pc.cast(batch.column("df"), pa.float64())))
        vals = pc.multiply(pc.cast(batch.column("tf"), pa.float64()), idf)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "tfidf": vals,
            }
        )

    return joined.map_batches(weigh, batch_format="pyarrow")


def bm25_weights(postings, pages, *, k1: float = 1.2, b: float = 0.75):
    """→ (doc_id, term, bm25): Okapi BM25 per posting — the ranking
    upgrade over :func:`tfidf_weights` (same distributed shape, one more
    exchange for per-doc lengths).

    score = ln(((N − df) + 0.5) / (df + 0.5) + 1)        [Lucene idf]
            · (tf·(k1+1)) / (tf + k1·((1−b) + b·(dl/avgdl)))

    N = page rows, dl = Σtf per doc, avgdl = Σtf / N. df and dl are both
    corpus-scale tables at 10^12 docs, so each attaches through ONE
    int-key ``cluster_join`` exchange (term hash, then doc hash) — never
    a broadcast. The weight kernel is vectorized and every float op is
    two-operand in a PINNED order, so an oracle re-implementation
    reproduces the doubles bitwise (constants 2.2 / 1.2 / 0.25 / 0.75
    parse to identical IEEE doubles in Python and SQL).
    """
    import pyarrow.compute as pc

    from .relational import cluster_join, grouped_agg

    # postings feeds FOUR scans (total_tf, df stats, join left, dl agg) —
    # pin once (same rationale as tfidf_weights/bm25_search)
    postings = postings.materialize()
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

    df_table = term_stats(postings).map_batches(
        lambda t: t.select(["term", "df"]), batch_format="pyarrow"
    )
    with_df = cluster_join(
        postings, df_table, ["term"],
        left_types={"doc_id": pa.string(), "term": pa.string(),
                    "tf": pa.int64()},
        right_types={"df": pa.int64()},
    )
    dl_table = grouped_agg(postings, ["doc_id"], [("dl", "tf", "sum")])
    with_dl = cluster_join(
        with_df, dl_table, ["doc_id"],
        left_types={"doc_id": pa.string(), "term": pa.string(),
                    "tf": pa.int64(), "df": pa.int64()},
        right_types={"dl": pa.int64()},
    )

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def weigh(batch: pa.Table) -> pa.Table:
        nd = pa.scalar(n_docs, pa.float64())
        dfd = pc.cast(batch.column("df"), pa.float64())
        tfd = pc.cast(batch.column("tf"), pa.float64())
        dld = pc.cast(batch.column("dl"), pa.float64())
        # pinned two-operand order — mirrored verbatim in the oracle
        idf = pc.ln(
            pc.add(
                pc.divide(
                    pc.add(pc.subtract(nd, dfd), 0.5),
                    pc.add(dfd, 0.5),
                ),
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
        score = pc.multiply(
            idf, pc.divide(pc.multiply(tfd, k1p1), denom)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "bm25": score,
            }
        )

    return with_dl.map_batches(weigh, batch_format="pyarrow")


def heavy_terms(postings, *, min_cf: int, slots: int = 4096):
    """Exact heavy hitters (terms with total tf ≥ ``min_cf``) via a
    Misra-Gries pre-filter — the sketch-then-verify plan for Zipf heads.

    Pass 1 (no shuffle): each batch summarizes into a ``slots``-entry
    Misra-Gries sketch; the driver merges the small summaries. MG guarantees
    every term with true count ≥ N/slots survives as a candidate, so with
    slots ≥ N/min_cf the candidate set is a SUPERSET of the answer (the
    merge only over-approximates). Pass 2: exact counts for candidates only
    (vectorized is_in filter + partial sums) — the exchange carries one row
    per (batch, candidate), never the posting stream.

    → (term, cf) exact, for every term with cf ≥ min_cf.

    Guarantees, enforced: the superset property needs ``slots · min_cf > N``
    (N = total tf). N is measured first with a cheap no-shuffle partial-sum
    pass; if the bound fails the operator falls back to the exact
    ``term_stats`` aggregation (correct at any scale, just without the
    sketch's shuffle savings). The per-batch summaries are merged with ONE
    ``cluster_apply(["term"])`` exchange — summed and pruned to
    ``est ≥ min_cf − N/slots`` (every true-heavy term survives: MG
    undercounts a term by at most batch_weight/slots per batch, N/slots
    total) — so the driver collects only the tiny pruned candidate list,
    never the O(n_batches × slots) raw summaries.
    """
    import ray

    from .relational import cluster_apply

    def batch_weight(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"w": pa.array([pc.sum(batch.column("tf")).as_py() or 0],
                           pa.int64())}
        )

    total_n = sum(
        r["w"] for r in postings.map_batches(
            batch_weight, batch_format="pyarrow").take_all()
    )
    if slots * min_cf <= total_n:
        # sketch superset guarantee broken — exact (shuffled) fallback
        def exact_filter(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = batch.filter(
                pc.greater_equal(batch.column("cf"), min_cf))
            return keep.select(["term", "cf"])

        return term_stats(postings).map_batches(
            exact_filter, batch_format="pyarrow")

    def mg_sketch(batch: pa.Table) -> pa.Table:
        counters: dict[str, int] = {}
        terms = batch.column("term").to_pylist()
        tfs = batch.column("tf").to_pylist()
        for t, w in zip(terms, tfs):
            if t in counters:
                counters[t] += w
            elif len(counters) < slots:
                counters[t] = w
            else:
                # decrement-all by the smallest counter, drop zeros
                dec = min(min(counters.values()), w)
                w_left = w - dec
                counters = {k: v - dec for k, v in counters.items() if v > dec}
                if w_left > 0 and len(counters) < slots:
                    counters[t] = w_left
        return pa.table(
            {
                "term": pa.array(list(counters), pa.string()),
                "est": pa.array(list(counters.values()), pa.int64()),
            }
        )

    # distributed merge of the per-batch summaries: one int-key exchange,
    # sum ests, prune to the guaranteed-superset threshold — the driver
    # collects only the pruned candidate terms (≈ answer-sized)
    def block_merge_sketches(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = block.group_by("term").aggregate([("est", "sum")])
        est = agg.column("est_sum").cast(pa.int64())
        # keep est ≥ min_cf − N/slots, in exact integer arithmetic:
        keep = pc.greater_equal(
            pc.multiply(est, slots), slots * min_cf - total_n
        )
        return pa.table({"term": agg.column("term")}).filter(keep)

    summaries = postings.map_batches(mg_sketch, batch_format="pyarrow")
    candidates = sorted(
        r["term"]
        for r in cluster_apply(summaries, ["term"],
                               block_merge_sketches).take_all()
    )
    cand_ref = ray.put(pa.array(candidates, pa.string()))

    def exact_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cand = ray.get(cand_ref)
        hits = batch.filter(pc.is_in(batch.column("term"), value_set=cand))
        agg = hits.select(["term", "tf"]).group_by("term").aggregate(
            [("tf", "sum")]
        )
        return pa.table(
            {"term": agg.column("term"),
             "cf_part": agg.column("tf_sum").cast(pa.int64())}
        )

    def block_final(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = block.group_by("term").aggregate([("cf_part", "sum")])
        out = pa.table(
            {"term": agg.column("term"),
             "cf": agg.column("cf_part_sum").cast(pa.int64())}
        )
        return out.filter(pc.greater_equal(out.column("cf"), min_cf))

    partials = postings.map_batches(exact_partial, batch_format="pyarrow")
    return cluster_apply(partials, ["term"], block_final)
