"""Driver-facing query implementations (the Ray side of __ray_entry__).

Every function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names + dtypes match the corresponding oracle SQL in
``__ray_entry__.oracle_sql`` exactly (the driver hash-compares values after
sorting columns by name).

These are thin compositions of the engine's stages — nothing here implements
logic of its own.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.webpages import read_webpages
from ..stages import dedup as dedup_stage
from ..stages import textstats
from ..stages.correlate import closest_terms, term_correlations
from ..stages.diff import diff_snapshots, keep_latest
from ..stages.index import term_stats
from ..stages.relational import grouped_agg
from ..stages.search import search
from ..stages.multimodal import extract_media_features
from ..stages.similarity import (
    ann_brute_topk,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)
from .ingest import ingest

PAGE_COLS = [
    "url", "page_idx", "page_count", "file_id", "doc_id", "img_path", "text",
    "status",
]


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned read with ~num_cpus blocks (the CLAUDE.md exchange
    rule): Ray's default read parallelism (2×cpus splits) makes every
    downstream exchange schedule hundreds of ms-scale tasks — measured
    3-4× wall on the multi-join entries at sf0.1. ``override_num_blocks``
    pins read tasks to the cluster's core count; oversized outputs still
    split by ``target_max_block_size``, so the setting is size-safe at
    any scale."""
    import ray
    import ray.data as rd

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns,
        override_num_blocks=max(4, min(64, cpus)),
    )


# ---------------------------------------------------------------- ingest core


def q_ingest_pages(sf_dir: str):
    pages = ingest(read_webpages(sf_dir))["pages"]
    return pages.select_columns(PAGE_COLS)


def _postings(sf_dir: str):
    return ingest(read_webpages(sf_dir))["postings"]


def q_postings_tf(sf_dir: str):
    return _postings(sf_dir)


def q_term_stats(sf_dir: str):
    return term_stats(_postings(sf_dir))


def q_term_burstiness(sf_dir: str):
    """Per-term dispersion moments (df, Σtf, Σtf²) over the
    reference-locked postings — the burstiness/Katz raw material
    (variance and Church-Gale B are consumer-side ratios); exact
    order-free integer sums."""
    from ..stages.relational import grouped_agg

    def sq(b: pa.Table) -> pa.Table:
        tf = b.column("tf").cast(pa.int64())
        return pa.table(
            {"term": b.column("term"), "tf": tf, "tf2": pc.multiply(tf, tf)}
        )

    prepped = _postings(sf_dir).map_batches(sq, batch_format="pyarrow")
    return grouped_agg(
        prepped, ["term"],
        [("df", "tf", "count"), ("sum_tf", "tf", "sum"),
         ("sum_tf2", "tf2", "sum")],
    )


def q_search(sf_dir: str):
    stages = ingest(read_webpages(sf_dir))
    return search(
        stages["postings"], stages["pages"], "Spark MERGE data!", max_return=20
    )


def q_search_index(sf_dir: str):
    """The PRODUCTION on-disk query path (pipelines/query.search_index):
    build the hash-bucketed posting index + pages table under /tmp, then
    run the bucket-pruned, predicate-pushdown lookup against the files.
    Same oracle as search_topk — proves the disk layout (partition dirs,
    per-bucket sort, zstd row groups) returns results identical to the
    in-memory path."""
    import os
    import shutil
    import tempfile

    from ..stages.index import build_index
    from .query import search_index

    stages = ingest(read_webpages(sf_dir))
    tmp = tempfile.mkdtemp(prefix="osr-queryidx-", dir="/tmp")
    try:
        index_dir = os.path.join(tmp, "index")
        pages_path = os.path.join(tmp, "pages")
        build_index(stages["postings"], index_dir)
        stages["pages"].write_parquet(pages_path, compression="zstd")
        return search_index(index_dir, pages_path, "Spark MERGE data!",
                            max_return=20)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_merge_index(sf_dir: str):
    """Incremental index maintenance under the oracle: build the bucketed
    index on ~90% of docs, merge the rest with the bucket-local
    merge_into_index, read the merged layout back — rows must equal the
    full postings relation exactly (same oracle as postings_tf)."""
    import os
    import shutil
    import tempfile

    from ..stages.index import merge_into_index

    postings = _postings(sf_dir).materialize()

    def split(keep_mod):
        def f(batch: pa.Table) -> pa.Table:
            # deterministic doc split on the hex id's last char:
            # int(c,16) % 10 == 0 ⇔ c ∈ {'0','a'} — vectorized slice+is_in
            last = pc.utf8_slice_codeunits(
                batch.column("doc_id"), start=63, stop=64)
            mask = pc.is_in(last, value_set=pa.array(["0", "a"]))
            return batch.filter(mask if keep_mod else pc.invert(mask))
        return f

    base = postings.map_batches(split(False), batch_format="pyarrow")
    increment = postings.map_batches(split(True), batch_format="pyarrow")
    tmp = tempfile.mkdtemp(prefix="osr-mergeidx-", dir="/tmp")
    try:
        from ..stages.index import build_index

        idx = os.path.join(tmp, "index")
        build_index(base, idx)
        merge_into_index(increment, idx)
        import ray.data as rd

        out = rd.read_parquet(idx, columns=["doc_id", "term", "tf"])
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_term_correlations(sf_dir: str):
    return term_correlations(_postings(sf_dir))


def q_search_expanded(sf_dir: str):
    """The reference's disabled tcr*tf query-expansion path
    (TermMatcher.class.js:55-80), end to end: ingest → correlations →
    expand each query term to its top-5 neighbors → score tcr·tf →
    per-doc max-merge → top-k."""
    from ..stages.search import expanded_search

    stages = ingest(read_webpages(sf_dir))
    # three consumers of the ingest lineage (correlations, scoring, page
    # join) — pin once instead of re-running extract+tokenize per consumer
    postings = stages["postings"].materialize()
    pages = stages["pages"].materialize()
    corr = term_correlations(postings)
    return expanded_search(
        postings, pages, corr, "Spark MERGE data!", max_return=20,
    )


def q_closest_terms(sf_dir: str):
    return closest_terms(term_correlations(_postings(sf_dir)), num=5)


def q_similar_docs(sf_dir: str):
    """Per-document lexical nearest neighbors (sparse all-pairs tf-cosine
    over shared terms, df-pruned to 2..100, top-3 per doc) — the
    document-axis transpose of term_correlations; finds near-duplicate /
    related pages with no embedding model."""
    from ..stages.correlate import doc_similarity

    return doc_similarity(_postings(sf_dir), min_df=2, max_df=100, k=3)


# ------------------------------------------------------------ incremental ops


def batch_mod(batch: pa.Table, modulo: int):
    """event_id mod ``modulo`` (non-negative ints; truncating int division)."""
    return pc.subtract(
        batch.column("event_id"),
        pc.multiply(
            pc.divide(batch.column("event_id"), modulo), modulo
        ),
    )


def _snapshot_impl(events, modulo: int):
    def keep(batch: pa.Table) -> pa.Table:
        rem = batch_mod(batch, modulo)
        return batch.filter(pc.not_equal(rem, 0))

    filtered = events.map_batches(keep, batch_format="pyarrow")
    agg = grouped_agg(filtered, ["user_id", "event_type"], [("ts", "ts", "max")])

    def to_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{u}|{e}"
            for u, e in zip(
                batch.column("user_id").to_pylist(),
                batch.column("event_type").to_pylist(),
            )
        ]
        return pa.table(
            {"url": pa.array(keys, pa.string()), "warc_ts": batch.column("ts")}
        )

    return agg.map_batches(to_key, batch_format="pyarrow")


def q_manifest_diff(sf_dir: str):
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    old = _snapshot_impl(events, 3)
    new = _snapshot_impl(events, 4)
    return diff_snapshots(old, new, key="url", ts="warc_ts")


def q_dedup_keep_latest(sf_dir: str):
    events = _read(sf_dir, "events")
    return keep_latest(events, ["user_id", "event_type"], ["ts", "event_id"]).select_columns(
        ["user_id", "event_type", "event_id", "ts", "value"]
    )


# ------------------------------------------------------------- relational ops


def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): finest + per-flag +
    grand-total levels from one raw-data exchange."""
    from ..stages.relational import rollup_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        qty = pc.cast(pc.round(batch.column("l_quantity"), options=away),
                      pa.int64())
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
            }
        )

    return rollup_agg(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("sum_qty", "qty", "sum"), ("n_rows", "qty", "count")],
    )


def q_agg_lineitem(sf_dir: str):
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        # DuckDB round() is half-away-from-zero; arrow defaults to
        # half-to-even — match the oracle explicitly. l_quantity is integral
        # in TPC-H; round-then-cast also mirrors DuckDB CAST(DOUBLE AS
        # BIGINT) (which rounds) instead of raising on any non-integral.
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        qty = pc.cast(pc.round(batch.column("l_quantity"), options=away),
                      pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), 100),
                     options=away),
            pa.int64(),
        )
        ones = pa.array([1] * batch.num_rows, pa.int64())
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "cents": cents,
                "one": ones,
            }
        )

    prepped = li.map_batches(prep, batch_format="pyarrow")
    return grouped_agg(
        prepped,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "qty", "sum"),
            ("sum_price_cents", "cents", "sum"),
            ("count_order", "one", "count"),
        ],
    )


def q_topk_customers(sf_dir: str):
    """Top-k FIRST, names after: the counts distribute + distributed top-k
    (k rows ever reach the driver), THEN the k winner keys probe the
    customer table with a broadcast ``is_in`` filter (a scan, no shuffle,
    ≤ k matching rows collected). Customer is corpus-scaled in this
    schema, so it must never be driver state (VERDICT r3 #1)."""
    from ..stages.relational import topk_rows

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    counts = grouped_agg(orders, ["o_custkey"], [("n_orders", "o_custkey", "count")])
    top = topk_rows(
        counts, [("n_orders", "descending"), ("o_custkey", "ascending")], 10
    )
    top_tbl = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)

    keys = top_tbl.column("o_custkey")  # ≤ k values — bounded driver state
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def probe(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("c_custkey"), value_set=keys.combine_chunks())
        )

    hits = customers.map_batches(probe, batch_format="pyarrow").take_all()
    lookup = {r["c_custkey"]: r["c_name"] for r in hits}  # ≤ k rows
    return pa.table(
        {
            "custkey": keys,
            "name": pa.array(
                [lookup.get(ck) for ck in keys.to_pylist()], pa.string()
            ),
            "n_orders": top_tbl.column("n_orders"),
        }
    )


def q_filter_events(sf_dir: str):
    events = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("value"), 50.0))

    filtered = events.map_batches(keep, batch_format="pyarrow")
    return grouped_agg(
        filtered,
        ["event_type"],
        [
            ("n", "event_id", "count"),
            ("min_id", "event_id", "min"),
            ("max_id", "event_id", "max"),
        ],
    )


def q_join_orders_customers(sf_dir: str):
    """Distributed SHUFFLE join demo (relational.cluster_join): both sides
    exchange on the int-key hash and join block-locally in Arrow — the plan
    for two corpus-scaled sides (contrast topk_customers' broadcast join,
    the plan for a small side)."""
    from ..stages.relational import cluster_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cluster_join(
        orders,
        customers.map_batches(
            lambda t: t.rename_columns(["o_custkey", "c_name"]),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_totalprice": pa.float64()},
        right_types={"c_name": pa.string()},
    )


def q_salted_join(sf_dir: str):
    """Same join as join_orders_customers but through the skew-mitigated
    salted plan (left salted on o_orderkey, right replicated 8x) — the
    oracle proves the salt algebra changes nothing."""
    from ..stages.relational import salted_cluster_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return salted_cluster_join(
        orders,
        customers.map_batches(
            lambda t: t.rename_columns(["o_custkey", "c_name"]),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_totalprice": pa.float64()},
        right_types={"c_name": pa.string()},
        salt_col="o_orderkey", n_salts=8,
    )


def q_topk_orders_per_customer(sf_dir: str):
    """Per-group top-k as a window-function analogue: each customer's top-3
    orders by price (one int-key exchange + block-local head, no global
    sort — relational.grouped_topk)."""
    from ..stages.relational import grouped_topk

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return grouped_topk(
        orders, ["o_custkey"],
        [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 3,
    )


def q_value_percentiles(sf_dir: str):
    """Exact per-type value percentiles (median, p95) via the quantized
    two-phase histogram — percentiles at corpus scale without per-group
    value collection."""
    from ..stages.relational import grouped_percentiles

    events = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_percentiles(events, ["event_type"], "value", [0.5, 0.95])


def q_sample_documents(sf_dir: str):
    """Deterministic content-hash sampling (~12.5%): stable across runs /
    scales / partitionings — the reproducible train-eval-split primitive
    (the reference's randomChoice.func.js is the nondeterministic cousin)."""
    from ..stages.relational import hash_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return hash_sample(docs, "doc_id", threshold=32)


def q_top_revenue_orders(sf_dir: str):
    """TPC-H Q3-shaped 3-table pipeline: segment-filtered customers ⋈
    date-filtered orders ⋈ ship-date-filtered lineitem → per-order revenue
    → top 10. Both joins are distributed ``cluster_join`` exchanges (no
    side is assumed driver-small); revenue is aggregated in exact integer
    cent·pct units so the oracle compare is exact."""
    import datetime as dt

    from ..stages.relational import cluster_join, grouped_agg

    cutoff = dt.datetime(1998, 1, 1)

    def building(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.equal(batch.column("c_mktsegment"), "BUILDING"))
        return keep.select(["c_custkey"])

    customers = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(building, batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
    ).map_batches(
        lambda t: t.append_column(
            "is_bldg", pa.repeat(pa.scalar(1, pa.int8()), t.num_rows)),
        batch_format="pyarrow",
    )

    def early(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch.column("o_orderdate"),
                                    pa.scalar(cutoff, pa.timestamp("us"))))
        return keep.select(["o_orderkey", "o_custkey", "o_orderdate"])

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(early, batch_format="pyarrow")

    qualifying = cluster_join(
        orders, customers, ["o_custkey"],
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_orderdate": pa.timestamp("us")},
        right_types={"is_bldg": pa.int8()},
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]).rename_columns(
            ["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )

    def late_lines(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        keep = batch.filter(pc.greater(batch.column("l_shipdate"),
                                       pa.scalar(cutoff, pa.timestamp("us"))))
        cents = pc.cast(
            pc.round(pc.multiply(keep.column("l_extendedprice"), 100),
                     options=away), pa.int64())
        pct = pc.cast(
            pc.round(pc.multiply(keep.column("l_discount"), 100),
                     options=away), pa.int64())
        return pa.table(
            {
                "l_orderkey": keep.column("l_orderkey"),
                "rev_units": pc.multiply(cents, pc.subtract(100, pct)),
            }
        )

    lineitem = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(late_lines, batch_format="pyarrow")

    from ..stages.relational import topk_rows

    # revenue aggregates BELOW the join (sum is keyed by the join key, so
    # agg-then-join ≡ join-then-agg): the batch combiner collapses line
    # rows before any exchange, and the join then ships one row per order
    # instead of one per line. The inner join drops non-qualifying orders.
    rev_per_order = grouped_agg(
        lineitem, ["l_orderkey"], [("revenue_units", "rev_units", "sum")]
    )
    per_order = cluster_join(
        rev_per_order, qualifying, ["l_orderkey"],
        left_types={"l_orderkey": pa.int64(), "revenue_units": pa.int64()},
        right_types={"o_orderdate": pa.timestamp("us")},
    )
    # distributed top-10 (per-block head + one-block reduce) instead of a
    # whole-dataset sort exchange
    top = topk_rows(
        per_order,
        [("revenue_units", "descending"), ("l_orderkey", "ascending")], 10,
    )
    return pa.Table.from_pandas(top.to_pandas(), preserve_index=False)


# ---------------------------------------------------------- training-data ops


def q_exact_dedup(sf_dir: str):
    return dedup_stage.exact_dedup(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_minhash_signatures(sf_dir: str):
    return dedup_stage.minhash_signatures(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_minhash_lsh_pairs(sf_dir: str):
    return dedup_stage.minhash_lsh_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), min_jaccard_pct=50
    )


def q_ngram_jaccard_pairs(sf_dir: str):
    return dedup_stage.ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), min_jaccard_pct=30
    )


def q_novelty_counts(sf_dir: str):
    """Per-doc corpus-first shingle counts (content novelty; min-doc_id
    ownership) over word-3-gram shingles."""
    return dedup_stage.novelty_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), k=3
    )


def q_editdist1_pairs(sf_dir: str):
    """Typo-variant URL pairs at levenshtein ≤ 1 (SymSpell deletion-
    variant blocking, stages/dedup.editdist1_pairs) over the engine's
    deterministic URL scheme (sources/webpages.doc_url — mirrored by the
    oracle's CASE/lpad construction)."""
    from ..sources.webpages import doc_url
    from ..stages.dedup import editdist1_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def add_url(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        urls = pa.array(
            [doc_url(int(x)) for x in d.to_pylist()], pa.string()
        )
        return pa.table({"doc_id": d, "url": urls})

    return editdist1_pairs(
        docs.map_batches(add_url, batch_format="pyarrow")
    )


def q_containment_pairs(sf_dir: str):
    """Asymmetric partial-duplicate pairs: 100·|A∩B| ≥ 80·min(|A|,|B|)
    over word-3-gram shingle sets (Broder containment — catches a page
    quoted whole inside a larger one, which Jaccard misses)."""
    return dedup_stage.containment_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        min_containment_pct=80,
    )


def q_chunk_documents(sf_dir: str):
    """Overlapping word-window chunking (64-word chunks every 48 words)."""
    from ..stages.pack import chunk_documents

    return chunk_documents(_read(sf_dir, "documents",
                                 columns=["doc_id", "text"]))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: the 'benchmark' is the deterministic
    doc_id % 23 == 0 slice of the corpus itself (those docs self-contaminate
    by construction, plus any other doc sharing one of their 3-grams), so
    the overlap check is exercised with guaranteed positives AND negatives."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick_bench(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        rem = pc.subtract(ids, pc.multiply(pc.divide(ids, 23), 23))
        return batch.filter(pc.equal(rem, 0))

    bench = docs.map_batches(pick_bench, batch_format="pyarrow")
    return dedup_stage.decontaminate(docs, bench)


def q_simhash_signatures(sf_dir: str):
    return dedup_stage.simhash_signatures(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_simhash_neardup(sf_dir: str):
    return dedup_stage.simhash_neardup_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), radius=3
    )


def q_posting_lists(sf_dir: str):
    from ..stages.index import posting_lists

    return posting_lists(_postings(sf_dir))


def q_compact_delete(sf_dir: str):
    """Delete cascade (SURVEY.md §3.3/J5/D3) under the oracle: remove every
    url whose source doc number is ≡ 0 (mod 50), return surviving postings."""
    from ..pipelines.compact import delete_urls

    stages = ingest(read_webpages(sf_dir))

    # derive the deleted set with a DISTRIBUTED filter — only the doomed
    # urls (1/50th) are collected, never the whole url column
    def doomed(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        keep = [i for i, u in enumerate(urls)
                if int(u.rsplit("-", 1)[-1]) % 50 == 0]
        return batch.select(["url"]).take(pa.array(keep, pa.int64()))

    deleted = {
        r["url"]
        for r in read_webpages(sf_dir).select_columns(["url"])
        .map_batches(doomed, batch_format="pyarrow").take_all()
    }
    # pages feeds two scans inside delete_urls (doomed ids + anti filter)
    pages2, postings2 = delete_urls(
        stages["pages"].materialize(), stages["postings"], deleted)
    return postings2.select_columns(["doc_id", "term", "tf"])


def _office_webpages(sf_dir: str):
    """Office-kind webpages synthesized from documents: even ids become
    pptx, odd ids docx; half of each kind (id % 4 < 2) ships as a REAL OPC
    zip+XML container (``functions/officetext.py`` — genuine .pptx/.docx
    bytes), the other half as the hermetic ``fakeoffice`` stand-in, so the
    normalize chain exercises both routes. Real pptx slides are packed as
    the 256-char page chunks, matching the conversion's one-page-per-slide
    rule — the SQL oracle's pagination is unchanged."""
    from ..functions import fakeoffice, officetext
    from ..sources.webpages import doc_url, doc_warc_ts
    from ..stages.normalize import _chunk_pages

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def payload_for(d: int, t: str) -> bytes:
        kind = "pptx" if d % 2 == 0 else "docx"
        if d % 4 >= 2:
            return fakeoffice.pack(t, kind)
        if kind == "pptx":
            return officetext.pack_pptx(_chunk_pages(t))
        return officetext.pack_docx(t)

    def to_office(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        return pa.table(
            {
                "url": pa.array([doc_url(d) for d in ids], pa.string()),
                "warc_ts": pa.array([doc_warc_ts(d) for d in ids],
                                    pa.timestamp("us")),
                "html": pa.array(
                    [payload_for(d, t or "") for d, t in zip(ids, texts)],
                    pa.binary(),
                ),
                "text": pa.array([None] * len(ids), pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return docs.map_batches(to_office, batch_format="pyarrow")


def q_normalize_convert(sf_dir: str):
    """O1/O2 parity chain: office container → FormatNormalizer (convert to
    the paged-binary format, actor-pool, watchdog) → page extraction. The
    oracle recomputes the whole chain (conversion preserves text, 256-char
    chunking, id padding rule) in SQL — conversion must round-trip
    byte-identically for the value hashes to match."""
    from ..stages.extract import extract_pages
    from ..stages.normalize import normalize_formats

    normalized = normalize_formats(_office_webpages(sf_dir), concurrency=2)
    pages = normalized.select_columns(
        ["url", "warc_ts", "html", "text", "lang"]
    ).map_batches(extract_pages, batch_format="pyarrow", batch_size=128)
    return pages.select_columns(
        ["url", "page_idx", "page_count", "doc_id", "text", "status"]
    )


def q_quality_stats(sf_dir: str):
    return textstats.quality_stats(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_token_counts(sf_dir: str):
    return textstats.token_counts(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_approx_distinct(sf_dir: str):
    """HLL distinct-text estimate (rows-only: the estimate is deterministic
    but not SQL-derivable; accuracy/determinism locked by pytest)."""
    return textstats.approx_distinct(
        _read(sf_dir, "documents", columns=["text"]), "text"
    )


def q_dup_spans(sf_dir: str):
    """Exact duplicated-substring spans (Lee-et-al-style at window
    granularity) over the raw documents text; the oracle replays window
    extraction, the >= 2 occurrence filter, and the gaps-and-islands
    merge in SQL."""
    return dedup_stage.dup_spans(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), window=4
    )


def q_winnowing(sf_dir: str):
    """Winnowing (MOSS) rolling-hash fingerprints, exact vs a windowed-SQL
    oracle (min per window, rightmost tie-break, distinct selections)."""
    return textstats.winnowing_fingerprints(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_fingerprints(sf_dir: str):
    return textstats.fingerprints(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_vocab_stats(sf_dir: str):
    return textstats.vocab_stats(_postings(sf_dir))


def q_lang_id(sf_dir: str):
    return textstats.lang_id(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _query_vectors(sf_dir: str, n: int = 5):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("vec_id"), n))

    rows = emb.map_batches(keep, batch_format="pyarrow").take_all()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def q_ann_cosine_topk(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_brute_topk(emb, _query_vectors(sf_dir), k=10)


def q_rademacher_project(sf_dir: str):
    """Exact-integer Rademacher JL projection to 8 dims
    (stages/similarity.rademacher_project): quantize floor(x·2^16), ±1
    signs from a seeded mod-prime lattice, int64 matmul — shuffle-free,
    bit-exact vs the SQL replay."""
    from ..stages.similarity import rademacher_project

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return rademacher_project(emb, k=8)


def q_ann_lsh_topk(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_bucket_topk(emb, _query_vectors(sf_dir), k=10)


def q_ann_pq_topk(sf_dir: str):
    """Product-quantization ANN (ADC scan), EXACT oracle: the corpus is a
    deterministic codeword-aligned embedding table — vec v has subspace-0
    code vec_id % 16 and subspace-1 code (vec_id*7+3) % 16 on two ring
    codebooks with subspace energies 0.7/0.3 (unit-norm concatenations) —
    so PQ encode recovers the codes exactly and the ADC score EQUALS the
    true cosine: 0.7·cos(2π·Δ0/16) + 0.3·cos(2π·Δ1/16), which the SQL
    replays per (query, vec) to rank. Output is integer-only
    (query_id, vec_id, rank); mathematically-equal scores occur exactly
    for duplicated code pairs (both codes depend on vec_id mod 16, so
    vectors repeat with period 16) and break by vec_id asc in both
    engines — equal codes hit the same LUT entries (bit-identical floats)
    on the Ray side and the same normalized-Δ cos() expressions on the
    SQL side, so ties are consistent ties everywhere. Lossy-corpus recall
    and the trained-codebook path stay pytest-pinned (tests/test_pq.py)."""
    import numpy as np

    from ..stages.similarity import pq_topk

    K = 16
    th = 2 * np.pi * np.arange(K) / K
    cb = np.stack([
        np.stack([np.sqrt(0.7) * np.cos(th),
                  np.sqrt(0.7) * np.sin(th)], axis=1),
        np.stack([np.sqrt(0.3) * np.cos(th),
                  np.sqrt(0.3) * np.sin(th)], axis=1),
    ])
    emb = _read(sf_dir, "embeddings", columns=["vec_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        vecs = np.concatenate(
            [cb[0][ids % K], cb[1][(ids * 7 + 3) % K]], axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )

    corpus = emb.map_batches(synth, batch_format="pyarrow")
    queries = {
        q: np.concatenate(
            [cb[0][(2 * q + 1) % K], cb[1][(5 * q + 2) % K]]).tolist()
        for q in range(3)
    }
    return pq_topk(corpus, queries, k=10, codebooks=cb)


def q_ann_pq_disk(sf_dir: str):
    """The on-disk PQ index under the oracle, FULL lifecycle: build the
    id-hash-bucketed code index from the even-id half of the codeword
    corpus (same geometry as ``ann_pq_topk``), incrementally add the odd
    half PLUS 50 planted vectors (ids +1000000), delete the planted
    cohort (point-pruned: only its own buckets open), then the ADC disk
    search must equal the in-memory result — the SAME SQL as
    ``ann_pq_topk`` replays it."""
    import shutil
    import tempfile

    import numpy as np

    from ..stages.similarity import (
        add_to_pq_index,
        build_pq_index,
        delete_from_pq_index,
        search_pq_index,
    )

    K = 16
    th = 2 * np.pi * np.arange(K) / K
    cb = np.stack([
        np.stack([np.sqrt(0.7) * np.cos(th),
                  np.sqrt(0.7) * np.sin(th)], axis=1),
        np.stack([np.sqrt(0.3) * np.cos(th),
                  np.sqrt(0.3) * np.sin(th)], axis=1),
    ])
    emb = _read(sf_dir, "embeddings", columns=["vec_id"])

    def synth_part(parity: "int | None", shift: int = 0):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64, copy=False)
            if parity is not None:
                ids = ids[ids % 2 == parity]
            if shift:
                ids = ids[ids < 50] + shift
            vecs = np.concatenate(
                [cb[0][ids % K], cb[1][(ids * 7 + 3) % K]], axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        vecs.tolist(), pa.list_(pa.float64())),
                }
            )
        return f

    queries = {
        q: np.concatenate(
            [cb[0][(2 * q + 1) % K], cb[1][(5 * q + 2) % K]]).tolist()
        for q in range(3)
    }
    tmp = tempfile.mkdtemp(prefix="osr-pq-", dir="/tmp")
    try:
        build_pq_index(
            emb.map_batches(synth_part(0), batch_format="pyarrow"),
            tmp, codebooks=cb, n_buckets=16)
        add_to_pq_index(
            emb.map_batches(synth_part(1), batch_format="pyarrow"), tmp)
        add_to_pq_index(
            emb.map_batches(synth_part(None, shift=1000000),
                            batch_format="pyarrow"), tmp)
        planted = [i + 1000000 for i in range(50)]
        delete_from_pq_index(tmp, planted)
        out = search_pq_index(tmp, queries, k=10)
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_lsh_neardup(sf_dir: str):
    """Unbounded-scale embedding near-dup (LSH buckets + in-bucket verify;
    no broadcast side): the corpus is augmented with 20 planted duplicates
    (ids +100000) which the operator must recover — rows-only driver check;
    recall/precision are locked by test_similarity."""
    from ..stages.similarity import lsh_neardup_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def planted(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch.column("vec_id"), 20))
        return pa.table(
            {
                "vec_id": pc.add(keep.column("vec_id"), 100000),
                "embedding": keep.column("embedding"),
            }
        )

    aug = emb.union(emb.map_batches(planted, batch_format="pyarrow"))
    return lsh_neardup_pairs(aug, threshold=0.98)


def q_running_totals(sf_dir: str):
    """Per-user cumulative COUNT/SUM/MAX in time order — the
    UNBOUNDED-PRECEDING window frame, integer-cents exact."""
    from ..stages.sessionize import running_totals

    return running_totals(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "value"])
    )


def q_ingest_warc(sf_dir: str):
    """The flagship ingest fed from REAL WARC container files (the
    Common Crawl wire format): spec-valid .warc.gz files are synthesized
    inside a Ray map, parsed back by ``read_warc`` (one task per file),
    and the unmodified extract chain runs on them. The oracle is the
    SAME pages CTE as ingest_pages — the whole WARC round trip must be
    byte-identical per url for the value hashes to match."""
    import hashlib

    from ..sources.warc import read_warc, write_warc_from_documents

    import os

    import shutil

    # pid-keyed dir: file contents depend on this run's batch splits, so a
    # shared path would let a concurrent run with a different parallelism
    # os.replace() a file out from under this one mid-read. Sweep dirs
    # whose owning pid is gone (crashed runs), and remove our own dir once
    # the pages dataset is pinned — repeated invocations must not
    # accumulate a compressed corpus copy per run in /tmp.
    root = "/tmp/ocr_search_warc"
    for name in os.listdir(root) if os.path.isdir(root) else []:
        pid = name.rsplit("-", 1)[-1]
        if not pid.isdigit() or not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    warc_dir = f"{root}/{tag}-{os.getpid()}"
    paths = write_warc_from_documents(sf_dir, warc_dir, compress=True)
    try:
        pages = ingest(read_warc(paths))["pages"].materialize()
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)
    return pages.select_columns(PAGE_COLS)


def q_curate_full(sf_dir: str):
    """The full training-data curation pass in one entry: Gopher quality
    gate → transitive near-dup clustering over the survivors → keep only
    cluster representatives. Standard web-pipeline order (filter before
    dedup: garbage never pays for shingling); every stage is the
    distributed plan (semi/left cluster_joins, CC delta propagation),
    no driver state."""
    from ..stages.graph import connected_components
    from ..stages.relational import cluster_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    docs = docs.materialize()  # consumers: verdicts + the semi-join left side
    qual_ids = textstats.quality_filter(docs).map_batches(
        lambda b: b.filter(b.column("keep")).select(["doc_id"]),
        batch_format="pyarrow",
    )
    qdocs = cluster_join(
        docs, qual_ids, ["doc_id"], how="semi",
        left_types={"doc_id": pa.int64(), "text": pa.string()},
        right_types={},
    ).materialize()  # consumers: pair gen + the final label join
    # enforced switch: past the measured bound the banded-LSH generator
    # (same pair schema) replaces the all-candidate exact plan
    pairs = dedup_stage.neardup_pairs_auto(qdocs, min_jaccard_pct=30)
    labels = connected_components(
        pairs, src_col="doc_id1", dst_col="doc_id2", n_blocks=8
    )
    joined = cluster_join(
        qdocs.select_columns(["doc_id"]), labels.map_batches(
            lambda b: b.rename_columns(["doc_id", "component"]),
            batch_format="pyarrow",
        ),
        ["doc_id"], how="left",
        left_types={"doc_id": pa.int64()},
        right_types={"component": pa.int64()},
    )

    def reps_only(batch: pa.Table) -> pa.Table:
        rep = pc.coalesce(
            batch.column("component").cast(pa.int64()),
            batch.column("doc_id").cast(pa.int64()),
        )
        return batch.select(["doc_id"]).filter(
            pc.equal(rep, batch.column("doc_id"))
        )

    return joined.map_batches(reps_only, batch_format="pyarrow")


def q_grouped_approx_percentiles(sf_dir: str):
    """Per-event-type DDSketch percentiles (rows-only; α bound, grouping
    exactness and merge invariance pytest-locked — the heavy-tail grouped
    companion to the exact value_percentiles)."""
    from ..stages.relational import grouped_dd_percentiles

    events = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_dd_percentiles(events, ["event_type"], "value",
                                  [0.5, 0.95])


def q_neardup_clusters(sf_dir: str):
    """End-to-end fuzzy-dedup clustering: n-gram Jaccard pairs (≥30%) →
    connected components (TRANSITIVE closure: A~B, B~C ⇒ one cluster
    even when A≁C — the semantics the curate pipeline's greedy pair
    drops don't give) → every doc labeled with its cluster rep (min
    doc_id; singletons rep themselves). The pair stage switches to the
    MinHash-LSH generator past a measured corpus bound — enforced inside
    ``neardup_pairs_auto``, not a caller convention."""
    from ..stages.graph import connected_components
    from ..stages.relational import cluster_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    docs = docs.materialize()  # two consumers: pair gen + the final join
    pairs = dedup_stage.neardup_pairs_auto(docs, min_jaccard_pct=30)
    labels = connected_components(
        pairs, src_col="doc_id1", dst_col="doc_id2", n_blocks=8
    )
    joined = cluster_join(
        docs.select_columns(["doc_id"]), labels.map_batches(
            lambda b: b.rename_columns(["doc_id", "component"]),
            batch_format="pyarrow",
        ),
        ["doc_id"], how="left",
        left_types={"doc_id": pa.int64()},
        right_types={"component": pa.int64()},
    )

    def finish(batch: pa.Table) -> pa.Table:
        rep = pc.coalesce(
            batch.column("component").cast(pa.int64()),
            batch.column("doc_id").cast(pa.int64()),
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "rep_id": rep}
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_deterministic_shuffle(sf_dir: str):
    """Reproducible global training-order permutation (md5 order)."""
    from ..stages.relational import deterministic_shuffle

    return deterministic_shuffle(
        _read(sf_dir, "documents", columns=["doc_id"])
    )


def q_quality_filter(sf_dir: str):
    """Gopher-style composite quality gate — integer-exact verdicts and
    reason strings (several rules exercise real drops at every sf)."""
    return textstats.quality_filter(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_domain_cap(sf_dir: str):
    """Per-domain frequency cap (25 docs/host) over the ingested corpus —
    the crawl skew guard, exercising drops at every sf (50+ docs/host)."""
    pages = ingest(read_webpages(sf_dir))["pages"]
    docs = pages.map_batches(
        lambda b: b.filter(pc.equal(b.column("page_idx"), 1))
        .select(["url", "doc_id"]),
        batch_format="pyarrow",
    )
    return textstats.domain_cap(docs, 25)


def q_approx_percentiles(sf_dir: str):
    """DDSketch relative-error percentiles over l_extendedprice (rows-only:
    deterministic but not SQL-derivable; the α bound, determinism and merge
    invariance are pytest-locked — the heavy-tail companion to the exact
    value_percentiles)."""
    from ..stages.relational import dd_percentiles

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return dd_percentiles(li, "l_extendedprice", [0.5, 0.95, 0.99])


def q_bigram_familiarity(sf_dir: str):
    """Corpus-LM familiarity score per doc (integer-exact bigram model
    trained and applied in one pass — no broadcast model)."""
    return textstats.bigram_familiarity(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_semantic_dedup(sf_dir: str):
    """SemDeDup survivors at threshold 0.435 over sign-pattern cells.

    Output is kept ids only (scores stay internal) so the oracle compare
    is exact-integer; 0.435 sits in a ≥1.8e-3 gap of the within-cell
    cosine distribution at sf0.001/0.01/0.1, far beyond cross-engine
    float ulp drift (the q_embedding_neardup threshold convention).
    """
    from ..stages.similarity import semantic_dedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup(emb, threshold=0.435, bucket_bits=6)


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs over vec_id < 200 at threshold 0.39.

    Output is id pairs only (the score stays internal) so the oracle compare
    is exact-integer; 0.39 sits in a ≥1.5e-3 gap of the sf0.01 score
    distribution, far beyond any cross-engine float ulp drift.
    """
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = embedding_neardup_pairs(emb, threshold=0.39, max_id=200)
    return pairs.select_columns(["vec_id1", "vec_id2"])


def _media_from_documents(sf_dir: str):
    """Deterministic media table synthesized from documents (kind cycles
    image/audio/video by doc_id; payload = utf-8 text bytes; dims unknown)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        kinds = [("image", "audio", "video")[i % 3] for i in ids]
        return pa.table(
            {
                "media_id": pa.array([f"m-{i:06d}" for i in ids], pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(
                    [t.encode("utf-8") for t in texts], pa.binary()
                ),
                "width": pa.array([-1] * len(ids), pa.int32()),
                "height": pa.array([-1] * len(ids), pa.int32()),
                "duration_ms": pa.array([-1] * len(ids), pa.int32()),
            }
        )

    return docs.map_batches(to_media, batch_format="pyarrow")


def q_page_images(sf_dir: str):
    """S8 page-image artifact sink: every page renders to a real PNG under
    a deterministic /tmp artifact dir (atomic, idempotent); the entry
    returns the artifact metadata whose layout math the oracle replays
    (width/height are exact functions of the page text's wrap)."""
    import hashlib as _hashlib

    from ..stages.raster import rasterize_pages

    pages = ingest(read_webpages(sf_dir))["pages"]
    art = "/tmp/osr_page_images_" + _hashlib.md5(
        sf_dir.encode()).hexdigest()[:8]
    out = rasterize_pages(pages, art)
    return out.select_columns(
        ["doc_id", "img_path", "width", "height", "status"])


def q_media_features(sf_dir: str):
    """Multimodal feature stage over the synthesized media table. Decode
    itself is the documented stub — this entry exercises the real Ray
    plumbing (actor pool, quarantine, layout)."""
    media = _media_from_documents(sf_dir)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def summarize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "status": batch.column("status"),
                "feature_dim": pa.array(
                    [len(f) if f is not None else -1
                     for f in batch.column("feature").to_pylist()],
                    pa.int32(),
                ),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def q_media_resize(sf_dir: str):
    """Image-resize actor stage (pixel transform stubbed; metadata exact):
    unknown dims default to the target box, non-images quarantine."""
    from ..stages.multimodal import resize_images

    resized = resize_images(_media_from_documents(sf_dir), concurrency=2)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "kind", "status", "width", "height"])

    return resized.map_batches(project, batch_format="pyarrow")


def q_media_frames(sf_dir: str):
    """Video frame sampling (1→N fan-out; decode stubbed, layout exact):
    unknown duration samples exactly one frame at t=0."""
    from ..stages.multimodal import sample_frames

    frames = sample_frames(_media_from_documents(sf_dir))

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "frame_idx", "ts_ms", "status"])

    return frames.map_batches(project, batch_format="pyarrow")


def q_media_gif(sf_dir: str):
    """REAL compressed-format decode end-to-end, EXACT oracle: a
    deterministic ≤256-color GIF per doc — real LZW streams, dims varying
    per doc_id — decoded through the media actor pool. The projected
    width/height come from the DECODED pixel array's shape, so the value
    hash only matches if the codec actually ran (the metadata columns are
    set to -1 on purpose); feature values stay pytest-locked."""
    import numpy as np

    from ..functions.gif_codec import encode_gif
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            w, h = 8 + d % 9, 6 + d % 7
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [((xx * (1 + d % 7)) % 11) * 23,
                 ((yy * (2 + d % 5)) % 7) * 36,
                 ((xx + yy + d) % 13) * 19],
                axis=2,
            ).astype(np.uint8)
            payloads.append(encode_gif(img))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"g-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["image"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                # dims deliberately unknown: decode must recover them
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "width", "height"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_gif_frames(sf_dir: str):
    """REAL video-kind frame sampling, EXACT oracle: a deterministic
    animated GIF per doc with 2 + doc_id % 4 frames (1000 ms GCE delays),
    decoded through the from-scratch LZW codec and sampled every 1000 ms
    — the fan-out width and tick times are pure functions of doc_id the
    SQL replays; the sampled pixel payloads stay pytest-locked."""
    import numpy as np

    from ..functions.gif_codec import encode_gif_frames
    from ..stages.multimodal import sample_frames

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            nf = 2 + d % 4
            base = np.full((8, 8, 3), (d * 13) % 200, np.uint8)
            frames = []
            for f in range(nf):
                img = base.copy()
                img[:, : 2 * (f + 1)] = ((d + f * 37) % 251, 10, 200)
                frames.append(img)
            payloads.append(encode_gif_frames(frames, delay_ms=1000))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"v-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["video"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([8] * n, pa.int32()),
                "height": pa.array([8] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    frames = sample_frames(media, every_ms=1000)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "frame_idx", "ts_ms", "status"])

    return frames.map_batches(project, batch_format="pyarrow")


def q_media_adpcm(sf_dir: str):
    """REAL compressed-AUDIO decode end-to-end, EXACT oracle: a
    deterministic IMA-ADPCM WAV tone per doc with 256 + (doc_id % 7) * 64
    samples at a doc-varying rate, decoded through the media actor pool.
    The projected n_samples/sample_rate come from the DECODED stream (the
    fact chunk + block walk), pure functions of doc_id the SQL replays;
    waveform bit-exactness stays pytest-locked."""
    import numpy as np

    from ..functions.adpcm import encode_wav_adpcm
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            n = 256 + (d % 7) * 64
            t = np.arange(n, dtype=np.float64)
            tone = (np.sin(t * (1 + d % 24) / 16.0) * 14000).astype(np.int16)
            payloads.append(encode_wav_adpcm(tone, 8000 * (1 + d % 3)))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"a-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["audio"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "n_samples", "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_real(sf_dir: str):
    """REAL media decode end-to-end, EXACT oracle: doc_id % 3 cycles BMP
    image / WAV-PCM16 tone / grayscale PNG (the raster sink's codec wired
    into the media router), each with doc-varying dims or sample counts
    synthesized per doc and recovered from the DECODED arrays — pure
    functions of doc_id the SQL replays. Feature values (pixel stats, FFT
    bands) stay pytest-locked."""
    import numpy as np

    from ..functions.media_codecs import encode_bmp24, encode_wav_pcm16
    from ..functions.raster import encode_png
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads, kinds = [], []
        for d in ids:
            if d % 3 == 0:
                w, h = 4 + d % 13, 3 + d % 11
                img = np.full((h, w, 3), d % 251, dtype=np.uint8)
                img[:, :, 1] = (d * 7) % 251
                payloads.append(encode_bmp24(img))
                kinds.append("image")
            elif d % 3 == 1:
                ns = 128 + (d % 5) * 32
                t = np.arange(ns, dtype=np.float32)
                tone = (np.sin(t * (1 + d % 16) / 8.0) * 12000).astype(
                    np.int16)
                payloads.append(encode_wav_pcm16(tone, 8000))
                kinds.append("audio")
            else:
                w, h = 5 + d % 9, 4 + d % 6
                yy, xx = np.mgrid[0:h, 0:w]
                gray = ((xx * 31 + yy * 17 + d) % 256).astype(np.uint8)
                payloads.append(encode_png(gray))
                kinds.append("image")
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"m-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "kind", "status", "width",
                             "height", "n_samples", "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_mp3(sf_dir: str):
    """REAL MPEG-audio framing probe end-to-end, EXACT oracle: a
    deterministic spec-valid MP3 frame chain per doc — 8 + (doc_id % 11)
    frames at a doc-cycled MPEG-1/2/2.5 sample rate (44100/22050/8000,
    so samples-per-frame flips 1152/576 per spec), every third doc behind
    a real ID3v2 tag — walked by functions/mp3_probe through the media
    actor pool. The projected n_samples/sample_rate come from the PARSED
    headers, pure functions of doc_id the SQL replays; header-field
    bit-exactness stays pytest-locked (tests/test_media_probe.py)."""
    from ..functions.mp3_probe import encode_mp3_frames, make_id3v2_tag
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            sr = (44100, 22050, 8000)[d % 3]
            payloads.append(encode_mp3_frames(
                8 + d % 11,
                sample_rate=sr,
                bitrate_kbps=64,
                channels=1 + (d % 2),
                id3_tag=make_id3v2_tag(16 + d % 8) if d % 3 == 0 else None,
            ))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array(
                    [f"mp-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["audio"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "n_samples",
                             "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_h264(sf_dir: str):
    """REAL H.264 NAL/SPS parse end-to-end, EXACT oracle: a deterministic
    Annex-B stream per doc (SPS + PPS + IDR/non-IDR slice NALs), picture
    dims 16 + 2·(doc_id % 160) × 16 + 2·(doc_id % 91) — mostly NOT
    multiples of 16, so the SPS frame-cropping arithmetic (spec 7.4.2.1.1)
    must run for the widths/heights to match — parsed by
    functions/h264_probe through the media actor pool. The SQL replays
    the dimension/slice-count formulas; Exp-Golomb/emulation-prevention
    bit-exactness stays pytest-locked."""
    from ..functions.h264_probe import encode_h264_stream
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = [
            encode_h264_stream(16 + 2 * (d % 160), 16 + 2 * (d % 91),
                               1 + d % 6)
            for d in ids
        ]
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array(
                    [f"hv-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["video"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        out = batch.select(["media_id", "status", "width", "height",
                            "n_samples"])
        return out.rename_columns(
            ["media_id", "status", "width", "height", "n_frames"])

    return feats.map_batches(project, batch_format="pyarrow")


def _synth_mjpeg_avi(d: int, nf: int, fps: int):
    """One deterministic MJPEG AVI for doc_id d: nf gradient frames whose
    dims are pure functions of d (the SQL replays them)."""
    import numpy as np

    from ..functions.avi_mjpeg import encode_avi_mjpeg

    w, h = 16 + (d % 3) * 8, 16 + (d % 2) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for f in range(nf):
        img = np.stack(
            [((xx * 3 + f * 20 + d) % 256),
             ((yy * 5 + d) % 256),
             np.full_like(xx, (d * 7) % 256)],
            axis=2,
        ).astype(np.uint8)
        frames.append(img)
    return encode_avi_mjpeg(frames, fps=fps)


def q_media_mjpeg(sf_dir: str):
    """REAL video-container decode end-to-end, EXACT oracle: a
    deterministic MJPEG AVI per doc (RIFF demux + the from-scratch
    baseline-JPEG codec), frame dims / frame count / fps varying per
    doc_id. width/height come from DECODING the first frame (not the AVI
    header) and (n_samples, sample_rate) carry (movi frame count, fps) —
    pure functions of doc_id the SQL replays; pixel features stay
    pytest-locked."""
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = [
            _synth_mjpeg_avi(d, nf=2 + d % 5, fps=5 + d % 6) for d in ids
        ]
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"mj-{d:06d}" for d in ids],
                                     pa.string()),
                "kind": pa.array(["video"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                # dims deliberately unknown: decode must recover them
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "width", "height",
                             "n_samples", "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_mjpeg_frames(sf_dir: str):
    """REAL MJPEG-AVI frame sampling, EXACT oracle: 2 + doc_id % 5 frames
    at 1 fps sampled every 1000 ms → the fan-out width and tick times are
    pure functions of doc_id the SQL replays; the sampled payloads are
    the container's RAW JPEG frame bytes (byte-faithful demux,
    pytest-locked)."""
    from ..stages.multimodal import sample_frames

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = [_synth_mjpeg_avi(d, nf=2 + d % 5, fps=1) for d in ids]
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"vj-{d:06d}" for d in ids],
                                     pa.string()),
                "kind": pa.array(["video"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    frames = sample_frames(media, every_ms=1000)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "frame_idx", "ts_ms", "status"])

    return frames.map_batches(project, batch_format="pyarrow")


def q_media_g711(sf_dir: str):
    """REAL G.711 companded-audio decode end-to-end, EXACT oracle: a
    deterministic µ-law (odd doc_id) or A-law (even) WAV tone per doc
    with 200 + (doc_id % 6) * 50 samples at a doc-varying rate, decoded
    through the media actor pool. n_samples/sample_rate come from the
    DECODED stream (fact-chunk trim + LUT expansion), pure functions of
    doc_id the SQL replays; waveform SNR stays pytest-locked
    (tests/test_g711.py)."""
    import numpy as np

    from ..functions.g711 import encode_wav_g711
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            n = 200 + (d % 6) * 50
            t = np.arange(n, dtype=np.float64)
            tone = (np.sin(t * (1 + d % 20) / 12.0) * 15000).astype(np.int16)
            payloads.append(
                encode_wav_g711(tone, 8000 * (1 + d % 3),
                                law="mu" if d % 2 else "a"))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"t-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["audio"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "n_samples", "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_flac(sf_dir: str):
    """REAL lossless-compressed-audio decode end-to-end, EXACT oracle: a
    deterministic FLAC tone per doc — mono (even doc_id) or stereo (odd),
    300 + (doc_id % 5) * 70 frames at a doc-varying rate, multi-frame at
    blocksize 256 — encoded by the from-scratch fixed-predictor/Rice codec
    (``functions/flac_codec.py``) and decoded through the media actor
    pool with CRC-8/CRC-16/MD5 verification. n_samples/sample_rate come
    from the DECODED stream (frame walk + STREAMINFO), pure functions of
    doc_id the SQL replays; waveform bit-exactness stays pytest-locked
    (tests/test_flac_codec.py)."""
    import numpy as np

    from ..functions.flac_codec import encode_flac
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            n = 300 + (d % 5) * 70
            t = np.arange(n, dtype=np.float64)
            tone = (np.sin(t * (1 + d % 18) / 10.0) * 13000).astype(np.int16)
            if d % 2:  # stereo: right channel is a phase-shifted copy
                sig = np.stack([tone, np.roll(tone, 3)], axis=1)
            else:
                sig = tone
            payloads.append(
                encode_flac(sig, 8000 * (1 + d % 4), blocksize=256))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"f-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["audio"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "n_samples", "sample_rate"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_media_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode end-to-end, EXACT oracle: a deterministic
    gradient JPEG per doc — encoded by the from-scratch DCT+Huffman codec
    (``functions/jpeg_codec.py``) with dims, 4:2:0 subsampling
    (doc_id % 2) and restart intervals (doc_id % 3) varying per doc —
    decoded through the media actor pool. The projected width/height come
    from the DECODED pixel array's shape (the metadata columns are -1 on
    purpose), so the value hash only matches if the codec actually ran;
    pixel fidelity (PSNR) stays pytest-locked (tests/test_jpeg_codec.py)."""
    import numpy as np

    from ..functions.jpeg_codec import encode_jpeg
    from ..stages.multimodal import extract_media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            w, h = 9 + d % 12, 7 + d % 10
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 9 + d) % 256, (yy * 7) % 256, ((xx + yy) * 5) % 256],
                axis=2,
            ).astype(np.uint8)
            payloads.append(
                encode_jpeg(img, quality=80, subsample=bool(d % 2),
                            restart_interval=d % 3)
            )
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array([f"j-{d:06d}" for d in ids], pa.string()),
                "kind": pa.array(["image"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                # dims deliberately unknown: decode must recover them
                "width": pa.array([-1] * n, pa.int32()),
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([-1] * n, pa.int32()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
    feats = extract_media_features(media, concurrency=2, batch_size=64)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "status", "width", "height"])

    return feats.map_batches(project, batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    """Gap-based sessions over the events stream (30-min gap)."""
    from ..stages.sessionize import sessionize

    return sessionize(_read(sf_dir, "events",
                            columns=["user_id", "ts", "event_id"]))


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over the events stream: cohort = day of a
    user's first event, users counted per (cohort_day, day_offset) —
    all-integer day arithmetic, exact."""
    from ..stages.sessionize import cohort_retention

    return cohort_retention(_read(sf_dir, "events",
                                  columns=["user_id", "ts"]))


def q_funnel_counts(sf_dir: str):
    """Ordered view→click→purchase funnel (earliest-chain greedy,
    strictly increasing timestamps) — per-step reach counts."""
    from ..stages.sessionize import funnel_counts

    return funnel_counts(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_type"]),
        steps=["view", "click", "purchase"],
    )


def q_winsorize_values(sf_dir: str):
    """Per-event-type winsorization of `value` at the [p5, p95] discrete
    quantiles (selection-based — float-exact, quantile_disc ranks)."""
    from ..stages.relational import winsorize_values

    return winsorize_values(
        _read(sf_dir, "events", columns=["event_id", "event_type", "value"]),
        ["event_type"], "value", q_lo=0.05, q_hi=0.95,
        carry_cols=["event_id"],
    )


def q_grouped_mad(sf_dir: str):
    """Per-event-type robust dispersion (stages/relational.grouped_mad):
    selection-exact median + MAD and the Hampel z=3 outlier count —
    float-exact lattice (one subtraction, one abs, one multiply per
    value), bit-exact oracle."""
    from ..stages.relational import grouped_mad

    return grouped_mad(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        ["event_type"], "value", z=3.0,
    )


def q_leakage_free_split(sf_dir: str):
    """Near-dup-aware train/valid/test split: every member of a fuzzy-dup
    cluster (q_neardup_clusters: Jaccard ≥ 30% pairs → transitive
    closure) inherits its representative's split, so no near-duplicate
    ever straddles train and eval — the leakage-free split best
    practice. Assignment = rep_id % 10 (8/1/1)."""
    clusters = q_neardup_clusters(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        rep = b.column("rep_id").combine_chunks()
        m = _mod(rep, 10)
        split = pc.if_else(
            pc.less(m, 8), pa.scalar("train"),
            pc.if_else(pc.equal(m, 8), pa.scalar("valid"),
                       pa.scalar("test")),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "rep_id": rep, "split": split}
        )

    return clusters.map_batches(assign, batch_format="pyarrow")


def q_value_ranks(sf_dir: str):
    """Exact global rank of every document's n_chars (count of strictly
    smaller values) via the bounded-domain histogram + broadcast — no
    global sort."""
    from ..stages.relational import value_ranks

    return value_ranks(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        "n_chars", carry_cols=["doc_id"],
    )


def q_pareto_frontier(sf_dir: str):
    """2-D skyline of purchase events (maximize value AND recency) —
    exact NOT-EXISTS dominance semantics."""
    from ..stages.relational import pareto_frontier

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("event_type"), "purchase")
        f = b.filter(keep)
        return pa.table(
            {"event_id": f.column("event_id"),
             "value": f.column("value"),
             "t_us": f.column("ts").cast(pa.timestamp("us")).cast(
                 pa.int64())}
        )

    return pareto_frontier(
        ev.map_batches(prep, batch_format="pyarrow"),
        "value", "t_us", carry_cols=["event_id"],
    )


def q_ntile_values(sf_dir: str):
    """Exact NTILE(4) of value per event_type under the (value,
    event_id) total order — SQL's remainder rule replayed."""
    from ..stages.relational import ntile_values

    return ntile_values(
        _read(sf_dir, "events", columns=["event_type", "value", "event_id"]),
        ["event_type"], "value", n_buckets=4, order_cols=["event_id"],
    )


def q_interval_coverage(sf_dir: str):
    """Merged-interval union length per user: each event spans `value`
    seconds (quantized to integer µs); islands merge on the running-max
    rule — exact integer output."""
    from ..stages.sessionize import interval_coverage

    return interval_coverage(
        _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    )


def q_grouped_mode(sf_dir: str):
    """Per-user modal event type (highest count, smallest type on ties —
    a deterministic MODE the SQL ROW_NUMBER replay matches exactly)."""
    from ..stages.relational import grouped_mode

    return grouped_mode(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        ["user_id"], "event_type",
    )


def q_event_runs(sf_dir: str):
    """Run-length encoding of per-user event-type streams
    (gaps-and-islands under the (ts, event_id) total order)."""
    from ..stages.sessionize import event_runs

    return event_runs(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "event_type", "event_id"])
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event streams
    ((ts, event_id)-ordered — total order, so LEAD() replays exactly)."""
    from ..stages.sessionize import event_transitions

    return event_transitions(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "event_type", "event_id"])
    )


def q_pivot_event_types(sf_dir: str):
    """Pivot event_type counts per day (listed values + other bucket)."""
    from ..stages.relational import pivot_counts

    events = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def add_day(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        day = pc.cast(pc.multiply(pc.divide(ts_us, day_us), day_us),
                      pa.timestamp("us"))
        return pa.table({"day": day, "event_type": batch.column("event_type")})

    with_day = events.map_batches(add_day, batch_format="pyarrow")
    return pivot_counts(with_day, ["day"], "event_type",
                        ["click", "error", "purchase"])


def q_event_lag_features(sf_dir: str):
    """LAG / ROWS-BETWEEN window features per event (gap to previous event,
    rolling 4-row cents sum, per user in time order)."""
    from ..stages.sessionize import event_lag_features

    return event_lag_features(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "value"])
    )


def q_tumbling_windows(sf_dir: str):
    """Fixed 1-hour event-time windows per event_type (streaming-window
    analogue of the micro-batch loop; stateless assignment + two-phase agg)."""
    import datetime as dt

    from ..stages.sessionize import tumbling_window_agg

    events = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    return tumbling_window_agg(events, window=dt.timedelta(hours=1),
                               key_cols=["event_type"])


def q_tfidf_weights(sf_dir: str):
    """tf·idf weight per posting (N = total pages; df from term_stats)."""
    from ..stages.index import tfidf_weights

    stages = ingest(read_webpages(sf_dir))
    return tfidf_weights(stages["postings"], stages["pages"])


def q_doc_keywords(sf_dir: str):
    """Per-document top-5 tf·idf keywords: the tfidf term-key join plus
    one doc-key grouped_topk exchange (window rank re-expressed as
    exchange + head-of-run). EXACT oracle: the tfidf SQL with a
    row_number() replay — double comparisons are bit-stable because both
    engines compute tf·ln(N/df) in the same two-operand order, and ties
    break on term."""
    from ..stages.index import tfidf_weights
    from ..stages.relational import grouped_topk

    stages = ingest(read_webpages(sf_dir))
    w = tfidf_weights(stages["postings"], stages["pages"])
    return grouped_topk(
        w, ["doc_id"], [("tfidf", "descending"), ("term", "ascending")], 5)


def q_asof_join(sf_dir: str):
    """For every click, the user's latest view at-or-before it (LEFT ASOF).

    The right side is deduped to one row per (user, ts) — max event_id —
    so the as-of pick is well-defined on both engines."""
    from ..stages.asof import asof_join

    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def side(kind, out_name):
        def f(batch: pa.Table) -> pa.Table:
            keep = batch.filter(pc.equal(batch.column("event_type"), kind))
            return pa.table(
                {
                    "user_id": keep.column("user_id"),
                    "ts": keep.column("ts"),
                    out_name: keep.column("event_id"),
                }
            )

        return f

    clicks = events.map_batches(side("click", "click_id"), batch_format="pyarrow")
    views = events.map_batches(side("view", "view_id"), batch_format="pyarrow")
    views = keep_latest(views, ["user_id", "ts"], ["view_id"])
    return asof_join(clicks, views, on="user_id", ts_col="ts",
                     left_cols=["click_id"], right_cols=["view_id"])


_VALUE_RANGES = [
    (0.0, 10.0, "low"),
    (10.0, 25.0, "mid"),
    (25.0, 50.0, "high"),
    (50.0, 75.0, "very_high"),
]


def q_range_join(sf_dir: str):
    """Broadcast range join: event value → (lo, hi, bucket), null outside."""
    from ..stages.relational import broadcast_range_join

    events = _read(sf_dir, "events", columns=["event_id", "value"])
    return broadcast_range_join(events, _VALUE_RANGES, "value",
                                label_names=["bucket"])


def q_ann_ivf_topk(sf_dir: str):
    from ..stages.similarity import ivf_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(emb, _query_vectors(sf_dir), k=10, n_centroids=16,
                    nprobe=16)


def q_ann_ivf_disk(sf_dir: str):
    """The on-disk IVF ANN layout under the oracle: build centroid-
    partitioned cells in /tmp, run the probe-pruned disk search at full
    probe — must equal exact brute-force cosine top-k."""
    import shutil
    import tempfile

    from ..stages.similarity import build_ivf_index, search_ivf_index

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    tmp = tempfile.mkdtemp(prefix="osr-ivf-", dir="/tmp")
    try:
        build_ivf_index(emb, tmp, n_centroids=16)
        out = search_ivf_index(tmp, _query_vectors(sf_dir), k=10, nprobe=16)
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_ann_ivf_add(sf_dir: str):
    """Incremental IVF adds under the oracle: build the on-disk index from
    the EVEN-id half of the vectors, add the odd half incrementally
    (assign-to-existing-centroids, crash-safe cell merges), re-add it once
    more to prove idempotency, then a full-probe search must equal exact
    brute-force cosine top-k over the WHOLE table."""
    import shutil
    import tempfile

    from ..stages.similarity import (
        add_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            rem = pc.subtract(
                b.column("vec_id"),
                pc.multiply(pc.divide(b.column("vec_id"), 2), 2),
            )
            return b.filter(pc.equal(rem, parity))

        return emb.map_batches(f, batch_format="pyarrow")

    tmp = tempfile.mkdtemp(prefix="osr-ivfadd-", dir="/tmp")
    try:
        build_ivf_index(half(0), tmp, n_centroids=16)
        add_to_ivf_index(half(1), tmp)
        add_to_ivf_index(half(1), tmp)  # idempotent re-add: no duplicates
        out = search_ivf_index(tmp, _query_vectors(sf_dir), k=10, nprobe=16)
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_heavy_terms(sf_dir: str):
    """Exact heavy hitters (cf ≥ 900) via the Misra-Gries sketch+verify plan."""
    from ..stages.index import heavy_terms

    return heavy_terms(_postings(sf_dir), min_cf=900)


def q_curate(sf_dir: str):
    """Training-data curation: quality gate + exact dedup + near-dup drop."""
    from .curate import curate

    return curate(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_ngram_counts(sf_dir: str):
    """Corpus-wide word-bigram counts (count >= 10)."""
    return textstats.ngram_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n=2, min_count=10,
    )


def q_collocations(sf_dir: str):
    """Integer-scaled PMI-lift bigram collocations
    (stages/textstats.collocations) over documents, pair count >= 3 —
    all-integer lattice, bit-exact oracle."""
    return textstats.collocations(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        min_count=3,
    )


def q_domain_stats(sf_dir: str):
    """Per-domain page/url volume over the ingested pages (skew monitor)."""
    pages = ingest(read_webpages(sf_dir))["pages"]
    return textstats.domain_stats(pages)


def q_domain_ngrams(sf_dir: str):
    """Per-domain top-5 word bigrams (stages/textstats.domain_ngrams)
    over the ingested pages — the per-host boilerplate-phrase audit."""
    pages = ingest(read_webpages(sf_dir))["pages"]
    return textstats.domain_ngrams(pages, n=2, k=5)


def _synth_justext_pages(sf_dir: str):
    """Deterministic page per document (nav link list, short <h1>, 40-word
    <p> chunks, link-dense footer) — the jusText oracle reconstructs the
    identical blocks straight from the documents table."""
    import math

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synthesize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        pages = []
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            h1 = " ".join(words[:3])
            chunks = [
                " ".join(words[i * 40:(i + 1) * 40])
                for i in range(math.ceil(len(words) / 40))
            ]
            pages.append(
                '<html><head><title>x</title></head><body>'
                '<ul><li><a href="/">home</a></li>'
                '<li><a href="/a">about us</a></li></ul>'
                f"<h1>{h1}</h1>"
                + "".join(f"<p>{c}</p>" for c in chunks)
                + '<p><a href="/c">copyright</a> '
                '<a href="/s">sitemap links</a></p>'
                "</body></html>"
            )
        return pa.table({"doc_id": ids, "html": pa.array(pages)})

    return docs.map_batches(synthesize, batch_format="pyarrow")


def q_justext_blocks(sf_dir: str):
    """jusText-family block classification over synthesized pages: the
    classifier labels every block through the exact integer rules; the
    oracle replays both passes in SQL (IGNORE NULLS windows for the
    context pass)."""
    from ..stages.boilerplate import justext_blocks

    return justext_blocks(
        _synth_justext_pages(sf_dir), stopwords=frozenset({"a", "the"})
    )


def _synth_link_pages(sf_dir: str):
    """Deterministic outlink page per document: one nav anchor per first-6
    word ('/w/<word>', '<word> page') + one cross-site anchor."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synthesize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        id_list = ids.to_pylist()
        pages = []
        for d, t in zip(id_list, texts):
            words = [w for w in (t or "").split(" ") if w]
            nav = "".join(
                f'<li><a href="/w/{w}">{w} page</a></li>'
                for w in words[:6]
            )
            pages.append(
                "<html><body><ul>" + nav + "</ul>"
                f'<p><a href="https://site{d % 7}.example.org/next">'
                "next doc</a></p></body></html>"
            )
        return pa.table({"doc_id": ids, "html": pa.array(pages)})

    return docs.map_batches(synthesize, batch_format="pyarrow")


def _synth_anchor_pages(sf_dir: str):
    """Anchor-diversity pages: doc d links to three hub targets with
    doc-varying anchor text — hub d%5 (anchor 'hub N home' on even docs,
    'hub N page' on odd), hub (d+2)%5 ('hub N page'), hub d%3
    ('hub N news') — so each target accumulates several distinct anchors
    with different frequencies, all pure functions of doc_id the SQL
    replays."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synthesize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        pages = []
        for d in ids.to_pylist():
            h1, h2, h3 = d % 5, (d + 2) % 5, d % 3
            a1 = f"hub {h1} home" if d % 2 == 0 else f"hub {h1} page"
            pages.append(
                "<html><body>"
                f'<p><a href="https://hub{h1}.example.org/">{a1}</a></p>'
                f'<p><a href="https://hub{h2}.example.org/">hub {h2} page'
                "</a></p>"
                f'<p><a href="https://hub{h3}.example.org/">hub {h3} news'
                "</a></p>"
                "</body></html>"
            )
        return pa.table({"doc_id": ids, "html": pa.array(pages)})

    return docs.map_batches(synthesize, batch_format="pyarrow")


def q_top_anchors(sf_dir: str):
    """Per-target top-k anchor texts (the inbound-anchor URL-labeling
    signal): HTML parse → edges → partial-combined counts → one href
    exchange → head-of-run top-3. EXACT oracle: the SQL rebuilds the
    three planted edges per doc and replays the window rank."""
    from ..stages.linkgraph import extract_links, top_anchor_texts

    return top_anchor_texts(extract_links(_synth_anchor_pages(sf_dir)), k=3)


def q_extract_links(sf_dir: str):
    """Outlink/anchor edge extraction over synthesized pages."""
    from ..stages.linkgraph import extract_links

    return extract_links(_synth_link_pages(sf_dir))


def q_link_degrees(sf_dir: str):
    """Per-target link-graph degrees (total links + distinct sources)."""
    from ..stages.linkgraph import extract_links, link_degrees

    return link_degrees(extract_links(_synth_link_pages(sf_dir)))


def q_crawl_frontier(sf_dir: str):
    """Crawl frontier prioritization (stages/linkgraph.crawl_frontier):
    link targets not yet crawled, ranked by distinct linking sources —
    deny-list anti join + sort-free top-k over the synthesized outlink
    graph. Crawled set = '/w/<word>' urls for even-length nav words
    (pure function of documents.text, replayed in SQL)."""
    from ..stages.linkgraph import crawl_frontier, extract_links

    edges = extract_links(_synth_link_pages(sf_dir))
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def crawled_rows(batch: pa.Table) -> pa.Table:
        out = set()
        for t in batch.column("text").to_pylist():
            words = [w for w in (t or "").split(" ") if w]
            for w in words[:6]:
                if len(w) % 2 == 0:
                    out.add("/w/" + w)
        return pa.table({"url": pa.array(sorted(out), pa.string())})

    crawled = docs.map_batches(crawled_rows, batch_format="pyarrow")
    return crawl_frontier(edges, crawled, k=25)


def q_main_content(sf_dir: str):
    """End-to-end main-content extraction: synthesized pages → jusText
    two-pass labels → '\\n\\n'-joined good blocks per page."""
    from ..stages.boilerplate import extract_main_content

    pages = _synth_justext_pages(sf_dir)
    return extract_main_content(pages, stopwords=frozenset({"a", "the"}))


def q_html_meta(sf_dir: str):
    """Head-metadata extraction (stages/boilerplate.extract_html_meta)
    over deterministically synthesized pages: title / meta description /
    canonical link / charset pulled by vectorized RE2 kernels; the
    oracle recomputes every field straight from the generator inputs, so
    the synthesis→extraction round trip must be byte-identical."""
    from ..stages.boilerplate import extract_html_meta

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synthesize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        pages = []
        for d, t in zip(ids, texts):
            words = [w for w in (t or "").split(" ") if w]
            head = (
                f"<title>{' '.join(words[:4])} | site{d % 7}</title>"
                f'<meta name="description" content='
                f'"{" ".join(words[:12])}">'
            )
            if d % 3 != 0:
                head += (
                    f'<link rel="canonical" '
                    f'href="https://site{d % 7}.example.org/canon-{d}">'
                )
            if d % 2 == 0:
                head += '<meta charset="utf-8">'
            pages.append(
                f"<html><head>{head}</head><body><p>{t}</p></body></html>"
            )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "html": pa.array(pages, pa.string())}
        )

    return extract_html_meta(
        docs.map_batches(synthesize, batch_format="pyarrow")
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-family repetition counters (exact integers; ratios are
    consumer-side)."""
    return textstats.repetition_stats(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_bloom_semi_join(sf_dir: str):
    """Orders of high-balance customers via the Bloom-prefiltered exact
    semi-join (deny/allow-list pattern: bitmap prunes per batch, the
    cluster semi-join decides — result == WHERE EXISTS)."""
    from ..stages.relational import bloom_semi_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    vip = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch.column("c_acctbal"), 9000.0)
        ).select(["c_custkey"])

    return bloom_semi_join(
        orders, vip.map_batches(keep, batch_format="pyarrow"),
        "o_custkey", right_key="c_custkey",
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_totalprice": pa.float64()},
    )


_BOILER16 = ("copyright terms of service all rights reserved privacy "
             "policy contact us home about sitemap login search")


def q_span_dedup(sf_dir: str):
    """C4-style global span dedup (8-word spans). Every doc is prefixed
    with the same 16-word boilerplate header (2 aligned spans) so the
    operator has real cross-doc duplication to strip — only the globally
    first doc keeps the header; the oracle replays the identical
    construction."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            _BOILER16, batch.column("text"), " "
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    return dedup_stage.span_dedup(
        docs.map_batches(augment, batch_format="pyarrow"), window=8
    )


def q_pii_redact(sf_dir: str):
    """PII scrub (emails / IPv4 / phones → typed tokens + counts).

    The synthetic corpus carries no PII, so the entry plants deterministic
    PII derived from doc_id (two e-mails, an IP octet, a phone tail) before
    redacting — the oracle performs the identical concat + RE2 chain."""
    from ..stages.redact import redact_pii

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        ds_ = pc.cast(d, pa.string())
        ip_oct = pc.cast(pc.bit_wise_and(d, 255), pa.string())
        phone4 = pc.utf8_lpad(
            pc.cast(pc.bit_wise_and(d, 4095), pa.string()), 4, "0"
        )
        text = pc.binary_join_element_wise(
            batch.column("text"), " reach u", ds_, "@mail.org cc u", ds_,
            "@dev.example.net from 10.", ip_oct, ".0.7 call +1-555-",
            phone4, " end", "",
        )
        return pa.table({"doc_id": d, "text": text})

    return redact_pii(docs.map_batches(augment, batch_format="pyarrow"))


def q_profile_table(sf_dir: str):
    """Data-quality profile (counts, nulls, distinct, string min/max per
    column). Floats are profiled as exact integer cents (Arrow and DuckDB
    render doubles differently as strings — '10' vs '10.0'); nulls are
    planted (every 7th event) so the null counter is exercised."""
    from ..stages.relational import profile_table

    events = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        eid = batch.column("event_id")
        rem = pc.subtract(eid, pc.multiply(pc.divide(eid, 7), 7))
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100),
                     options=away), pa.int64())
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "user_id": batch.column("user_id"),
                "value_cents": pc.if_else(pc.equal(rem, 0),
                                          pa.nulls(batch.num_rows,
                                                   pa.int64()),
                                          cents),
            }
        )

    return profile_table(
        events.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "user_id", "value_cents"],
    )


def q_substring_search(sf_dir: str):
    """LIKE '%merge batch%' via the trigram-index plan (candidates from
    pattern-trigram intersection, exact verify by candidate join-back)."""
    return textstats.substring_search(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        "merge batch",
    )


def q_assign_split(sf_dir: str):
    """Deterministic content-hash train/val/test assignment (98/1/1)."""
    from ..stages.relational import assign_split

    return assign_split(_read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def q_grouped_distinct(sf_dir: str):
    """Exact distinct users per event_type (two-level value-keyed
    exchange)."""
    from ..stages.relational import grouped_count_distinct

    events = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_count_distinct(events, ["event_type"], "user_id")


def q_grouped_approx_distinct(sf_dir: str):
    """Per-group HLL distinct-user estimates (rows-only: deterministic
    sketch, accuracy locked by pytest against the exact operator)."""
    from ..stages.relational import grouped_approx_distinct

    events = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_approx_distinct(events, ["event_type"], "user_id")


def q_sliding_windows(sf_dir: str):
    """1-hour windows hopping every 15 min per event_type (each event in 4
    windows)."""
    import datetime as dt

    from ..stages.sessionize import sliding_window_agg

    events = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    return sliding_window_agg(
        events, window=dt.timedelta(hours=1),
        slide=dt.timedelta(minutes=15), key_cols=["event_type"],
    )


def q_full_outer_join(sf_dir: str):
    """Distributed FULL OUTER join: all orders x high-balance customers
    (unmatched sides null-extended, key coalesced). Every customer in
    this corpus has orders, so the right side also plants shadow keys
    (+10000) that match nothing — exercising the right-only branch."""
    from ..stages.relational import cluster_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.greater(batch.column("c_acctbal"), 5000.0))
        real = pa.table({"o_custkey": k.column("c_custkey"),
                         "c_name": k.column("c_name")})
        sh = k.filter(pc.greater(k.column("c_acctbal"), 9500.0))
        shadow = pa.table(
            {"o_custkey": pc.add(sh.column("c_custkey"), 10000),
             "c_name": pc.binary_join_element_wise(
                 sh.column("c_name"), "-shadow", "")}
        )
        return pa.concat_tables([real, shadow]).combine_chunks()

    vip = _read(sf_dir, "customer",
                columns=["c_custkey", "c_name", "c_acctbal"]).map_batches(
        keep, batch_format="pyarrow")
    return cluster_join(
        orders, vip, ["o_custkey"],
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
        right_types={"c_name": pa.string()},
        how="full",
    )


def q_anti_join(sf_dir: str):
    """Distributed ANTI join: orders whose customer is NOT high-balance
    (the deny-list complement of bloom_semi_join)."""
    from ..stages.relational import cluster_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.greater(batch.column("c_acctbal"), 9000.0))
        return pa.table({"o_custkey": k.column("c_custkey")})

    vip = _read(sf_dir, "customer",
                columns=["c_custkey", "c_acctbal"]).map_batches(
        keep, batch_format="pyarrow")
    return cluster_join(
        orders, vip, ["o_custkey"],
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_totalprice": pa.float64()},
        right_types={},
        how="anti",
    )


_ROBOTS_DOMAINS = ["hot.example.com"] + [
    f"site{i}.example.org" for i in range(7)
]


def q_robots_filter(sf_dir: str):
    """REP longest-match robots filtering over the synthesized url corpus
    (every domain disallows /doc-0001 but re-allows /doc-00012)."""
    from ..sources.webpages import read_webpages
    from ..stages.robots import robots_filter

    urls = read_webpages(sf_dir).map_batches(
        lambda b: b.select(["url"]), batch_format="pyarrow"
    )
    import ray.data as rd

    rules = rd.from_arrow(
        pa.table(
            {
                "domain": pa.array(
                    [d for d in _ROBOTS_DOMAINS for _ in range(2)]),
                "rule_type": pa.array(
                    ["disallow", "allow"] * len(_ROBOTS_DOMAINS)),
                "path_prefix": pa.array(
                    ["/doc-0001", "/doc-00012"] * len(_ROBOTS_DOMAINS)),
            }
        )
    )
    return robots_filter(urls, rules)


def q_connected_components(sf_dir: str):
    """Dedup-cluster construction: connected components (hash-min label
    propagation to fixpoint) over planted chain edges (doc d — d+1 when
    d%5<3 → components are the maximal runs; the oracle states the
    closed form for this graph)."""
    from ..stages.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        rem = pc.subtract(d, pc.multiply(pc.divide(d, 5), 5))
        keep = batch.filter(pc.less(rem, 3))
        return pa.table(
            {"src": keep.column("doc_id"),
             "dst": pc.add(keep.column("doc_id"), 1)}
        )

    return connected_components(
        docs.map_batches(edges, batch_format="pyarrow"), n_blocks=4
    )


def q_vocab_encode(sf_dir: str):
    """Token-id dictionary: vocabulary ranked by collection frequency
    (ties by term) via the distributed prefix-sum ranking — no global
    string sort."""
    from ..stages.relational import global_rank

    stats = term_stats(_postings(sf_dir)).select_columns(["term", "cf"])
    ranked = global_rank(stats, "cf", "term")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": batch.column("term"),
                "cf": batch.column("cf"),
                "token_id": pc.subtract(batch.column("rank"), 1),
            }
        )

    return ranked.map_batches(project, batch_format="pyarrow")


def _synth_bpe_corpus(sf_dir: str):
    """Planted-frequency BPE corpus whose merge sequence is analytically
    forced: three words over DISJOINT alphabets — ``aaaa`` × (5 + d%3),
    ``bbbb`` × (3 + d%2), ``cccc`` × 1 per doc d. Pair counts (overlap
    counting, weighted by word frequency) are strictly ordered POINTWISE
    per document at every step, so for ANY document set the first four
    merges are (a,a) @ 3·Σna, (b,b) @ 3·Σnb, (aa,aa) @ Σna, (bb,bb) @ Σnb
    — step 4's only possible tie, (bb,bb) vs (c,c) at n=1, resolves to
    (bb,bb) under the documented lexicographic tie-break. The SQL oracle
    replays both the merge table and the encoded token counts as pure
    functions of doc_id (the media-entry oracle pattern)."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = []
        for d in ids:
            na, nb = 5 + d % 3, 3 + d % 2
            texts.append(" ".join(["aaaa"] * na + ["bbbb"] * nb + ["cccc"]))
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "text": pa.array(texts, pa.string())}
        )

    return docs.map_batches(synth, batch_format="pyarrow")


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training: one word-count exchange
    (per-batch Arrow partials), capped type table, bounded driver merge
    loop. EXACT oracle: the planted corpus forces the merge sequence and
    the SQL replays each rank's winning pair count from doc_id sums."""
    from ..stages.bpe import bpe_train, word_frequencies

    return bpe_train(word_frequencies(_synth_bpe_corpus(sf_dir)), n_merges=4)


def q_bpe_encode(sf_dir: str):
    """Train-then-encode chain: merges broadcast once, actor-pool encode
    with per-word memo. EXACT oracle: with the planted corpus's four
    forced merges, ``aaaa``/``bbbb`` collapse to one token and ``cccc``
    stays four, so n_tokens = 12 + d%3 + d%2 per doc — any trainer or
    encoder deviation changes the counts and fails the hash."""
    from ..stages.bpe import bpe_encode, bpe_train, word_frequencies

    # Scanned twice (train + encode) → pin the lineage once (CLAUDE.md
    # multi-consumer rule); the synthesized corpus is small per sf.
    corpus = _synth_bpe_corpus(sf_dir).materialize()
    merges = bpe_train(word_frequencies(corpus), n_merges=4)
    return bpe_encode(corpus, merges)


def _synth_messy_urls(sf_dir: str):
    """Two spellings per target: even docs clean https, odd docs upper-case
    host + default port + fragment — pairs (2c, 2c+1) share a canonical."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synthesize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for d in ids:
            c = d // 2
            if d % 2 == 0:
                urls.append(f"https://site{c % 7}.example.org/doc-{c}")
            else:
                urls.append(
                    f"HTTPS://SITE{c % 7}.EXAMPLE.ORG:443/doc-{c}#S"
                )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "url": pa.array(urls, pa.string())}
        )

    return docs.map_batches(synthesize, batch_format="pyarrow")


def q_canonical_urls(sf_dir: str):
    """URL canonicalization (scheme/host case, default ports, fragments)."""
    from ..stages.urlnorm import canonical_urls

    return canonical_urls(_synth_messy_urls(sf_dir))


def q_canonical_dedup(sf_dir: str):
    """Canonical-URL dedup: representative (min doc) + variant count."""
    from ..stages.urlnorm import canonical_dedup

    return canonical_dedup(_synth_messy_urls(sf_dir))


def q_stratified_sample(sf_dir: str):
    """Deterministic 5-per-lang document sample (content-hash ranked)."""
    from ..stages.relational import stratified_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = stratified_sample(docs, ["lang"], 5, id_col="doc_id",
                            text_col="text")

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["lang", "doc_id"])

    return out.map_batches(project, batch_format="pyarrow")


def q_clean_text(sf_dir: str):
    """Unicode NFC + control-strip + whitespace-squeeze + trim. The corpus
    is ASCII, so the entry plants combining characters, tabs, control
    bytes and pad spaces per doc; the oracle replays the identical concat
    + nfc_normalize + RE2 chain."""
    from ..stages.redact import clean_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # decomposed accents (so NFC composes them), tab, control byte,
    # space runs, trailing tab
    suffix = " x\ty\x01  cafe\u0301 e\u0301\t"

    def augment(batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            batch.column("text"), suffix, ""
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    return clean_text(docs.map_batches(augment, batch_format="pyarrow"))


def q_export_curated_shards(sf_dir: str):
    """Capstone training-data export — the full LLM-data path in ONE
    pipeline: Gopher quality gate → transitive near-dup cluster
    representatives (``q_curate_full``) → survivor texts via a semi
    cluster_join → global sequence packing at budget 256 (distributed
    prefix-sum offsets). EXACT composed oracle: the curate_full SQL as a
    subquery feeding the pack window replay. Every stage is the
    distributed plan; driver state is O(n_parts) offsets."""
    from ..stages.pack import pack_sequences
    from ..stages.relational import cluster_join

    survivors = q_curate_full(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = cluster_join(
        docs, survivors, ["doc_id"], how="semi",
        left_types={"doc_id": pa.int64(), "text": pa.string()},
        right_types={},
    )
    return pack_sequences(kept, budget=256)


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing (budget=256 tokens) via the
    distributed prefix-sum plan — global token offsets + window ids per doc."""
    from ..stages.pack import pack_sequences

    return pack_sequences(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), budget=256
    )


def q_path_convert(sf_dir: str):
    """O15 full path algebra over the reference's office-file layout
    (PathConvert.const.js:10-134): synthesize each document's pptx upload
    path, derive pdf / png-dir / docx and the png-dir→pptx round trip with
    the vectorized replace-first kernels. Hex/integer ids contain no
    directory or extension token, so replace-first equals the oracle's
    direct concatenation on these inputs (the divergent double-token case
    is pinned JS-exact in tests/test_pathconvert.py)."""
    from ..functions.pathconvert import PathConvert

    conv = PathConvert()
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("doc_id").cast(pa.string())
        lit = lambda s: pa.array([s] * n, pa.string())  # noqa: E731
        pptx = pc.binary_join_element_wise(lit("data/pptx/"), ids,
                                           lit(".pptx"), "")
        pdf = conv.convert_column(pptx, "pptx", "pdf")
        png_dir = conv.convert_column(pptx, "pptx", "png_dir")
        docx = conv.convert_column(pdf, "pdf", "docx")
        roundtrip = conv.convert_column(png_dir, "png_dir", "pptx")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pptx_path": pptx,
                "pdf_path": pdf,
                "png_dir": png_dir,
                "docx_path": docx,
                "pptx_roundtrip": roundtrip,
            }
        )

    return docs.map_batches(derive, batch_format="pyarrow")


def _mod(col, n: int):
    """Euclidean mod for nonnegative int columns (Arrow has no mod)."""
    return pc.subtract(col, pc.multiply(pc.divide(col, n), n))


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup against the ON-DISK digest index
    (stages/dedup_disk): corpus = doc_id%10≠0 builds the bucketed index;
    the arriving batch = (doc_id%10=0 docs) ∪ (copies of doc_id%7=0 docs
    re-arriving under new ids) — so both drop paths run: within-batch
    dups collapse to the min id, index dups are anti-joined out reading
    only the affected bucket dirs. Survivors = the %10 rows exactly."""
    import os
    import shutil
    import tempfile

    from ..stages.dedup_disk import build_digest_index, dedup_against_index

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keep(pred):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pred(_mod(batch.column("doc_id"), 10),
                                     _mod(batch.column("doc_id"), 7)))
        return f

    corpus = docs.map_batches(
        keep(lambda m10, m7: pc.not_equal(m10, 0)), batch_format="pyarrow"
    )
    fresh = docs.map_batches(
        keep(lambda m10, m7: pc.equal(m10, 0)), batch_format="pyarrow"
    )
    rearrivals = docs.map_batches(
        keep(lambda m10, m7: pc.equal(m7, 0)), batch_format="pyarrow"
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": pc.add(b.column("doc_id"), 1_000_000),
             "text": b.column("text")}
        ),
        batch_format="pyarrow",
    )
    batch = fresh.union(rearrivals)

    tmp = tempfile.mkdtemp(prefix="osr-dedupinc-", dir="/tmp")
    try:
        index_dir = os.path.join(tmp, "digests")
        build_digest_index(corpus, index_dir)
        out = dedup_against_index(batch, index_dir)
        # materialize before the index dir is removed (lazy reads)
        return out.map_batches(
            lambda t: t.select(["doc_id", "text_sha256"]),
            batch_format="pyarrow",
        ).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_pagerank(sf_dir: str):
    """Exact int64 fixed-point PageRank (stages/graph.pagerank_fixed) over
    a deterministic hub-skewed graph: every doc links to doc_id%97,
    doc_id%89 and doc_id//2 (duplicate edges and self-loops included —
    the SQL builds the identical multiset). 3 synchronous rounds at
    scale 10^12; every operation is an integer floor, so the oracle
    hash-compare is bit-exact."""
    from ..stages.graph import pagerank_fixed

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    # few wide blocks: an iterative op multiplies per-task overhead by
    # (stages × rounds); at corpus scale the natural block count applies
    return pagerank_fixed(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4),
        iters=3,
    )


def q_hits(sf_dir: str):
    """Exact int64 fixed-point HITS (stages/graph.hits_fixed) over the
    same deterministic hub-skewed multigraph as ``pagerank``: every doc
    links to doc_id%97, doc_id%89 and doc_id//2. 2 synchronous rounds at
    scale 10^6 with floor-divisor normalization — every op is an integer
    floor, so the oracle hash-compare is bit-exact."""
    from ..stages.graph import hits_fixed

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    return hits_fixed(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4),
        iters=2,
    )


def q_triangle_counts(sf_dir: str):
    """Exact per-node triangle counts (stages/graph.triangle_counts,
    degree-ordered orientation) over the deterministic hub-skewed
    multigraph shared with ``pagerank``/``hits`` — self-loops and
    duplicate edges exercised; the SQL replays canonicalize → distinct →
    orient → wedge-close on the identical edge multiset."""
    from ..stages.graph import triangle_counts

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    return triangle_counts(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4)
    )


def q_ppr(sf_dir: str):
    """Personalized PageRank (stages/graph.ppr_fixed) from the seed set
    {doc_id % 50 == 0} over the shared deterministic multigraph — 2
    rounds at scale 10^12, teleport only to seeds; bit-exact integer
    lattice replayed in SQL."""
    from ..stages.graph import ppr_fixed

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    def seed_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        keep = pc.equal(_mod(d.combine_chunks(), 50), 0)
        return pa.table({"node": d.filter(keep)})

    return ppr_fixed(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4),
        docs.map_batches(seed_rows, batch_format="pyarrow"),
        iters=2,
    )


def q_cocitation(sf_dir: str):
    """Co-citation counts (distinct shared in-link sources per target
    pair) over the deterministic doc multigraph."""
    from ..stages.graph import cocitation_counts

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    return cocitation_counts(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4)
    )


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distances (stages/graph.bfs_hops): frontier-
    delta expansion from the seed set {doc_id % 67 == 5} over the shared
    deterministic doc multigraph, 3 bounded hops. The oracle replays it
    as unrolled walk levels (distinct dst per level, MIN level per node
    — identical to BFS shortest hops within the bound)."""
    from ..stages.graph import bfs_hops

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    def seed_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        keep = pc.equal(_mod(d.combine_chunks(), 67), 5)
        return pa.table({"node": d.filter(keep)})

    return bfs_hops(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4),
        docs.map_batches(seed_rows, batch_format="pyarrow"),
        max_hops=3,
    )


def q_kcore(sf_dir: str):
    """Bounded synchronous k-core peel (k=3, 6 rounds,
    stages/graph.kcore_peel) over the deterministic doc multigraph —
    exact vs a 6-round unrolled CTE chain."""
    from ..stages.graph import kcore_peel

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = [
            _mod(d, 97).combine_chunks()
            if isinstance(_mod(d, 97), pa.ChunkedArray) else _mod(d, 97),
            _mod(d, 89).combine_chunks()
            if isinstance(_mod(d, 89), pa.ChunkedArray) else _mod(d, 89),
            pc.divide(d, 2),
        ]
        return pa.table(
            {
                "src": pa.chunked_array([d, d, d]),
                "dst": pa.chunked_array(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in dsts]
                ),
            }
        )

    return kcore_peel(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4),
        k=3, rounds=6,
    )


def q_bm25_weights(sf_dir: str):
    """Okapi BM25 per posting (k1=1.2, b=0.75; Lucene idf) — pinned float
    op order, df and dl attached via distributed cluster_join exchanges."""
    from ..stages.index import bm25_weights

    stages = ingest(read_webpages(sf_dir))
    return bm25_weights(stages["postings"], stages["pages"])


def q_search_bm25(sf_dir: str):
    """BM25-ranked search over the same corpus/query as search_topk —
    integer-quantized scores make the per-doc sum order-free, so the
    oracle compares exactly."""
    from ..stages.search import bm25_search

    stages = ingest(read_webpages(sf_dir))
    return bm25_search(
        stages["postings"], stages["pages"], "Spark MERGE data!",
        max_return=20,
    )


def q_search_rrf(sf_dir: str):
    """Reciprocal-rank fusion (stages/search.rrf_fuse) of the raw-tf and
    BM25 top-20 rankings for the shared query — one ingest, both scorers
    over the same pinned postings/pages, exact integer RRF lattice."""
    from ..stages.search import bm25_search, rrf_fuse, search

    stages = ingest(read_webpages(sf_dir))
    postings = stages["postings"].materialize()
    pages = stages["pages"].materialize()
    tf = search(postings, pages, "Spark MERGE data!", max_return=20)
    bm = bm25_search(postings, pages, "Spark MERGE data!", max_return=20)
    return rrf_fuse([tf, bm], ["tf", "bm25"])


def q_neardup_incremental(sf_dir: str):
    """Incremental near-dup against the on-disk MinHash band index
    (stages/neardup_disk): corpus = doc_id%10≠0 docs build the bucketed
    band+shingle index; the arriving batch = (%10=0 docs, all fresh) ∪
    (verbatim re-arrivals of %7=0 corpus docs under id+1e6). Candidates
    come from the probed band buckets only; verification runs from the
    index's shingle digests — the corpus text is never re-read. Expected
    pairs: exactly the re-arrivals of INDEXED docs (Jaccard 1)."""
    import os
    import shutil
    import tempfile

    from ..stages.neardup_disk import build_neardup_index, neardup_against_index

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    corpus = docs.map_batches(
        lambda b: b.filter(pc.not_equal(_mod(b.column("doc_id"), 10), 0)),
        batch_format="pyarrow",
    )
    fresh = docs.map_batches(
        lambda b: b.filter(pc.equal(_mod(b.column("doc_id"), 10), 0)),
        batch_format="pyarrow",
    )
    rearrivals = docs.map_batches(
        lambda b: (lambda k: pa.table(
            {"doc_id": pc.add(k.column("doc_id"), 1_000_000),
             "text": k.column("text")}
        ))(b.filter(pc.equal(_mod(b.column("doc_id"), 7), 0))),
        batch_format="pyarrow",
    )
    batch = fresh.union(rearrivals)

    tmp = tempfile.mkdtemp(prefix="osr-ndinc-", dir="/tmp")
    try:
        index_dir = os.path.join(tmp, "ndidx")
        build_neardup_index(corpus, index_dir)
        return neardup_against_index(batch, index_dir).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_search_bm25_disk(sf_dir: str):
    """The PRODUCTION BM25 path: bucketed posting index + doc-length
    sidecar on disk, bucket-pruned query — must equal the in-memory
    search_bm25 exactly (same oracle)."""
    import os
    import shutil
    import tempfile

    from ..stages.index import build_index
    from .query import search_index_bm25, write_doc_lengths

    stages = ingest(read_webpages(sf_dir))
    n_docs = stages["pages"].count()
    tmp = tempfile.mkdtemp(prefix="osr-bm25idx-", dir="/tmp")
    try:
        index_dir = os.path.join(tmp, "index")
        pages_path = os.path.join(tmp, "pages")
        dl_path = os.path.join(tmp, "doc_lengths")
        build_index(stages["postings"], index_dir)
        write_doc_lengths(stages["postings"], dl_path)
        stages["pages"].write_parquet(pages_path, compression="zstd")
        return search_index_bm25(
            index_dir, pages_path, dl_path, n_docs, "Spark MERGE data!",
            max_return=20,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_grouped_corr(sf_dir: str):
    """Per-(returnflag, linestatus) Pearson correlation between quantity
    and extended price (stages/relational.grouped_corr): values enter as
    EXACT integers (quantity is integer-valued; price scaled to cents),
    the five moment sums accumulate in int64, and only the final
    expression touches floats in pinned IEEE order — the distributed
    replacement for SQL's corr() that stays hash-exact."""
    from ..stages.relational import grouped_corr

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"])

    def to_ints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": batch.column("l_quantity").cast(pa.int64()),
                "cents": pc.round(
                    pc.multiply(batch.column("l_extendedprice"), 100.0)
                ).cast(pa.int64()),
            }
        )

    return grouped_corr(
        li.map_batches(to_ints, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], "qty", "cents",
    )


def q_vocab_overlap(sf_dir: str):
    """Per-host-pair vocabulary Jaccard (stages/textstats.vocab_overlap)
    over the ingested pages — the mirror-site / content-farm audit:
    exact |V(a) ∩ V(b)| and union counts per host pair, one pinned IEEE
    division for the ratio."""
    pages = ingest(read_webpages(sf_dir))["pages"]
    return textstats.vocab_overlap(pages)


def q_covisitation(sf_dir: str):
    """Item–item co-visitation counts (the recsys / related-content
    primitive): distinct users who purchased BOTH items, for every item
    pair — stages/graph.cocitation_counts over (user → item) edges,
    items extracted from the events JSON props by a vectorized RE2
    kernel (pc.extract_regex), purchases only. The apex guard bounds
    power-user fan-out the same way cocitation bounds hub apexes."""
    from ..stages.graph import cocitation_counts

    ev = _read(sf_dir, "events",
               columns=["user_id", "event_type", "props"])

    def edges(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("event_type"), "purchase")
        t = batch.filter(keep)
        m = pc.extract_regex(t.column("props"), r'"k": (?P<k>\d+)')
        item = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table(
            {"src": t.column("user_id").cast(pa.int64()), "dst": item}
        )

    out = cocitation_counts(
        ev.map_batches(edges, batch_format="pyarrow")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["item1", "item2", "n_common_users"])

    return out.map_batches(rename, batch_format="pyarrow")


def _doc_multigraph(sf_dir: str):
    """The deterministic hub-skewed doc multigraph shared by the graph
    entries (pagerank/hits/triangle_counts/kcore): src=doc_id with dsts
    doc_id%97, doc_id%89, doc_id//2 — self-loops and duplicate edges
    included so every operator's canonicalize path is exercised; SQL
    replays the same three UNION ALL selects."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        dsts = []
        for x in (_mod(d, 97), _mod(d, 89), pc.divide(d, 2)):
            dsts.append(
                x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
            )
        return pa.table(
            {"src": pa.chunked_array([d, d, d]),
             "dst": pa.chunked_array(dsts)}
        )

    return docs.map_batches(edges, batch_format="pyarrow").repartition(4)


def q_clustering_coefficient(sf_dir: str):
    """Per-node local clustering coefficient
    (stages/graph.clustering_coefficient = triangle_counts with the
    degree spine + one pinned-IEEE map) over the deterministic doc
    multigraph — the link-farm / clique-neighborhood audit."""
    from ..stages.graph import clustering_coefficient

    return clustering_coefficient(_doc_multigraph(sf_dir))


def q_assortativity(sf_dir: str):
    """Degree assortativity coefficient (stages/graph.assortativity):
    Pearson over symmetrized endpoint degrees with exact int64 moment
    sums and the grouped_corr pinned final expression — one scalar row
    the SQL mirror replays bit-for-bit."""
    from ..stages.graph import assortativity

    return assortativity(_doc_multigraph(sf_dir))


def q_fof_counts(sf_dir: str):
    """Distance-exactly-2 neighbor counts (stages/graph.fof_counts):
    symmetrized wedges through co-located mid nodes, distinct pairs,
    ANTI join against direct edges — the link-prediction candidate
    volume per node."""
    from ..stages.graph import fof_counts

    return fof_counts(_doc_multigraph(sf_dir))


def q_reciprocity(sf_dir: str):
    """Directed reciprocity (stages/graph.reciprocity): distinct
    non-loop directed edges whose reverse also exists, counted
    block-locally per canonical pair — one scalar row, one pinned
    division. The derivation doc→doc%97 ∪ doc→2·doc mixes one-way hub
    edges with doubling edges whose reverse (2u→u via //2-style halving
    emitted from row 2u) exists exactly when 2u is itself a doc —
    a nonzero, nontrivial mutual fraction the SQL replays."""
    from ..stages.graph import reciprocity

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").combine_chunks()
        m = _mod(d, 97)
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        dbl = pc.multiply(d, 2)
        dbl = dbl.combine_chunks() if isinstance(dbl, pa.ChunkedArray) else dbl
        half = pc.divide(d, 2)
        half = (half.combine_chunks()
                if isinstance(half, pa.ChunkedArray) else half)
        return pa.table(
            {"src": pa.chunked_array([d, d, d]),
             "dst": pa.chunked_array([m, dbl, half])}
        )

    return reciprocity(
        docs.map_batches(edges, batch_format="pyarrow").repartition(4)
    )


def q_attribution(sf_dir: str):
    """Last-touch conversion attribution over the events stream
    (stages/sessionize.last_touch_attribution): each purchase credits
    the user's most recent strictly-earlier non-purchase event type
    under the (ts, event_id) total order; purchases with no prior touch
    credit 'direct'. SQL replays it with LAST_VALUE(... IGNORE NULLS)
    OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)."""
    from ..stages.sessionize import last_touch_attribution

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])
    return last_touch_attribution(ev, conversion="purchase")


def q_hapax_ratio(sf_dir: str):
    """Per-page hapax-legomena ratio over the reference-locked postings:
    distinct-term count, tf=1 count, and their single pinned IEEE
    division — the classic lexical-richness / OCR-noise signal (noisy
    pages skew hapax-heavy). Exact order-free integer sums; one
    doc-key exchange."""
    from ..stages.relational import grouped_agg

    postings = ingest(read_webpages(sf_dir))["postings"]

    def part(b: pa.Table) -> pa.Table:
        tf = b.column("tf").cast(pa.int64())
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "one": pa.repeat(pa.scalar(1, pa.int64()), b.num_rows),
             "hap": pc.equal(tf, 1).cast(pa.int64())}
        )

    agg = grouped_agg(
        postings.map_batches(part, batch_format="pyarrow"),
        ["doc_id"],
        [("n_terms", "one", "sum"), ("n_hapax", "hap", "sum")],
    )

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        nt = b.column("n_terms").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nh = b.column("n_hapax").to_numpy(zero_copy_only=False).astype(
            np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(nt == 0.0, 0.0, nh / nt)
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "n_terms": b.column("n_terms"),
             "n_hapax": b.column("n_hapax"),
             "hapax_ratio": pa.array(ratio, pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_label_propagation(sf_dir: str):
    """Bounded-round LPA community detection
    (stages/graph.label_propagation, 3 synchronous rounds, (count DESC,
    label ASC) tie-break) over the deterministic doc multigraph; the
    SQL mirror unrolls the rounds as materialized ROW_NUMBER() CTEs,
    the kcore pattern."""
    from ..stages.graph import label_propagation

    return label_propagation(_doc_multigraph(sf_dir), rounds=3)


def q_char_profile(sf_dir: str):
    """Per-document byte-frequency profile (stages/textstats.
    char_profile): zero-copy Arrow-buffer bincount over doc_idx·256+byte
    — total bytes, distinct bytes, modal count and modal character
    (smallest on ties) for pure-ASCII docs; SQL replays it with a
    per-character split + ROW_NUMBER window."""
    from ..stages.textstats import char_profile

    return char_profile(_read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def q_order_gaps(sf_dir: str):
    """Repeat-purchase interval stats (stages/relational.
    consecutive_gaps): per customer, consecutive order-date differences
    under the (date, orderkey) total order — n/min/max/sum in exact
    integer microseconds, single-order customers excluded; the SQL LAG
    window replays it exactly."""
    from ..stages.relational import consecutive_gaps

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_orderkey"])
    return consecutive_gaps(orders, "o_custkey", "o_orderdate",
                            "o_orderkey")
