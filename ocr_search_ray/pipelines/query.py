"""Index-backed search: the production query path (SURVEY.md §3.2).

``search()`` in stages/search.py operates on in-memory datasets; this module
is the on-disk variant a deployed engine serves queries from:

1. tokenize the query with the SAME tokenizer as ingest
   (ApiHandler.const.js:31 parity),
2. read ONLY the index buckets that can contain the query terms
   (hash-bucket layout from stages/index.build_index) with a row-level
   ``term IN (...)`` filter pushed into the Parquet scan — a point lookup
   against a 10^12-row index touches ``len(terms)`` buckets, not the corpus,
3. score/merge/rank exactly as the in-memory path,
4. append a search-history event (the reference's ``search_history``
   collection, DbInterface.class.js:477-496).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.tokenizer import Tokenizer
from ..stages.index import N_BUCKETS_DEFAULT, term_bucket
from ..stages.search import (
    DEFAULT_MAX_RETURN,
    join_pages,
    score_hits,
    topk_hits,
    validate_query,
)


def append_search_history(history_dir: str, query: str,
                          term_freqs: dict[str, int],
                          now: dt.datetime | None = None) -> None:
    """Append-only query log: one small parquet per event, atomic rename
    (the engine's version of the Mongo insert at DbInterface.class.js:485)."""
    os.makedirs(history_dir, exist_ok=True)
    now = now or dt.datetime.now()
    table = pa.table(
        {
            "time": pa.array([now], pa.timestamp("us")),
            "search_terms": pa.array([json.dumps(term_freqs)], pa.string()),
            "search_query": pa.array([query], pa.string()),
        }
    )
    tmp = os.path.join(history_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(history_dir, f"evt-{uuid.uuid4().hex}.parquet"))


def _read_pages_for_hits(pages_path: str, hit_ids: list[str],
                         n_buckets: int):
    """Read page records for a hit-id list with point-lookup pruning.

    When ``pages_path`` carries the ``write_pages_indexed`` layout
    (``doc_bucket=`` partition dirs), only the buckets the hit ids hash to
    are opened, with a ``doc_id IN`` predicate pushed into the scan —
    sha256 ids defeat min/max stats on a flat layout, so the hash-bucket
    dirs are what makes the pages side a point lookup instead of a corpus
    scan. A flat layout falls back to the full (column-pruned) read.
    """
    import glob as _glob

    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.index import doc_bucket

    cols = ["url", "page_idx", "img_path", "doc_id"]
    bucket_dirs = sorted(
        _glob.glob(os.path.join(pages_path, "doc_bucket=*")))
    if not bucket_dirs:
        return rd.read_parquet(pages_path, columns=cols)
    wanted = sorted({doc_bucket(d, n_buckets) for d in hit_ids})
    paths = [
        f
        for b in wanted
        for f in sorted(_glob.glob(
            os.path.join(pages_path, f"doc_bucket={b}", "*.parquet")))
    ]
    if not paths:
        return rd.read_parquet(pages_path, columns=cols)
    return rd.read_parquet(
        paths, columns=cols,
        filter=pc.field("doc_id").isin(sorted(hit_ids)),
    )


def _heal_index(index_dir: str) -> None:
    """Best-effort read-side healing: a bucket left aside by a crashed
    merge would otherwise be silently invisible to queries until the next
    merge touches it. No-op on a read-only mount (healing is then the
    writers' job)."""
    from ..state.atomic import recover_all

    try:
        recover_all(index_dir, "term_bucket=*")
    except OSError:
        pass


def search_index(index_dir: str, pages_path: str, query: str,
                 max_return: int = DEFAULT_MAX_RETURN,
                 *, n_buckets: int = N_BUCKETS_DEFAULT,
                 history_dir: str | None = None) -> pa.Table:
    """Query the on-disk bucketed posting index + pages table."""
    import pyarrow.compute as pc
    import ray.data as rd

    validate_query(query, max_return)
    tok = Tokenizer()
    tfs = tok.term_freqs(query)
    if history_dir is not None:
        append_search_history(history_dir, query, tfs)
    terms = sorted(tfs)
    if not terms:
        return pa.table(
            {c: [] for c in ["url", "page_idx", "img_path", "doc_id", "score"]}
        )

    _heal_index(index_dir)
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    # bucket pruning by partition path (only the buckets that can contain a
    # query term are opened) + row pruning via a term predicate pushed into
    # the parquet scan
    import glob as _glob

    paths = [
        f
        for b in buckets
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"term_bucket={b}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table(
            {c: [] for c in ["url", "page_idx", "img_path", "doc_id", "score"]}
        )
    postings = rd.read_parquet(paths, filter=pc.field("term").isin(terms),
                               columns=["doc_id", "term", "tf"])

    hits = score_hits(postings, terms)
    # distributed top-k before the collect — the driver and the pages
    # point-lookup below both see ≤ max_return ids, even for a hot term
    hits_table = topk_hits(hits, max_return)
    if hits_table.num_rows == 0:
        return pa.table(
            {c: [] for c in ["url", "page_idx", "img_path", "doc_id", "score"]}
        )
    pages = _read_pages_for_hits(
        pages_path, hits_table.column("doc_id").to_pylist(), n_buckets
    )
    import pyarrow.compute as pc2

    scored = join_pages(hits_table, pages)  # ≤ max_return rows
    out = pa.Table.from_pandas(scored.to_pandas(), preserve_index=False)
    out = out.take(pc2.sort_indices(
        out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )[:max_return])
    return out.select(["url", "page_idx", "img_path", "doc_id", "score"])


def write_doc_lengths(postings, out_dir: str) -> None:
    """Persist the per-doc token-length sidecar a BM25 index needs
    (Lucene's norms analogue): (doc_id, dl = Σtf) plus one stats row
    (n_postings total) — written once at build time so the query path
    never re-aggregates the posting stream."""
    from ..stages.relational import grouped_agg

    grouped_agg(postings, ["doc_id"], [("dl", "tf", "sum")]).write_parquet(
        out_dir, compression="zstd"
    )


def search_index_bm25(index_dir: str, pages_path: str, dl_path: str,
                      n_docs: int, query: str,
                      max_return: int = DEFAULT_MAX_RETURN,
                      *, n_buckets: int = N_BUCKETS_DEFAULT,
                      k1: float = 1.2, b: float = 0.75,
                      history_dir: str | None = None) -> pa.Table:
    """BM25 ranking over the ON-DISK layout: bucket-pruned posting read
    (only the query terms' ``term_bucket`` dirs, term predicate pushed
    down), df per term as block partials reduced into a ≤|query|-entry
    driver dict (query-bounded, so a grouped exchange + join would buy
    nothing), per-doc lengths joined from the :func:`write_doc_lengths`
    sidecar (a distributed ``cluster_join`` — the dl table is corpus-sized
    and never collects), integer-quantized scores, distributed top-k,
    pages point-lookup. ``n_docs`` is the corpus page count (a build-time
    constant, like the sidecar)."""
    import glob as _glob

    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.relational import cluster_apply, cluster_join, grouped_agg
    from ..stages.search import _RESULT_COLUMNS, join_pages, topk_hits

    validate_query(query, max_return)
    tok = Tokenizer()
    tfs = tok.term_freqs(query)
    if history_dir is not None:
        append_search_history(history_dir, query, tfs)
    terms = sorted(tfs)
    empty = pa.table({c: [] for c in _RESULT_COLUMNS})
    if not terms:
        return empty

    _heal_index(index_dir)
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    paths = [
        f
        for bkt in buckets
        for f in sorted(_glob.glob(
            os.path.join(index_dir, f"term_bucket={bkt}", "*.parquet")))
    ]
    if not paths:
        return empty
    hits_tf = rd.read_parquet(paths, filter=pc.field("term").isin(terms),
                              columns=["doc_id", "term", "tf"])

    # avgdl from the sidecar (one cheap partial-sum pass over two thin
    # int columns — or store it as a stats row at build time)
    dl_ds = rd.read_parquet(dl_path, columns=["doc_id", "dl"])

    def dl_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"t": pa.array([pc.sum(batch.column("dl")).as_py() or 0],
                           pa.int64())}
        )

    total_tf = sum(
        r["t"] for r in dl_ds.map_batches(
            dl_partial, batch_format="pyarrow").take_all()
    )
    avgdl = float(total_tf) / float(n_docs)

    hits_tf = hits_tf.materialize()  # two consumers: df partials + dl join

    def df_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("term").aggregate([("tf", "count")])

    df: dict[str, int] = {}
    for r in hits_tf.map_batches(
            df_partial, batch_format="pyarrow").take_all():
        df[r["term"]] = df.get(r["term"], 0) + r["tf_count"]
    terms_arr = pa.array(terms, pa.string())
    df_arr = pa.array([float(df.get(t, 0)) for t in terms], pa.float64())

    with_dl = cluster_join(
        hits_tf, dl_ds, ["doc_id"],
        left_types={"doc_id": pa.string(), "term": pa.string(),
                    "tf": pa.int64()},
        right_types={"dl": pa.int64()},
    )

    nd = float(n_docs)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def score_units(batch: pa.Table) -> pa.Table:
        dfd = pc.take(
            df_arr, pc.index_in(batch.column("term"), value_set=terms_arr)
        )
        tfd = pc.cast(batch.column("tf"), pa.float64())
        dld = pc.cast(batch.column("dl"), pa.float64())
        idf = pc.ln(
            pc.add(
                pc.divide(
                    pc.add(pc.subtract(pa.scalar(nd, pa.float64()), dfd),
                           0.5),
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
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pc.cast(
                    pc.trunc(pc.multiply(bm25, 1000000000.0)), pa.int64()
                ),
            }
        )

    def block_sum(block: pa.Table) -> pa.Table:
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
        block_sum,
    )
    hits_table = topk_hits(doc_scores, max_return)
    if hits_table.num_rows == 0:
        return empty
    pages = _read_pages_for_hits(
        pages_path, hits_table.column("doc_id").to_pylist(), n_buckets
    )
    import pyarrow.compute as pc3

    out = pa.Table.from_pandas(
        join_pages(hits_table, pages).to_pandas(), preserve_index=False
    )
    out = out.take(pc3.sort_indices(
        out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )[:max_return])
    return out.select(_RESULT_COLUMNS)
