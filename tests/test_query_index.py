"""On-disk index query path: bucket pruning, pushdown, history sink."""

import json

import pyarrow.parquet as pq
import ray.data as rd

from ocr_search_ray.pipelines.ingest import ingest
from ocr_search_ray.pipelines.query import append_search_history, search_index
from ocr_search_ray.sources.webpages import read_webpages
from ocr_search_ray.stages.index import build_index
from ocr_search_ray.stages.search import search

SF_DIR = "/root/testdata/sf0.001"


def test_index_query_matches_in_memory_search(tmp_path):
    stages = ingest(read_webpages(SF_DIR))
    pages = stages["pages"].materialize()
    postings = stages["postings"].materialize()

    index_dir = str(tmp_path / "index")
    pages_dir = str(tmp_path / "pages")
    build_index(postings, out_dir=index_dir)
    pages.write_parquet(pages_dir)

    query = "Spark MERGE data!"
    expected = search(postings, pages, query, max_return=15)
    got = search_index(index_dir, pages_dir, query, max_return=15,
                       history_dir=str(tmp_path / "history"))
    assert got.to_pydict() == expected.to_pydict()

    # history event was appended with the tokenized terms
    hist = rd.read_parquet(str(tmp_path / "history")).take_all()
    assert len(hist) == 1
    terms = json.loads(hist[0]["search_terms"])
    assert terms == {"spark": 1, "merge": 1, "datum": 1}
    assert hist[0]["search_query"] == query


def test_history_appends_accumulate(tmp_path):
    d = str(tmp_path / "h")
    append_search_history(d, "q1", {"a": 1})
    append_search_history(d, "q2", {"b": 2})
    rows = rd.read_parquet(d).take_all()
    assert sorted(r["search_query"] for r in rows) == ["q1", "q2"]


def test_bucketed_index_layout(tmp_path):
    stages = ingest(read_webpages(SF_DIR))
    index_dir = str(tmp_path / "index")
    build_index(stages["postings"], out_dir=index_dir)
    # partition dirs exist and carry the bucket key
    import glob
    import os

    parts = glob.glob(os.path.join(index_dir, "term_bucket=*"))
    assert len(parts) > 1
    # a file inside a bucket holds only terms hashing to that bucket
    from ocr_search_ray.pipelines.query import term_bucket

    some = parts[0]
    bucket = int(some.split("=")[-1])
    f = glob.glob(os.path.join(some, "*.parquet"))[0]
    terms = set(pq.read_table(f, columns=["term"]).column("term").to_pylist())
    assert terms and all(term_bucket(t) == bucket for t in terms)


def test_index_query_cjk_and_missing_terms(tmp_path):
    """Multi-bucket queries, CJK terms, and terms absent from the index."""
    stages = ingest(read_webpages(SF_DIR))
    postings = stages["postings"].materialize()
    pages = stages["pages"].materialize()
    index_dir = str(tmp_path / "index")
    pages_dir = str(tmp_path / "pages")
    build_index(postings, out_dir=index_dir)
    pages.write_parquet(pages_dir)

    # a query whose terms hash to multiple buckets; in-memory path is oracle
    q = "storage layer merge checkpoint"
    got = search_index(index_dir, pages_dir, q, max_return=10)
    expected = search(postings, pages, q, max_return=10)
    assert got.to_pydict() == expected.to_pydict()

    # nonexistent vocabulary → 0 hits, no error
    got = search_index(index_dir, pages_dir, "zzqqxx nonexistentterm", max_return=5)
    assert got.num_rows == 0

    # CJK query tokenizes through the same chain (unigrams+bigrams); corpus
    # is ASCII so no hits, but the path must not error
    got = search_index(index_dir, pages_dir, "中文查詢", max_return=5)
    assert got.num_rows == 0


def test_merge_into_index_matches_full_build(tmp_path):
    """Incremental maintenance: build on most docs, merge the rest — result
    rows equal a from-scratch full build; buckets receiving no new terms
    keep their exact files (never read or rewritten)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_search_ray.stages.index import merge_into_index

    postings = ingest(read_webpages(SF_DIR))["postings"].materialize()

    # increment = postings of 2 specific docs (few terms -> few buckets)
    some_docs = sorted({r["doc_id"] for r in postings.take_all()})[:2]
    docs_arr = pa.array(some_docs, pa.string())

    def split(keep_in):
        def f(b):
            mask = pc.is_in(b.column("doc_id"), value_set=docs_arr)
            return b.filter(mask if keep_in else pc.invert(mask))
        return f

    base = postings.map_batches(split(False), batch_format="pyarrow")
    increment = postings.map_batches(split(True), batch_format="pyarrow")
    assert increment.count() > 0

    inc_dir = tmp_path / "inc"
    full_dir = tmp_path / "full"
    build_index(base, str(inc_dir))
    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(str(inc_dir / "term_bucket=*" / "*.parquet"))
    }
    stats = merge_into_index(increment, str(inc_dir))
    assert 0 < stats["buckets_affected"] < stats["buckets_total"]

    build_index(postings, str(full_dir))

    def rows(d):
        return sorted(
            (r["doc_id"], r["term"], r["tf"])
            for r in rd.read_parquet(str(d)).take_all()
        )

    assert rows(inc_dir) == rows(full_dir)
    # every pre-existing file in a bucket the increment didn't touch is
    # bit-for-bit untouched (same inode mtime — never read+rewritten)
    inc_terms = {r["term"] for r in increment.take_all()}
    from ocr_search_ray.stages.index import term_bucket

    affected_buckets = {f"term_bucket={term_bucket(t)}" for t in inc_terms}
    assert len(affected_buckets) == stats["buckets_affected"]
    n_untouched = 0
    for f, mtime in before.items():
        bucket = os.path.basename(os.path.dirname(f))
        if bucket not in affected_buckets:
            assert os.stat(f).st_mtime_ns == mtime, f"{f} was rewritten"
            n_untouched += 1
    assert n_untouched > 0


def test_search_index_with_bucketed_pages_point_lookup(tmp_path):
    """The pages side of the query path prunes too: with the
    write_pages_indexed layout only the hit ids' hash buckets are opened
    (sha256 ids defeat min/max stats on a flat layout), and results are
    byte-identical to the flat-layout query."""
    import glob

    from ocr_search_ray.stages.index import write_pages_indexed

    stages = ingest(read_webpages(SF_DIR))
    pages = stages["pages"].materialize()
    postings = stages["postings"].materialize()

    idx = tmp_path / "idx"
    flat = tmp_path / "pages_flat"
    bucketed = tmp_path / "pages_bucketed"
    build_index(postings, str(idx))
    pages.write_parquet(str(flat), compression="zstd")
    write_pages_indexed(pages, str(bucketed))

    q = "Spark MERGE data!"
    res_flat = search_index(str(idx), str(flat), q, max_return=10)
    res_bucketed = search_index(str(idx), str(bucketed), q, max_return=10)
    assert res_flat.equals(res_bucketed)
    assert res_flat.num_rows == 10

    # pruning is real: the hit set hashes to far fewer buckets than exist
    from ocr_search_ray.stages.index import doc_bucket

    n_dirs = len(glob.glob(str(bucketed / "doc_bucket=*")))
    hit_buckets = {doc_bucket(d) for d in res_flat.column("doc_id").to_pylist()}
    assert len(hit_buckets) < n_dirs
