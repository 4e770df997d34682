"""Search scoring semantics (A3/K1/K2) + deletion-cascade compaction (D3)."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.pipelines.compact import delete_urls
from ocr_search_ray.stages.search import search


def _pages(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "page_idx": pa.array([r[2] for r in rows], pa.int32()),
                "img_path": pa.array([f"{r[0]}.png" for r in rows], pa.string()),
            }
        )
    )


def _postings(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "term": pa.array([r[1] for r in rows], pa.string()),
                "tf": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def test_max_merge_not_sum():
    pages = _pages([("d1", "u1", 1), ("d2", "u2", 1)])
    postings = _postings(
        [("d1", "spark", 4), ("d1", "merge", 9), ("d2", "spark", 5)]
    )
    out = search(postings, pages, "spark merge", max_return=10)
    scores = dict(zip(out.column("doc_id").to_pylist(), out.column("score").to_pylist()))
    assert scores == {"d1": 9, "d2": 5}  # max, not 13


def test_rank_desc_and_topk_truncation():
    pages = _pages([(f"d{i}", f"u{i}", 1) for i in range(5)])
    postings = _postings([(f"d{i}", "spark", i + 1) for i in range(5)])
    out = search(postings, pages, "spark", max_return=3)
    assert out.column("score").to_pylist() == [5, 4, 3]


def test_expanded_search_scores_neighbor_docs_tcr_times_tf():
    """The reference's disabled expansion path (TermMatcher.class.js:55-80):
    a doc containing only a CORRELATED term scores tcr*tf; originals keep
    weight 1; per-doc merge is max."""
    from ocr_search_ray.stages.correlate import term_correlations
    from ocr_search_ray.stages.search import expanded_search

    pages = _pages([("d1", "u1", 1), ("d2", "u2", 1), ("d3", "u3", 1)])
    # spark and flink co-occur in d1/d2 → high tcr; d3 has only flink
    postings = _postings(
        [("d1", "spark", 2), ("d1", "flink", 2),
         ("d2", "spark", 3), ("d2", "flink", 3),
         ("d3", "flink", 4)]
    )
    corr = term_correlations(postings, min_df=1).materialize()
    tcr = {
        (r["term1"], r["term2"]): r["tcr"] for r in corr.take_all()
    }[("spark", "flink")]
    assert 0.0 < tcr <= 1.0

    out = expanded_search(postings, pages, corr, "spark", max_return=10)
    scores = dict(zip(out.column("doc_id").to_pylist(),
                      out.column("score").to_pylist()))
    # originals at weight 1: d1=2, d2=3; neighbor-only doc d3 = tcr*4;
    # d1/d2 ALSO match flink — max(1*tf, tcr*tf) = tf since tcr ≤ 1
    assert scores["d1"] == 2.0 and scores["d2"] == 3.0
    assert scores["d3"] == tcr * 4.0

    # no-expansion corpus sanity: plain search never returns d3 for spark
    plain = search(postings, pages, "spark", max_return=10)
    assert "d3" not in plain.column("doc_id").to_pylist()


def test_delete_cascade_removes_pages_and_postings():
    pages = _pages([("d1", "u1", 1), ("d2", "u2", 1), ("d3", "u2", 2)])
    postings = _postings([("d1", "x", 1), ("d2", "y", 2), ("d3", "z", 3)])
    pages2, postings2 = delete_urls(pages, postings, {"u2"})
    assert {r["doc_id"] for r in pages2.take_all()} == {"d1"}
    assert {r["doc_id"] for r in postings2.take_all()} == {"d1"}


def test_on_disk_compaction_rewrites_only_affected_partitions(tmp_path):
    """Partition-pruned deletion: untouched partitions keep their exact
    files (not reread into new bytes); affected ones are filtered and
    atomically rewritten with a stage='compact' manifest row; the surviving
    data equals a full filter."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_search_ray.pipelines.compact import compact_delete_on_disk
    from ocr_search_ray.pipelines.ingest import ingest_resumable
    from ocr_search_ray.sources.webpages import read_webpages
    from ocr_search_ray.state import manifest as m

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    webpages = read_webpages("/root/testdata/sf0.001").materialize()
    # sort by url so fragments have DISJOINT url ranges -> stats can prune
    ordered = webpages.sort("url")
    for i, sub in enumerate(ordered.split(4)):
        pq.write_table(
            pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
            input_dir / f"frag-{i}.parquet",
        )
    ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2)

    # delete urls that live ONLY in partition 0 (smallest urls)
    part0 = pq.read_table(str(out_dir / "pages" / "part=00000"))
    victims = set(sorted(set(part0.column("url").to_pylist()))[:5])
    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(str(out_dir / "*" / "part=*" / "*.parquet"))
    }
    n_pages_before = rd.read_parquet(str(out_dir / "pages")).count()

    stats = compact_delete_on_disk(str(out_dir), victims)
    assert stats["rewritten"] == 1
    assert stats["pruned_by_stats"] >= 2  # disjoint ranges prune the rest
    assert stats["pages_removed"] == len(victims)

    # untouched partitions: identical files
    for f, mtime in before.items():
        if "part=00000" not in f:
            assert os.path.exists(f) and os.stat(f).st_mtime_ns == mtime

    pages_after = rd.read_parquet(str(out_dir / "pages"))
    urls_after = {r["url"] for r in pages_after.take_all()}
    assert urls_after.isdisjoint(victims)
    assert pages_after.count() == n_pages_before - len(victims)
    # postings cascade: no surviving posting references a doomed doc_id
    doomed_ids = set(
        part0.filter(
            pa.compute.is_in(part0.column("url"),
                             value_set=pa.array(sorted(victims)))
        ).column("doc_id").to_pylist()
    )
    post_ids = {
        r["doc_id"]
        for r in rd.read_parquet(str(out_dir / "postings")).take_all()
    }
    assert post_ids.isdisjoint(doomed_ids)
    rows = m.read(str(out_dir / "_manifest"))
    stages_in_manifest = set(rows.column("stage").to_pylist())
    assert "compact" in stages_in_manifest

def test_rrf_fuse_integer_lattice():
    """rrf_fuse vs a literal replay: rank order (score desc, id asc),
    union of lists, null rank for absences, 10^9//(60+r) contributions."""
    import pyarrow as pa
    from ocr_search_ray.stages.search import rrf_fuse

    t1 = pa.table({"doc_id": pa.array(["a", "b", "c"]),
                   "score": pa.array([9, 9, 5], pa.int64())})
    t2 = pa.table({"doc_id": pa.array(["c", "d"]),
                   "score": pa.array([7, 2], pa.int64())})
    out = rrf_fuse([t1, t2], ["x", "y"])
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    S = 10**9
    # list x ranks: a=1 (tie 9/9 broken by id), b=2, c=3; list y: c=1, d=2
    assert rows["a"]["rank_x"] == 1 and rows["a"]["rank_y"] is None
    assert rows["b"]["rank_x"] == 2
    assert rows["c"]["rank_x"] == 3 and rows["c"]["rank_y"] == 1
    assert rows["a"]["rrf_units"] == S // 61
    assert rows["c"]["rrf_units"] == S // 63 + S // 61
    assert rows["d"]["rrf_units"] == S // 62
    assert set(rows) == {"a", "b", "c", "d"}
