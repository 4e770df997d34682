"""Crash-safe directory swaps (state/atomic): every crash point of a
bucket/partition rewrite leaves recoverable state, and the writers heal
aside dirs before reading them as merge input."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ocr_search_ray.state.atomic import recover_all, recover_aside, swap_dir_in


def _mkdir_with(path, name, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({"v": pa.array(rows, pa.int64())}),
                   os.path.join(path, name))


def test_swap_and_recovery_protocol(tmp_path):
    final = str(tmp_path / "bucket")
    _mkdir_with(final, "part-0.parquet", [1, 2])

    # normal swap: new content in, aside gone
    tmp = final + ".tmp"
    _mkdir_with(tmp, "part-0.parquet", [3])
    swap_dir_in(tmp, final)
    assert pq.read_table(final).column("v").to_pylist() == [3]
    assert not os.path.isdir(final + ".old")

    # crash window: old renamed aside, new never renamed in
    os.rename(final, final + ".old")
    assert not os.path.isdir(final)
    assert recover_aside(final)  # healed
    assert pq.read_table(final).column("v").to_pylist() == [3]

    # stale aside next to a completed swap → dropped, final untouched
    _mkdir_with(final + ".old", "part-0.parquet", [99])
    assert not recover_aside(final)
    assert not os.path.isdir(final + ".old")
    assert pq.read_table(final).column("v").to_pylist() == [3]

    # recover_all heals many at once
    for i in range(3):
        _mkdir_with(str(tmp_path / f"part={i}.old"), "p.parquet", [i])
    assert recover_all(str(tmp_path), "part=*") == 3
    assert sorted(os.path.basename(p)
                  for p in glob.glob(str(tmp_path / "part=*"))) == [
        "part=0", "part=1", "part=2"]


def test_query_path_heals_crashed_bucket(tmp_path):
    """A search against an index whose bucket sits aside (mid-crash) must
    heal it and return that bucket's hits — not silently miss them."""
    from ocr_search_ray.functions.tokenizer import Tokenizer
    from ocr_search_ray.pipelines.query import search_index
    from ocr_search_ray.stages.index import build_index

    idx = str(tmp_path / "idx")
    term = next(iter(Tokenizer().term_freqs("zebra")))
    build_index(
        rd.from_arrow(pa.table({"doc_id": pa.array(["d1"]),
                                "term": pa.array([term]),
                                "tf": pa.array([2], pa.int64())})),
        out_dir=idx,
    )
    (bucket,) = glob.glob(os.path.join(idx, "term_bucket=*"))
    os.rename(bucket, bucket + ".old")

    pages_dir = str(tmp_path / "pages")
    rd.from_arrow(
        pa.table({"doc_id": pa.array(["d1"]), "url": pa.array(["u1"]),
                  "page_idx": pa.array([0], pa.int32()),
                  "img_path": pa.array(["d1.png"])})
    ).write_parquet(pages_dir)
    res = search_index(idx, pages_dir, "zebra", max_return=5)
    assert res.column("doc_id").to_pylist() == ["d1"]
    assert os.path.isdir(bucket) and not os.path.isdir(bucket + ".old")


def test_index_merge_heals_crashed_bucket(tmp_path):
    """A bucket left aside by a crashed merge must be restored BEFORE the
    next merge reads it — its postings survive into the merged output."""
    from ocr_search_ray.functions.tokenizer import Tokenizer
    from ocr_search_ray.stages.index import build_index, merge_into_index
    from ocr_search_ray.pipelines.query import search_index

    idx = str(tmp_path / "idx")

    def postings(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows]),
                    "term": pa.array([r[1] for r in rows]),
                    "tf": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        )

    term = next(iter(Tokenizer().term_freqs("zebra")))
    build_index(postings([("d1", term, 3), ("d2", "other", 1)]), out_dir=idx)

    # simulate the crash window: the term's bucket is aside, not in place
    (bucket,) = {
        os.path.dirname(f)
        for f in glob.glob(os.path.join(idx, "term_bucket=*", "*.parquet"))
        if term in pq.read_table(f).column("term").to_pylist()
    }
    os.rename(bucket, bucket + ".old")

    merge_into_index(postings([("d3", term, 5)]), idx)

    pages = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2", "d3"]),
                "url": pa.array(["u1", "u2", "u3"]),
                "page_idx": pa.array([0, 0, 0], pa.int32()),
                "img_path": pa.array(["d1.png", "d2.png", "d3.png"]),
            }
        )
    ).materialize()
    pages_dir = str(tmp_path / "pages")
    pages.write_parquet(pages_dir)
    res = search_index(idx, pages_dir, "zebra", max_return=10)
    # BOTH the pre-crash posting (d1) and the merged one (d3) survive
    assert set(res.column("doc_id").to_pylist()) == {"d1", "d3"}
