"""Regression tests for the round-3 ADVICE findings.

1. sha256_hex_column: large_string columns (int64 offsets) must hash
   correctly — the int32 buffer walk silently read wrong slices.
2. dedup_disk/neardup_disk merge_bucket: the swap must be crash-safe —
   the bucket dir is never absent, and stale subset files (a crash
   between the replace and the cleanup) must not change results.
3. neardup_disk band/shingle fns: a batch whose docs ALL have empty
   minhash signatures must still emit a correctly-TYPED doc_id column.
4. minhash_lsh_pairs: min_jaccard_pct == 0 is not representable by the
   collect-free verify and must be rejected at entry.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pytest
import ray.data as rd


def test_sha256_hex_column_large_string_matches_per_row():
    from ocr_search_ray.functions.hashing import sha256_hex_column

    texts = ["", "alpha", "べんきょう", None, "x" * 5000, "alpha"]
    expect = [
        hashlib.sha256((t or "").encode()).hexdigest() for t in texts
    ]
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(texts, typ)
        got = sha256_hex_column(col).to_pylist()
        assert got == expect, typ
        # sliced views exercise non-zero offsets too
        got_tail = sha256_hex_column(col.slice(2)).to_pylist()
        assert got_tail == expect[2:], typ


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_digest_merge_is_crash_safe_and_tolerates_stale_files(tmp_path):
    from ocr_search_ray.stages.dedup_disk import (
        build_digest_index,
        dedup_against_index,
        merge_new_into_digest_index,
    )

    idx = str(tmp_path / "digests")
    build_digest_index(
        _docs([(i, f"base {i}") for i in range(20)]), idx, n_buckets=4)

    batch = _docs([(100, "fresh"), (101, "base 3")])
    s = dedup_against_index(batch, idx, n_buckets=4).materialize()
    assert {r["doc_id"] for r in s.take_all()} == {100}
    merge_new_into_digest_index(s, idx, n_buckets=4)

    # the bucket dirs all still exist and contain parquet
    buckets = sorted(glob.glob(os.path.join(idx, "digest_bucket=*")))
    assert buckets
    for b in buckets:
        assert glob.glob(os.path.join(b, "*.parquet")), b

    # simulate a crash between the atomic replace and the stale-file
    # cleanup: duplicate one bucket's merged file under an old-style name
    victim = buckets[0]
    merged = glob.glob(os.path.join(victim, "*.parquet"))[0]
    import shutil

    shutil.copyfile(merged, os.path.join(victim, "000000_stale.parquet"))

    # duplicate digest rows are harmless to the membership probe …
    probe = _docs([(200, "fresh"), (201, "base 3"), (202, "new new")])
    got = {
        r["doc_id"]
        for r in dedup_against_index(probe, idx, n_buckets=4).take_all()
    }
    assert got == {202}

    # … and the next merge compacts them back to one file per bucket
    s2 = dedup_against_index(probe, idx, n_buckets=4).materialize()
    merge_new_into_digest_index(s2, idx, n_buckets=4)
    again = {
        r["doc_id"]
        for r in dedup_against_index(probe, idx, n_buckets=4).take_all()
    }
    assert again == set()


def test_neardup_index_all_short_texts_keeps_id_type(tmp_path):
    """Docs shorter than k words produce empty signatures; the band table
    must still carry an int64 doc_id (not a null-typed column)."""
    from ocr_search_ray.stages.neardup_disk import (
        build_neardup_index,
        merge_new_into_neardup_index,
        neardup_against_index,
    )

    idx = str(tmp_path / "nd")
    shorties = _docs([(1, "hi"), (2, ""), (3, "one two")])  # all < k=3 words
    build_neardup_index(shorties, idx, k=3, n_buckets=4)
    merge_new_into_neardup_index(shorties, idx, k=3, n_buckets=4)

    out = neardup_against_index(
        _docs([(10, "alpha beta gamma delta"), (11, "tiny")]),
        idx, k=3, n_buckets=4,
    )
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    ) if out.count() else None
    assert out.count() == 0
    assert tbl is None

    # mixed batch: short docs skipped, long docs indexed with the right type
    mixed = _docs([(20, "no"), (21, "alpha beta gamma delta epsilon")])
    merge_new_into_neardup_index(mixed, idx, k=3, n_buckets=4)
    hits = neardup_against_index(
        _docs([(30, "alpha beta gamma delta epsilon")]), idx, k=3,
        n_buckets=4,
    ).take_all()
    assert {(r["doc_id"], r["corpus_doc_id"]) for r in hits} == {(30, 21)}


def test_digest_index_delete_readmits_future_identical_content(tmp_path):
    """delete_reps_from_digest_index: once a digest's representative is
    deleted, a future identical document is admitted again (keeping the
    row would suppress content that no longer exists anywhere)."""
    from ocr_search_ray.stages.dedup_disk import (
        build_digest_index,
        dedup_against_index,
        delete_reps_from_digest_index,
        merge_new_into_digest_index,
    )

    idx = str(tmp_path / "digests")
    build_digest_index(
        _docs([(1, "keep me"), (2, "delete me")]), idx, n_buckets=4)

    # suppressed while doc 2 lives
    probe = _docs([(10, "delete me"), (11, "keep me"), (12, "fresh")])
    s = {r["doc_id"]
         for r in dedup_against_index(probe, idx, n_buckets=4).take_all()}
    assert s == {12}

    stats = delete_reps_from_digest_index(idx, [2])
    assert stats["digests_removed"] == 1

    s2 = dedup_against_index(probe, idx, n_buckets=4).materialize()
    assert {r["doc_id"] for r in s2.take_all()} == {10, 12}
    # and re-merging restores suppression under the NEW representative
    merge_new_into_digest_index(s2, idx, n_buckets=4)
    s3 = {r["doc_id"]
          for r in dedup_against_index(probe, idx, n_buckets=4).take_all()}
    assert s3 == set()


def test_neardup_index_delete_cascade(tmp_path):
    """delete_docs_from_neardup_index: a deleted corpus doc stops matching
    immediately (shingle side is the correctness gate, bucket-pruned);
    compact_bands reclaims its stale band rows."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    from ocr_search_ray.stages.neardup_disk import (
        build_neardup_index,
        delete_docs_from_neardup_index,
        neardup_against_index,
    )

    idx = str(tmp_path / "nd")
    text = "alpha beta gamma delta epsilon zeta"
    build_neardup_index(
        _docs([(1, text), (2, "totally different words here now")]),
        idx, k=3, n_buckets=4)

    probe = _docs([(10, text)])
    hits = neardup_against_index(probe, idx, k=3, n_buckets=4).take_all()
    assert {(r["doc_id"], r["corpus_doc_id"]) for r in hits} == {(10, 1)}

    stats = delete_docs_from_neardup_index(idx, [1], n_buckets=4)
    assert stats["shingle_rows_removed"] == 1
    assert stats["shingle_buckets_pruned_to"] == 1  # bucket-pruned
    assert neardup_against_index(probe, idx, k=3, n_buckets=4).count() == 0

    # stale band rows still exist until the opt-in sweep reclaims them
    def band_rows():
        return sum(
            pq.read_table(f).num_rows
            for f in _glob.glob(
                os.path.join(idx, "bands", "*", "*.parquet"))
        )

    before = band_rows()
    stats2 = delete_docs_from_neardup_index(
        idx, [1], n_buckets=4, compact_bands=True)
    assert stats2["band_rows_removed"] > 0
    assert band_rows() == before - stats2["band_rows_removed"]


def test_minhash_lsh_pairs_rejects_nonpositive_threshold():
    from ocr_search_ray.stages.dedup import minhash_lsh_pairs

    docs = _docs([(1, "a b c d"), (2, "a b c d")])
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, min_jaccard_pct=0)
