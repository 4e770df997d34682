"""Incremental on-disk dedup index: build → probe → merge → next batch.

The micro-batch dedup lifecycle (stages/dedup_disk): the corpus's digests
live in bucketed parquet; each arriving batch dedups within itself, anti-
joins the index bucket-pruned, and merges its survivors back atomically.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.dedup_disk import (
    build_digest_index,
    dedup_against_index,
    merge_new_into_digest_index,
)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_incremental_dedup_lifecycle(tmp_path):
    idx = str(tmp_path / "digests")
    corpus = _docs([(i, f"corpus text {i}") for i in range(50)]
                   + [(100 + i, f"corpus text {i}") for i in range(5)])
    build_digest_index(corpus, idx, n_buckets=8)
    assert len(glob.glob(os.path.join(idx, "digest_bucket=*"))) > 1

    # batch 1: 3 fresh, 2 dups-of-corpus, 1 within-batch dup pair
    batch1 = _docs([
        (200, "fresh one"), (201, "fresh two"), (202, "fresh three"),
        (203, "corpus text 7"), (204, "corpus text 8"),
        (205, "twin text"), (206, "twin text"),
    ])
    s1 = dedup_against_index(batch1, idx, n_buckets=8)
    survivors1 = {r["doc_id"] for r in s1.take_all()}
    assert survivors1 == {200, 201, 202, 205}  # min id wins the twin pair

    stats = merge_new_into_digest_index(s1, idx, n_buckets=8)
    assert stats["digests_merged"] == 4

    # batch 2: dups of batch-1 survivors are now caught by the index
    batch2 = _docs([
        (300, "fresh one"),       # dup of merged batch-1 digest
        (301, "twin text"),       # dup of merged twin digest
        (302, "genuinely new"),
        (303, "corpus text 3"),   # still caught
    ])
    survivors2 = {
        r["doc_id"] for r in dedup_against_index(batch2, idx, n_buckets=8).take_all()
    }
    assert survivors2 == {302}

    # idempotent merge: re-merging the same survivors is a no-op on
    # content — batch 2's probe result is unchanged afterwards
    merge_new_into_digest_index(s1, idx, n_buckets=8)
    again = {
        r["doc_id"] for r in dedup_against_index(batch2, idx, n_buckets=8).take_all()
    }
    assert again == {302}


def test_dedup_against_empty_index_dir(tmp_path):
    idx = str(tmp_path / "none")  # no buckets exist yet
    batch = _docs([(1, "a"), (2, "a"), (3, "b")])
    out = {r["doc_id"] for r in dedup_against_index(batch, idx).take_all()}
    assert out == {1, 3}
    merge_new_into_digest_index(
        dedup_against_index(batch, idx), idx
    )
    # the merged dir now catches those digests
    out2 = dedup_against_index(_docs([(9, "a"), (10, "c")]), idx).take_all()
    assert {r["doc_id"] for r in out2} == {10}
