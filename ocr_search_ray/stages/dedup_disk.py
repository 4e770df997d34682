"""Incremental exact-dedup against an on-disk digest index.

At 10^12 documents you never re-dedup the corpus per sync cycle: the
corpus's content digests live in a bucketed parquet index (the dedup
analogue of ``index.build_index``'s posting layout and the same
micro-batch lifecycle as ``index.merge_into_index`` /
``jobs/ingest_job.py``), and each arriving batch

1. hashes batch-locally (``functions.hashing.sha256_hex_column``),
2. dedups WITHIN the batch (min-id representative, one digest-key
   exchange),
3. anti-joins the index — reading ONLY the bucket dirs the new digests
   hash to (``crc32(digest) % n_buckets`` partition dirs; cost ∝ affected
   buckets, not corpus),
4. merges the survivors' digests back bucket-locally (atomic tmp-dir
   swap; idempotent — rerunning a merge cannot double-insert a digest).

Driver state: the affected-bucket id set (≤ n_buckets ints). Everything
else is datasets and bucket-local Ray tasks.
"""

from __future__ import annotations

import pyarrow as pa

N_BUCKETS_DEFAULT = 64


def digest_bucket(digest: str, n_buckets: int = N_BUCKETS_DEFAULT) -> int:
    """Same pure-crc32 recipe as ``index.term_bucket`` — the build and the
    probe MUST agree on this function."""
    import zlib

    return zlib.crc32(digest.encode()) % n_buckets


def _hash_and_bucket(id_col: str, text_col: str, n_buckets: int):
    from ..functions.hashing import crc32_column, sha256_hex_column

    def f(batch: pa.Table) -> pa.Table:
        digests = sha256_hex_column(batch.column(text_col))
        # Digests are fixed-width 64-hex → crc32_column takes the fully
        # vectorized table-driven path (bit-exact with digest_bucket()).
        buckets = pa.array(
            (crc32_column(digests) % n_buckets).astype("int32"), pa.int32()
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_sha256": digests,
                "digest_bucket": buckets,
            }
        )

    return f


def build_digest_index(documents, out_dir: str, *,
                       n_buckets: int = N_BUCKETS_DEFAULT,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> None:
    """Write the corpus digest index: one row per DISTINCT text digest
    (min-id representative), partitioned ``digest_bucket=N`` dirs, zstd."""
    from .relational import cluster_apply

    hashed = documents.select_columns([id_col, text_col]).map_batches(
        _hash_and_bucket(id_col, text_col, n_buckets),
        batch_format="pyarrow",
    )

    def block_reps(block: pa.Table) -> pa.Table:
        agg = block.group_by(["text_sha256", "digest_bucket"]).aggregate(
            [(id_col, "min")]
        )
        return pa.table(
            {
                "text_sha256": agg.column("text_sha256"),
                "rep_id": agg.column(f"{id_col}_min"),
                "digest_bucket": agg.column("digest_bucket"),
            }
        )

    cluster_apply(hashed, ["text_sha256"], block_reps).write_parquet(
        out_dir, partition_cols=["digest_bucket"], compression="zstd"
    )


def _affected_buckets(hashed_uniques) -> list[int]:
    """Distinct bucket ids of a batch — per-block distinct first, so the
    driver sees ≤ blocks × n_buckets rows (parallelism-bounded)."""
    rows = (
        hashed_uniques.select_columns(["digest_bucket"])
        .map_batches(
            lambda b: b.group_by(["digest_bucket"]).aggregate([]),
            batch_format="pyarrow",
        )
        .take_all()
    )
    return sorted({r["digest_bucket"] for r in rows})


def dedup_against_index(new_docs, index_dir: str, *,
                        n_buckets: int = N_BUCKETS_DEFAULT,
                        id_col: str = "doc_id", text_col: str = "text"):
    """→ (id_col, text_sha256, digest_bucket): the arriving batch's docs
    that are batch-unique (min id per digest) AND absent from the index.

    The index side is bucket-pruned: only ``digest_bucket=N`` dirs the
    batch's digests hash to are opened; the membership test is an anti
    ``cluster_join`` on the digest (both sides datasets — no digest set
    ever lands on the driver)."""
    import glob as _glob
    import os

    import ray.data as rd

    from .relational import cluster_apply, cluster_join

    id_type = dict(
        zip(new_docs.schema().names, new_docs.schema().types)
    )[id_col]

    hashed = new_docs.select_columns([id_col, text_col]).map_batches(
        _hash_and_bucket(id_col, text_col, n_buckets),
        batch_format="pyarrow",
    )

    def block_min(block: pa.Table) -> pa.Table:
        agg = block.group_by(["text_sha256", "digest_bucket"]).aggregate(
            [(id_col, "min")]
        )
        return pa.table(
            {
                id_col: agg.column(f"{id_col}_min"),
                "text_sha256": agg.column("text_sha256"),
                "digest_bucket": agg.column("digest_bucket"),
            }
        )

    uniq = cluster_apply(hashed, ["text_sha256"], block_min).materialize()

    buckets = _affected_buckets(uniq)
    paths = [
        f
        for b in buckets
        for f in sorted(_glob.glob(
            os.path.join(index_dir, f"digest_bucket={b}", "*.parquet")))
    ]
    if not paths:
        return uniq
    index_side = rd.read_parquet(paths, columns=["text_sha256"])
    # materialized: the result is batch-sized, and a lazy plan would keep
    # reading the very bucket files a subsequent merge atomically rewrites
    return cluster_join(
        uniq, index_side, ["text_sha256"],
        left_types={id_col: id_type, "text_sha256": pa.string(),
                    "digest_bucket": pa.int32()},
        right_types={},
        how="anti",
    ).materialize()


def delete_reps_from_digest_index(index_dir: str, doomed_ids) -> dict:
    """Delete docs from the digest index — the D3 cascade for exact dedup.

    Semantics: a digest row whose REPRESENTATIVE is deleted must go, so
    future identical content is re-admitted once its surviving copy is
    gone (keeping the row would silently suppress a document that no
    longer exists anywhere). ``rep_id`` is not the bucket key, so this is
    a full parallel sweep over the bucket dirs (one anti-filter task per
    bucket, aside swap) — the tombstone-wave operation, not the per-batch
    path. Returns counters."""
    import glob as _glob
    import os

    import pyarrow.compute as pc
    import ray

    from ..state.atomic import recover_all

    recover_all(index_dir, "digest_bucket=*")
    ids = sorted(set(
        doomed_ids.to_pylist() if hasattr(doomed_ids, "to_pylist")
        else doomed_ids
    ))
    ids_ref = ray.put(pa.array(ids))

    @ray.remote
    def rewrite(bucket_dir: str, ids_v) -> int:
        import os as _os
        import shutil as _sh

        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import swap_dir_in

        table = pq2.read_table(bucket_dir)
        keep = pc.invert(pc.is_in(
            table.column("rep_id"),
            value_set=ids_v.cast(table.column("rep_id").type),
        ))
        kept = table.filter(keep)
        removed = table.num_rows - kept.num_rows
        if removed == 0:
            return 0
        tmp = bucket_dir + ".tmp"
        _sh.rmtree(tmp, ignore_errors=True)
        _os.makedirs(tmp)
        pq2.write_table(kept, _os.path.join(tmp, "part-0.parquet"),
                        compression="zstd")
        swap_dir_in(tmp, bucket_dir)
        return removed

    futures = [
        rewrite.remote(d, ids_ref)
        for d in sorted(_glob.glob(
            os.path.join(index_dir, "digest_bucket=*")))
    ]
    removed = ray.get(futures)
    return {"buckets_rewritten": sum(1 for r in removed if r),
            "digests_removed": sum(removed)}


def merge_new_into_digest_index(survivors, index_dir: str, *,
                                n_buckets: int = N_BUCKETS_DEFAULT,
                                id_col: str = "doc_id") -> dict:
    """Merge accepted digests into the index bucket-locally (atomic swap).

    Idempotent: each bucket merge dedups on digest keeping the EXISTING
    row first — rerunning after a crash cannot double-insert. Only
    affected buckets are touched. Returns counters."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import ray

    staging = tempfile.mkdtemp(prefix="osr-dedupidx-", dir="/tmp")
    try:
        def to_index_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "text_sha256": batch.column("text_sha256").cast(
                        pa.string()),
                    "rep_id": batch.column(id_col),
                    "digest_bucket": batch.column("digest_bucket"),
                }
            )

        survivors.map_batches(
            to_index_rows, batch_format="pyarrow"
        ).write_parquet(
            staging, partition_cols=["digest_bucket"], compression="zstd"
        )

        @ray.remote
        def merge_bucket(bucket_dir: str, new_dir: str) -> int:
            import os

            import pyarrow.parquet as pq2

            new_rows = pq2.read_table(
                new_dir, columns=["text_sha256", "rep_id"])
            # decode dictionary columns to their VALUE type (int64 rep_id
            # stays int64 — forcing pa.string() here would make the concat
            # with the existing bucket's int64 column raise)
            new_rows = pa.table(
                {
                    n: (new_rows.column(n).cast(
                            new_rows.column(n).type.value_type)
                        if pa.types.is_dictionary(new_rows.column(n).type)
                        else new_rows.column(n))
                    for n in new_rows.column_names
                }
            )
            parts = []
            if os.path.isdir(bucket_dir):
                parts.append(pq2.read_table(
                    bucket_dir, columns=["text_sha256", "rep_id"]))
            parts.append(new_rows)
            both = pa.concat_tables(parts)
            # keep-first per digest: existing rows precede new ones, so a
            # rerun of the same merge is a no-op
            agg = both.group_by("text_sha256", use_threads=False).aggregate(
                [("rep_id", "first")]
            )
            merged = pa.table(
                {
                    "text_sha256": agg.column("text_sha256"),
                    "rep_id": agg.column("rep_id_first"),
                }
            ).sort_by([("text_sha256", "ascending")])
            # Crash-safe swap: write ONE merged file and os.replace() it in
            # (atomic on POSIX). The bucket dir is never absent: before the
            # replace it holds the old files, after it the merged superset
            # plus (briefly) the old subset files — duplicate digests are
            # harmless to the anti-join membership test and the next merge's
            # keep-first compacts them. The old rmtree-then-rename pattern
            # had a window where the bucket vanished entirely (ADVICE r3).
            os.makedirs(bucket_dir, exist_ok=True)
            old_files = [f for f in os.listdir(bucket_dir)
                         if f.endswith(".parquet")]
            tmp_file = os.path.join(bucket_dir, ".merged.parquet.tmp")
            pq2.write_table(merged, tmp_file, compression="zstd")
            merged_name = "merged-0.parquet"
            os.replace(tmp_file, os.path.join(bucket_dir, merged_name))
            for f in old_files:
                if f != merged_name:
                    try:
                        os.remove(os.path.join(bucket_dir, f))
                    except OSError:
                        pass
            return new_rows.num_rows

        futures = []
        affected = sorted(
            _glob.glob(os.path.join(staging, "digest_bucket=*")))
        for new_dir in affected:
            part = os.path.basename(new_dir)
            futures.append(
                merge_bucket.remote(os.path.join(index_dir, part), new_dir))
        merged_rows = sum(ray.get(futures))
        return {"buckets_affected": len(affected),
                "digests_merged": merged_rows}
    finally:
        shutil.rmtree(staging, ignore_errors=True)
