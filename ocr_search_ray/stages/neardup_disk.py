"""Incremental NEAR-dup detection against an on-disk MinHash band index.

The companion of ``dedup_disk`` (exact) for near-duplicates: at corpus
scale you never re-band the corpus per sync cycle. The index persists,
bucketed for point lookups:

- ``bands/``    — (band, band_sig, doc_id) partitioned by
  ``crc32(band_sig) % n_buckets``: an arriving doc's band signatures
  hash to a handful of bucket dirs, so candidate generation reads
  ~|batch-bands| buckets, not the corpus;
- ``shingles/`` — (doc_id, sh_md5: string — the sorted distinct-shingle
  md5 hexes comma-joined; one fixed-width token per shingle, so the set
  round-trips unambiguously and Acero joins can carry it) partitioned by
  ``crc32(str(doc_id)) % n_buckets``: each candidate's shingle digests,
  so the exact Jaccard verify runs from INDEX DATA ONLY — the corpus
  text is never re-read. (Full 128-bit digests: |∩| of md5 sets equals
  |∩| of shingle sets to the same standard as ``decontaminate``; at
  10^12 docs store a binary blob of sorted uint64 pairs instead.)

Probe output: (doc_id, corpus_doc_id, inter, uni) pairs with
100·inter ≥ pct·uni — the arriving doc against the indexed corpus.
Within-batch pairs are ``minhash_lsh_pairs``'s job. Driver state: the
affected-bucket id sets (≤ n_buckets ints each).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.minhash import lsh_bands, minhash_signature, shingles

N_BUCKETS_DEFAULT = 64


def _sig_bucket(sig: str, n_buckets: int) -> int:
    import zlib

    return zlib.crc32(sig.encode()) % n_buckets


def _band_and_shingle_fns(id_col: str, text_col: str, k: int,
                          num_hashes: int, band_rows: int, n_buckets: int):
    import zlib

    def band_rows_fn(batch: pa.Table) -> pa.Table:
        out_id, out_b, out_sig, out_bkt = [], [], [], []
        for did, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            sig = minhash_signature(shingles(text or "", k), num_hashes)
            if not sig:
                continue
            for b, bsig in enumerate(lsh_bands(sig, band_rows)):
                digest = hashlib.md5(bsig.encode()).hexdigest()
                out_id.append(did)
                out_b.append(b)
                out_sig.append(digest)
                out_bkt.append(zlib.crc32(digest.encode()) % n_buckets)
        # Pin the id type: a batch whose docs ALL have empty signatures
        # (texts shorter than k words) would otherwise yield a null-typed
        # doc_id column that conflicts at union/write (ADVICE r3).
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "band": pa.array(out_b, pa.int32()),
                "band_sig": pa.array(out_sig, pa.string()),
                "band_bucket": pa.array(out_bkt, pa.int32()),
            }
        )

    def shingle_rows_fn(batch: pa.Table) -> pa.Table:
        out_id, out_sh, out_bkt = [], [], []
        for did, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            shs = sorted(
                hashlib.md5(s.encode()).hexdigest()
                for s in shingles(text or "", k)
            )
            out_id.append(did)
            out_sh.append(",".join(shs))
            out_bkt.append(zlib.crc32(str(did).encode()) % n_buckets)
        return pa.table(
            {
                id_col: pa.array(out_id, batch.column(id_col).type),
                "sh_md5": pa.array(out_sh, pa.string()),
                "doc_bucket": pa.array(out_bkt, pa.int32()),
            }
        )

    return band_rows_fn, shingle_rows_fn


def build_neardup_index(documents, out_dir: str, *, k: int = 3,
                        num_hashes: int = 16, band_rows: int = 4,
                        n_buckets: int = N_BUCKETS_DEFAULT,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> None:
    import os

    band_fn, sh_fn = _band_and_shingle_fns(
        id_col, text_col, k, num_hashes, band_rows, n_buckets)
    docs = documents.select_columns([id_col, text_col])
    docs.map_batches(band_fn, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "bands"), partition_cols=["band_bucket"],
        compression="zstd",
    )
    docs.map_batches(sh_fn, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "shingles"), partition_cols=["doc_bucket"],
        compression="zstd",
    )


def _distinct_driver(ds, col: str) -> list:
    rows = ds.select_columns([col]).map_batches(
        lambda b: b.group_by([col]).aggregate([]), batch_format="pyarrow"
    ).take_all()
    return sorted({r[col] for r in rows})


def neardup_against_index(new_docs, index_dir: str, *, k: int = 3,
                          num_hashes: int = 16, band_rows: int = 4,
                          min_jaccard_pct: int = 50,
                          n_buckets: int = N_BUCKETS_DEFAULT,
                          id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, corpus_doc_id, inter, uni): each arriving doc's verified
    near-dups among the INDEXED corpus. Reads only the band buckets the
    batch's signatures hash to and the shingle buckets its candidates
    live in."""
    import glob as _glob
    import os

    import ray.data as rd

    from .relational import cluster_apply, cluster_join

    band_fn, sh_fn = _band_and_shingle_fns(
        id_col, text_col, k, num_hashes, band_rows, n_buckets)
    docs = new_docs.select_columns([id_col, text_col])
    new_bands = docs.map_batches(band_fn, batch_format="pyarrow").materialize()
    new_sh = docs.map_batches(sh_fn, batch_format="pyarrow")

    id_type = dict(zip(docs.schema().names, docs.schema().types))[id_col]
    empty = pa.table(
        {
            id_col: pa.array([], id_type),
            "corpus_doc_id": pa.array([], id_type),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
        }
    )
    band_buckets = _distinct_driver(new_bands, "band_bucket")
    band_paths = [
        f
        for b in band_buckets
        for f in sorted(_glob.glob(
            os.path.join(index_dir, "bands", f"band_bucket={b}",
                         "*.parquet")))
    ]
    if not band_paths:
        return rd.from_arrow(empty)

    corpus_bands = rd.read_parquet(
        band_paths, columns=[id_col, "band", "band_sig"]
    ).map_batches(
        lambda b: pa.table(
            {"corpus_doc_id": b.column(id_col), "band": b.column("band"),
             "band_sig": b.column("band_sig")}
        ),
        batch_format="pyarrow",
    )
    # candidates: same (band, sig) on both sides; dedup pairs block-local
    # on the pair-key exchange
    cand = cluster_join(
        new_bands.map_batches(
            lambda b: b.select([id_col, "band", "band_sig"]),
            batch_format="pyarrow",
        ),
        corpus_bands,
        ["band", "band_sig"],
        left_types={id_col: id_type, "band": pa.int32(),
                    "band_sig": pa.string()},
        right_types={"corpus_doc_id": id_type},
    )
    pairs = cluster_apply(
        cand.map_batches(
            lambda b: b.select([id_col, "corpus_doc_id"]),
            batch_format="pyarrow",
        ),
        [id_col, "corpus_doc_id"],
        lambda block: block.group_by(
            [id_col, "corpus_doc_id"]).aggregate([]),
    ).materialize()

    import zlib

    # ONLY the affected doc-bucket ids reach the driver (≤ n_buckets
    # ints) — never the candidate id set, which is duplicate-sized at
    # web dup rates
    def to_bucket(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_bucket": pa.array(
                    [zlib.crc32(str(d).encode()) % n_buckets
                     for d in b.column("corpus_doc_id").to_pylist()],
                    pa.int32(),
                )
            }
        )

    doc_buckets = _distinct_driver(
        pairs.map_batches(to_bucket, batch_format="pyarrow"), "doc_bucket"
    )
    if not doc_buckets:
        return rd.from_arrow(empty)
    sh_paths = [
        f
        for b in doc_buckets
        for f in sorted(_glob.glob(
            os.path.join(index_dir, "shingles", f"doc_bucket={b}",
                         "*.parquet")))
    ]
    if not sh_paths:
        return rd.from_arrow(empty)
    corpus_sh = rd.read_parquet(sh_paths, columns=[id_col, "sh_md5"]).map_batches(
        lambda b: pa.table(
            {"corpus_doc_id": b.column(id_col), "c_sh": b.column("sh_md5")}
        ),
        batch_format="pyarrow",
    )

    with_c = cluster_join(
        pairs, corpus_sh, ["corpus_doc_id"],
        left_types={id_col: id_type, "corpus_doc_id": id_type},
        right_types={"c_sh": pa.string()},
    )
    with_both = cluster_join(
        with_c,
        new_sh.map_batches(
            lambda b: pa.table(
                {id_col: b.column(id_col), "n_sh": b.column("sh_md5")}
            ),
            batch_format="pyarrow",
        ),
        [id_col],
        left_types={id_col: id_type, "corpus_doc_id": id_type,
                    "c_sh": pa.string()},
        right_types={"n_sh": pa.string()},
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_n, out_c, out_i, out_u = [], [], [], []
        for nid, cid, c_sh, n_sh in zip(
            batch.column(id_col).to_pylist(),
            batch.column("corpus_doc_id").to_pylist(),
            batch.column("c_sh").to_pylist(),
            batch.column("n_sh").to_pylist(),
        ):
            a = set(c_sh.split(",")) if c_sh else set()
            bset = set(n_sh.split(",")) if n_sh else set()
            inter = len(a & bset)
            uni = len(a | bset)
            if uni and 100 * inter >= min_jaccard_pct * uni:
                out_n.append(nid)
                out_c.append(cid)
                out_i.append(inter)
                out_u.append(uni)
        return pa.table(
            {
                id_col: pa.array(out_n, id_type),
                "corpus_doc_id": pa.array(out_c, id_type),
                "inter": pa.array(out_i, pa.int64()),
                "uni": pa.array(out_u, pa.int64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


def delete_docs_from_neardup_index(index_dir: str, doomed_ids, *,
                                   n_buckets: int = N_BUCKETS_DEFAULT,
                                   compact_bands: bool = False) -> dict:
    """Delete docs from the near-dup index — the D3 cascade for this
    index family.

    Correctness needs only the SHINGLE side: the probe's exact verify
    inner-joins candidates against the shingle table, so once a doc's
    shingle row is gone it can never reach the output. Shingle rows live
    in ``doc_bucket = crc32(str(id)) % n`` — derivable from the id alone —
    so the delete is bucket-pruned: only the doomed ids' buckets rewrite
    (aside swap).

    Stale BAND rows are harmless (wasted candidate pairs the verify
    drops); their buckets are content-derived and unknowable without the
    deleted text, so reclaiming them is a full parallel sweep — opt in
    with ``compact_bands=True`` on whatever cadence amortizes it (the
    Lucene-style deferred-compaction posture). Returns counters."""
    import glob as _glob
    import os
    import zlib

    import pyarrow.compute as pc
    import ray

    from ..state.atomic import recover_all

    ids = sorted(set(
        doomed_ids.to_pylist() if hasattr(doomed_ids, "to_pylist")
        else doomed_ids
    ))
    ids_arr = pa.array(ids)
    ids_ref = ray.put(ids_arr)

    @ray.remote
    def rewrite(dir_path: str, ids_v, col: str) -> int:
        import os as _os
        import shutil as _sh

        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import recover_aside, swap_dir_in

        recover_aside(dir_path)
        if not _os.path.isdir(dir_path):
            return 0
        table = pq2.read_table(dir_path)
        keep = pc.invert(pc.is_in(
            table.column(col),
            value_set=ids_v.cast(table.column(col).type),
        ))
        kept = table.filter(keep)
        removed = table.num_rows - kept.num_rows
        if removed == 0:
            return 0
        tmp = dir_path + ".tmp"
        _sh.rmtree(tmp, ignore_errors=True)
        _os.makedirs(tmp)
        pq2.write_table(kept, _os.path.join(tmp, "part-0.parquet"),
                        compression="zstd")
        swap_dir_in(tmp, dir_path)
        return removed

    id_col = "doc_id"
    sh_buckets = sorted({zlib.crc32(str(d).encode()) % n_buckets
                         for d in ids})
    futures = [
        rewrite.remote(
            os.path.join(index_dir, "shingles", f"doc_bucket={b}"),
            ids_ref, id_col)
        for b in sh_buckets
    ]
    stats = {"shingle_buckets_pruned_to": len(sh_buckets),
             "shingle_rows_removed": sum(ray.get(futures))}
    if compact_bands:
        recover_all(os.path.join(index_dir, "bands"), "band_bucket=*")
        band_futures = [
            rewrite.remote(d, ids_ref, id_col)
            for d in sorted(_glob.glob(
                os.path.join(index_dir, "bands", "band_bucket=*")))
        ]
        stats["band_rows_removed"] = sum(ray.get(band_futures))
    return stats


def merge_new_into_neardup_index(new_docs, index_dir: str, *, k: int = 3,
                                 num_hashes: int = 16, band_rows: int = 4,
                                 n_buckets: int = N_BUCKETS_DEFAULT,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> dict:
    """Append the batch's band + shingle rows bucket-locally (atomic swap,
    idempotent: per-bucket dedup on (doc_id, band) / doc_id keeps the
    first occurrence, so a crash-rerun cannot double-insert)."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import ray

    band_fn, sh_fn = _band_and_shingle_fns(
        id_col, text_col, k, num_hashes, band_rows, n_buckets)
    docs = new_docs.select_columns([id_col, text_col])
    staging = tempfile.mkdtemp(prefix="osr-ndidx-", dir="/tmp")
    try:
        docs.map_batches(band_fn, batch_format="pyarrow").write_parquet(
            os.path.join(staging, "bands"), partition_cols=["band_bucket"],
            compression="zstd",
        )
        docs.map_batches(sh_fn, batch_format="pyarrow").write_parquet(
            os.path.join(staging, "shingles"),
            partition_cols=["doc_bucket"], compression="zstd",
        )

        @ray.remote
        def merge_bucket(bucket_dir: str, new_dir: str,
                         dedup_keys: tuple) -> int:
            import os

            import pyarrow.parquet as pq2

            new_rows = pq2.read_table(new_dir)
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
                    bucket_dir, columns=new_rows.column_names))
            parts.append(new_rows)
            both = pa.concat_tables(parts)
            value_cols = [c for c in both.column_names
                          if c not in dedup_keys]
            agg = both.group_by(list(dedup_keys), use_threads=False).aggregate(
                [(c, "first") for c in value_cols]
            )
            merged = pa.table(
                {**{c: agg.column(c) for c in dedup_keys},
                 **{c: agg.column(f"{c}_first") for c in value_cols}}
            )
            # Crash-safe swap (see dedup_disk.merge_bucket): one merged
            # file os.replace()d in; old subset files removed after. A
            # crash mid-cleanup leaves redundant duplicate rows that the
            # next merge's keep-first dedup compacts — the bucket itself
            # is never missing.
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
        n_affected = 0
        for sub, keys in (("bands", (id_col, "band")),
                          ("shingles", (id_col,))):
            for new_dir in sorted(
                _glob.glob(os.path.join(staging, sub, "*=*"))
            ):
                part = os.path.basename(new_dir)
                futures.append(merge_bucket.remote(
                    os.path.join(index_dir, sub, part), new_dir, keys))
                n_affected += 1
        merged_rows = sum(ray.get(futures))
        return {"buckets_affected": n_affected, "rows_merged": merged_rows}
    finally:
        shutil.rmtree(staging, ignore_errors=True)
