"""Sequence packing for training-data export (concat-and-chunk).

The standard LLM-pretraining packing step: documents are laid end-to-end in
a deterministic global order and the token stream is cut into fixed-size
context windows (``budget`` tokens). Each document is assigned the global
token interval it occupies and the pack (window) its first token falls in —
exactly what a sharded tokenize-and-pack export needs to write shard
``pack_id`` files independently.

Scale shape (the classic distributed prefix sum):

1. token counts per row are a vectorized regex count (no Python loop);
2. rows are range-partitioned on the order key (equal-width ranges over the
   observed [min, max] — at web scale swap in sampled quantile boundaries,
   the partition contract is the same);
3. ONE tiny aggregation (`grouped_agg` over the partition id) brings ≤
   ``n_parts`` rows to the driver, which turns them into exclusive prefix
   offsets (driver state is O(n_parts), never O(corpus));
4. one int-key exchange (`cluster_apply` on the partition id) co-locates
   each range, a block-local sort + cumulative sum attaches the global
   offsets, and ``pack_id = start_off // budget``.

No whole-corpus collect, no global Ray sort on the data path; the only
all-to-all moves (id, n_tokens, part) — two int64s and an int32 per row.

Reference scope: beyond-reference training-data operator (brief); the
reference engine has no packing analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import cluster_apply, grouped_agg

_WORD_RE = "[^ ]+"


def _with_tokens_and_part(documents, id_col: str, text_col: str,
                          lo: int, width: int, n_parts: int):
    def f(batch: pa.Table) -> pa.Table:
        n_tokens = pc.count_substring_regex(
            batch.column(text_col), _WORD_RE
        ).cast(pa.int64())
        part = pc.if_else(
            pc.greater_equal(
                pc.divide(pc.subtract(batch.column(id_col), lo), width),
                n_parts,
            ),
            n_parts - 1,
            pc.divide(pc.subtract(batch.column(id_col), lo), width),
        ).cast(pa.int32())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": n_tokens,
                "part": part,
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def pack_sequences(documents, *, budget: int = 256, id_col: str = "doc_id",
                   text_col: str = "text", n_parts: int = 64):
    """→ (doc_id, n_tokens, start_off, end_off, pack_id).

    Tokens are non-empty single-space-split words (``[^ ]+`` runs — the
    same contract as ``token_counts.n_ws_tokens``); documents are ordered
    by ``id_col``; ``start_off`` is the exclusive cumulative token count
    before the doc, ``end_off = start_off + n_tokens``, and
    ``pack_id = start_off // budget`` (a doc belongs to the window its
    first token falls in; windows are cut mid-doc exactly as a contiguous
    token stream would be).

    SQL analogue: ``SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.
    """
    import ray

    # partition domain from a cheap id-only pass (per-block partials; the
    # driver sees one row per block, bounded by parallelism not corpus)
    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # an upstream filter may empty a block; min/max of an empty
            # batch is null and would crash the driver-side min()
            return pa.table(
                {"lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        ids = batch.column(id_col)
        return pa.table(
            {"lo": pa.array([pc.min(ids).as_py()], pa.int64()),
             "hi": pa.array([pc.max(ids).as_py()], pa.int64())}
        )

    mm = documents.select_columns([id_col]).map_batches(
        minmax, batch_format="pyarrow"
    ).take_all()
    if not mm:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "start_off": pa.array([], pa.int64()),
             "end_off": pa.array([], pa.int64()),
             "pack_id": pa.array([], pa.int64())}
        )
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = max(1, (hi - lo) // n_parts + 1)

    counted = _with_tokens_and_part(
        documents, id_col, text_col, lo, width, n_parts
    )

    # per-partition token sums -> exclusive prefix offsets (<= n_parts rows)
    sums = grouped_agg(counted, ["part"], [("part_sum", "n_tokens", "sum")])
    part_rows = sorted(
        (r["part"], r["part_sum"]) for r in sums.take_all()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for part, s in part_rows:
        offsets[part] = acc
        acc += s
    offsets_ref = ray.put(offsets)

    def block_offsets(block: pa.Table) -> pa.Table:
        import numpy as np

        table = ray.get(offsets_ref)
        block = block.sort_by([("part", "ascending"), (id_col, "ascending")])
        parts = block.column("part").to_numpy(zero_copy_only=False)
        n_tok = block.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(n_tok)
        excl = cum - n_tok
        # hash collisions may co-locate several parts in one block: rebase
        # each part-run to its own global offset
        start = np.empty(len(parts), dtype=np.int64)
        run_start = 0
        for i in range(1, len(parts) + 1):
            if i == len(parts) or parts[i] != parts[i - 1]:
                base = table[int(parts[run_start])] - excl[run_start]
                start[run_start:i] = excl[run_start:i] + base
                run_start = i
        return pa.table(
            {
                id_col: block.column(id_col),
                "n_tokens": block.column("n_tokens"),
                "start_off": pa.array(start, pa.int64()),
                "end_off": pa.array(start + n_tok, pa.int64()),
                "pack_id": pa.array(start // budget, pa.int64()),
            }
        )

    return cluster_apply(counted, ["part"], block_offsets)


def write_packed_shards(documents, out_dir: str, *, budget: int = 256,
                        packs_per_shard: int = 16,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_parts: int = 64):
    """Materialize the packed training layout: one partition dir per shard
    (``shard=K/``, K = pack_id // packs_per_shard), rows = (doc_id,
    n_tokens, start_off, end_off, pack_id, text), zstd parquet.

    The text column is re-attached to the (ids-only) packing table with a
    distributed ``cluster_join`` on doc_id — neither side lands on the
    driver. Shard dirs are written atomically (tmp dir + rename), so a
    failed export leaves no partial shard and a rerun is idempotent —
    the same resume discipline as ``ingest_resumable``.

    → dict with n_docs, n_shards, out_dir.
    """
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import cluster_join

    packed = pack_sequences(
        documents, budget=budget, id_col=id_col, text_col=text_col,
        n_parts=n_parts,
    )
    if isinstance(packed, pa.Table):  # empty-input fast path
        packed = rd.from_arrow(packed)

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard",
            pc.divide(batch.column("pack_id"), packs_per_shard)
            .cast(pa.int64()),
        )

    packed = packed.map_batches(add_shard, batch_format="pyarrow")
    joined = cluster_join(
        packed, documents.select_columns([id_col, text_col]), [id_col],
        left_types={id_col: pa.int64(), "n_tokens": pa.int64(),
                    "start_off": pa.int64(), "end_off": pa.int64(),
                    "pack_id": pa.int64(), "shard": pa.int64()},
        right_types={text_col: pa.string()},
    )

    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".packed-tmp-", dir=parent)
    try:
        joined.write_parquet(
            tmp, partition_cols=["shard"], compression="zstd"
        )
        n_docs = rd.read_parquet(tmp).count()
        shards = sorted(
            d for d in os.listdir(tmp) if d.startswith("shard=")
        )
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {"n_docs": n_docs, "n_shards": len(shards), "out_dir": out_dir}


def chunk_documents(documents, *, chunk_words: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Overlapping fixed-window document chunking (the RAG / long-doc
    training split): each doc fans out into word windows of ``chunk_words``
    starting every ``stride`` words (overlap = chunk_words - stride).

    → (id_col, chunk_idx, chunk_text, n_words). The final window is the
    remainder (shorter than ``chunk_words``); a window is emitted only if
    it starts inside the doc. Splitting is the engine-wide single-space
    convention (``''.split(' ') == ['']``), so every doc — including empty
    text — emits at least one chunk and no rows are silently dropped.

    Scale shape: a pure stateless 1→N ``map_batches`` fan-out — no shuffle,
    no state; chunk boundaries are word offsets so the SQL oracle replays
    them with list slicing. Fully vectorized: one Arrow ``split_pattern``
    per batch, numpy window arithmetic on the list offsets, one gather
    (``pc.take``) of the flat word values, one ``binary_join``.
    """
    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")

    def fan_out(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = np.asarray(words.offsets)
        per_doc = np.diff(offs)  # >= 1 per doc: split(' ') never returns []
        n_chunks = -(-per_doc // stride)  # ceil; >= 1, so no doc is dropped
        doc_idx = np.repeat(np.arange(len(per_doc)), n_chunks)
        csum = np.cumsum(n_chunks)
        chunk_idx = np.arange(int(csum[-1]) if len(csum) else 0) - np.repeat(
            csum - n_chunks, n_chunks
        )
        starts = chunk_idx * stride  # word offset inside the doc
        lens = np.minimum(chunk_words, per_doc[doc_idx] - starts)
        # gather index into the flat word values: concat of per-chunk ranges
        lsum = np.cumsum(lens)
        gather = (
            np.arange(int(lsum[-1]) if len(lsum) else 0)
            - np.repeat(lsum - lens, lens)
            + np.repeat(offs[doc_idx] + starts, lens)
        )
        taken = pc.take(words.values, pa.array(gather, pa.int64()))
        lists = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate(([0], lsum)), pa.int64()), taken
        )
        return pa.table(
            {
                id_col: pc.take(batch.column(id_col),
                                pa.array(doc_idx, pa.int64())),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk_text": pc.binary_join(lists, " "),
                "n_words": pa.array(lens, pa.int64()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        fan_out, batch_format="pyarrow"
    )
