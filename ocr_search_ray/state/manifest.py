"""Checkpoint manifest — the engine's incremental/resume state.

The reference's incremental state is the local file tree + mtime diff plus
idempotent Mongo upserts (``src/DropboxSynchronizer/DropboxSynchronizer.class.
js:171-242``, SURVEY.md §2.9, §4 Checkpoint/resume). The engine's equivalent,
required by the north rule, is an explicit **per-partition manifest**: one
Parquet row per completed output partition carrying lineage (which input
fragment produced it), row/byte/error counts and wall time. Resume =
anti-join of input fragments against ``status='done'`` manifest rows; output
partition directories are deterministically named by partition id, so a
rewrite after a mid-run failure is idempotent (overwrite, not append).

Manifest rows are appended one small Parquet file per partition (atomic-ish:
written via temp name + rename), so concurrent writers on different
partitions never conflict.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import sha256_hex
from ..schemas import MANIFEST


def fragment_hash(path: str) -> str:
    """Lineage identity of an input fragment: path + size + mtime."""
    st = os.stat(path)
    return sha256_hex(f"{path}|{st.st_size}|{int(st.st_mtime)}")


def append_row(
    manifest_dir: str,
    *,
    partition_id: int,
    stage: str,
    input_hash: str,
    row_count: int,
    byte_count: int,
    n_errors: int,
    n_timeouts: int = 0,
    status: str = "done",
    wall_time_s: float = 0.0,
) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    table = pa.table(
        {
            "partition_id": pa.array([partition_id], pa.int64()),
            "stage": pa.array([stage], pa.string()),
            "input_hash": pa.array([input_hash], pa.string()),
            "row_count": pa.array([row_count], pa.int64()),
            "byte_count": pa.array([byte_count], pa.int64()),
            "n_errors": pa.array([n_errors], pa.int64()),
            "n_timeouts": pa.array([n_timeouts], pa.int64()),
            "status": pa.array([status], pa.string()),
            "wall_time_s": pa.array([wall_time_s], pa.float64()),
        }
    )
    tmp = os.path.join(manifest_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(manifest_dir, f"part-{partition_id:06d}-{int(time.time()*1e6)}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def read(manifest_dir: str) -> pa.Table:
    """All manifest rows (empty table with the declared schema if none)."""
    if not os.path.isdir(manifest_dir):
        return MANIFEST.empty_table()
    files = sorted(
        os.path.join(manifest_dir, f)
        for f in os.listdir(manifest_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if not files:
        return MANIFEST.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def done_hashes(manifest_dir: str, stage: str) -> set[str]:
    """Input-fragment hashes already completed for ``stage``."""
    t = read(manifest_dir)
    if t.num_rows == 0:
        return set()
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.equal(t.column("stage"), pa.scalar(stage)),
        pc.equal(t.column("status"), pa.scalar("done")),
    )
    return set(t.filter(mask).column("input_hash").to_pylist())
