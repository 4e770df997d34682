"""Snapshot diff + upsert dedup — the incremental layer (SURVEY.md J2, D1).

``diff_snapshots`` re-expresses the reference's ``diffFileLib``
(``src/DropboxSynchronizer/DropboxSynchronizer.class.js:198-242``):
  - added     = key in new snapshot only
  - modified  = key in both AND new ts strictly greater    (:224-227)
  - deleted   = key in old snapshot only                   (:230-240)
  - unchanged = key in both, ts not newer

``keep_latest`` re-expresses Mongo upsert-by-key = last-write-wins dedup
(``src/DbInterface/DbInterface.class.js:241-245,371-375``): hash-partition on
the key (the groupby shuffle) and keep the row with the max ordering tuple
per group — deterministic because the full ordering tuple is a total order.

Both are single-shuffle groupby compositions — no join primitive needed: the
two snapshots are tagged and unioned, then classified per key group.
"""

from __future__ import annotations

import pyarrow as pa

from .relational import cluster_apply


def _tag(ds, side: str, key: str, ts: str):
    def add(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column(key).cast(pa.string()),
                "ts": batch.column(ts),
                "side": pa.array([side] * batch.num_rows, pa.string()),
            }
        )

    return ds.map_batches(add, batch_format="pyarrow")


def diff_snapshots(old_ds, new_ds, *, key: str = "url", ts: str = "warc_ts"):
    """→ Dataset(key:string, change:string, old_ts, new_ts).

    Full-outer-join semantics via union + tag + per-key classification
    (one shuffle on ``key``).
    """
    tagged = _tag(old_ds, "old", key, ts).union(_tag(new_ds, "new", key, ts))

    def block_classify(block: pa.Table) -> pa.Table:
        block = block.sort_by([("key", "ascending")])
        keys = block.column("key").to_pylist()
        sides = block.column("side").to_pylist()
        tss = block.column("ts").to_pylist()
        out_key, out_change, out_old, out_new = [], [], [], []
        i, n = 0, len(keys)
        while i < n:
            j = i
            while j < n and keys[j] == keys[i]:
                j += 1
            old_ts = max((tss[x] for x in range(i, j) if sides[x] == "old"),
                         default=None)
            new_ts = max((tss[x] for x in range(i, j) if sides[x] == "new"),
                         default=None)
            if old_ts is None:
                change = "added"
            elif new_ts is None:
                change = "deleted"
            elif new_ts > old_ts:
                change = "modified"
            else:
                change = "unchanged"
            out_key.append(keys[i])
            out_change.append(change)
            out_old.append(old_ts)
            out_new.append(new_ts)
            i = j
        ts_type = block.column("ts").type
        return pa.table(
            {
                "key": pa.array(out_key, pa.string()),
                "change": pa.array(out_change, pa.string()),
                "old_ts": pa.array(out_old, ts_type),
                "new_ts": pa.array(out_new, ts_type),
            }
        )

    return cluster_apply(tagged, ["key"], block_classify)


def keep_latest(ds, key_cols: list[str], order_cols: list[str]):
    """Last-write-wins dedup: one row per key, the max of ``order_cols``.

    ``order_cols`` must be a total order within a key group (e.g.
    ``[warc_ts, event_id]``) so the survivor is deterministic.
    """

    def block_pick(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [(c, "ascending") for c in key_cols]
            + [(c, "descending") for c in order_cols]
        )
        keys = [block.column(c).to_pylist() for c in key_cols]
        keep: list[int] = []
        n = block.num_rows
        for i in range(n):
            if i == 0 or any(col[i] != col[i - 1] for col in keys):
                keep.append(i)
        return block.take(pa.array(keep, pa.int64()))

    return cluster_apply(ds, key_cols, block_pick)
