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
import pyarrow.compute as pc


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

    def classify(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_pylist()
        tss = group.column("ts").to_pylist()
        old_ts = max((t for s, t in zip(sides, tss) if s == "old"), default=None)
        new_ts = max((t for s, t in zip(sides, tss) if s == "new"), default=None)
        if old_ts is None:
            change = "added"
        elif new_ts is None:
            change = "deleted"
        elif new_ts > old_ts:
            change = "modified"
        else:
            change = "unchanged"
        return pa.table(
            {
                "key": group.column("key").slice(0, 1),
                "change": pa.array([change], pa.string()),
                "old_ts": pa.array([old_ts], group.column("ts").type),
                "new_ts": pa.array([new_ts], group.column("ts").type),
            }
        )

    return tagged.groupby("key").map_groups(classify, batch_format="pyarrow")


def keep_latest(ds, key_cols: list[str], order_cols: list[str]):
    """Last-write-wins dedup: one row per key, the max of ``order_cols``.

    ``order_cols`` must be a total order within a key group (e.g.
    ``[warc_ts, event_id]``) so the survivor is deterministic.
    """

    def pick(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(c, "descending") for c in order_cols],
        )
        return group.take(idx[:1])

    return ds.groupby(key_cols).map_groups(pick, batch_format="pyarrow")
