"""As-of join — the time-travel lookup Ray Data has no primitive for.

For every left row, attach the right row with the greatest ``ts_col`` that
is <= the left row's (per ``on`` key) — a LEFT ASOF join (brief: custom
operators "as-of join"). Built on the engine's exchange primitive
(SURVEY.md §8): tag both sides, union, ``cluster_by`` the key, then one
block-local Arrow sort + a vectorized segment-cummax pick (numpy accumulate + one Arrow
take). No per-group Python dispatch, no sort-merge machinery — wall cost
is one int-key exchange over |left| + |right| rows.

Determinism: rows are walked in ``(key, ts, side, order_col)`` order with
right rows first at equal timestamps (<= semantics) — among right rows
sharing (key, ts), the one with the greatest ``order_col`` wins. Callers
wanting DuckDB-ASOF-identical output should pre-dedup the right side to one
row per (key, ts) (e.g. ``diff.keep_latest``).
"""

from __future__ import annotations

import pyarrow as pa

from .relational import cluster_apply


def asof_join(left, right, *, on: str, ts_col: str,
              left_cols: list[str], right_cols: list[str],
              suffix: str = "_r"):
    """→ one row per left row: ``[on, ts_col] + left_cols`` plus
    ``ts_col+suffix`` and ``right_cols`` (suffixed on collision), null when
    no right row is at-or-before the left timestamp."""
    rcols_out = [c + suffix if c in set(left_cols) | {on, ts_col} else c
                 for c in right_cols]

    # concrete types for the null padding so both union sides share a schema
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    ltypes = {c: lschema.field(c).type for c in left_cols}
    rtypes = {c: rschema.field(c).type for c in right_cols}

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            data = {
                on: batch.column(on),
                ts_col: batch.column(ts_col),
                "__side": pa.array([side] * n, pa.int8()),
            }
            for c in left_cols:
                data["l_" + c] = (
                    batch.column(c) if side == 1 else pa.nulls(n, ltypes[c])
                )
            for c in right_cols:
                data["r_" + c] = (
                    batch.column(c) if side == 0 else pa.nulls(n, rtypes[c])
                )
            return pa.table(data)

        return f

    # union with aligned schemas: left carries l_*, right carries r_*
    tagged_left = left.map_batches(tag(1), batch_format="pyarrow")
    tagged_right = right.map_batches(tag(0), batch_format="pyarrow")
    unioned = tagged_left.union(tagged_right)

    def block_walk(block: pa.Table) -> pa.Table:
        """Vectorized as-of pick: after the (key, ts, side) sort, the
        right row each left row sees is the LATEST side-0 index in its
        key group — a segment-reset cumulative max. Encode (group_id,
        right_index+1) into one monotonic int64, ``np.maximum.accumulate``
        once, decode, and gather the right payload with one Arrow take
        whose null indices produce the no-match nulls. No per-row
        Python."""
        import numpy as np
        import pyarrow.compute as pc

        block = block.sort_by(
            [(on, "ascending"), (ts_col, "ascending"), ("__side", "ascending")]
        )
        n = block.num_rows
        if n == 0:
            ts_type = block.column(ts_col).type
            cols = {on: block.column(on), ts_col: block.column(ts_col),
                    ts_col + suffix: pa.nulls(0, ts_type)}
            for c in left_cols:
                cols[c] = block.column("l_" + c)
            for c, rc in zip(right_cols, rcols_out):
                cols[rc] = block.column("r_" + c)
            return pa.table(cols)

        side = block.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False)
        kcol = block.column(on).combine_chunks()
        if n > 1:
            a, b = kcol.slice(1), kcol.slice(0, n - 1)
            neq = pc.fill_null(pc.not_equal(a, b), False)
            nm = pc.xor(pc.is_null(a), pc.is_null(b))
            change = np.concatenate(
                ([True], pc.or_(neq, nm).to_numpy(zero_copy_only=False))
            )
        else:
            change = np.array([True])
        gid = (np.cumsum(change) - 1).astype(np.int64)
        rp = np.where(side == 0, np.arange(n, dtype=np.int64), -1)
        enc = gid * np.int64(n + 1) + (rp + 1)
        run = np.maximum.accumulate(enc)
        last_gid = run // np.int64(n + 1)
        last_rp = run % np.int64(n + 1) - 1
        lmask = side == 1
        ridx = np.where((last_gid == gid) & (last_rp >= 0), last_rp, -1)[lmask]
        take_idx = pa.array(np.maximum(ridx, 0), pa.int64(), mask=ridx < 0)

        left_tbl = block.filter(pa.array(lmask))
        rside = block.select([ts_col] + ["r_" + c for c in right_cols])
        taken = rside.take(take_idx)

        cols = {on: left_tbl.column(on), ts_col: left_tbl.column(ts_col),
                ts_col + suffix: taken.column(ts_col)}
        for c in left_cols:
            cols[c] = left_tbl.column("l_" + c)
        for c, rc in zip(right_cols, rcols_out):
            cols[rc] = taken.column("r_" + c)
        return pa.table(cols)

    return cluster_apply(unioned, [on], block_walk)
