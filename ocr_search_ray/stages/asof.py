"""As-of join — the time-travel lookup Ray Data has no primitive for.

For every left row, attach the right row with the greatest ``ts_col`` that
is <= the left row's (per ``on`` key) — a LEFT ASOF join (brief: custom
operators "as-of join"). Built on the engine's exchange primitive
(SURVEY.md §8): tag both sides, union, ``cluster_by`` the key, then one
block-local Arrow sort + linear walk. No per-group Python dispatch, no
sort-merge machinery — wall cost is one int-key exchange over
|left| + |right| rows.

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
        block = block.sort_by(
            [(on, "ascending"), (ts_col, "ascending"), ("__side", "ascending")]
        )
        keys = block.column(on).to_pylist()
        tss = block.column(ts_col).to_pylist()
        sides = block.column("__side").to_pylist()
        lvals = {c: block.column("l_" + c).to_pylist() for c in left_cols}
        rvals = {c: block.column("r_" + c).to_pylist() for c in right_cols}

        out = {on: [], ts_col: [], ts_col + suffix: []}
        for c in left_cols:
            out[c] = []
        for c in rcols_out:
            out[c] = []

        last_key = object()
        last_right: tuple | None = None
        for i in range(block.num_rows):
            if keys[i] != last_key:
                last_key = keys[i]
                last_right = None
            if sides[i] == 0:
                last_right = (tss[i], tuple(rvals[c][i] for c in right_cols))
                continue
            out[on].append(keys[i])
            out[ts_col].append(tss[i])
            for c in left_cols:
                out[c].append(lvals[c][i])
            if last_right is None:
                out[ts_col + suffix].append(None)
                for c in rcols_out:
                    out[c].append(None)
            else:
                out[ts_col + suffix].append(last_right[0])
                for c, v in zip(rcols_out, last_right[1]):
                    out[c].append(v)

        ts_type = block.column(ts_col).type
        schema_types = {on: block.column(on).type, ts_col: ts_type,
                        ts_col + suffix: ts_type}
        # infer payload types from the tagged columns (null-safe)
        for c in left_cols:
            schema_types[c] = block.column("l_" + c).type
        for c, rc in zip(right_cols, rcols_out):
            schema_types[rc] = block.column("r_" + c).type
        return pa.table(
            {name: pa.array(vals, schema_types[name])
             for name, vals in out.items()}
        )

    return cluster_apply(unioned, [on], block_walk)
