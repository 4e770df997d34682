"""Gap-based sessionization — the engine's windowed-aggregate pattern.

No reference counterpart (the reference is a polling micro-batch loop,
SURVEY.md §2.9); this is the custom-operator shape the engine uses for
order-sensitive windowed semantics Ray Data has no primitive for
(brief: "windowed aggregate"): ``cluster_by`` co-locates each partition key
(user) in one block, a block-local Arrow sort restores event-time order,
and the per-key walk runs once per block, not once per key.

Partitioning assumption (documented per the brief): one user's events fit
in one block. Holds whenever per-key history is bounded (sessions, device
logs); keys larger than a block need a time-bucketed pre-split.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

from .relational import cluster_apply

DEFAULT_GAP = dt.timedelta(minutes=30)


def tumbling_window_agg(events, *, window: dt.timedelta,
                        ts_col: str = "ts", key_cols: list[str] | None = None,
                        value_col: str = "value"):
    """Fixed (tumbling) event-time windows: → key_cols + (window_start,
    n_events, sum_value_cents).

    The window assignment is a stateless per-batch map (epoch-floor — no
    order sensitivity, unlike gap sessions), so the only exchange is the
    standard two-phase ``grouped_agg`` over (keys, window_start); windows
    never span blocks by construction. Values are aggregated in exact
    integer cents so oracle comparison is exact.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    key_cols = key_cols or []
    window_us = int(window.total_seconds() * 1_000_000)

    def assign(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        ts_us = pc.cast(batch.column(ts_col), pa.int64())
        start = pc.multiply(pc.divide(ts_us, window_us), window_us)
        cols = {k: batch.column(k) for k in key_cols}
        cols["window_start"] = pc.cast(start, pa.timestamp("us"))
        cols["one"] = pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows)
        cols["cents"] = pc.cast(
            pc.round(pc.multiply(batch.column(value_col), 100), options=away),
            pa.int64(),
        )
        return pa.table(cols)

    assigned = events.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(
        assigned,
        key_cols + ["window_start"],
        [
            ("n_events", "one", "count"),
            ("sum_value_cents", "cents", "sum"),
        ],
    )


def sessionize(events, *, gap: dt.timedelta = DEFAULT_GAP,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id"):
    """→ (user_id, session_idx, n_events, start_ts, end_ts).

    A new session starts when the gap to the previous event (per user,
    ordered by (ts, order_col)) exceeds ``gap`` (strict). ``session_idx``
    is 0-based per user in time order.
    """

    def block_sessions(block: pa.Table) -> pa.Table:
        block = block.sort_by(
            [(user_col, "ascending"), (ts_col, "ascending"),
             (order_col, "ascending")]
        )
        users = block.column(user_col).to_pylist()
        tss = block.column(ts_col).to_pylist()
        out_u, out_s, out_n, out_a, out_b = [], [], [], [], []

        def flush(user, sidx, n, start, end):
            out_u.append(user)
            out_s.append(sidx)
            out_n.append(n)
            out_a.append(start)
            out_b.append(end)

        i, n_rows = 0, len(users)
        while i < n_rows:
            j = i
            while j < n_rows and users[j] == users[i]:
                j += 1
            sidx, count, start = 0, 1, tss[i]
            for k in range(i + 1, j):
                if tss[k] - tss[k - 1] > gap:
                    flush(users[i], sidx, count, start, tss[k - 1])
                    sidx += 1
                    count, start = 1, tss[k]
                else:
                    count += 1
            flush(users[i], sidx, count, start, tss[j - 1])
            i = j
        ts_type = block.column(ts_col).type
        return pa.table(
            {
                user_col: pa.array(out_u, block.column(user_col).type),
                "session_idx": pa.array(out_s, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "start_ts": pa.array(out_a, ts_type),
                "end_ts": pa.array(out_b, ts_type),
            }
        )

    projected = events.select_columns([user_col, ts_col, order_col])
    return cluster_apply(projected, [user_col], block_sessions)


def sliding_window_agg(events, *, window: "dt.timedelta",
                       slide: "dt.timedelta", ts_col: str = "ts",
                       key_cols: list[str] | None = None,
                       value_col: str = "value"):
    """Sliding (hopping) event-time windows: → key_cols + (window_start,
    n_events, sum_value_cents), one output row per (key, window) where the
    window [start, start+window) contains the event.

    ``window`` must be an integer multiple of ``slide``; each event
    replicates into window/slide window assignments (a vectorized k-way
    batch concat — no per-row Python), then the standard two-phase
    ``grouped_agg`` merges. The tumbling case is window == slide.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    key_cols = key_cols or []
    window_us = int(window.total_seconds() * 1_000_000)
    slide_us = int(slide.total_seconds() * 1_000_000)
    if window_us % slide_us:
        raise ValueError("window must be a multiple of slide")
    k = window_us // slide_us

    def assign(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        ts_us = pc.cast(batch.column(ts_col), pa.int64())
        base = pc.multiply(pc.divide(ts_us, slide_us), slide_us)
        cents = pc.cast(
            pc.round(pc.multiply(batch.column(value_col), 100),
                     options=away),
            pa.int64(),
        )
        parts = []
        for i in range(k):
            start = pc.subtract(base, i * slide_us)
            cols = {kc: batch.column(kc) for kc in key_cols}
            cols["window_start"] = pc.cast(start, pa.timestamp("us"))
            cols["one"] = pa.repeat(pa.scalar(1, pa.int64()),
                                    batch.num_rows)
            cols["cents"] = cents
            parts.append(pa.table(cols))
        return pa.concat_tables(parts).combine_chunks()

    assigned = events.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(
        assigned, key_cols + ["window_start"],
        [("n_events", "one", "sum"), ("sum_value_cents", "cents", "sum")],
    )


def _sorted_cents_groups(block, user_col, ts_col, order_col, value_col):
    """Shared window-frame prelude: sort by (user, ts, order), round the
    value column to exact integer cents (half away from zero — MUST match
    DuckDB ``round()``, the oracle contract), and locate per-user group
    runs. → (sorted block, users, cents, is_start, starts, group_start).
    One copy of the sort keys + rounding mode for every window op."""
    import numpy as np
    import pyarrow.compute as pc

    block = block.sort_by(
        [(user_col, "ascending"), (ts_col, "ascending"),
         (order_col, "ascending")]
    )
    n = block.num_rows
    users = block.column(user_col).to_numpy(zero_copy_only=False)
    away = pc.RoundOptions(round_mode="half_towards_infinity")
    cents = pc.cast(
        pc.round(pc.multiply(block.column(value_col), 100), options=away),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    np.not_equal(users[1:], users[:-1], out=is_start[1:])
    starts = np.flatnonzero(is_start)
    group_start = np.repeat(starts, np.diff(np.append(starts, n)))
    return block, users, cents, is_start, starts, group_start


def event_lag_features(events, *, user_col: str = "user_id",
                       ts_col: str = "ts", order_col: str = "event_id",
                       value_col: str = "value", preceding: int = 3):
    """Per-event window features — the LAG / ROWS-BETWEEN frame shape:
    → (order_col, user_col, prev_gap_us, roll_sum_cents).

    ``prev_gap_us``    = microseconds since the user's previous event
                         (null on each user's first event) — SQL
                         ``epoch_us(ts) - epoch_us(LAG(ts) OVER w)``.
    ``roll_sum_cents`` = exact-integer-cents sum over the current row and
                         ``preceding`` prior rows of the same user — SQL
                         ``SUM(cents) OVER (w ROWS BETWEEN p PRECEDING AND
                         CURRENT ROW)``. Window ``w`` is PARTITION BY user
                         ORDER BY (ts, order_col).

    Same partitioning assumption as :func:`sessionize` (one user's events
    fit in one block — bounded per-key history); the walk itself is fully
    vectorized: group boundaries via one numpy change-point scan, gaps via
    a shifted diff, frames via prefix-cumsum differences.
    """
    import numpy as np
    import pyarrow.compute as pc

    def block_features(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return pa.table(
                {
                    order_col: pa.array([], block.column(order_col).type),
                    user_col: pa.array([], block.column(user_col).type),
                    "prev_gap_us": pa.array([], pa.int64()),
                    "roll_sum_cents": pa.array([], pa.int64()),
                }
            )
        block, users, cents, is_start, starts, group_start = \
            _sorted_cents_groups(block, user_col, ts_col, order_col,
                                 value_col)
        ts_us = pc.cast(block.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )

        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        np.subtract(ts_us[1:], ts_us[:-1], out=gap[1:])

        idx = np.arange(n)
        lo = np.maximum(idx - preceding, group_start)
        cum = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        roll = cum[idx + 1] - cum[lo]

        return pa.table(
            {
                order_col: block.column(order_col),
                user_col: block.column(user_col),
                "prev_gap_us": pa.array(gap, pa.int64(), mask=is_start),
                "roll_sum_cents": pa.array(roll, pa.int64()),
            }
        )

    projected = events.select_columns(
        [order_col, user_col, ts_col, value_col]
    )
    return cluster_apply(projected, [user_col], block_features)


def running_totals(events, *, user_col: str = "user_id",
                   ts_col: str = "ts", order_col: str = "event_id",
                   value_col: str = "value"):
    """Per-key cumulative window aggregates — the UNBOUNDED-PRECEDING frame
    shape: → (order_col, user_col, run_count, run_sum_cents, run_max_cents).

    SQL: ``COUNT(*)/SUM(cents)/MAX(cents) OVER (PARTITION BY user ORDER BY
    (ts, order_col) ROWS UNBOUNDED PRECEDING)``. Same partitioning
    assumption as :func:`event_lag_features` (one key's history per
    block); the walk is one numpy cumsum / cummax per block with
    group-start subtraction — no per-row Python.
    """
    import numpy as np
    import pyarrow.compute as pc

    def block_running(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return pa.table(
                {
                    order_col: pa.array([], block.column(order_col).type),
                    user_col: pa.array([], block.column(user_col).type),
                    "run_count": pa.array([], pa.int64()),
                    "run_sum_cents": pa.array([], pa.int64()),
                    "run_max_cents": pa.array([], pa.int64()),
                }
            )
        block, users, cents, is_start, starts, group_start = \
            _sorted_cents_groups(block, user_col, ts_col, order_col,
                                 value_col)

        idx = np.arange(n)
        run_count = idx - group_start + 1
        cum = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        run_sum = cum[idx + 1] - cum[group_start]
        # segment cummax: one accumulate per group run (groups per block
        # are few relative to rows; the inner op stays vectorized)
        run_max = cents.copy()
        for s, e in zip(starts, np.append(starts[1:], n)):
            np.maximum.accumulate(cents[s:e], out=run_max[s:e])

        return pa.table(
            {
                order_col: block.column(order_col),
                user_col: block.column(user_col),
                "run_count": pa.array(run_count, pa.int64()),
                "run_sum_cents": pa.array(run_sum, pa.int64()),
                "run_max_cents": pa.array(run_max, pa.int64()),
            }
        )

    projected = events.select_columns(
        [order_col, user_col, ts_col, value_col]
    )
    return cluster_apply(projected, [user_col], block_running)


def cohort_retention(events, *, user_col: str = "user_id",
                     ts_col: str = "ts", day_us: int = 86_400_000_000):
    """Cohort retention matrix — the standard product-analytics rollup:
    cohort(user) = the day of the user's FIRST event; for every distinct
    (user, active day) pair count users per (cohort_day, day_offset).
    All-integer (epoch-microseconds floor-divided into day numbers), so
    the DuckDB oracle replays it exactly.

    Physical plan: day-quantize in one map, per-user min (``grouped_agg``),
    distinct (user, day) pairs (one ``cluster_apply`` group_by), cohort
    attach (``cluster_join`` on user), final (cohort, offset) count — four
    int-key exchanges, nothing driver-resident, no sort.

    → (cohort_day:int64, day_offset:int64, users:int64).
    """
    import pyarrow.compute as pc

    from .relational import cluster_join, grouped_agg

    def days(b: pa.Table) -> pa.Table:
        us = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "day": pc.divide(us, day_us)}
        )

    ud = events.map_batches(days, batch_format="pyarrow").materialize()

    cohort = grouped_agg(ud, ["user"], [("cohort_day", "day", "min")])
    pairs = cluster_apply(
        ud, ["user", "day"],
        lambda blk: blk.group_by(["user", "day"]).aggregate([]),
    )
    joined = cluster_join(
        pairs, cohort, ["user"],
        left_types={"user": pa.int64(), "day": pa.int64()},
        right_types={"cohort_day": pa.int64()},
    )
    offsets = joined.map_batches(
        lambda b: pa.table(
            {"cohort_day": b.column("cohort_day"),
             "day_offset": pc.subtract(b.column("day"),
                                       b.column("cohort_day"))}
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(
        offsets, ["cohort_day", "day_offset"],
        [("users", "cohort_day", "count")],
    )


def funnel_counts(events, *, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type"):
    """Ordered funnel: users reaching step k = users with a strictly
    increasing timestamp chain t_1 < t_2 < … < t_k where t_i is the
    EARLIEST step-i event after t_{i-1} (the standard greedy funnel —
    earliest-first maximizes reach, so it's order-canonical and
    SQL-replayable with per-step MIN chains).

    Physical plan: per step one user-key ``cluster_join`` of the step's
    events against the previous frontier + one ``grouped_agg`` min — the
    frontier shrinks monotonically; counts are per-step ``count()``
    scalars (driver holds len(steps) ints). No sort, no per-user state.

    → (step:int64, users:int64), step 1-based, one row per step.
    """
    import pyarrow.compute as pc

    from .relational import cluster_join, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        us = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "t": us,
             "typ": b.column(type_col)}
        )

    ev = events.map_batches(prep, batch_format="pyarrow").materialize()

    frontier = None  # (user, t) = earliest completion of the chain so far
    counts = []
    for step in steps:
        mine = ev.map_batches(
            lambda b, _s=step: b.filter(
                pc.equal(b.column("typ"), _s)
            ).select(["user", "t"]),
            batch_format="pyarrow",
        )
        if frontier is None:
            reached = grouped_agg(mine, ["user"], [("t", "t", "min")])
        else:
            cand = cluster_join(
                mine, frontier.map_batches(
                    lambda b: pa.table(
                        {"user": b.column("user"), "prev": b.column("t")}
                    ),
                    batch_format="pyarrow",
                ),
                ["user"],
                left_types={"user": pa.int64(), "t": pa.int64()},
                right_types={"prev": pa.int64()},
            ).map_batches(
                lambda b: b.filter(
                    pc.greater(b.column("t"), b.column("prev"))
                ).select(["user", "t"]),
                batch_format="pyarrow",
            )
            reached = grouped_agg(cand, ["user"], [("t", "t", "min")])
        frontier = reached.materialize()  # next join + the count scalar
        counts.append(frontier.count())

    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"step": pa.array(range(1, len(steps) + 1), pa.int64()),
             "users": pa.array(counts, pa.int64())}
        )
    )


def event_transitions(events, *, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id"):
    """First-order Markov transition counts: per user, events ordered by
    (ts, event_id) — the id tie-break makes the order total, so the
    result is deterministic and a SQL LEAD() window replays it exactly —
    consecutive (prev_type, next_type) pairs counted corpus-wide.

    Physical plan: one user-key ``cluster_apply`` (block-local Arrow sort
    + numpy shift-compare per block, not per user) emitting per-block
    PARTIAL pair counts, then one small ``grouped_agg`` merge over the
    (prev, next) type alphabet — the wide exchange carries |alphabet|²
    rows per block, not per event.

    → (prev_type, next_type, n:int64).
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "t": b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
             "eid": b.column(id_col).cast(pa.int64()),
             "typ": b.column(type_col)}
        )

    def pairs(block: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            block,
            sort_keys=[("user", "ascending"), ("t", "ascending"),
                       ("eid", "ascending")],
        )
        s = block.take(idx)
        user = s.column("user").to_numpy(zero_copy_only=False)
        typ = s.column("typ").combine_chunks()
        if len(user) < 2:
            return pa.table(
                {"prev_type": pa.array([], pa.string()),
                 "next_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        same = user[1:] == user[:-1]
        prev = typ.slice(0, len(user) - 1).filter(pa.array(same))
        nxt = typ.slice(1).filter(pa.array(same))
        part = pa.table({"prev_type": prev, "next_type": nxt}).group_by(
            ["prev_type", "next_type"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"prev_type": part.column("prev_type"),
             "next_type": part.column("next_type"),
             "n": part.column("count_all").cast(pa.int64())}
        )

    partials = cluster_apply(
        events.map_batches(prep, batch_format="pyarrow"), ["user"], pairs
    )
    return grouped_agg(partials, ["prev_type", "next_type"],
                       [("n", "n", "sum")])


def event_runs(events, *, user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", id_col: str = "event_id"):
    """Run-length encoding of per-user event streams (gaps-and-islands):
    consecutive same-type events under the (ts, event_id) total order
    collapse into runs. The standard LAG-breaks + windowed-SUM SQL shape,
    replayed here block-locally.

    Physical plan: ONE user-key ``cluster_apply`` — block-local Arrow
    sort, numpy boundary detection (user change ∨ type change), and
    per-run aggregation via ``np.flatnonzero`` boundaries — python loops
    over nothing; runs per user are numbered by position. One exchange
    total; output is run-count-sized.

    → (user_id, run_idx, event_type, n_events, start_ts, end_ts).
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "t": b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
             "eid": b.column(id_col).cast(pa.int64()),
             "typ": b.column(type_col)}
        )

    def runs(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "run_idx": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "n_events": pa.array([], pa.int64()),
             "start_ts": pa.array([], pa.timestamp("us")),
             "end_ts": pa.array([], pa.timestamp("us"))}
        )
        if block.num_rows == 0:
            return empty
        idx = pc.sort_indices(
            block,
            sort_keys=[("user", "ascending"), ("t", "ascending"),
                       ("eid", "ascending")],
        )
        s = block.take(idx)
        user = s.column("user").to_numpy(zero_copy_only=False)
        t = s.column("t").to_numpy(zero_copy_only=False)
        typ = s.column("typ").to_numpy(zero_copy_only=False)
        n = len(user)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (user[1:] != user[:-1]) | (typ[1:] != typ[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [n]))
        # run_idx: runs are contiguous per user after the sort — number
        # each run by its offset from the user's first run
        user_start = np.ones(len(starts), dtype=bool)
        user_start[1:] = user[starts[1:]] != user[starts[:-1]]
        first_of_user = np.maximum.accumulate(
            np.where(user_start, np.arange(len(starts)), 0)
        )
        run_idx = np.arange(len(starts)) - first_of_user
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "run_idx": pa.array(run_idx, pa.int64()),
                "event_type": pa.array(typ[starts].tolist(), pa.string()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_ts": pa.array(t[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "end_ts": pa.array(t[ends - 1], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return cluster_apply(
        events.map_batches(prep, batch_format="pyarrow"), ["user"], runs
    )


def interval_coverage(events, *, user_col: str = "user_id",
                      ts_col: str = "ts", dur_col: str = "value",
                      unit_us: int = 1_000_000):
    """Merged-interval coverage per user: each event spans
    [ts, ts + max(0, round(dur·unit_us))); overlapping/touching-inside
    spans merge into islands (strictly-after starts open a new island —
    the running-max formulation); output counts islands and the exact
    union length in integer microseconds.

    Duration quantizes with round-half-away (the repo's oracle rounding
    convention), so everything downstream is int64 — exact.

    Physical plan: ONE user-key ``cluster_apply``: block-local (user, s,
    e) sort, ``np.maximum.accumulate`` running max per user for island
    breaks, per-island min-start/max-end via boundary indexing — python
    loops over nothing. Output is user-count-sized.

    → (user_id, n_islands:int64, covered_us:int64).
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def prep(b: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        s = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        dur = pc.max_element_wise(
            pc.cast(
                pc.round(pc.multiply(b.column(dur_col), unit_us),
                         options=away),
                pa.int64(),
            ),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "s": s, "e": pc.add(s, dur)}
        )

    def cover(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_islands": pa.array([], pa.int64()),
                 "covered_us": pa.array([], pa.int64())}
            )
        srt = block.sort_by(
            [("user", "ascending"), ("s", "ascending"), ("e", "ascending")]
        )
        user = srt.column("user").to_numpy(zero_copy_only=False)
        s = srt.column("s").to_numpy(zero_copy_only=False)
        e = srt.column("e").to_numpy(zero_copy_only=False)
        n = len(user)
        user_head = np.ones(n, dtype=bool)
        user_head[1:] = user[1:] != user[:-1]
        # per-user running max of e: maximum.accumulate, reset at user
        # boundaries by segment trick (subtract per-user offset is wrong
        # for max — instead accumulate over (user, e) pairs: within a
        # user the plain accumulate is correct, and at a user head we
        # restart by taking e as-is; do it segment-wise via np.fmax with
        # a reset mask loop-free using the standard "grouped cummax":
        run = e.copy()
        # grouped cummax: iterate log(n) doubling — O(n log n), loop-free
        shift = 1
        while shift < n:
            prev = np.empty(n, dtype=run.dtype)
            prev[:shift] = run[:shift]
            prev[shift:] = run[:-shift]
            same = np.zeros(n, dtype=bool)
            same[shift:] = user[shift:] == user[:-shift]
            # only allow carrying where the whole shifted span stays
            # within one user — user array is sorted, so equality of the
            # endpoints implies the span is one user
            np.maximum(run, np.where(same, prev, run), out=run)
            shift *= 2
        prev_max = np.empty(n, dtype=e.dtype)
        prev_max[0] = 0
        prev_max[1:] = run[:-1]
        new_island = user_head | (s > prev_max)
        starts = np.flatnonzero(new_island)
        ends = np.concatenate((starts[1:], [n]))
        isl_user = user[starts]
        isl_s = s[starts]
        isl_e = run[ends - 1]
        lengths = isl_e - isl_s
        # per-user rollup (islands are contiguous per user after sort)
        u_head = np.ones(len(starts), dtype=bool)
        u_head[1:] = isl_user[1:] != isl_user[:-1]
        u_starts = np.flatnonzero(u_head)
        u_ends = np.concatenate((u_starts[1:], [len(starts)]))
        cum = np.concatenate(([0], np.cumsum(lengths)))
        return pa.table(
            {"user_id": pa.array(isl_user[u_starts], pa.int64()),
             "n_islands": pa.array(u_ends - u_starts, pa.int64()),
             "covered_us": pa.array(
                 cum[u_ends] - cum[u_starts], pa.int64())}
        )

    return cluster_apply(
        events.map_batches(prep, batch_format="pyarrow"), ["user"], cover
    )


def last_touch_attribution(events, *, conversion: str = "purchase",
                           user_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id"):
    """Last-touch conversion attribution: every ``conversion`` event is
    credited to the SAME USER's most recent strictly-earlier
    non-conversion event type under the (ts, event_id) total order —
    the id tie-break makes "most recent" deterministic, so a SQL
    LAST_VALUE(... IGNORE NULLS) window replays it exactly. Conversions
    with no prior touch credit the ``direct`` channel.

    Physical plan: ONE user-key ``cluster_apply`` — block-local Arrow
    sort, then a single vectorized ``np.maximum.accumulate`` over
    candidate indexes (the classic segmented last-seen scan: a
    cross-user carry is rejected by comparing the accumulated index
    against the row's segment start, so no per-user loop exists) —
    emitting per-block PARTIAL channel counts; one tiny ``grouped_agg``
    merge over the channel alphabet. Bytes on the wire: O(alphabet ×
    blocks), never O(events).

    → (channel:string, n_conversions:int64).
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user": b.column(user_col).cast(pa.int64()),
             "t": b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
             "eid": b.column(id_col).cast(pa.int64()),
             "typ": b.column(type_col)}
        )

    def attribute(block: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            block,
            sort_keys=[("user", "ascending"), ("t", "ascending"),
                       ("eid", "ascending")],
        )
        s = block.take(idx)
        n = s.num_rows
        empty = pa.table(
            {"channel": pa.array([], pa.string()),
             "n_p": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        user = s.column("user").to_numpy(zero_copy_only=False)
        typ = s.column("typ").to_numpy(zero_copy_only=False)
        is_conv = typ == conversion
        rows = np.arange(n, dtype=np.int64)
        # last non-conversion index at-or-before each row; conversion rows
        # contribute -1, so acc[i] at a conversion row IS "strictly earlier"
        acc = np.maximum.accumulate(np.where(is_conv, -1, rows))
        seg_change = np.flatnonzero(user[1:] != user[:-1]) + 1
        starts = np.concatenate(([0], seg_change))
        seg_start = np.repeat(
            starts, np.diff(np.concatenate((starts, [n])))
        )
        conv_rows = np.flatnonzero(is_conv)
        if len(conv_rows) == 0:
            return empty
        prior = acc[conv_rows]
        in_seg = prior >= seg_start[conv_rows]
        channel = np.where(
            in_seg, typ[np.where(in_seg, prior, 0)], "direct"
        )
        part = pa.table(
            {"channel": pa.array(channel.astype(object), pa.string())}
        ).group_by(["channel"]).aggregate([([], "count_all")])
        return pa.table(
            {"channel": part.column("channel"),
             "n_p": part.column("count_all").cast(pa.int64())}
        )

    partials = cluster_apply(
        events.map_batches(prep, batch_format="pyarrow"),
        ["user"], attribute,
    )
    out = grouped_agg(partials, ["channel"], [("n_conversions", "n_p", "sum")])
    return out
