"""Gap-based sessionization (windowed-aggregate pattern)."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.sessionize import sessionize


def _events(rows):
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
            }
        )
    ).repartition(3)


def test_sessions_split_on_gap():
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0), (1, t0 + 5 * m), (1, t0 + 10 * m),      # session 0
        (1, t0 + 50 * m), (1, t0 + 55 * m),              # session 1 (40m gap)
        (2, t0 + 2 * m),                                 # user 2, session 0
    ]
    out = sessionize(_events(rows), gap=dt.timedelta(minutes=30)).take_all()
    sess = {(r["user_id"], r["session_idx"]): r for r in out}
    assert len(sess) == 3
    assert sess[(1, 0)]["n_events"] == 3
    assert sess[(1, 0)]["start_ts"] == t0 and sess[(1, 0)]["end_ts"] == t0 + 10 * m
    assert sess[(1, 1)]["n_events"] == 2
    assert sess[(1, 1)]["start_ts"] == t0 + 50 * m
    assert sess[(2, 0)]["n_events"] == 1


def test_gap_boundary_is_strict():
    t0 = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(minutes=30)
    rows = [(1, t0), (1, t0 + gap)]          # exactly the gap → SAME session
    out = sessionize(_events(rows), gap=gap).take_all()
    assert len(out) == 1 and out[0]["n_events"] == 2
    rows = [(1, t0), (1, t0 + gap + dt.timedelta(microseconds=1))]
    out = sessionize(_events(rows), gap=gap).take_all()
    assert len(out) == 2


def test_events_scattered_across_blocks_still_one_session():
    t0 = dt.datetime(2024, 1, 1)
    rows = [(7, t0 + dt.timedelta(minutes=i)) for i in range(20)]
    out = sessionize(_events(rows)).take_all()
    assert len(out) == 1
    assert out[0]["n_events"] == 20


def test_event_lag_features_gaps_and_rolling_sum():
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.sessionize import event_lag_features

    t0 = dt.datetime(2024, 1, 1)
    rows = {
        "event_id": [1, 2, 3, 4, 10],
        "user_id": [7, 7, 7, 7, 9],
        "ts": [t0, t0 + dt.timedelta(seconds=5), t0 + dt.timedelta(seconds=6),
               t0 + dt.timedelta(seconds=10), t0],
        "value": [1.0, 2.0, 3.0, 4.0, 0.5],
    }
    out = (
        event_lag_features(rd.from_arrow(pa.table(rows)), preceding=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 7: gaps null/5s/1s/4s; rolling window = current + 2 preceding
    gaps = out["prev_gap_us"].tolist()
    assert gaps[0] is None or gaps[0] != gaps[0]  # null first event
    assert gaps[1:4] == [5_000_000, 1_000_000, 4_000_000]
    assert out["roll_sum_cents"].tolist() == [100, 300, 600, 900, 50]
    # user 9's single event: null gap, own cents only
    assert out.loc[4, "event_id"] == 10


def test_pivot_counts_listed_and_other():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.relational import pivot_counts

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": ["x", "y", "z", "x", "w"],
        }
    )
    out = (
        pivot_counts(rd.from_arrow(t), ["k"], "v", ["x", "y"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["x_cnt"].tolist() == [1, 1]
    assert out["y_cnt"].tolist() == [1, 0]
    assert out["other_cnt"].tolist() == [1, 1]


def test_running_totals_exact_per_key():
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.sessionize import running_totals

    base = dt.datetime(2025, 1, 1)
    rows = [  # (event_id, user, minute, value)
        (1, "u1", 0, 1.0), (2, "u1", 5, 3.5), (3, "u1", 6, 2.0),
        (4, "u2", 1, 9.0), (5, "u2", 2, -4.0),
        (6, "u3", 0, 0.005),  # rounds half away from zero → 1 cent
    ]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows]),
        "ts": pa.array([base + dt.timedelta(minutes=r[2]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })).repartition(3)
    got = {r["event_id"]: (r["run_count"], r["run_sum_cents"],
                           r["run_max_cents"])
           for r in running_totals(ds).take_all()}
    assert got == {
        1: (1, 100, 100), 2: (2, 450, 350), 3: (3, 650, 350),
        4: (1, 900, 900), 5: (2, 500, 900),
        6: (1, 1, 1),
    }


def _typed_events(rows):
    """rows = (user, ts, type)"""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_cohort_retention_day_matrix():
    from ocr_search_ray.stages.sessionize import cohort_retention

    d = lambda n, h=0: dt.datetime(2024, 1, 1 + n, h)
    rows = [
        (1, d(0), "x"), (1, d(0, 5), "x"), (1, d(1), "x"), (1, d(3), "x"),
        (2, d(0), "x"), (2, d(2), "x"),
        (3, d(2), "x"), (3, d(2, 9), "x"), (3, d(3), "x"),
    ]
    ev = _typed_events(rows).drop_columns(["event_type"])
    got = {
        (r["cohort_day"], r["day_offset"]): r["users"]
        for r in cohort_retention(ev).take_all()
    }
    day0 = dt.datetime(2024, 1, 1).timestamp() * 1_000_000 // 86_400_000_000
    c0, c2 = int(day0), int(day0) + 2
    # cohort day0 = users 1,2; offsets: 0 → both, 1 → user1, 2 → user2,
    # 3 → user1. cohort day2 = user3; offsets 0 and 1.
    assert got == {
        (c0, 0): 2, (c0, 1): 1, (c0, 2): 1, (c0, 3): 1,
        (c2, 0): 1, (c2, 1): 1,
    }


def test_funnel_counts_ordered_chain():
    from ocr_search_ray.stages.sessionize import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: full ordered funnel
        (1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "purchase"),
        # user 2: click BEFORE the first view — chain breaks at step 2,
        # then a later click continues it, but no purchase
        (2, t0 + m, "click"), (2, t0 + 2 * m, "view"), (2, t0 + 3 * m, "click"),
        # user 3: purchase before click — reaches step 2 only
        (3, t0, "view"), (3, t0 + m, "purchase"), (3, t0 + 2 * m, "click"),
        # user 4: view only
        (4, t0, "view"),
        # user 5: no view at all — never enters
        (5, t0, "purchase"),
    ]
    got = {r["step"]: r["users"] for r in
           funnel_counts(_typed_events(rows),
                         steps=["view", "click", "purchase"]).take_all()}
    assert got == {1: 4, 2: 3, 3: 1}


def test_funnel_strictly_increasing_excludes_ties():
    from ocr_search_ray.stages.sessionize import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "view"), (1, t0, "click")]  # tie → not after → breaks
    got = {r["step"]: r["users"] for r in
           funnel_counts(_typed_events(rows), steps=["view", "click"]).take_all()}
    assert got == {1: 1, 2: 0}


def test_event_transitions_counts():
    from ocr_search_ray.stages.sessionize import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "view"),
        (2, t0, "view"), (2, t0 + m, "click"),
        (3, t0, "error"),  # single event → no transition
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
            }
        )
    ).repartition(3)
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in event_transitions(ds).take_all()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_event_transitions_tie_break_by_event_id():
    from ocr_search_ray.stages.sessionize import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    # two events at the SAME ts: event_id order decides the chain
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "ts": pa.array([t0, t0], pa.timestamp("us")),
                "event_type": pa.array(["b", "a"], pa.string()),
                "event_id": pa.array([10, 2], pa.int64()),
            }
        )
    )
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in event_transitions(ds).take_all()}
    assert got == {("a", "b"): 1}


def test_event_runs_gaps_and_islands():
    from ocr_search_ray.stages.sessionize import event_runs

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, "view"), (1, t0 + m, "view"), (1, t0 + 2 * m, "click"),
        (1, t0 + 3 * m, "view"),
        (2, t0, "error"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
            }
        )
    ).repartition(3)
    got = {
        (r["user_id"], r["run_idx"]):
            (r["event_type"], r["n_events"], r["start_ts"], r["end_ts"])
        for r in event_runs(ds).take_all()
    }
    assert got == {
        (1, 0): ("view", 2, t0, t0 + m),
        (1, 1): ("click", 1, t0 + 2 * m, t0 + 2 * m),
        (1, 2): ("view", 1, t0 + 3 * m, t0 + 3 * m),
        (2, 0): ("error", 1, t0, t0),
    }


def test_interval_coverage_merges_islands():
    from ocr_search_ray.stages.sessionize import interval_coverage

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # user 1: [0,10) + [5,15) overlap → one island of 15 s;
    #         [20,21) touching nothing → second island of 1 s
    # user 2: [0,2) then [2,3) TOUCHING (s == prev max) → ONE island 3 s
    # user 3: zero/negative durations clamp to empty intervals
    rows = [
        (1, t0, 10.0), (1, t0 + 5 * s, 10.0), (1, t0 + 20 * s, 1.0),
        (2, t0, 2.0), (2, t0 + 2 * s, 1.0),
        (3, t0, 0.0), (3, t0 + 1 * s, -5.0),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    ).repartition(3)
    got = {r["user_id"]: (r["n_islands"], r["covered_us"])
           for r in interval_coverage(ds).take_all()}
    assert got[1] == (2, 16_000_000)
    assert got[2] == (1, 3_000_000)
    # zero-length intervals: s > prev_max(e=s) is False only when equal;
    # second event starts 1 s after the first empty interval → 2 islands
    assert got[3] == (2, 0)
