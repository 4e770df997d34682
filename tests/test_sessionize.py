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
