"""Snapshot diff classification + keep-latest upsert dedup (J2 / D1)."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.diff import diff_snapshots, keep_latest


def _snap(rows):
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [dt.datetime(2025, 1, 1) + dt.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_diff_classification():
    old = _snap([("a", 1), ("b", 1), ("c", 5)])
    new = _snap([("b", 3), ("c", 5), ("d", 9)])
    got = {r["key"]: r["change"] for r in diff_snapshots(old, new).take_all()}
    assert got == {
        "a": "deleted",
        "b": "modified",  # newer ts
        "c": "unchanged",  # equal ts is NOT modified (strict >)
        "d": "added",
    }


def test_keep_latest_is_deterministic_total_order():
    t = pa.table(
        {
            "url": pa.array(["u", "u", "u", "v"], pa.string()),
            "warc_ts": pa.array([2, 5, 5, 1], pa.int64()),
            "event_id": pa.array([10, 11, 12, 1], pa.int64()),
            "payload": pa.array(["old", "mid", "new", "only"], pa.string()),
        }
    )
    out = keep_latest(rd.from_arrow(t), ["url"], ["warc_ts", "event_id"]).take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url["u"]["payload"] == "new"  # ts tie broken by event_id
    assert by_url["v"]["payload"] == "only"
