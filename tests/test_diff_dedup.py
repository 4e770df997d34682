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


def test_curate_pipeline_composition():
    """quality gate + exact-rep + near-dup loser removal compose exactly."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.pipelines.curate import curate

    # 60 distinct words → appended word keeps jaccard ≈ 0.98 (verified
    # deterministically caught by the banded LSH with these md5 planes)
    long = "spark " + " ".join(f"w{i}" for i in range(60))
    near = long + " extraword"  # near-dup of `long`
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([
                long,                 # 1: survives (rep, quality ok)
                long,                 # 2: exact dup of 1 → dropped (not rep)
                near,                 # 3: near-dup of 1 → dropped (loser)
                "too short",          # 4: fails quality
                ("the and of to in is was " * 20).strip(),  # 5: stopword soup
            ]),
        }
    )
    out = curate(rd.from_arrow(docs)).take_all()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_tokens"] > 30
