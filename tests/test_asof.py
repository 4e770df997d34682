"""As-of join: per-key latest-at-or-before lookup."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _ds(rows, cols):
    arrays = {}
    for i, (name, typ) in enumerate(cols):
        arrays[name] = pa.array([r[i] for r in rows], typ)
    return rd.from_arrow(pa.table(arrays)).repartition(3)


def test_asof_basic_and_nulls():
    left = _ds(
        [(1, _m(5), 100), (1, _m(20), 101), (2, _m(1), 200), (3, _m(9), 300)],
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("click_id", pa.int64())],
    )
    right = _ds(
        [(1, _m(0), 900), (1, _m(10), 901), (2, _m(2), 902)],
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("view_id", pa.int64())],
    )
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    left_cols=["click_id"], right_cols=["view_id"]).take_all()
    by_click = {r["click_id"]: r for r in out}
    assert len(by_click) == 4
    assert by_click[100]["view_id"] == 900 and by_click[100]["ts_r"] == _m(0)
    assert by_click[101]["view_id"] == 901  # latest at-or-before 20m
    assert by_click[200]["view_id"] is None  # right row is AFTER the left ts
    assert by_click[300]["view_id"] is None  # key has no right rows


def test_asof_equal_ts_is_inclusive():
    left = _ds([(1, _m(10), 1)],
               [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("click_id", pa.int64())])
    right = _ds([(1, _m(10), 77)],
                [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("view_id", pa.int64())])
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    left_cols=["click_id"], right_cols=["view_id"]).take_all()
    assert out[0]["view_id"] == 77  # <= semantics


def test_asof_matches_duckdb_asof_join():
    import duckdb
    import numpy as np

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lrows = [(int(rng.integers(0, 20)), _m(int(rng.integers(0, 500))), i)
             for i in range(n_l)]
    rrows_raw = [(int(rng.integers(0, 20)), _m(int(rng.integers(0, 500))), 1000 + i)
                 for i in range(n_r)]
    # unique (key, ts) on the right for well-defined ASOF semantics
    seen, rrows = set(), []
    for k, ts, vid in rrows_raw:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rrows.append((k, ts, vid))

    cols_l = [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("click_id", pa.int64())]
    cols_r = [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("view_id", pa.int64())]
    got = asof_join(_ds(lrows, cols_l), _ds(rrows, cols_r), on="user_id",
                    ts_col="ts", left_cols=["click_id"],
                    right_cols=["view_id"]).take_all()

    con = duckdb.connect()
    con.register("l", pa.table({n: pa.array([r[i] for r in lrows], t)
                                for i, (n, t) in enumerate(cols_l)}))
    con.register("r", pa.table({n: pa.array([r[i] for r in rrows], t)
                                for i, (n, t) in enumerate(cols_r)}))
    exp = con.sql("""
        SELECT l.click_id, r.view_id
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """).fetchall()
    exp_map = {c: v for c, v in exp}
    got_map = {r["click_id"]: r["view_id"] for r in got}
    assert got_map == exp_map
