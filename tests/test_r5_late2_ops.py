"""Brute-force replays for the late-r5 wave 2 operators: grouped_corr
(exact-moment Pearson), vocab_overlap (host-pair Jaccard), and the
covisitation reuse of cocitation_counts over parsed event props."""

import math

import pyarrow as pa
import ray


def _ds(tbl: pa.Table):
    return ray.data.from_arrow(tbl).repartition(3)


def test_grouped_corr_matches_brute_force(ray_session):
    from ocr_search_ray.stages.relational import grouped_corr

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4, 5]
    grp = ["a", "b", "a", "b", "a", "b", "a", "b", "a", "b", "a", "b"]
    tbl = pa.table({"g": pa.array(grp), "x": pa.array(xs, pa.int64()),
                    "y": pa.array(ys, pa.int64())})
    out = {r["g"]: r for r in
           grouped_corr(_ds(tbl), ["g"], "x", "y").take_all()}
    for g in ("a", "b"):
        sel = [(x, y) for x, y, gg in zip(xs, ys, grp) if gg == g]
        n = float(len(sel))
        sx = float(sum(x for x, _ in sel))
        sy = float(sum(y for _, y in sel))
        sxx = float(sum(x * x for x, _ in sel))
        syy = float(sum(y * y for _, y in sel))
        sxy = float(sum(x * y for x, y in sel))
        num = n * sxy - sx * sy
        den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert out[g]["n"] == len(sel)
        assert out[g]["corr"] == (0.0 if den == 0 else num / den)


def test_grouped_corr_zero_variance_group(ray_session):
    from ocr_search_ray.stages.relational import grouped_corr

    tbl = pa.table({"g": pa.array(["z"] * 4),
                    "x": pa.array([7, 7, 7, 7], pa.int64()),
                    "y": pa.array([1, 2, 3, 4], pa.int64())})
    (row,) = grouped_corr(_ds(tbl), ["g"], "x", "y").take_all()
    assert row["corr"] == 0.0 and row["n"] == 4


def test_vocab_overlap_matches_brute_force(ray_session):
    from ocr_search_ray.stages.textstats import vocab_overlap

    pages = pa.table(
        {
            "url": pa.array(
                ["https://a.com/1", "https://a.com/2",
                 "https://b.com/1", "https://c.com/1"]),
            "text": pa.array(
                ["red blue green", "blue yellow",
                 "red blue", "purple"]),
        }
    )
    rows = {(r["host1"], r["host2"]): r for r in
            vocab_overlap(_ds(pages)).take_all()}
    # a.com vocab {red,blue,green,yellow}, b.com {red,blue}, c.com {purple}
    assert set(rows) == {("a.com", "b.com")}  # c shares nothing → absent
    r = rows[("a.com", "b.com")]
    assert (r["n_shared"], r["n_union"]) == (2, 4)
    assert r["jaccard"] == 2.0 / 4.0


def test_vocab_overlap_apex_guard(ray_session):
    from ocr_search_ray.stages.textstats import vocab_overlap

    # 'common' appears on all 3 hosts; guard at 2 drops its pairs, so the
    # only surviving pair is the one sharing a below-guard term.
    pages = pa.table(
        {
            "url": pa.array(["https://a.com/1", "https://b.com/1",
                             "https://c.com/1"]),
            "text": pa.array(["common pair", "common pair", "common"]),
        }
    )
    rows = vocab_overlap(_ds(pages), max_hosts_per_term=2).take_all()
    assert {(r["host1"], r["host2"]) for r in rows} == {("a.com", "b.com")}
    (r,) = rows
    assert r["n_shared"] == 1  # 'pair' only; 'common' guarded out


def test_covisitation_entry_matches_brute_force(ray_session, tmp_path):
    import itertools

    import pyarrow.parquet as pq

    from ocr_search_ray.pipelines.queries import q_covisitation

    users = [1, 1, 1, 2, 2, 3, 3, 3]
    items = [10, 20, 20, 10, 30, 10, 20, 30]
    kinds = ["purchase"] * 7 + ["view"]  # last row must be ignored
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(kinds),
            "props": pa.array(['{"k": %d}' % i for i in items]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {(r["item1"], r["item2"]): r["n_common_users"]
           for r in q_covisitation(str(tmp_path)).take_all()}
    baskets = {}
    for u, i, k in zip(users, items, kinds):
        if k == "purchase":
            baskets.setdefault(u, set()).add(i)
    want: dict = {}
    for basket in baskets.values():
        for a, b in itertools.combinations(sorted(basket), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
