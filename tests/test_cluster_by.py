"""cluster_by/cluster_apply: the engine's int-key exchange primitive."""

import pyarrow as pa
import ray
import ray.data as rd

from ocr_search_ray.stages.relational import cluster_apply, cluster_by


def _docs(n_keys=50, rows_per_key=8):
    keys, vals = [], []
    for k in range(n_keys):
        for r in range(rows_per_key):
            keys.append(f"key-{k:03d}")
            vals.append(k * 1000 + r)
    return rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    ).repartition(7)  # scatter keys across blocks


def _sums(ds, **kw):
    # defined as a closure so cloudpickle ships it by value (test modules
    # aren't importable in Ray workers)
    def block_sum(block: pa.Table) -> pa.Table:
        agg = block.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": agg.column("k"), "s": agg.column("v_sum")})

    rows = cluster_apply(ds, ["k"], block_sum, **kw).take_all()
    return {r["k"]: r["s"] for r in rows}


def test_cluster_apply_block_local_groupby_is_globally_exact():
    got = _sums(_docs())
    expected = {
        f"key-{k:03d}": sum(k * 1000 + r for r in range(8)) for k in range(50)
    }
    assert got == expected


def test_cluster_by_never_splits_a_key_across_blocks():
    mat = cluster_by(_docs(), ["k"]).materialize()
    owners: dict[str, int] = {}
    for bi, ref in enumerate(mat.get_internal_block_refs()):
        block = ray.get(ref)
        for key in set(block.column("k").to_pylist()):
            assert owners.setdefault(key, bi) == bi, f"{key} split across blocks"
    assert len(owners) == 50


def test_cluster_apply_exact_under_total_hash_collision():
    """Force every key to hash identically — all rows land in one block and
    the block-local group_by must still produce exact per-key results
    (collision safety is by construction, not by hash quality)."""
    got = _sums(_docs(n_keys=20, rows_per_key=5), hash_fn=lambda b: 7)
    expected = {
        f"key-{k:03d}": sum(k * 1000 + r for r in range(5)) for k in range(20)
    }
    assert got == expected


def test_skewed_hot_key_completes_and_is_exact():
    """One key holds 90% of rows (Zipf head) — the exchange must not lose or
    duplicate anything."""
    keys = ["hot"] * 9000 + [f"cold-{i}" for i in range(1000)]
    vals = list(range(10000))
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    ).repartition(11)
    got = _sums(ds)
    assert got["hot"] == sum(range(9000))
    assert len(got) == 1001
    assert got["cold-0"] == 9000


def test_multi_column_keys_and_int_keys():
    t = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 1], pa.int64()),
            "b": pa.array(["x", "x", "x", "y", "x"]),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )

    def blk(block: pa.Table) -> pa.Table:
        agg = block.group_by(["a", "b"]).aggregate([("v", "sum")])
        return pa.table(
            {"a": agg.column("a"), "b": agg.column("b"), "s": agg.column("v_sum")}
        )

    rows = cluster_apply(rd.from_arrow(t).repartition(3), ["a", "b"], blk).take_all()
    got = {(r["a"], r["b"]): r["s"] for r in rows}
    assert got == {(1, "x"): 80, (2, "x"): 30, (2, "y"): 40}


def test_broadcast_range_join():
    from ocr_search_ray.stages.relational import broadcast_range_join

    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "value": pa.array([5.0, 10.0, 99.0, 24.999], pa.float64()),
            }
        )
    )
    ranges = [(0.0, 10.0, "low"), (10.0, 25.0, "mid")]
    out = {r["id"]: r for r in broadcast_range_join(
        ds, ranges, "value", label_names=["bucket"]).take_all()}
    assert out[1]["bucket"] == "low" and out[1]["lo"] == 0.0
    assert out[2]["bucket"] == "mid"      # boundary: lo inclusive
    assert out[3]["bucket"] is None       # outside every range
    assert out[4]["bucket"] == "mid"

    import pytest

    with pytest.raises(ValueError):
        broadcast_range_join(ds, [(5.0, 2.0, "bad")], "value",
                             label_names=["bucket"])
    with pytest.raises(ValueError):
        broadcast_range_join(ds, [(0.0, 10.0, "a"), (5.0, 20.0, "b")],
                             "value", label_names=["bucket"])


import pytest


@pytest.mark.parametrize("slots", [8, 64])
def test_heavy_terms_sketch_verify_is_exact_under_eviction(slots):
    """Tiny slot budget forces MG evictions; the verify pass must still
    produce exactly the terms with cf >= min_cf."""
    from collections import Counter

    from ocr_search_ray.stages.index import heavy_terms

    docs, terms, tfs = [], [], []
    # zipf-ish: term t_i appears ~ 600/i times across docs
    true = Counter()
    row = 0
    for i in range(1, 40):
        for rep in range(600 // i):
            docs.append(f"d{row % 17}")
            terms.append(f"t{i}")
            tfs.append(1 + (row % 3))
            true[f"t{i}"] += 1 + (row % 3)
            row += 1
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(docs),
                "term": pa.array(terms),
                "tf": pa.array(tfs, pa.int64()),
            }
        )
    ).repartition(9)
    min_cf = 300
    # slots=8 breaks the superset bound (slots*min_cf <= N) -> exact
    # fallback; slots=64 holds it -> MG sketch + distributed merge path
    got = {r["term"]: r["cf"] for r in heavy_terms(ds, min_cf=min_cf, slots=slots).take_all()}
    expected = {t: c for t, c in true.items() if c >= min_cf}
    assert got == expected


def test_cluster_join_inner_matches_python_join():
    from ocr_search_ray.stages.relational import cluster_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i % 20}" for i in range(200)]),
                "x": pa.array(list(range(200)), pa.int64()),
            }
        )
    ).repartition(5)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i}" for i in range(0, 30, 2)]),  # k0,k2,...k28
                "y": pa.array([i * 10 for i in range(0, 30, 2)], pa.int64()),
            }
        )
    ).repartition(3)
    got = sorted(
        (r["k"], r["x"], r["y"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={"y": pa.int64()},
        ).take_all()
    )
    expected = sorted(
        (f"k{i % 20}", i, (i % 20) * 10)
        for i in range(200)
        if i % 20 < 30 and (i % 20) % 2 == 0
    )
    assert got == expected


def test_cluster_join_left_outer_nulls_unmatched():
    from ocr_search_ray.stages.relational import cluster_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b", "c"]), "x": pa.array([1, 2, 3], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(["b"]), "y": pa.array([99], pa.int64())})
    )
    got = sorted(
        (r["k"], r["x"], r["y"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={"y": pa.int64()},
            how="left",
        ).take_all()
    )
    assert got == [("a", 1, None), ("b", 2, 99), ("c", 3, None)]


def test_cluster_join_duplicate_right_keys_multiply():
    from ocr_search_ray.stages.relational import cluster_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b"]), "x": pa.array([1, 2], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(["a", "a"]), "y": pa.array([10, 20], pa.int64())})
    )
    got = sorted(
        (r["k"], r["x"], r["y"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={"y": pa.int64()},
        ).take_all()
    )
    assert got == [("a", 1, 10), ("a", 1, 20)]


def test_cluster_apply_exact_when_partition_exceeds_target_block_size():
    """Loud pin of the cluster_apply invariant (see relational.py): a hot
    key whose rows far exceed target_max_block_size must still arrive in ONE
    block, or block-local grouping would emit split groups. If a Ray upgrade
    starts splitting sort-reduce partitions, this fails instead of silently
    corrupting aggregates."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 256 * 1024  # 256 KiB
    try:
        n_hot = 60_000  # ~50 B/row payload -> several MiB for one key
        keys = ["hot-key"] * n_hot + [f"cold-{i % 40}" for i in range(20_000)]
        vals = list(range(len(keys)))
        pad = ["x" * 40] * len(keys)
        ds = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(keys),
                    "v": pa.array(vals, pa.int64()),
                    "pad": pa.array(pad),
                }
            )
        ).repartition(16)

        def block_sum(block: pa.Table) -> pa.Table:
            agg = block.group_by("k").aggregate([("v", "sum"), ("v", "count")])
            return pa.table(
                {
                    "k": agg.column("k"),
                    "s": agg.column("v_sum"),
                    "c": agg.column("v_count").cast(pa.int64()),
                }
            )

        out = cluster_apply(ds, ["k"], block_sum).take_all()
        by_key = {}
        for r in out:
            # a key appearing TWICE in the output = split group = broken
            assert r["k"] not in by_key, f"split group for {r['k']}"
            by_key[r["k"]] = (r["s"], r["c"])
        assert by_key["hot-key"] == (sum(range(n_hot)), n_hot)
        assert sum(c for _s, c in by_key.values()) == len(keys)
    finally:
        ctx.target_max_block_size = old


def test_cluster_join_semi_and_anti():
    from ocr_search_ray.stages.relational import cluster_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b", "c", "a"]),
                  "x": pa.array([1, 2, 3, 4], pa.int64())})
    ).repartition(2)
    right = rd.from_arrow(
        pa.table({"k": pa.array(["a", "a", "z"])})  # dup right keys
    )
    semi = sorted(
        (r["k"], r["x"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={}, how="semi",
        ).take_all()
    )
    anti = sorted(
        (r["k"], r["x"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.string(), "x": pa.int64()},
            right_types={}, how="anti",
        ).take_all()
    )
    assert semi == [("a", 1), ("a", 4)]  # no duplication from dup right keys
    assert anti == [("b", 2), ("c", 3)]


def test_rollup_agg_levels():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.relational import rollup_agg

    t = pa.table(
        {
            "a": ["x", "x", "y"],
            "b": ["p", "q", "p"],
            "v": [1, 2, 4],
        }
    )
    out = rollup_agg(
        rd.from_arrow(t), ["a", "b"],
        [("s", "v", "sum"), ("n", "v", "count")],
    ).to_pandas()
    assert len(out) == 3 + 2 + 1  # finest + per-a + grand total
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["s"].tolist() == [7] and total["n"].tolist() == [3]
    per_a = out[out["a"].notna() & out["b"].isna()].sort_values("a")
    assert per_a["s"].tolist() == [3, 4]
    finest = out[out["b"].notna()]
    assert sorted(finest["s"].tolist()) == [1, 2, 4]


def test_salted_join_matches_plain_on_hot_key():
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from ocr_search_ray.stages.relational import (
        cluster_join,
        salted_cluster_join,
    )

    # 2000 left rows, 90% share ONE hot key (the skew case the salt fixes)
    n = 2000
    left = pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "k": pa.array([7 if i % 10 else i for i in range(n)], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([7, 11, 2050], pa.int64()),
            "label": ["hot", "cold", "unmatched-left"],
        }
    )
    kw = dict(
        left_types={"rid": pa.int64(), "k": pa.int64()},
        right_types={"label": pa.string()},
    )
    for how in ("inner", "left", "semi", "anti"):
        plain = (
            cluster_join(rd.from_arrow(left), rd.from_arrow(right), ["k"],
                         how=how, **kw)
            .to_pandas().sort_values(["rid"]).reset_index(drop=True)
        )
        salted = (
            salted_cluster_join(rd.from_arrow(left), rd.from_arrow(right),
                                ["k"], salt_col="rid", n_salts=8, how=how,
                                **kw)
            .to_pandas().sort_values(["rid"]).reset_index(drop=True)
        )
        assert plain.equals(salted), how
    with _pytest.raises(ValueError):
        salted_cluster_join(rd.from_arrow(left), rd.from_arrow(right),
                            ["k"], salt_col="rid", how="full", **kw)


def test_broadcast_lookup_join_vectorized_inner_and_left():
    """VERDICT r4 #8: the probe is pc.index_in + take (no per-row Python);
    inner drops missing keys, left appends nulls, int32 probe casts to the
    lookup key type."""
    from ocr_search_ray.stages.relational import broadcast_lookup_join

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2], pa.int32()),
        "x": pa.array(list("abcde")),
    }))
    lookup = {2: ("two", 20), 4: ("four", 40)}
    out_cols = {"name": pa.string(), "ten": pa.int64()}

    inner = sorted(
        broadcast_lookup_join(ds, lookup, "k", out_cols).take_all(),
        key=lambda r: r["x"])
    assert [(r["k"], r["x"], r["name"], r["ten"]) for r in inner] == [
        (2, "b", "two", 20), (4, "d", "four", 40), (2, "e", "two", 20)]

    left = sorted(
        broadcast_lookup_join(ds, lookup, "k", out_cols,
                              how="left").take_all(),
        key=lambda r: r["x"])
    assert [(r["k"], r["name"], r["ten"]) for r in left] == [
        (1, None, None), (2, "two", 20), (3, None, None),
        (4, "four", 40), (2, "two", 20)]
