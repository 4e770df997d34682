"""Regression tests for the round-2 ADVICE findings.

1. salted_cluster_join: negative integer salt-column values must produce
   salts in 0..n_salts-1 (Euclidean mod) — truncating mod silently lost
   every match for rows with a negative salt value.
2. span_dedup: null-text docs must surface through the empty-doc branch
   (one-row-per-doc contract) instead of vanishing from both branches.
3. pack_sequences / global_rank: an upstream filter that empties a block
   must not crash the driver-side min()/max() over minmax partials.
4. decontaminate: membership compares the FULL 128-bit md5, not a 64-bit
   prefix.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def test_salted_join_negative_salt_column_matches_plain():
    from ocr_search_ray.stages.relational import (
        cluster_join,
        salted_cluster_join,
    )

    n = 400
    left = pa.table(
        {
            # salt column spans negative and positive values
            "rid": pa.array([i - n // 2 for i in range(n)], pa.int64()),
            "k": pa.array([7 if i % 4 else i for i in range(n)], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([7, 2, 9999], pa.int64()),
            "label": ["hot", "cold", "right-only"],
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


def test_span_dedup_null_text_surfaces_one_row_per_doc():
    from ocr_search_ray.stages.dedup import span_dedup

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma delta", None, "", "alpha beta gamma delta"],
                pa.string(),
            ),
        }
    )
    out = span_dedup(rd.from_arrow(docs), window=2).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert sorted(by_id) == [1, 2, 3, 4]  # one row per doc, nulls included
    assert by_id[2]["text_clean"] == ""
    assert by_id[2]["n_spans"] == 0
    assert by_id[3]["text_clean"] == ""


def test_pack_and_rank_survive_emptied_blocks():
    from ocr_search_ray.stages.pack import pack_sequences
    from ocr_search_ray.stages.relational import global_rank

    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array([f"w{i} w{i} w{i}" for i in range(40)]),
            "v": pa.array([i % 7 for i in range(40)], pa.int64()),
            "t": pa.array([f"t{i:03d}" for i in range(40)]),
        }
    )
    # 8 blocks, then a filter that empties several of them entirely
    ds = rd.from_arrow(docs).repartition(8).map_batches(
        lambda b: b.filter(pc.less(b.column("doc_id"), 5)),
        batch_format="pyarrow",
    )
    packed = pack_sequences(ds, budget=4, n_parts=4)
    assert packed.count() == 5
    ranked = {
        r["doc_id"]: r["rank"]
        for r in global_rank(ds, "v", "t", n_parts=4).take_all()
    }
    assert sorted(ranked.values()) == [1, 2, 3, 4, 5]

    # the fully-emptied case must also not crash
    empty = rd.from_arrow(docs).map_batches(
        lambda b: b.slice(0, 0), batch_format="pyarrow"
    )
    assert pack_sequences(empty, budget=4, n_parts=4).num_rows == 0


def test_decontaminate_full_digest_membership():
    from ocr_search_ray.stages.dedup import bench_ngram_hashes, decontaminate

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps",   # shares a 3-gram w/ bench
                    "completely different words here",
                    None,
                ]
            ),
        }
    )
    bench = pa.table(
        {
            "doc_id": pa.array([100], pa.int64()),
            "text": pa.array(["quick brown fox runs fast"]),
        }
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            rd.from_arrow(docs), rd.from_arrow(bench)
        ).take_all()
    }
    assert out[1]["contaminated"] and out[1]["bench_hits"] == 1
    assert not out[2]["contaminated"]
    assert out[3]["bench_hits"] == 0 and out[3]["n_sh"] == 0

    hi, lo = bench_ngram_hashes(rd.from_arrow(bench))
    assert hi.shape == lo.shape and hi.dtype.name == "uint64"
    # sorted lexicographically by (hi, lo)
    pairs = list(zip(hi.tolist(), lo.tolist()))
    assert pairs == sorted(pairs)


def test_bloom_prefilter_superset_and_semi_join_exact():
    """bloom_prefilter keeps EVERY true member (no false negatives) and
    only a bounded false-positive residue; bloom_semi_join stays exact."""
    from ocr_search_ray.stages.relational import (
        bloom_prefilter,
        bloom_semi_join,
    )

    n = 4000
    big = rd.from_arrow(
        pa.table({"k": pa.array(range(n), pa.int64()),
                  "v": pa.array([f"v{i}" for i in range(n)])})
    ).repartition(4)
    members = list(range(0, n, 37))
    keys = rd.from_arrow(pa.table({"k": pa.array(members, pa.int64())}))

    pre = {r["k"] for r in bloom_prefilter(big, keys, "k").take_all()}
    assert set(members) <= pre  # no false negatives, ever
    assert len(pre) <= len(members) + n // 100  # fp residue bounded (~1%)

    exact = {r["k"] for r in bloom_semi_join(
        big, keys, "k",
        left_types={"k": pa.int64(), "v": pa.string()},
    ).take_all()}
    assert exact == set(members)
