"""Randomized properties of the distributed operators vs naive Python.

Few examples (each runs a real Ray exchange) but adversarial shapes:
duplicate keys, empty groups, ties, negative values.
"""

import math

import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.floats(-50, 50, allow_nan=False)),
        min_size=1, max_size=120,
    ),
    st.sampled_from([[0.5], [0.25, 0.95], [0.5, 0.9, 1.0]]),
)
def test_grouped_percentiles_matches_naive(rows, qs):
    from ocr_search_ray.stages.relational import grouped_percentiles

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"g{a}" for a, _ in rows]),
                "v": pa.array([b for _, b in rows], pa.float64()),
            }
        )
    ).repartition(3)
    got = {
        r["k"]: tuple(r[f"p{int(q*100)}"] for q in qs)
        for r in grouped_percentiles(ds, ["k"], "v", qs).take_all()
    }

    def away(x):
        return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)

    naive = {}
    for a, b in rows:
        naive.setdefault(f"g{a}", []).append(away(b))
    expected = {}
    for k, vals in naive.items():
        vals.sort()
        expected[k] = tuple(
            vals[max(1, math.ceil(q * len(vals))) - 1] for q in qs
        )
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(-5, 5)),
             min_size=0, max_size=60),
    st.lists(st.tuples(st.integers(0, 8), st.integers(100, 105)),
             min_size=0, max_size=20),
)
def test_cluster_join_inner_matches_naive(left_rows, right_rows):
    from ocr_search_ray.stages.relational import cluster_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([a for a, _ in left_rows], pa.int64()),
                "x": pa.array([b for _, b in left_rows], pa.int64()),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([a for a, _ in right_rows], pa.int64()),
                "y": pa.array([b for _, b in right_rows], pa.int64()),
            }
        )
    )
    got = sorted(
        (r["k"], r["x"], r["y"])
        for r in cluster_join(
            left, right, ["k"],
            left_types={"k": pa.int64(), "x": pa.int64()},
            right_types={"y": pa.int64()},
        ).take_all()
    )
    expected = sorted(
        (lk, lx, ry)
        for lk, lx in left_rows
        for rk, ry in right_rows
        if lk == rk
    )
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000),
                  st.floats(0, 99, allow_nan=False)),
        min_size=1, max_size=80,
    )
)
def test_tumbling_windows_match_naive(rows):
    import datetime as dt

    from ocr_search_ray.stages.sessionize import tumbling_window_agg

    epoch = dt.datetime(2025, 1, 1)
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([f"t{a}" for a, _, _ in rows]),
                "ts": pa.array(
                    [epoch + dt.timedelta(seconds=b) for _, b, _ in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([c for _, _, c in rows], pa.float64()),
            }
        )
    ).repartition(2)
    got = {
        (r["g"], r["window_start"]): (r["n_events"], r["sum_value_cents"])
        for r in tumbling_window_agg(
            ds, window=dt.timedelta(minutes=10), key_cols=["g"]
        ).take_all()
    }

    def away(x):
        return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)

    naive: dict = {}
    for a, b, c in rows:
        w = epoch + dt.timedelta(seconds=(b // 600) * 600)
        n, s = naive.get((f"t{a}", w), (0, 0))
        naive[(f"t{a}", w)] = (n + 1, s + away(c))
    assert got == naive


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.lists(st.sampled_from(["a", "bb", "ccc", ""]),
                           max_size=12)),
        min_size=0, max_size=80, unique_by=lambda r: r[0],
    ),
    st.sampled_from([1, 7, 256]),
)
def test_pack_sequences_matches_naive(rows, budget):
    from ocr_search_ray.stages.pack import pack_sequences

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([" ".join(ws) for _, ws in rows]),
            }
        )
    ).repartition(3)
    out = pack_sequences(ds, budget=budget, n_parts=5)
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_off"], r["end_off"], r["pack_id"])
        for r in (out.take_all() if hasattr(out, "take_all")
                  else out.to_pylist())
    }

    acc = 0
    expected = {}
    for i, ws in sorted(rows):
        n = sum(1 for w in ws if w)
        expected[i] = (n, acc, acc + n, acc // budget)
        acc += n
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), max_size=20),
        min_size=0, max_size=30,
    )
)
def test_span_dedup_matches_naive(docs):
    from ocr_search_ray.stages.dedup import span_dedup

    W = 4
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array([" ".join(ws) for ws in docs]),
            }
        )
    ).repartition(3)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_dropped"])
        for r in span_dedup(ds, window=W).take_all()
    }

    seen: set = set()
    expected = {}
    for i, ws in enumerate(docs):
        words = [w for w in ws if w]
        kept, n_spans, dropped = [], 0, 0
        for s in range(0, (len(words) + W - 1) // W):
            st_ = " ".join(words[s * W:(s + 1) * W])
            n_spans += 1
            if st_ in seen:
                dropped += 1
            else:
                seen.add(st_)
                kept.append(st_)
        expected[i] = (" ".join(kept), n_spans, dropped)
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=0, max_size=60),
    st.lists(st.integers(0, 40), min_size=0, max_size=15),
    st.booleans(),
)
def test_bloom_semi_join_matches_naive(big_keys, allow_keys, as_str):
    from ocr_search_ray.stages.relational import bloom_semi_join

    typ = pa.string() if as_str else pa.int64()

    def conv(x):
        return f"k{x}" if as_str else x

    big = rd.from_arrow(
        pa.table(
            {"k": pa.array([conv(x) for x in big_keys], typ),
             "v": pa.array(range(len(big_keys)), pa.int64())}
        )
    ).repartition(3)
    allow = rd.from_arrow(
        pa.table({"k": pa.array([conv(x) for x in allow_keys], typ)})
    ).repartition(2)
    out = bloom_semi_join(
        big, allow, "k", left_types={"k": typ, "v": pa.int64()},
        n_bits=1 << 12,
    )
    got = sorted((r["k"], r["v"]) for r in out.take_all())
    allowed = set(conv(x) for x in allow_keys)
    expected = sorted(
        (conv(x), i) for i, x in enumerate(big_keys) if conv(x) in allowed
    )
    assert got == expected


def test_bloom_prefilter_prunes():
    import numpy as np

    from ocr_search_ray.stages.relational import _bloom_hashes

    n_bits, k = 1 << 16, 4
    members = pa.array(list(range(0, 2000, 2)), pa.int64())
    buf = np.zeros(n_bits // 8, np.uint8)
    h1, h2 = _bloom_hashes(members)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(buf, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    probes = pa.array(list(range(1, 20001, 2)), pa.int64())  # non-members
    p1, p2 = _bloom_hashes(probes)
    member = np.ones(len(probes), bool)
    for i in range(k):
        idx = (p1 + np.uint64(i) * p2) % np.uint64(n_bits)
        member &= (
            (buf[(idx >> np.uint64(3)).astype(np.int64)]
             >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        ).astype(bool)
    # with m/n = 65536/1000 and k=4 the fp rate is << 1%; require < 2%
    assert member.sum() < 200


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.text("ab", max_size=5)),
             min_size=0, max_size=40),
)
def test_stratified_sample_quota_and_determinism(rows):
    import hashlib

    from ocr_search_ray.stages.relational import stratified_sample

    table = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "g": pa.array([f"g{a}" for a, _ in rows]),
            "text": pa.array([t for _, t in rows]),
        }
    )
    k = 3

    def run(n_parts):
        ds = rd.from_arrow(table).repartition(n_parts)
        out = stratified_sample(ds, ["g"], k, id_col="doc_id",
                                text_col="text")
        return sorted((r["g"], r["doc_id"]) for r in out.take_all())

    got = run(3)
    assert got == run(1)  # partitioning-independent
    naive: dict = {}
    for i, (a, t) in enumerate(rows):
        naive.setdefault(f"g{a}", []).append(
            (hashlib.md5(t.encode()).hexdigest(), i)
        )
    expected = sorted(
        (g, i)
        for g, lst in naive.items()
        for _, i in sorted(lst)[:k]
    )
    assert got == expected


def test_write_packed_shards_layout_and_atomicity():
    import os

    import ray.data as rd

    from ocr_search_ray.stages.pack import write_packed_shards

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = "/tmp/osr-packed-test"
    res = write_packed_shards(docs, out, budget=256, packs_per_shard=8)
    assert res["n_docs"] == docs.count()
    shards = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shards) == res["n_shards"] >= 2
    back = rd.read_parquet(out)
    rows = back.take_all()
    assert len(rows) == res["n_docs"]
    # every doc starts inside the shard's pack range and text survived
    for r in rows[:50]:
        assert r["start_off"] // 256 == r["pack_id"]
        assert isinstance(r["text"], str) and r["n_tokens"] >= 0
    # rerun is idempotent (atomic swap, no appended duplicates)
    res2 = write_packed_shards(docs, out, budget=256, packs_per_shard=8)
    assert res2["n_docs"] == res["n_docs"]
    assert rd.read_parquet(out).count() == res["n_docs"]
    import shutil

    shutil.rmtree(out, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 9), st.text("abc", min_size=1,
                                                  max_size=4)),
             min_size=1, max_size=60, unique_by=lambda r: r[1]),
)
def test_global_rank_matches_row_number(rows):
    from ocr_search_ray.stages.relational import global_rank

    ds = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([a for a, _ in rows], pa.int64()),
                "t": pa.array([b for _, b in rows]),
            }
        )
    ).repartition(3)
    got = {
        r["t"]: r["rank"]
        for r in global_rank(ds, "v", "t", n_parts=4).take_all()
    }
    expected = {
        t: i + 1
        for i, (_, t) in enumerate(
            sorted(rows, key=lambda r: (-r[0], r[1]))
        )
    }
    assert got == expected


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)),
             min_size=1, max_size=24),
)
def test_connected_components_matches_union_find(edges):
    from ocr_search_ray.stages.graph import connected_components

    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(2)
    got = {
        r["node"]: r["component"]
        for r in connected_components(ds, n_blocks=2).take_all()
    }

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {n for e in edges for n in e}
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in nodes}
    assert got == expected


def test_grouped_distinct_exact_and_hll_within_bounds():
    import random

    from ocr_search_ray.stages.relational import (
        grouped_approx_distinct,
        grouped_count_distinct,
    )

    rng = random.Random(7)
    rows = [(f"g{rng.randrange(3)}", f"u{rng.randrange(500)}")
            for _ in range(6000)]
    ds = rd.from_arrow(
        pa.table(
            {"g": pa.array([a for a, _ in rows]),
             "u": pa.array([b for _, b in rows])}
        )
    ).repartition(4)
    naive: dict = {}
    for g, u in rows:
        naive.setdefault(g, set()).add(u)
    exact = {
        r["g"]: r["n_distinct"]
        for r in grouped_count_distinct(ds, ["g"], "u").take_all()
    }
    assert exact == {g: len(s) for g, s in naive.items()}
    approx = {
        r["g"]: r["estimate"]
        for r in grouped_approx_distinct(ds, ["g"], "u").take_all()
    }
    for g, s in naive.items():
        assert abs(approx[g] - len(s)) / len(s) < 3 * 1.04 / (1 << 6)
    # determinism across partitionings
    approx2 = {
        r["g"]: r["estimate"]
        for r in grouped_approx_distinct(
            ds.repartition(2), ["g"], "u").take_all()
    }
    assert approx2 == approx


def test_new_ops_collect_only_bounded_state(monkeypatch):
    """Scale-safety: on an amplified corpus the round-2 operator wave
    collects only BOUNDED driver state — pack/rank collect per-block and
    per-partition rows, bloom collects ONE merged bitmap row, span dedup
    and canonical dedup collect nothing. Any whole-corpus take_all would
    trip the cap."""
    import ray.data as rd2

    collected = []
    orig = rd2.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(rd2.Dataset, "take_all", spy)

    n = 5000
    ds = rd2.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [f"w{i} x{i} y{i} z{i} common filler" for i in range(n)]
                ),
            }
        )
    ).repartition(8)

    from ocr_search_ray.stages.dedup import span_dedup
    from ocr_search_ray.stages.pack import pack_sequences
    from ocr_search_ray.stages.relational import (
        bloom_semi_join,
        global_rank,
    )
    from ocr_search_ray.stages.urlnorm import canonical_dedup

    assert pack_sequences(ds, budget=64, n_parts=16).count() == n
    assert span_dedup(ds, window=4).count() == n
    assert global_rank(
        ds.map_batches(
            lambda b: pa.table(
                {"v": b.column("doc_id"), "t": b.column("text")}
            ),
            batch_format="pyarrow",
        ),
        "v", "t", n_parts=16,
    ).count() == n

    allow = rd2.from_arrow(
        pa.table({"doc_id": pa.array(range(0, n, 50), pa.int64())})
    )
    assert bloom_semi_join(
        ds, allow, "doc_id",
        left_types={"doc_id": pa.int64(), "text": pa.string()},
    ).count() == n // 50

    urls = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "url": pa.array(
                 [f"https://s{int(d) % 5}.org/p{int(d)}"
                  for d in b.column("doc_id").to_pylist()])}
        ),
        batch_format="pyarrow",
    )
    assert canonical_dedup(urls).count() == n

    # every driver collect across ALL those ops is bounded: per-block
    # minmax rows / per-partition sums / one bloom row — never ~corpus
    assert collected, "expected instrumented collects"
    assert max(collected) <= 64, collected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", ""]), max_size=20),
        min_size=0, max_size=25,
    ),
    st.sampled_from([(4, 3), (5, 5), (64, 48)]),
)
def test_chunk_documents_matches_naive(docs, shape):
    from ocr_search_ray.stages.pack import chunk_documents

    chunk_words, stride = shape
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array([" ".join(ws) for ws in docs]),
            }
        )
    ).repartition(3)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"])
        for r in chunk_documents(
            ds, chunk_words=chunk_words, stride=stride
        ).take_all()
    }

    expected = {}
    for i, ws in enumerate(docs):
        words = " ".join(ws).split(" ")  # engine convention: '' -> ['']
        for ci, s in enumerate(range(0, len(words), stride)):
            piece = words[s : s + chunk_words]
            expected[(i, ci)] = (" ".join(piece), len(piece))
    assert got == expected
    # every doc emits at least one chunk; overlap windows cover all words
    assert {k[0] for k in got} == set(range(len(docs)))


def test_deterministic_shuffle_is_partitioning_invariant():
    """Same permutation whatever the block layout — the reproducibility
    contract random_shuffle can't give; ranks are a 1..n bijection in
    md5-hex order."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.relational import deterministic_shuffle

    ids = list(range(137))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    runs = []
    for parts in (1, 7):
        got = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(
            rd.from_arrow(tbl).repartition(parts)).take_all()}
        runs.append(got)
    assert runs[0] == runs[1]
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert [runs[0][i] for i in order] == list(range(1, len(ids) + 1))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.floats(-50, 50, allow_nan=False)),
        min_size=1, max_size=100,
    )
)
def test_winsorize_values_matches_naive(rows):
    from ocr_search_ray.stages.relational import winsorize_values

    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "k": pa.array([f"g{a}" for a, _ in rows]),
                "v": pa.array([b for _, b in rows], pa.float64()),
            }
        )
    ).repartition(3)
    got = {
        r["event_id"]: r["v_w"]
        for r in winsorize_values(
            ds, ["k"], "v", q_lo=0.05, q_hi=0.95, carry_cols=["event_id"]
        ).take_all()
    }

    by_k = {}
    for a, b in rows:
        by_k.setdefault(f"g{a}", []).append(b)
    bounds = {}
    for k, vs in by_k.items():
        s = sorted(vs)
        n = len(s)
        bounds[k] = (s[max(1, math.ceil(0.05 * n)) - 1],
                     s[max(1, math.ceil(0.95 * n)) - 1])
    for i, (a, b) in enumerate(rows):
        lo, hi = bounds[f"g{a}"]
        assert got[i] == min(max(b, lo), hi)
    assert len(got) == len(rows)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcde")),
        min_size=1, max_size=100,
    )
)
def test_grouped_mode_matches_naive(rows):
    from collections import Counter

    from ocr_search_ray.stages.relational import grouped_mode

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([a for a, _ in rows], pa.int64()),
                "v": pa.array([b for _, b in rows]),
            }
        )
    ).repartition(3)
    got = {r["k"]: (r["mode_v"], r["n"])
           for r in grouped_mode(ds, ["k"], "v").take_all()}

    by_k = {}
    for a, b in rows:
        by_k.setdefault(a, []).append(b)
    exp = {}
    for k, vs in by_k.items():
        c = Counter(vs)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp[k] = best
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.floats(-10, 10, allow_nan=False)),
        min_size=1, max_size=60,
    ),
    st.integers(1, 6),
)
def test_ntile_values_matches_sql_remainder_rule(rows, b):
    from ocr_search_ray.stages.relational import ntile_values

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([a for a, _ in rows], pa.int64()),
                "v": pa.array([x for _, x in rows], pa.float64()),
                "rid": pa.array(range(len(rows)), pa.int64()),
            }
        )
    ).repartition(3)
    got = {r["rid"]: r["bucket"]
           for r in ntile_values(ds, ["k"], "v", n_buckets=b,
                                 order_cols=["rid"]).take_all()}

    by_k = {}
    for i, (a, x) in enumerate(rows):
        by_k.setdefault(a, []).append((x, i))
    exp = {}
    for vs in by_k.values():
        vs.sort()
        n = len(vs)
        big, r = n // b + 1, n % b
        for rank, (_x, i) in enumerate(vs):
            if rank < r * big:
                exp[i] = rank // big + 1
            else:
                exp[i] = r + (rank - r * big) // max(n // b, 1) + 1
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
        min_size=1, max_size=60,
    )
)
def test_pareto_frontier_matches_dominance_oracle(rows):
    from ocr_search_ray.stages.relational import pareto_frontier

    ds = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(range(len(rows)), pa.int64()),
                "x": pa.array([a for a, _ in rows], pa.int64()),
                "y": pa.array([b for _, b in rows], pa.int64()),
            }
        )
    ).repartition(3)
    got = {r["rid"] for r in
           pareto_frontier(ds, "x", "y", carry_cols=["rid"]).take_all()}

    exp = set()
    for i, (xi, yi) in enumerate(rows):
        dominated = any(
            (xq >= xi and yq >= yi and (xq > xi or yq > yi))
            for j, (xq, yq) in enumerate(rows) if j != i
        )
        # exact duplicates never dominate each other — but a duplicate
        # PAIR is dominated together or survives together; the naive
        # check above treats a duplicate as a dominator only when strict
        # somewhere, so it already matches the NOT-EXISTS oracle
        if not dominated:
            exp.add(i)
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=80))
def test_value_ranks_matches_naive(vals):
    from ocr_search_ray.stages.relational import value_ranks

    ds = rd.from_arrow(
        pa.table(
            {"rid": pa.array(range(len(vals)), pa.int64()),
             "v": pa.array(vals, pa.int64())}
        )
    ).repartition(3)
    got = {r["rid"]: (r["n_smaller"], r["n_total"])
           for r in value_ranks(ds, "v", carry_cols=["rid"]).take_all()}
    for i, v in enumerate(vals):
        assert got[i] == (sum(1 for x in vals if x < v), len(vals))


def test_value_ranks_domain_guard():
    from ocr_search_ray.stages.relational import value_ranks

    ds = rd.from_arrow(
        pa.table({"v": pa.array(range(100), pa.int64())})
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_domain"):
        value_ranks(ds, "v", max_domain=10)
