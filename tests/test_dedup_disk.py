"""Incremental on-disk dedup index: build → probe → merge → next batch.

The micro-batch dedup lifecycle (stages/dedup_disk): the corpus's digests
live in bucketed parquet; each arriving batch dedups within itself, anti-
joins the index bucket-pruned, and merges its survivors back atomically.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.dedup_disk import (
    build_digest_index,
    dedup_against_index,
    merge_new_into_digest_index,
)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_incremental_dedup_lifecycle(tmp_path):
    idx = str(tmp_path / "digests")
    corpus = _docs([(i, f"corpus text {i}") for i in range(50)]
                   + [(100 + i, f"corpus text {i}") for i in range(5)])
    build_digest_index(corpus, idx, n_buckets=8)
    assert len(glob.glob(os.path.join(idx, "digest_bucket=*"))) > 1

    # batch 1: 3 fresh, 2 dups-of-corpus, 1 within-batch dup pair
    batch1 = _docs([
        (200, "fresh one"), (201, "fresh two"), (202, "fresh three"),
        (203, "corpus text 7"), (204, "corpus text 8"),
        (205, "twin text"), (206, "twin text"),
    ])
    s1 = dedup_against_index(batch1, idx, n_buckets=8)
    survivors1 = {r["doc_id"] for r in s1.take_all()}
    assert survivors1 == {200, 201, 202, 205}  # min id wins the twin pair

    stats = merge_new_into_digest_index(s1, idx, n_buckets=8)
    assert stats["digests_merged"] == 4

    # batch 2: dups of batch-1 survivors are now caught by the index
    batch2 = _docs([
        (300, "fresh one"),       # dup of merged batch-1 digest
        (301, "twin text"),       # dup of merged twin digest
        (302, "genuinely new"),
        (303, "corpus text 3"),   # still caught
    ])
    survivors2 = {
        r["doc_id"] for r in dedup_against_index(batch2, idx, n_buckets=8).take_all()
    }
    assert survivors2 == {302}

    # idempotent merge: re-merging the same survivors is a no-op on
    # content — batch 2's probe result is unchanged afterwards
    merge_new_into_digest_index(s1, idx, n_buckets=8)
    again = {
        r["doc_id"] for r in dedup_against_index(batch2, idx, n_buckets=8).take_all()
    }
    assert again == {302}


def test_dedup_against_empty_index_dir(tmp_path):
    idx = str(tmp_path / "none")  # no buckets exist yet
    batch = _docs([(1, "a"), (2, "a"), (3, "b")])
    out = {r["doc_id"] for r in dedup_against_index(batch, idx).take_all()}
    assert out == {1, 3}
    merge_new_into_digest_index(
        dedup_against_index(batch, idx), idx
    )
    # the merged dir now catches those digests
    out2 = dedup_against_index(_docs([(9, "a"), (10, "c")]), idx).take_all()
    assert {r["doc_id"] for r in out2} == {10}


def test_pagerank_fixed_matches_local_fixpoint():
    """pagerank_fixed vs a literal numpy replay of the integer lattice —
    hubs rank above leaves, teleport-only nodes get the closed form."""
    from ocr_search_ray.stages.graph import pagerank_fixed

    edges = [(i, i % 5) for i in range(2, 40)] + [(0, 1), (1, 0)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    scale, iters = 10**12, 3
    got = {
        r["node"]: r["pr_units"]
        for r in pagerank_fixed(ds, iters=iters, scale=scale).take_all()
    }

    nodes = sorted({v for e in edges for v in e})
    pr0 = scale // len(nodes)
    teleport = (15 * pr0) // 100
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {v: pr0 for v in nodes}
    for _ in range(iters):
        sums = {}
        for a, b in edges:
            sums[b] = sums.get(b, 0) + pr[a] // outdeg[a]
        pr = {v: teleport + (85 * sums.get(v, 0)) // 100 for v in nodes}
    assert got == pr
    # structural sanity: the in-degree hubs outrank plain nodes
    assert min(pr[h] for h in range(5) if h in pr) > pr[7]


def test_neardup_index_lifecycle(tmp_path):
    """Band index: probe finds near-dups of INDEXED docs only; merge makes
    a batch's docs visible to the next batch; idempotent re-merge."""
    from ocr_search_ray.stages.neardup_disk import (
        build_neardup_index,
        merge_new_into_neardup_index,
        neardup_against_index,
    )

    def text(i, *, tweak=None):
        ws = [f"w{i}t{j}" for j in range(12)]
        if tweak is not None:
            ws[tweak] = "perturbed"
        return " ".join(ws)

    idx = str(tmp_path / "ndidx")
    corpus = _docs([(i, text(i)) for i in range(30)])
    build_neardup_index(corpus, idx, n_buckets=8)

    batch1 = _docs([
        (100, text(3)),            # exact re-arrival → pair with 3
        (101, text(5, tweak=11)),  # near-dup (11/13 shingles shared)
        (102, "completely novel words only here today"),
    ])
    got = {
        (r["doc_id"], r["corpus_doc_id"]): (r["inter"], r["uni"])
        for r in neardup_against_index(
            batch1, idx, n_buckets=8, min_jaccard_pct=50
        ).take_all()
    }
    assert (100, 3) in got and got[(100, 3)][0] == got[(100, 3)][1]
    assert (101, 5) in got  # the perturbed doc still collides + verifies
    assert all(n != 102 for n, _ in got)

    # merge batch 1; a doc duplicating 102 is now caught
    merge_new_into_neardup_index(batch1, idx, n_buckets=8)
    batch2 = _docs([(200, "completely novel words only here today")])
    got2 = {
        (r["doc_id"], r["corpus_doc_id"])
        for r in neardup_against_index(
            batch2, idx, n_buckets=8, min_jaccard_pct=50
        ).take_all()
    }
    assert (200, 102) in got2

    # idempotent re-merge: same probe result afterwards
    merge_new_into_neardup_index(batch1, idx, n_buckets=8)
    got3 = {
        (r["doc_id"], r["corpus_doc_id"])
        for r in neardup_against_index(
            batch2, idx, n_buckets=8, min_jaccard_pct=50
        ).take_all()
    }
    assert got3 == got2


def test_hits_fixed_matches_local_fixpoint():
    """hits_fixed vs a literal integer replay of the floor-divisor
    lattice — authorities (high in-degree) and hubs (high out-degree)
    separate; nodes without in/out edges read 0 on that axis."""
    from ocr_search_ray.stages.graph import hits_fixed

    # 0..4 are authorities (everyone links in); 20 is a pure hub
    edges = [(i, i % 5) for i in range(2, 40)] + [(20, j) for j in range(5, 9)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    scale, iters = 10**6, 2
    got = {
        r["node"]: (r["auth_units"], r["hub_units"])
        for r in hits_fixed(ds, iters=iters, scale=scale).take_all()
    }

    nodes = sorted({v for e in edges for v in e})

    def norm(d):
        div = max(1, sum(d.values()) // scale)
        return {k: v // div for k, v in d.items()}

    a = {}
    for _, b in edges:
        a[b] = a.get(b, 0) + scale
    auth = hub = None
    for i in range(iters):
        auth = norm(a)
        h = {}
        for u, v in edges:
            h[u] = h.get(u, 0) + auth.get(v, 0)
        hub = norm(h)
        if i < iters - 1:
            a = {}
            for u, v in edges:
                a[v] = a.get(v, 0) + hub.get(u, 0)
    expect = {v: (auth.get(v, 0), hub.get(v, 0)) for v in nodes}
    assert got == expect
    # structural sanity: authorities beat non-authorities; the fan-out
    # node is a hub; a target with no out-edges has zero hub score
    assert min(got[v][0] for v in range(5)) > got[7][0]
    assert got[20][1] > 0 and got[0][1] == 0


def test_triangle_counts_matches_brute_force():
    """triangle_counts vs itertools brute force on a messy multigraph
    (duplicate edges, self-loops, both directions present)."""
    import itertools

    from ocr_search_ray.stages.graph import triangle_counts

    edges = (
        [(i, (i * i) % 23) for i in range(60)]
        + [(i, (i + 7) % 19) for i in range(60)]
        + [(5, 5), (3, 9), (9, 3), (3, 9)]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    got = {r["node"]: r["triangles"] for r in triangle_counts(ds).take_all()}

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in und for v in e}
    adj = {v: set() for v in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    exp = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            exp[a] += 1
            exp[b] += 1
            exp[c] += 1
    assert got == exp
    assert sum(got.values()) // 3 == 8  # pin the planted triangle count


def test_kcore_peel_matches_local_replay():
    """kcore_peel vs a literal python replay of the bounded peel; on a
    graph whose peel converges within the round budget the result is the
    true k-core (min surviving degree >= k)."""
    from ocr_search_ray.stages.graph import kcore_peel

    # a 5-clique (true 4-core, so 2-core too) + a tail path that 2-core
    # peeling eats one layer per round, + dup/self-loop noise
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12), (12, 13)]
    noise = [(0, 0), (1, 0), (0, 1)]
    edges = clique + tail + noise
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    k, rounds = 2, 6
    got = {r["node"]: r["deg"] for r in
           kcore_peel(ds, k=k, rounds=rounds).take_all()}

    e = {tuple(sorted(x)) for x in edges if x[0] != x[1]}
    for _ in range(rounds):
        deg = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e = {(u, v) for u, v in e if u in keep and v in keep}
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert got == deg
    # converged here: the tail is fully peeled, the clique remains
    assert set(got) == set(range(5)) and min(got.values()) >= k


def test_ppr_fixed_matches_local_replay():
    """ppr_fixed vs a literal integer replay — mass concentrates near the
    seed, unreachable nodes read exactly 0."""
    from ocr_search_ray.stages.graph import ppr_fixed

    # seed 0 → 1 → 2 → 3 chain, plus an unreachable island 50-51
    edges = [(0, 1), (1, 2), (2, 3), (1, 3), (50, 51), (51, 50)]
    seeds = [0]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(2)
    sd = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))
    scale, iters = 10**12, 3
    got = {
        r["node"]: r["ppr_units"]
        for r in ppr_fixed(ds, sd, iters=iters, scale=scale).take_all()
    }

    nodes = sorted({v for e in edges for v in e})
    pr0 = scale // len(seeds)
    tele = {v: (15 * pr0) // 100 if v in seeds else 0 for v in nodes}
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {v: (pr0 if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        sums = {}
        for a, b in edges:
            sums[b] = sums.get(b, 0) + pr[a] // outdeg[a]
        pr = {v: tele[v] + (85 * sums.get(v, 0)) // 100 for v in nodes}
    assert got == pr
    assert got[50] == 0 and got[51] == 0       # unreachable
    assert got[0] > 0 and got[1] > 0 and got[3] > 0


def test_cocitation_counts_matches_brute_force():
    from ocr_search_ray.stages.graph import cocitation_counts

    edges = [(0, 1), (0, 2), (0, 2), (1, 2), (1, 3), (2, 1), (2, 3),
             (3, 3)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    got = {(r["node1"], r["node2"]): r["n_common_sources"]
           for r in cocitation_counts(ds).take_all()}

    from collections import defaultdict
    outs = defaultdict(set)
    for s, d in edges:
        outs[s].add(d)
    exp = defaultdict(int)
    for _s, ds_ in outs.items():
        ds_ = sorted(ds_)
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                exp[(ds_[i], ds_[j])] += 1
    assert got == dict(exp)
    # dup edge 0→2 counts once: pair (1,2) has the single source 0
    assert got[(1, 2)] == 1 and got[(2, 3)] == 1 and got[(1, 3)] == 1

def test_bfs_hops_matches_local_bfs():
    """bfs_hops vs a literal BFS replay: min hop distances, directed
    edges, bound respected, unreachable nodes absent, early exit on a
    converged frontier."""
    from ocr_search_ray.stages.graph import bfs_hops

    # two seeds; diamond + chain past the bound + unreachable island +
    # a back-edge revisiting a closer node (anti-join must drop it)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6),
             (3, 0), (20, 21), (9, 1)]
    seeds = [0, 9]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    sd = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))
    max_hops = 3
    got = {r["node"]: r["hops"]
           for r in bfs_hops(ds, sd, max_hops=max_hops).take_all()}

    from collections import deque
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    exp, dq = {s: 0 for s in seeds}, deque(seeds)
    while dq:
        u = dq.popleft()
        if exp[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in exp:
                exp[v] = exp[u] + 1
                dq.append(v)
    assert got == exp
    assert 20 not in got and 21 not in got      # unreachable island
    assert got[3] == 1 or got[3] == 2           # diamond min path
    assert got[3] == min(2, got[3])
    assert 5 not in got and 6 not in got         # past the 3-hop bound
    assert got[4] == 3
