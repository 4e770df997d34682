"""Product-quantization ANN: codeword-corpus exactness, ADC semantics,
trained-codebook recall, determinism, oracle tie-safety."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_search_ray.stages.similarity import (
    ann_brute_topk,
    pq_encode,
    pq_scan_topk,
    pq_topk,
    train_pq_codebooks,
)

K = 16


def _ring_codebooks():
    """Two 2-d ring codebooks with subspace energies 0.7/0.3 — any
    codeword concatenation is unit-norm (the ann_pq_topk entry's
    geometry)."""
    th = 2 * np.pi * np.arange(K) / K
    return np.stack([
        np.stack([np.sqrt(0.7) * np.cos(th),
                  np.sqrt(0.7) * np.sin(th)], axis=1),
        np.stack([np.sqrt(0.3) * np.cos(th),
                  np.sqrt(0.3) * np.sin(th)], axis=1),
    ])


def _codeword_corpus(n=200):
    cb = _ring_codebooks()
    ids = np.arange(n)
    vecs = np.concatenate([cb[0][ids % K], cb[1][(ids * 7 + 3) % K]], axis=1)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    return ds, cb, vecs


def test_pq_exact_on_codeword_corpus():
    """Every corpus vector lies on a codeword combination → encode is
    lossless and the ADC top-k EQUALS brute-force cosine top-k."""
    ds, cb, _ = _codeword_corpus()
    queries = {
        q: np.concatenate(
            [cb[0][(2 * q + 1) % K], cb[1][(5 * q + 2) % K]]).tolist()
        for q in range(3)
    }
    pq = sorted(
        pq_topk(ds, queries, k=10, codebooks=cb).take_all(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    bf = sorted(
        ann_brute_topk(ds, queries, k=10).take_all(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    assert [(r["query_id"], r["vec_id"], r["rank"]) for r in pq] == \
        [(r["query_id"], r["vec_id"], r["rank"]) for r in bf]


def test_pq_encode_recovers_codes():
    ds, cb, _ = _codeword_corpus(64)
    rows = pq_encode(ds, cb).take_all()
    assert len(rows) == 64
    for r in rows:
        codes = list(r["codes"])
        assert len(codes) == 2
        assert codes[0] == r["vec_id"] % K
        assert codes[1] == (r["vec_id"] * 7 + 3) % K


def test_oracle_score_gaps_dominate_float_noise():
    """The ann_pq_topk oracle compares ranks computed by numpy LUTs vs
    DuckDB cos() — safe only if mathematically-distinct scores are
    separated far above cross-engine ulp noise. Verify the min nonzero
    gap over ALL (Δ0, Δ1) score values."""
    d = np.cos(2 * np.pi * np.arange(K) / K)
    scores = (0.7 * d[:, None] + 0.3 * d[None, :]).ravel()
    gaps = np.diff(np.unique(scores.round(12)))
    assert gaps.min() > 1e-3, gaps.min()


def test_pq_scan_ties_break_by_vec_id():
    """vec_id and vec_id+16 carry identical codes → bit-identical ADC
    scores; both must appear with the lower id ranked first."""
    ds, cb, _ = _codeword_corpus(40)
    queries = {0: np.concatenate([cb[0][1], cb[1][2]]).tolist()}
    rows = sorted(pq_topk(ds, queries, k=40, codebooks=cb).take_all(),
                  key=lambda r: r["rank"])
    pos = {r["vec_id"]: r["rank"] for r in rows}
    for i in range(16):
        assert pos[i] < pos[i + 16] < pos[i + 32] if i + 32 in pos \
            else pos[i] < pos[i + 16]


def test_pq_trained_recall_and_determinism():
    """Trained path on structured data: 8 well-separated clusters in 32
    dims. PQ collapses a tight cluster onto one code combination, so
    WITHIN-cluster order is lost to vec_id ties (recall vs brute ~0.4
    here is inherent coarseness, not error) — the property PQ must keep
    is CLUSTER retrieval: every top-k hit comes from the query's own
    cluster. Training twice gives identical codebooks (deterministic
    seeding + exchange-reduced partials)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 4.0
    vecs = np.concatenate(
        [c + 0.2 * rng.standard_normal((25, 32)) for c in centers])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).materialize()
    queries = {i: vecs[i * 25].tolist() for i in range(4)}
    cb1 = train_pq_codebooks(ds, n_subspaces=8, n_codes=16, train_iters=3)
    cb2 = train_pq_codebooks(ds, n_subspaces=8, n_codes=16, train_iters=3)
    assert cb1.shape == (8, 16, 4)
    assert np.array_equal(cb1, cb2)
    hits = pq_topk(ds, queries, k=10, codebooks=cb1).take_all()
    assert len(hits) == 40
    for r in hits:
        assert r["vec_id"] // 25 == r["query_id"], r
    bf = {(r["query_id"], r["vec_id"])
          for r in ann_brute_topk(ds, queries, k=10).take_all()}
    recall = len({(r["query_id"], r["vec_id"]) for r in hits} & bf) / len(bf)
    assert recall >= 0.3, recall


def test_pq_scan_separate_from_encode():
    """The production shape: encode once (codes persistable), scan many
    times with different query sets against the SAME codes dataset."""
    ds, cb, _ = _codeword_corpus(80)
    codes = pq_encode(ds, cb).materialize()
    q1 = {0: np.concatenate([cb[0][0], cb[1][0]]).tolist()}
    q2 = {7: np.concatenate([cb[0][9], cb[1][4]]).tolist()}
    r1 = pq_scan_topk(codes, cb, q1, k=3).take_all()
    r2 = pq_scan_topk(codes, cb, q2, k=3).take_all()
    assert {r["query_id"] for r in r1} == {0}
    assert {r["query_id"] for r in r2} == {7}
    assert all(r["rank"] in (1, 2, 3) for r in r1 + r2)


def test_pq_validation():
    ds, cb, _ = _codeword_corpus(10)
    with pytest.raises(ValueError, match="uint8"):
        train_pq_codebooks(ds, n_codes=512)
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(ds, n_subspaces=3, n_codes=4)


def test_pq_disk_lifecycle(tmp_path):
    """On-disk index: build/search parity with the in-memory scan,
    idempotent incremental adds, and POINT-PRUNED deletes — the doomed
    ids' own buckets rewrite, every other bucket stays byte-untouched
    (mtime-stable), unlike the IVF cascade's every-cell sweep."""
    import glob
    import os

    from ocr_search_ray.stages.similarity import (
        _pq_id_bucket,
        add_to_pq_index,
        build_pq_index,
        delete_from_pq_index,
        search_pq_index,
    )

    ds, cb, _ = _codeword_corpus(120)
    even = ds.filter(lambda r: r["vec_id"] % 2 == 0).materialize()
    odd = ds.filter(lambda r: r["vec_id"] % 2 == 1).materialize()
    idx = str(tmp_path / "pq")
    queries = {0: np.concatenate([cb[0][1], cb[1][2]]).tolist()}

    build_pq_index(even, idx, codebooks=cb, n_buckets=8)
    mem = [(r["query_id"], r["vec_id"], r["rank"]) for r in sorted(
        pq_topk(even, queries, k=10, codebooks=cb).take_all(),
        key=lambda r: (r["query_id"], r["rank"]))]
    dsk = [(r["query_id"], r["vec_id"], r["rank"]) for r in sorted(
        search_pq_index(idx, queries, k=10).take_all(),
        key=lambda r: (r["query_id"], r["rank"]))]
    assert mem == dsk

    r1 = add_to_pq_index(odd, idx)
    assert r1["rows_added"] == 60
    add_to_pq_index(odd, idx)  # idempotent: keep-first per id
    got = {r["vec_id"] for r in search_pq_index(idx, queries, k=200).take_all()}
    assert got == set(range(120))

    doomed = [0, 1, 2]
    target = set(_pq_id_bucket(np.array(doomed, dtype=np.int64), 8).tolist())
    before = {d: os.path.getmtime(d)
              for d in glob.glob(os.path.join(idx, "codes", "bucket=*"))}
    res = delete_from_pq_index(idx, doomed)
    assert res["vectors_removed"] == 3
    assert res["buckets_rewritten"] <= len(target)
    after = {d: os.path.getmtime(d)
             for d in glob.glob(os.path.join(idx, "codes", "bucket=*"))}
    for d in before:
        if int(d.rsplit("=", 1)[-1]) not in target:
            assert before[d] == after[d], f"untouched bucket rewritten: {d}"
    got = {r["vec_id"] for r in search_pq_index(idx, queries, k=200).take_all()}
    assert got == set(range(3, 120))


def test_codes_matrix_offset_aware():
    """A sliced list column's values child still holds the parent buffer;
    the ADC scan must respect the slice offset (Ray slices blocks into
    batches)."""
    from ocr_search_ray.stages.similarity import _codes_matrix

    full = pa.array([[i % 7, (i * 3) % 7] for i in range(50)],
                    pa.list_(pa.uint8()))
    sliced = full.slice(13, 20)
    m = _codes_matrix(sliced, 2)
    assert m.shape == (20, 2)
    for j in range(20):
        i = 13 + j
        assert m[j].tolist() == [i % 7, (i * 3) % 7]
    fixed = pa.array(
        [[i % 5, (i + 1) % 5] for i in range(30)],
        pa.list_(pa.uint8(), 2))
    fm = _codes_matrix(fixed.slice(4, 9), 2)
    assert fm.shape == (9, 2)
    assert fm[0].tolist() == [4 % 5, 5 % 5]
    assert _codes_matrix(full.slice(3, 0), 2).shape == (0, 2)


def test_batch_matrix_fixed_size_list_offset():
    from ocr_search_ray.stages.similarity import _batch_matrix

    full = pa.table({"embedding": pa.array(
        [[float(i), float(i * 2)] for i in range(40)],
        pa.list_(pa.float64(), 2))})
    m = _batch_matrix(full.slice(7, 12), "embedding")
    assert m.shape == (12, 2)
    assert m[0].tolist() == [7.0, 14.0]
    assert m[-1].tolist() == [18.0, 36.0]
