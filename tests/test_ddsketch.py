"""DDSketch percentiles: α relative-error bound, merge invariance, zeros."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.relational import dd_percentiles

RNG = np.random.default_rng(11)


def _run(values, qs, alpha, parts):
    ds = rd.from_arrow(
        pa.table({"v": pa.array(values, pa.float64())})
    ).repartition(parts)
    return {r["quantile"]: (r["estimate"], r["n_values"])
            for r in dd_percentiles(ds, "v", qs, alpha=alpha).take_all()}


def test_relative_error_bound_heavy_tail():
    """|est - true| <= alpha * true at rank ceil(q*n), 6-decade lognormal."""
    alpha = 0.01
    vals = np.exp(RNG.standard_normal(20_000) * 3.0 + 2.0)
    qs = [0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 0.999]
    got = _run(vals.tolist(), qs, alpha, parts=8)
    s = np.sort(vals)
    for q in qs:
        true = s[max(1, math.ceil(q * len(s))) - 1]
        est, n = got[q]
        assert n == len(s)
        assert abs(est - true) <= alpha * true * (1 + 1e-12), (q, est, true)


def test_merge_order_invariance_and_determinism():
    vals = np.exp(RNG.standard_normal(5_000)).tolist()
    a = _run(vals, [0.5, 0.99], 0.02, parts=1)
    b = _run(vals, [0.5, 0.99], 0.02, parts=13)
    assert a == b  # bitwise-identical under any partitioning


def test_zero_and_negative_take_zero_bucket():
    vals = [-5.0, 0.0, 0.0, 1.0, 2.0, 4.0]
    got = _run(vals, [0.25, 0.5, 0.9], 0.01, parts=2)
    assert got[0.25][0] == 0.0            # rank 2 of 6 → zero bucket
    assert abs(got[0.9][0] - 4.0) <= 0.01 * 4.0
    assert got[0.5][1] == 6


def test_nonfinite_values_do_not_corrupt_the_tail():
    """+inf sorts LAST (not into the zero bucket via int64 overflow);
    NaN joins the zero bucket with other non-positive garbage."""
    vals = [1.0, 2.0, 4.0, float("inf"), float("nan")]
    got = _run(vals, [0.2, 0.5, 1.0], 0.01, parts=2)
    assert got[0.2][0] == 0.0                     # rank 1 of 5 → NaN/zero bucket
    assert abs(got[0.5][0] - 2.0) <= 0.01 * 2.0   # rank 3: real values in order
    assert got[1.0][0] == float("inf")            # rank 5: inf at the top


def test_grouped_dd_percentiles_alpha_bound_and_invariance():
    """Per-group sketches: α bound per group vs numpy, identical under
    any partitioning, n_values exact per group."""
    import math

    from ocr_search_ray.stages.relational import grouped_dd_percentiles

    rng = np.random.default_rng(3)
    keys, vals = [], []
    for g, (mu, n) in enumerate([(0.0, 3000), (4.0, 800), (-2.0, 50)]):
        keys += ["g%d" % g] * n
        vals += np.exp(rng.standard_normal(n) + mu).tolist()
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})

    outs = []
    for parts in (1, 8):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {r["k"]: (r["n_values"], r["p50_est"], r["p95_est"])
               for r in grouped_dd_percentiles(
                   ds, ["k"], "v", [0.5, 0.95], alpha=0.02).take_all()}
        outs.append(got)
    assert outs[0] == outs[1]
    by_key = {}
    for k, v in zip(keys, vals):
        by_key.setdefault(k, []).append(v)
    for k, xs in by_key.items():
        s = np.sort(xs)
        n, p50, p95 = outs[0][k]
        assert n == len(xs)
        for q, est in ((0.5, p50), (0.95, p95)):
            true = s[max(1, math.ceil(q * len(s))) - 1]
            assert abs(est - true) <= 0.02 * true * (1 + 1e-12), (k, q)
