"""Generic relational helpers: two-phase aggregation + broadcast hash join.

These are the engine's reusable wide-operator building blocks (SURVEY.md
§7.4): every groupby here is preceded by a batch-local partial combine so the
shuffle moves one row per (batch, key) instead of one per input row — the
standard combiner/salting defense for hot keys at scale.
"""

from __future__ import annotations

import pyarrow as pa

_PARTIAL_FUNCS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}
_MERGE_OF = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def grouped_agg(ds, keys: list[str], specs: list[tuple[str, str, str]]):
    """Two-phase grouped aggregation.

    ``specs``: list of (out_name, column, fn) with fn ∈ sum|min|max|count
    (count is COUNT(*): rows, including nulls in the column). Returns a
    dataset with ``keys + [out_name...]`` columns, exact dtypes preserved
    (sums cast back to the partial's type).

    The merge exchange runs through ``cluster_apply`` (int-key hash of the
    composite key, block-local Arrow group_by) — never a Ray groupby on the
    raw (possibly string) key columns.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        # options built here: pyarrow FunctionOptions don't pickle inside
        # closures shipped to workers
        count_all = pc.CountOptions(mode="all")  # COUNT(*) semantics
        agg_list = [
            (col, _PARTIAL_FUNCS[fn], count_all) if fn == "count"
            else (col, _PARTIAL_FUNCS[fn])
            for _out, col, fn in specs
        ]
        cols = set(keys)
        for _, col, _fn in specs:
            cols.add(col)
        sub = batch.select([c for c in batch.column_names if c in cols])
        agg = sub.group_by(keys).aggregate(agg_list)
        # arrow names results like "col_sum"; rename to partial slots
        names = keys + [f"p{i}" for i in range(len(specs))]
        out_cols = {}
        for i, (_out, col, fn) in enumerate(specs):
            out_cols[f"p{i}"] = agg.column(f"{col}_{_PARTIAL_FUNCS[fn]}")
        for k in keys:
            out_cols[k] = agg.column(k)
        return pa.table({n: out_cols[n] for n in names})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    merge_list = [
        (f"p{i}", _MERGE_OF[fn]) for i, (_o, _c, fn) in enumerate(specs)
    ]

    def block_merge(block: pa.Table) -> pa.Table:
        agg = block.group_by(keys).aggregate(merge_list)
        out = {k: agg.column(k) for k in keys}
        for i, (out_name, _col, fn) in enumerate(specs):
            col = agg.column(f"p{i}_{_MERGE_OF[fn]}")
            if fn == "count":
                col = col.cast(pa.int64())
            out[out_name] = col
        return pa.table(out)

    return cluster_apply(partials, keys, block_merge)


def broadcast_lookup_join(ds, lookup: dict, key: str, out_cols: dict[str, "pa.DataType"],
                          how: str = "inner"):
    """Broadcast hash join: ``lookup`` maps key → tuple of values appended as
    ``out_cols`` (name → arrow type, in tuple order). Small side ships ONCE
    as Arrow arrays via ``ray.put``; each batch probes with ``pc.index_in``
    + ``take`` (vectorized — no per-row Python membership), never a shuffle
    (SURVEY.md J1). ``how='left'`` appends nulls for missing keys."""
    import pyarrow.compute as pc
    import ray

    names = list(out_cols)
    keys_arr = pa.array(list(lookup.keys()))
    value_arrs = [
        pa.array([v[j] for v in lookup.values()], out_cols[n])
        for j, n in enumerate(names)
    ]
    lookup_ref = ray.put((keys_arr, value_arrs))

    def probe(batch: pa.Table) -> pa.Table:
        keys_a, vals = ray.get(lookup_ref)
        col = batch.column(key).combine_chunks()
        if col.type != keys_a.type:
            col = col.cast(keys_a.type)
        idx = pc.index_in(col, value_set=keys_a)
        if how == "inner":
            keep = idx.is_valid()
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for name, varr in zip(names, vals):
            # take with null indices yields nulls — left-join semantics
            batch = batch.append_column(name, varr.take(idx))
        return batch

    return ds.map_batches(probe, batch_format="pyarrow")


KEY_HASH = "__key_hash"


def _default_key_hash(key: bytes) -> int:
    import zlib

    return zlib.crc32(key)


def _append_key_hash(batch: pa.Table, key_cols: list[str],
                     name: str = KEY_HASH, hash_fn=None) -> pa.Table:
    """int64 hash of the composite key, computed once per DISTINCT key via
    Arrow dictionary encoding (no per-row Python in the hot path)."""
    import pyarrow.compute as pc

    hash_fn = hash_fn or _default_key_hash
    if len(key_cols) == 1:
        key = batch.column(key_cols[0]).cast(pa.string())
    else:
        parts = [batch.column(c).cast(pa.string()) for c in key_cols]
        key = pc.binary_join_element_wise(*parts, "\x1f")
    enc = pc.dictionary_encode(key.combine_chunks())
    lut = pa.array(
        [hash_fn(v.encode()) for v in enc.dictionary.to_pylist()],
        pa.int64(),
    )
    return batch.append_column(name, lut.take(enc.indices))


def cluster_by(ds, key_cols: list[str], *, hash_fn=None):
    """Co-locate all rows sharing ``key_cols`` into one block.

    The exchange runs on a derived int64 key hash — range-partitioning an
    integer column is cheap for Ray's sort boundaries, whereas composite
    string sort keys make the boundary search convert whole string columns
    per boundary (the pathology measured in BENCH/BASELINE.md). Range
    partitioning never splits equal values across partitions, so after this
    call ANY block-local group_by on the REAL key columns is globally exact
    — hash collisions between distinct keys merely share a block and are
    disambiguated by the block-local grouping. Callers drop ``KEY_HASH``.

    This is the engine's generic "hash-cluster then combine locally"
    primitive for wide ops whose per-group logic is cheap but whose key
    domain is large (pair sums, per-doc products, keep-latest).

    String columns cross the exchange DICTIONARY-ENCODED (repeated keys /
    values — terms, ids, spans — shrink ~distinct/total on the wire; the
    all-to-all is the only corpus-sized byte mover, and on a
    bandwidth-capped host this is a measured ~2× on the index build).
    Consumers that need plain strings decode with ``_decode_dictionaries``
    — ``cluster_apply`` does it before every ``block_fn``."""

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = _append_key_hash(b, key_cols, hash_fn=hash_fn)
        cols = {}
        for name in b.column_names:
            col = b.column(name)
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                col = pc.dictionary_encode(col.combine_chunks())
            cols[name] = col
        return pa.table(cols)

    hashed = ds.map_batches(prep, batch_format="pyarrow")
    return hashed.sort(KEY_HASH)


def _decode_dictionaries(table: pa.Table) -> pa.Table:
    """Cast any dictionary column back to its plain value type."""
    if not any(pa.types.is_dictionary(f.type) for f in table.schema):
        return table
    return pa.table(
        {
            name: (table.column(name).cast(table.column(name).type.value_type)
                   if pa.types.is_dictionary(table.column(name).type)
                   else table.column(name))
            for name in table.column_names
        }
    )


def cluster_apply(ds, key_cols: list[str], block_fn, *, hash_fn=None):
    """cluster_by + apply ``block_fn(table)`` to each clustered block (whole
    block per call, KEY_HASH already dropped). ``block_fn`` must group by
    ``key_cols`` itself (Arrow ``group_by``/``sort_by`` — C++ speed) and may
    return any schema.

    INVARIANT (global exactness): each range partition of the int-key sort
    must arrive at ``block_fn`` as ONE block — ``map_batches`` with
    ``batch_size=None`` is per-block, and Ray 2.49's sort reduce emits one
    block per partition regardless of size. If a future Ray changed that
    (splitting oversized reduce partitions), equal keys could span batches
    and block-local grouping would silently emit split groups.
    ``tests/test_cluster_by.py::test_cluster_apply_exact_when_partition_exceeds_target_block_size``
    pins this behavior loudly: it forces a hot key far beyond
    ``target_max_block_size`` and asserts exact sums, so a Ray upgrade that
    breaks the invariant fails the suite instead of corrupting aggregates."""

    def apply(batch: pa.Table) -> pa.Table:
        return block_fn(
            _decode_dictionaries(batch.drop_columns([KEY_HASH]))
        )

    return cluster_by(ds, key_cols, hash_fn=hash_fn).map_batches(
        apply, batch_format="pyarrow", batch_size=None
    )


def topk_rows(ds, order_by: list[tuple[str, str]], k: int):
    """Global top-k WITHOUT a sort exchange: per-block head under the
    total order (``order_by`` must include a tiebreaker for determinism),
    then a one-block reduce of the ≤ blocks×k winners. Exact: the global
    top-k is a subset of the union of per-block top-k under the same
    total order. Replaces ``ds.sort(...).limit(k)`` — which range-
    partitions the WHOLE dataset — wherever only the head is wanted."""
    import pyarrow.compute as pc

    def block_topk(block: pa.Table) -> pa.Table:
        if block.num_rows <= k:
            return block
        idx = pc.sort_indices(block, sort_keys=order_by)
        return block.take(idx[:k])

    return (
        ds.map_batches(block_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    )


def block_head_per_run(block: pa.Table, key_cols: list[str],
                       order_by: list[tuple[str, str]], k: int) -> pa.Table:
    """Head-of-each-key-run over ONE block: sort by keys + order_by, then a
    vectorized run-boundary scan keeps the first k rows per key run. The
    block-local half of ``grouped_topk``; reusable by any cluster_apply
    consumer that already holds a whole key's rows in one block."""
    import numpy as np
    import pyarrow.compute as pc

    block = block.sort_by(
        [(c, "ascending") for c in key_cols] + list(order_by)
    )
    n = block.num_rows
    if n == 0:
        return block
    # vectorized run-boundary scan: compare each key column against
    # its shifted self (null==null is NOT a boundary; null vs value
    # is — matching Python != on to_pylist values)
    diff = None
    for c in key_cols:
        col = block.column(c).combine_chunks()
        a, b = col.slice(1), col.slice(0, n - 1)
        neq = pc.fill_null(pc.not_equal(a, b), False)
        null_mismatch = pc.xor(pc.is_null(a), pc.is_null(b))
        d = pc.or_(neq, null_mismatch)
        diff = d if diff is None else pc.or_(diff, d)
    boundary = np.concatenate(
        ([True], diff.to_numpy(zero_copy_only=False))
    )
    run_starts = np.flatnonzero(boundary)
    run_id = np.cumsum(boundary) - 1
    pos_in_run = np.arange(n) - run_starts[run_id]
    keep = np.flatnonzero(pos_in_run < k)
    return block.take(pa.array(keep, pa.int64()))


def grouped_topk(ds, key_cols: list[str], order_by: list[tuple[str, str]],
                 k: int, *, hash_fn=None):
    """Per-group top-k without a global sort: cluster on the group key,
    block-local Arrow sort, take the head of each key run.

    ``order_by``: [(col, "ascending"|"descending"), ...] applied after the
    key columns. The SQL analogue is ``row_number() OVER (PARTITION BY keys
    ORDER BY order_by) <= k``. Scale shape: one int-key exchange; each
    group's rows co-locate (same partitioning contract as every
    ``cluster_apply`` consumer), and only k rows per group survive the
    block walk — the window function re-expressed as an exchange + local
    scan (SURVEY.md K3 generalized)."""

    def block_topk(block: pa.Table) -> pa.Table:
        return block_head_per_run(block, key_cols, order_by, k)

    return cluster_apply(ds, key_cols, block_topk, hash_fn=hash_fn)


def grouped_percentiles(ds, key_cols: list[str], value_col: str,
                        qs: list[float], *, scale: int = 100):
    """Exact per-group discrete percentiles at corpus scale via value
    quantization.

    Values quantize to integer units (``round(value*scale)``,
    half-away-from-zero like SQL round); per-batch partial counts per
    (keys, unit) collapse the corpus BEFORE the one int-key exchange on
    the group key; each group's histogram — bounded by the VALUE DOMAIN,
    never the corpus — sorts block-locally, and the discrete percentile
    reads off cumulative counts at ``rank = max(1, ceil(q*n))``, exactly
    DuckDB's ``quantile_disc`` on the quantized units.

    → keys + ``n_values`` + one ``p{q*100}`` int64-units column per q.
    """
    import math

    import pyarrow.compute as pc

    qnames = []
    for q in qs:
        pct = q * 100
        if abs(pct - round(pct)) > 1e-9:
            raise ValueError(f"q={q}: use percentiles expressible as q*100 int")
        qnames.append(f"p{int(round(pct))}")

    def partial(batch: pa.Table) -> pa.Table:
        away = pc.RoundOptions(round_mode="half_towards_infinity")
        units = pc.cast(
            pc.round(pc.multiply(batch.column(value_col), scale),
                     options=away),
            pa.int64(),
        )
        t = pa.table(
            {**{k: batch.column(k) for k in key_cols}, "u": units,
             "one": pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows)}
        )
        agg = t.group_by(key_cols + ["u"]).aggregate([("one", "sum")])
        return agg.rename_columns(key_cols + ["u", "c_part"])

    def block_percentiles(block: pa.Table) -> pa.Table:
        agg = block.group_by(key_cols + ["u"]).aggregate([("c_part", "sum")])
        agg = agg.sort_by(
            [(k, "ascending") for k in key_cols] + [("u", "ascending")]
        )
        keys_lists = [agg.column(k).to_pylist() for k in key_cols]
        units = agg.column("u").to_pylist()
        counts = agg.column("c_part_sum").to_pylist()
        out_keys: list[list] = [[] for _ in key_cols]
        out_n: list[int] = []
        out_ps: list[list[int]] = [[] for _ in qs]
        i, n_rows = 0, len(units)
        while i < n_rows:
            j = i
            while j < n_rows and all(
                kl[j] == kl[i] for kl in keys_lists
            ):
                j += 1
            total = sum(counts[i:j])
            ranks = [max(1, math.ceil(q * total)) for q in qs]
            cum = 0
            found = [None] * len(qs)
            for r in range(i, j):
                cum += counts[r]
                for qi, rank in enumerate(ranks):
                    if found[qi] is None and cum >= rank:
                        found[qi] = units[r]
            for ki, kl in enumerate(keys_lists):
                out_keys[ki].append(kl[i])
            out_n.append(total)
            for qi in range(len(qs)):
                out_ps[qi].append(found[qi])
            i = j
        cols = {
            k: pa.array(out_keys[ki], agg.column(k).type)
            for ki, k in enumerate(key_cols)
        }
        cols["n_values"] = pa.array(out_n, pa.int64())
        for qi, name in enumerate(qnames):
            cols[name] = pa.array(out_ps[qi], pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return cluster_apply(partials, key_cols, block_percentiles)


def _dd_params(alpha: float) -> tuple[float, float]:
    """(gamma, log_gamma) for a DDSketch of relative accuracy ``alpha``."""
    import math

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return gamma, math.log(gamma)


def _dd_sentinels():
    import numpy as np

    return np.iinfo(np.int64).min, np.iinfo(np.int64).max  # zero, top


def _dd_bucketize(v, log_gamma: float):
    """float64 values → int64 DDSketch bucket ids. Values ≤ 0 and NaN take
    the zero sentinel; +inf takes the top sentinel — it must NOT fall
    through float→int64 overflow, which lands on INT64_MIN (the zero
    bucket, i.e. the BOTTOM of the distribution)."""
    import numpy as np

    zero_b, top_b = _dd_sentinels()
    idx = np.full(len(v), zero_b, dtype=np.int64)
    pos = np.isfinite(v) & (v > 0)
    idx[pos] = np.ceil(np.log(v[pos]) / log_gamma).astype(np.int64)
    idx[np.isposinf(v)] = top_b
    return idx


def _dd_estimate(k: int, gamma: float) -> float:
    """Bucket id → the DDSketch midpoint estimate for that bucket."""
    zero_b, top_b = _dd_sentinels()
    if k == zero_b:
        return 0.0
    if k == top_b:
        return float("inf")
    return 2.0 * gamma**k / (gamma + 1.0)


def dd_percentiles(ds, value_col: str, qs: list[float], *,
                   alpha: float = 0.01):
    """DDSketch approximate percentiles with a RELATIVE-error guarantee
    (Masson et al., VLDB 2019): every estimate is within ``alpha`` of the
    true value at rank ceil(q*n), at ANY data scale, with a sketch of
    O(log(max/min)/alpha) buckets.

    The scale story ``grouped_percentiles`` can't tell: its exact
    histogram is bounded by the quantized VALUE DOMAIN, which works for
    bounded business values but not for heavy-tailed corpus measures
    (doc lengths, latencies spanning 9 decades). DDSketch buckets are
    log-spaced — bucket k covers (γ^(k-1), γ^k], γ = (1+α)/(1-α) — so
    the sketch stays tiny no matter the tail.

    Shape: per-batch partial bucket counts (np.unique — one row per
    distinct bucket per batch, ≲1k rows for α=0.01 over 9 decades), one
    single-block reduce (the sketch, not the corpus, crosses the wire),
    cumulative scan reads each quantile off the merged histogram.
    Deterministic and merge-order invariant: bucket assignment is
    per-value, sums commute — identical output under any partitioning.
    Values ≤ 0 take the reserved zero bucket (estimate 0.0), the paper's
    zero-bucket convention.

    → (quantile, estimate, n_values) — declared rows-only for the driver
    (the estimate is deterministic but not SQL-derivable); the α bound,
    determinism and merge invariance are pytest-locked.
    """
    import math

    import numpy as np

    gamma, log_gamma = _dd_params(alpha)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        bkt, cnt = np.unique(_dd_bucketize(v, log_gamma),
                             return_counts=True)
        return pa.table(
            {"bkt": pa.array(bkt, pa.int64()),
             "c_part": pa.array(cnt, pa.int64())}
        )

    def merge_and_read(block: pa.Table) -> pa.Table:
        agg = block.group_by("bkt").aggregate([("c_part", "sum")])
        agg = agg.sort_by([("bkt", "ascending")])
        bkt = agg.column("bkt").to_numpy()
        cnt = agg.column("c_part_sum").to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1]) if len(cum) else 0
        out_q, out_e = [], []
        for q in qs:
            if n == 0:
                out_q.append(float(q))
                out_e.append(float("nan"))
                continue
            rank = max(1, math.ceil(q * n))
            k = int(bkt[np.searchsorted(cum, rank)])
            out_q.append(float(q))
            out_e.append(_dd_estimate(k, gamma))
        return pa.table(
            {"quantile": pa.array(out_q, pa.float64()),
             "estimate": pa.array(out_e, pa.float64()),
             "n_values": pa.array([n] * len(qs), pa.int64())}
        )

    return (
        ds.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_and_read, batch_format="pyarrow",
                     batch_size=None)
    )


def grouped_dd_percentiles(ds, key_cols: list[str], value_col: str,
                           qs: list[float], *, alpha: float = 0.01):
    """Per-group DDSketch percentiles — ``dd_percentiles``' grouped form
    and ``grouped_percentiles``' heavy-tail companion: per-group sketches
    stay O(log(max/min)/α) rows regardless of the group's value spread,
    where the exact quantized histogram grows with the value domain.

    Per-batch partial (keys, bucket, count) rows collapse each batch's
    values before the ONE int-key exchange on the group key; each group's
    merged sketch reads its quantiles off block-locally. Same estimate
    guarantees, determinism and merge invariance as ``dd_percentiles``.

    → keys + ``n_values`` + one float64 ``p{q*100}_est`` column per q.
    """
    import math

    gamma, log_gamma = _dd_params(alpha)

    qnames = []
    for q in qs:
        pct = q * 100
        if abs(pct - round(pct)) > 1e-9:
            raise ValueError(f"q={q}: use percentiles expressible as q*100 int")
        qnames.append(f"p{int(round(pct))}_est")

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        v = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        idx = _dd_bucketize(v, log_gamma)
        t = pa.table(
            {**{k: batch.column(k) for k in key_cols},
             "bkt": pa.array(idx, pa.int64()),
             "one": pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows)}
        )
        agg = t.group_by(key_cols + ["bkt"]).aggregate([("one", "sum")])
        return agg.rename_columns(key_cols + ["bkt", "c_part"])

    def block_read(block: pa.Table) -> pa.Table:
        agg = block.group_by(key_cols + ["bkt"]).aggregate(
            [("c_part", "sum")]
        )
        agg = agg.sort_by(
            [(k, "ascending") for k in key_cols] + [("bkt", "ascending")]
        )
        keys_lists = [agg.column(k).to_pylist() for k in key_cols]
        buckets = agg.column("bkt").to_pylist()
        counts = agg.column("c_part_sum").to_pylist()
        out_keys: list[list] = [[] for _ in key_cols]
        out_n: list[int] = []
        out_ps: list[list[float]] = [[] for _ in qs]
        i, n_rows = 0, len(buckets)
        while i < n_rows:
            j = i
            while j < n_rows and all(kl[j] == kl[i] for kl in keys_lists):
                j += 1
            total = sum(counts[i:j])
            ranks = [max(1, math.ceil(q * total)) for q in qs]
            cum = 0
            found: list[float | None] = [None] * len(qs)
            for r in range(i, j):
                cum += counts[r]
                for qi, rank in enumerate(ranks):
                    if found[qi] is None and cum >= rank:
                        found[qi] = _dd_estimate(buckets[r], gamma)
            for ki, kl in enumerate(keys_lists):
                out_keys[ki].append(kl[i])
            out_n.append(total)
            for qi in range(len(qs)):
                out_ps[qi].append(found[qi])
            i = j
        cols = {
            k: pa.array(out_keys[ki], agg.column(k).type)
            for ki, k in enumerate(key_cols)
        }
        cols["n_values"] = pa.array(out_n, pa.int64())
        for qi, name in enumerate(qnames):
            cols[name] = pa.array(out_ps[qi], pa.float64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return cluster_apply(partials, key_cols, block_read)


def hash_sample(ds, key_col: str, *, threshold: int, modulus: int = 256):
    """Deterministic content-hash sampling: keep rows whose
    ``md5(str(key))`` first byte < ``threshold`` (expected fraction
    threshold/modulus with modulus=256).

    Unlike ``Dataset.random_sample`` this is stable across runs, scales and
    partitionings — the property a train/eval split or a debugging subset
    needs at 10^12 rows (re-running the pipeline keeps the same rows). The
    filter is stateless and embarrassingly parallel; SQL-expressible as
    ``substr(md5(CAST(key AS VARCHAR)), 1, 2) < hex(threshold)``.
    """
    from ..functions.hashing import md5_digest_matrix

    if modulus != 256:
        raise ValueError("modulus must be 256 (first hash byte)")

    def f(batch: pa.Table) -> pa.Table:
        digests = md5_digest_matrix(batch.column(key_col))
        return batch.filter(pa.array(digests[:, 0] < threshold))

    return ds.map_batches(f, batch_format="pyarrow")


_SIDE = "__side"


def cluster_join(left, right, keys: list[str], *,
                 left_types: dict[str, "pa.DataType"],
                 right_types: dict[str, "pa.DataType"],
                 how: str = "inner", hash_fn=None):
    """Distributed hash-cluster equi-join — the shuffle join for two LARGE
    sides (when neither fits a ``broadcast_lookup_join``).

    Both sides are aligned to one schema (each side null-fills the other's
    columns), tagged, unioned, and exchanged ONCE on the int64 crc32 key hash
    (``cluster_by``). Range partitioning never splits equal hashes, so every
    key's rows from both sides land in the same block and a block-local Arrow
    acero join (C++ hash join) is globally exact; distinct keys that share a
    block via hash collision are disambiguated by the join itself.

    ``left_types``: ALL left columns (keys included) → arrow type, in output
    order. ``right_types``: the right side's non-key value columns (its key
    columns must be named like ``keys``; pass ``{}`` for semi/anti, whose
    output is the left columns only). Duplicate right keys produce m:n join
    semantics, like SQL. ``how``: "inner" | "left" | "semi" | "anti" | "full" —
    semi/anti are the scale answer for existence filters whose filter side
    is itself corpus-sized (e.g. drop every doc in a corpus-scale deny
    list without broadcasting it).

    Scale: cost is one all-to-all of left+right; there is no driver-side
    state and no whole-table broadcast — this is the replacement for
    "collect the small side" when the small side is corpus-sized (e.g.
    per-term df over a web vocabulary, per-doc sizes over 10^12 docs).
    """
    import pyarrow.compute as pc

    left_names = list(left_types)
    rvalue_names = [c for c in right_types if c not in keys]
    all_names = left_names + rvalue_names

    def align_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).cast(left_types[c]) for c in left_names}
        for c in rvalue_names:
            cols[c] = pa.nulls(batch.num_rows, right_types[c])
        cols[_SIDE] = pa.repeat(pa.scalar(0, pa.int8()), batch.num_rows)
        return pa.table({c: cols[c] for c in all_names + [_SIDE]})

    def align_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            if c in keys:
                cols[c] = batch.column(c).cast(left_types[c])
            else:
                cols[c] = pa.nulls(batch.num_rows, left_types[c])
        for c in rvalue_names:
            cols[c] = batch.column(c).cast(right_types[c])
        cols[_SIDE] = pa.repeat(pa.scalar(1, pa.int8()), batch.num_rows)
        return pa.table({c: cols[c] for c in all_names + [_SIDE]})

    tagged = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow")
    )
    join_type = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti",
                 "full": "full outer"}[how]

    def block_join(block: pa.Table) -> pa.Table:
        side = block.column(_SIDE)
        lt = block.filter(pc.equal(side, 0)).select(left_names)
        rt = block.filter(pc.equal(side, 1)).select(keys + rvalue_names)
        return lt.join(rt, keys=keys, join_type=join_type)

    return cluster_apply(tagged, keys, block_join, hash_fn=hash_fn)


def broadcast_range_join(ds, ranges: list[tuple], value_col: str,
                         *, label_names: list[str], lo_col: str = "lo",
                         hi_col: str = "hi"):
    """Range join against a SMALL ranges side (brief: custom operators —
    "range join"): each row joins the range with lo <= value < hi.

    ``ranges``: sorted, non-overlapping (lo, hi, *labels) tuples. The ranges
    table is broadcast via ``ray.put`` once and matched per batch with a
    vectorized ``np.searchsorted`` — never a shuffle; rows outside every
    range get null labels. The corpus side streams.
    """
    import numpy as np
    import ray

    los = [r[0] for r in ranges]
    his = [r[1] for r in ranges]
    if any(his[i] > los[i + 1] for i in range(len(ranges) - 1)) or any(
        h <= lo for lo, h in zip(los, his)
    ):
        raise ValueError("ranges must be sorted, non-empty, non-overlapping")
    ref = ray.put((np.asarray(los, dtype=np.float64),
                   np.asarray(his, dtype=np.float64),
                   [tuple(r[2:]) for r in ranges]))

    def join(batch: pa.Table) -> pa.Table:
        lo_arr, hi_arr, labels = ray.get(ref)
        vals = np.asarray(batch.column(value_col).to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        idx = np.searchsorted(lo_arr, vals, side="right") - 1
        ok = (idx >= 0) & (vals < hi_arr[np.clip(idx, 0, len(hi_arr) - 1)])
        out = {c: batch.column(c) for c in batch.column_names}
        out[lo_col] = pa.array(
            [float(lo_arr[i]) if k else None for i, k in zip(idx, ok)],
            pa.float64(),
        )
        out[hi_col] = pa.array(
            [float(hi_arr[i]) if k else None for i, k in zip(idx, ok)],
            pa.float64(),
        )
        for li, name in enumerate(label_names):
            out[name] = pa.array(
                [labels[i][li] if k else None for i, k in zip(idx, ok)]
            )
        return pa.table(out)

    return ds.map_batches(join, batch_format="pyarrow")


def _bloom_hashes(column):
    """Two vectorized uint64 hash streams for a key column (h2 forced odd
    so Kirsch-Mitzenmacher double hashing cycles all slots). Integer keys:
    pure-numpy splitmix64 (no Python per row). Other types: md5 once per
    DISTINCT value via dictionary encoding, mapped back through a take."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()

    def mix(x, c):
        z = x + np.uint64(c)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    if pa.types.is_integer(column.type):
        x = column.cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = x.astype(np.uint64)
        h1 = mix(x, 0x9E3779B97F4A7C15)
        h2 = mix(x, 0xD1B54A32D192ED03) | np.uint64(1)
        return h1, h2
    enc = pc.dictionary_encode(column.cast(pa.string()))
    digs = [
        hashlib.md5(v.encode()).digest()
        for v in enc.dictionary.to_pylist()
    ]
    d1 = np.array(
        [int.from_bytes(d[:8], "little") for d in digs], np.uint64
    )
    d2 = np.array(
        [int.from_bytes(d[8:16], "little") | 1 for d in digs], np.uint64
    )
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return d1[idx], d2[idx]


def bloom_prefilter(big, keys_ds, key: str, *, right_key: str | None = None,
                    n_bits: int = 1 << 20, n_hashes: int = 4):
    """PROBABILISTIC membership prefilter: ``big`` rows whose ``key`` is
    possibly in ``keys_ds[right_key]`` — keeps every true member plus a
    false-positive residue ≈ (1 - e^{-kn/m})^k; drops nothing that
    matches. No shuffle, driver state = ONE merged bitmap row.

    1. the key side folds into per-batch Bloom bitmaps (``n_bits`` bits,
       vectorized double hashing — one row of ``n_bits/8`` bytes per batch);
    2. bitmaps OR-reduce inside the dataset (`repartition(1)` + block OR —
       the driver receives ONE row, never a per-batch pile);
    3. the big side drops definite non-members per batch against the
       broadcast bitmap (``ray.put`` once) — no shuffle for the ~100% of
       rows a selective filter rejects.

    Use directly when a downstream join is ALREADY an exact gate (the LSH
    verify's pair-table joins) and survivors only cost wasted work, not
    wrong answers; use :func:`bloom_semi_join` when the filter itself must
    be exact.
    """
    import numpy as np

    import ray

    right_key = right_key or key
    np_bits = np.uint64(n_bits)

    def build_partial(batch: pa.Table) -> pa.Table:
        buf = np.zeros(n_bits // 8, np.uint8)
        if batch.num_rows:
            h1, h2 = _bloom_hashes(batch.column(right_key))
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) % np_bits
                np.bitwise_or.at(
                    buf,
                    (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        return pa.table({"bloom": pa.array([buf.tobytes()], pa.binary())})

    def block_or(block: pa.Table) -> pa.Table:
        buf = np.zeros(n_bits // 8, np.uint8)
        for v in block.column("bloom").to_pylist():
            buf |= np.frombuffer(v, np.uint8)
        return pa.table({"bloom": pa.array([buf.tobytes()], pa.binary())})

    merged = (
        keys_ds.select_columns([right_key])
        .map_batches(build_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(block_or, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    bits = (
        np.frombuffer(merged[0]["bloom"], np.uint8)
        if merged else np.zeros(n_bits // 8, np.uint8)
    )
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        buf = ray.get(bits_ref)
        h1, h2 = _bloom_hashes(batch.column(key))
        member = np.ones(batch.num_rows, bool)
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) % np_bits
            bit = (
                buf[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1)
            member &= bit.astype(bool)
        return batch.filter(pa.array(member))

    return big.map_batches(probe, batch_format="pyarrow")


def bloom_semi_join(big, keys_ds, key: str, *, right_key: str | None = None,
                    left_types: dict[str, "pa.DataType"],
                    n_bits: int = 1 << 20, n_hashes: int = 4,
                    hash_fn=None):
    """EXACT semi-join with a Bloom prefilter — ``big`` rows whose ``key``
    appears in ``keys_ds[right_key]``.

    The scale pattern for existence filters where BOTH sides are large but
    the match rate is low (visited-url suppression, deny-list application):
    :func:`bloom_prefilter` drops the ~100% of rows a selective filter
    rejects without a shuffle, then the survivors (match-rate-sized, not
    corpus-sized) go through the exact ``cluster_join`` semi — the Bloom
    pass only PRUNES, the join decides.

    ``left_types``: all ``big`` columns → arrow type (cluster_join output
    order). Result == SQL ``WHERE EXISTS`` exactly.
    """
    right_key = right_key or key
    prefiltered = bloom_prefilter(
        big, keys_ds, key, right_key=right_key,
        n_bits=n_bits, n_hashes=n_hashes,
    )
    right = keys_ds.select_columns([right_key])
    if right_key != key:
        right = right.map_batches(
            lambda b: b.rename_columns([key]), batch_format="pyarrow"
        )
    return cluster_join(
        prefiltered, right, [key], left_types=left_types, right_types={},
        how="semi", hash_fn=hash_fn,
    )


def stratified_sample(ds, key_cols: list[str], k: int, *,
                      id_col: str, text_col: str | None = None):
    """Deterministic k-per-group sample → input columns, ≤ k rows per
    group.

    The per-stratum quota pattern for corpus balancing (k docs per
    language/domain/bucket): rows are ranked inside each stratum by
    ``(md5(text or id), id)`` — a content hash, so the pick is stable
    across runs and partitionings, reproducible in SQL, and unbiased with
    respect to input order — and the existing ``grouped_topk`` exchange
    keeps only the quota (one int-key exchange; ≤ k rows per group leave
    the block walk).
    """
    from ..functions.hashing import md5_digest_matrix

    def hashed(batch: pa.Table) -> pa.Table:
        src = batch.column(text_col if text_col else id_col)
        digests = md5_digest_matrix(src)
        # raw digest bytes as fixed_size_binary(16): byte order ==
        # hex-string order, so ranking is identical to the md5-hex SQL
        # oracle at 16 bytes/row instead of a 32-char Python string
        rank = pa.Array.from_buffers(
            pa.binary(16), len(digests),
            [None, pa.py_buffer(digests.tobytes())],
        )
        return batch.append_column("sample_rank", rank)

    ranked = ds.map_batches(hashed, batch_format="pyarrow")
    out = grouped_topk(
        ranked, key_cols,
        [("sample_rank", "ascending"), (id_col, "ascending")], k,
    )

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["sample_rank"])

    return out.map_batches(drop, batch_format="pyarrow")


def global_rank(ds, value_col: str, tiebreak_col: str, *,
                rank_col: str = "rank", n_parts: int = 64):
    """Total ordering without a global sort: append 1-based ``rank_col``
    equal to SQL ``row_number() OVER (ORDER BY value DESC, tiebreak ASC)``.

    The distributed-ranking pattern (same prefix-sum plan as
    ``pack.pack_sequences``): range-partition on the INT value column
    (descending ranges), count per partition (≤ ``n_parts`` rows to the
    driver → exclusive prefix offsets), then one int-key exchange and a
    block-local Arrow sort per partition run. The tiebreak column (often a
    string — a web vocabulary) is only ever sorted BLOCK-locally: the
    pathological Ray range-partition boundary search over strings
    (CLAUDE.md hard-won rule) never runs.
    """
    import ray

    def minmax(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            # empty blocks (upstream filters) yield null min/max which
            # would crash the driver-side min() over partials
            return pa.table(
                {"lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        v = batch.column(value_col)
        return pa.table(
            {"lo": pa.array([pc.min(v).as_py()], pa.int64()),
             "hi": pa.array([pc.max(v).as_py()], pa.int64())}
        )

    mm = ds.select_columns([value_col]).map_batches(
        minmax, batch_format="pyarrow"
    ).take_all()
    if not mm:
        return ds
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = max(1, (hi - lo) // n_parts + 1)

    def add_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part = pc.divide(
            pc.subtract(hi, batch.column(value_col)), width
        ).cast(pa.int32())
        return batch.append_column("__rank_part", part)

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    sums = grouped_agg(
        parted.select_columns(["__rank_part"]),
        ["__rank_part"], [("n", "__rank_part", "count")],
    )
    rows = sorted((r["__rank_part"], r["n"]) for r in sums.take_all())
    offsets: dict[int, int] = {}
    acc = 0
    for part, n in rows:
        offsets[part] = acc
        acc += n
    offsets_ref = ray.put(offsets)

    def block_rank(block: pa.Table) -> pa.Table:
        import numpy as np

        table = ray.get(offsets_ref)
        block = block.sort_by(
            [("__rank_part", "ascending"), (value_col, "descending"),
             (tiebreak_col, "ascending")]
        )
        parts = block.column("__rank_part").to_numpy(zero_copy_only=False)
        rank = np.empty(len(parts), dtype=np.int64)
        run_start = 0
        for i in range(1, len(parts) + 1):
            if i == len(parts) or parts[i] != parts[i - 1]:
                base = table[int(parts[run_start])]
                rank[run_start:i] = base + np.arange(1, i - run_start + 1)
                run_start = i
        return block.drop_columns(["__rank_part"]).append_column(
            rank_col, pa.array(rank, pa.int64())
        )

    return cluster_apply(parted, ["__rank_part"], block_rank)


def deterministic_shuffle(ds, id_col: str = "doc_id", *,
                          rank_col: str = "shuffle_rank", n_parts: int = 64):
    """→ (id_col, rank_col): a REPRODUCIBLE global corpus shuffle — the
    training-order permutation, stable across runs / scales /
    partitionings (unlike ``ds.random_shuffle``).

    Rank = 1-based position under ``md5(str(id))`` ascending — i.e.
    SQL ``row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)))`` — via
    the ``global_rank`` prefix-sum plan: the 63-bit digest prefix is the
    int range-partition key (never a string boundary search), the full
    hex digest breaks prefix ties block-locally, so the order is exactly
    hex-ascending at any scale. Distinct ids with colliding full digests
    would tie arbitrarily on both engines — no such md5 collision is
    constructible from id strings.
    """
    import numpy as np

    from ..functions.hashing import md5_digest_matrix

    def add_keys(batch: pa.Table) -> pa.Table:
        d = md5_digest_matrix(batch.column(id_col))
        pref = np.ascontiguousarray(d[:, :8]).view(">u8").ravel()
        val = -((pref >> np.uint64(1)).astype(np.int64))
        hexes = [row.tobytes().hex() for row in d]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__sh_val": pa.array(val, pa.int64()),
                "__sh_hex": pa.array(hexes, pa.string()),
            }
        )

    ranked = global_rank(
        ds.select_columns([id_col]).map_batches(
            add_keys, batch_format="pyarrow"
        ),
        "__sh_val", "__sh_hex", rank_col=rank_col, n_parts=n_parts,
    )
    return ranked.map_batches(
        lambda b: b.select([id_col, rank_col]), batch_format="pyarrow"
    )


def grouped_count_distinct(ds, keys: list[str], col: str, *,
                           out_name: str = "n_distinct"):
    """Exact COUNT(DISTINCT col) per key group at scale → keys + out_name.

    Two-level plan (no group's distinct set ever sits in one Python
    structure larger than a block): (1) per-batch dedupe of (keys, col)
    collapses in-batch repeats; (2) ONE int-key exchange on (keys, col)
    — note the VALUE is part of the exchange key, so a hot group's
    distinct values spread across partitions like any other key domain —
    with block-local dedupe makes pairs globally unique; (3) the standard
    two-phase count per keys. The generic form of the salted trick
    ``textstats.domain_stats`` uses.
    """

    def batch_dedupe(batch: pa.Table) -> pa.Table:
        sub = batch.select(keys + [col])
        return sub.group_by(keys + [col]).aggregate([])

    deduped = cluster_apply(
        ds.map_batches(batch_dedupe, batch_format="pyarrow"),
        keys + [col],
        lambda block: block.group_by(keys + [col]).aggregate([]),
    )
    return grouped_agg(deduped, keys, [(out_name, col, "count")])


def grouped_approx_distinct(ds, keys: list[str], col: str, *,
                            precision: int = 12):
    """Approximate COUNT(DISTINCT col) per key group → keys +
    (estimate:int64): one HyperLogLog per group (same md5 construction,
    corrections and determinism as ``textstats.approx_distinct``), with
    per-batch register partials merged by ONE exchange on the group key
    (elementwise max, block-local). State per group is 2^precision bytes
    REGARDLESS of cardinality — the scale path when groups are huge and
    an exact per-group distinct is an avoidable full exchange of values.
    """
    import hashlib

    import numpy as np

    m = 1 << precision

    def batch_registers(batch: pa.Table) -> pa.Table:
        key_lists = [batch.column(k).to_pylist() for k in keys]
        vals = batch.column(col).to_pylist()
        regs_by_key: dict[tuple, np.ndarray] = {}
        for i, v in enumerate(vals):
            kt = tuple(kl[i] for kl in key_lists)
            regs = regs_by_key.get(kt)
            if regs is None:
                regs = regs_by_key[kt] = np.zeros(m, dtype=np.uint8)
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "big")
            idx = h >> (64 - precision)
            rest = h & ((1 << (64 - precision)) - 1)
            rank = (64 - precision) - rest.bit_length() + 1
            if rank > regs[idx]:
                regs[idx] = rank
        kts = list(regs_by_key)
        cols = {
            k: pa.array([kt[j] for kt in kts],
                        batch.column(k).type)
            for j, k in enumerate(keys)
        }
        cols["regs"] = pa.array(
            [regs_by_key[kt].tobytes() for kt in kts], pa.binary())
        return pa.table(cols)

    def block_merge(block: pa.Table) -> pa.Table:
        key_lists = [block.column(k).to_pylist() for k in keys]
        regs_col = block.column("regs").to_pylist()
        merged: dict[tuple, np.ndarray] = {}
        for i, rb in enumerate(regs_col):
            kt = tuple(kl[i] for kl in key_lists)
            r = np.frombuffer(rb, dtype=np.uint8)
            prev = merged.get(kt)
            merged[kt] = r if prev is None else np.maximum(prev, r)
        alpha = 0.7213 / (1 + 1.079 / m)
        kts = list(merged)
        ests = []
        for kt in kts:
            regs = merged[kt]
            est = alpha * m * m / np.sum(
                np.exp2(-regs.astype(np.float64)))
            zeros = int(np.count_nonzero(regs == 0))
            if est <= 2.5 * m and zeros:
                est = m * np.log(m / zeros)
            ests.append(int(round(est)))
        cols = {
            k: pa.array([kt[j] for kt in kts], block.column(k).type)
            for j, k in enumerate(keys)
        }
        cols["estimate"] = pa.array(ests, pa.int64())
        return pa.table(cols)

    parts = ds.select_columns(keys + [col]).map_batches(
        batch_registers, batch_format="pyarrow"
    )
    return cluster_apply(parts, keys, block_merge)


def assign_split(ds, *, text_col: str = "text",
                 splits: list[tuple[str, int]] | None = None):
    """Deterministic corpus split → input columns + ``split``.

    ``splits``: [(name, percent), ...] summing to 100; a row lands in the
    bucket its content-hash percentile falls in (md5 of the text — stable
    across runs, partitionings and machines; the standard
    train/val/test assignment that must NEVER depend on row order).
    Stateless per-batch map, no shuffle.
    """
    import numpy as np

    import pyarrow.compute as pc

    from ..functions.hashing import md5_digest_matrix

    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percents must sum to 100")
    bounds = np.cumsum([p for _, p in splits])
    names = pa.array([name for name, _ in splits], pa.string())

    def f(batch: pa.Table) -> pa.Table:
        # null text hashes as "" (the legacy `t or ""` semantics)
        digests = md5_digest_matrix(
            pc.fill_null(batch.column(text_col), "")
        ).astype(np.uint32)
        h = (
            (digests[:, 0] << 24) | (digests[:, 1] << 16)
            | (digests[:, 2] << 8) | digests[:, 3]
        ) % 100
        idx = np.searchsorted(bounds, h, side="right")
        return batch.append_column(
            "split", names.take(pa.array(idx, pa.int64()))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def profile_table(ds, columns: list[str]):
    """Data-quality profile → one row per column: (column, n_rows,
    n_nulls, n_distinct, min_str, max_str).

    The standard pre-ingest audit pass: per-batch partials (count, null
    count, min/max as strings) collapse each batch to one row per column;
    distinct counts ride the exact ``grouped_count_distinct`` plan keyed
    by (column, value-string) so no column's value set ever centralizes.
    Driver state: O(columns).
    """
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        names, n_rows, n_nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = batch.column(c)
            names.append(c)
            n_rows.append(batch.num_rows)
            n_nulls.append(col.null_count)
            s = col.drop_null().cast(pa.string())
            mins.append(pc.min(s).as_py() if len(s) else None)
            maxs.append(pc.max(s).as_py() if len(s) else None)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "n_nulls": pa.array(n_nulls, pa.int64()),
                "min_str": pa.array(mins, pa.string()),
                "max_str": pa.array(maxs, pa.string()),
            }
        )

    base = cluster_apply(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["column"],
        lambda block: block.group_by(["column"]).aggregate(
            [("n_rows", "sum"), ("n_nulls", "sum"),
             ("min_str", "min"), ("max_str", "max")]
        ).rename_columns(
            ["column", "n_rows", "n_nulls", "min_str", "max_str"]
        ),
    )

    def explode_values(batch: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            vals = batch.column(c).drop_null().cast(pa.string())
            parts.append(
                pa.table(
                    {"column": pa.array([c] * len(vals), pa.string()),
                     "value": vals}
                )
            )
        return pa.concat_tables(parts).combine_chunks()

    values = ds.map_batches(explode_values, batch_format="pyarrow")
    distinct = grouped_count_distinct(values, ["column"], "value")

    return cluster_join(
        base, distinct, ["column"],
        left_types={"column": pa.string(), "n_rows": pa.int64(),
                    "n_nulls": pa.int64(), "min_str": pa.string(),
                    "max_str": pa.string()},
        right_types={"n_distinct": pa.int64()},
    )


def pivot_counts(ds, key_cols: list[str], pivot_col: str,
                 values: list[str], *, include_other: bool = True):
    """Pivot a categorical column into per-value count columns:
    → key_cols + ``<value>_cnt`` per listed value (+ ``other_cnt``).

    The SQL shape ``COUNT(*) FILTER (WHERE pivot = v) ... GROUP BY keys``.
    Stateless vectorized indicator expansion (one ``pc.equal`` mask per
    value) feeding the standard two-phase :func:`grouped_agg` — the pivot
    adds NO exchange beyond the grouped merge, and the value list is a
    plan-time constant (pivoted columns must be enumerable; an unbounded
    domain belongs in ``grouped_agg`` on (keys, pivot) instead).
    """
    import pyarrow.compute as pc

    def indicators(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in key_cols}
        pv = batch.column(pivot_col)
        any_listed = None
        for v in values:
            m = pc.fill_null(pc.equal(pv, v), False)
            cols[f"ind_{v}"] = pc.cast(m, pa.int64())
            any_listed = m if any_listed is None else pc.or_(any_listed, m)
        if include_other:
            cols["ind__other"] = pc.cast(pc.invert(any_listed), pa.int64())
        return pa.table(cols)

    specs = [(f"{v}_cnt", f"ind_{v}", "sum") for v in values]
    if include_other:
        specs.append(("other_cnt", "ind__other", "sum"))
    expanded = ds.select_columns(key_cols + [pivot_col]).map_batches(
        indicators, batch_format="pyarrow"
    )
    return grouped_agg(expanded, key_cols, specs)


def rollup_agg(ds, keys: list[str], specs: list[tuple[str, str, str]]):
    """``GROUP BY ROLLUP(keys)``: the finest level runs ONE exchange over
    the raw data (:func:`grouped_agg`); every coarser prefix level is an
    aggregate-of-aggregates over the finest RESULT — group-count-sized, so
    the rollup adds only trivially small exchanges, never a second pass
    over the input (the classic rollup optimization).

    Rollup algebra: ``count`` partials roll up as ``sum``; sum/min/max roll
    up as themselves. Rolled-up key columns are NULL in coarser levels
    (like SQL ROLLUP; assumes the key columns themselves contain no nulls —
    callers with nullable keys need a sentinel, the standard GROUPING()
    ambiguity). Output: keys + out_names, all levels unioned.
    """
    in_schema = ds.schema()
    base = getattr(in_schema, "base_schema", in_schema)
    key_types = {k: base.field(k).type for k in keys}

    finest = grouped_agg(ds, keys, specs)
    out_names = [out for out, _c, _f in specs]
    roll_specs = [
        (out, out, "sum" if fn == "count" else fn) for out, _c, fn in specs
    ]
    all_cols = keys + out_names

    levels = [finest.select_columns(all_cols)]
    for i in range(len(keys) - 1, -1, -1):
        lvl_keys = keys[:i]
        if lvl_keys:
            lvl = grouped_agg(finest, lvl_keys, roll_specs)
        else:

            def add_all(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "__all", pa.repeat(pa.scalar(0, pa.int32()),
                                       batch.num_rows)
                )

            lvl = grouped_agg(
                finest.map_batches(add_all, batch_format="pyarrow"),
                ["__all"], roll_specs,
            )

        dropped = keys[i:]

        def pad(batch: pa.Table, _dropped=tuple(dropped)) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (
                    pa.nulls(batch.num_rows, key_types[k])
                    if k in _dropped else batch.column(k)
                )
            for o in out_names:
                cols[o] = batch.column(o)
            return pa.table({c: cols[c] for c in all_cols})

        levels.append(lvl.map_batches(pad, batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def salted_cluster_join(left, right, keys: list[str], *,
                        left_types: dict[str, "pa.DataType"],
                        right_types: dict[str, "pa.DataType"],
                        salt_col: str, n_salts: int = 16,
                        how: str = "inner", hash_fn=None):
    """Hot-key (skew) mitigation for :func:`cluster_join`: a single join
    key shared by 10^8 rows (one mega-domain of the web) would otherwise
    land its entire group in ONE reduce block. The skewed LEFT side gains
    a deterministic per-row salt (crc32 of ``salt_col`` — any well-spread
    per-row column, e.g. the url/doc id — mod ``n_salts``), the right side
    is replicated once per salt, and the exchange keys become
    ``keys + [salt]`` — the hot key now spreads across ``n_salts`` blocks.

    Exact for how ∈ inner|left|semi|anti: each left row meets the FULL
    right group of its key exactly once (in its salt's replica). ``full``
    is rejected — right-unmatched rows would surface once per salt.
    Cost: right side ships ``n_salts``×, so use when right ≪ left but too
    big to broadcast and the left key distribution is skewed.
    """
    import pyarrow.compute as pc

    if how == "full":
        raise ValueError("salted join cannot express full outer join "
                         "(right-unmatched rows would duplicate per salt)")
    _SALT = "__salt"

    def add_salt(batch: pa.Table) -> pa.Table:
        col = batch.column(salt_col)
        if pa.types.is_integer(col.type):
            # Euclidean (floor) mod: Arrow's divide truncates toward zero,
            # so a negative salt column would yield negative salts that
            # never match the right side's 0..n_salts-1 replicas — those
            # rows would silently lose all matches
            m = pc.subtract(col, pc.multiply(pc.divide(col, n_salts),
                                             n_salts))
            m = pc.if_else(pc.less(m, 0), pc.add(m, n_salts), m)
            salts = pc.cast(m, pa.int32())
        else:
            encoded = pc.dictionary_encode(
                col.cast(pa.string()).combine_chunks()
            )
            from ..functions.hashing import crc32_column

            lut = pa.array(
                (crc32_column(encoded.dictionary) % n_salts).astype("int32"),
                pa.int32(),
            )
            salts = lut.take(encoded.indices)
        return batch.append_column(_SALT, salts)

    def replicate(batch: pa.Table) -> pa.Table:
        parts = []
        for s in range(n_salts):
            parts.append(batch.append_column(
                _SALT, pa.repeat(pa.scalar(s, pa.int32()), batch.num_rows)
            ))
        return pa.concat_tables(parts).combine_chunks()

    joined = cluster_join(
        left.map_batches(add_salt, batch_format="pyarrow"),
        right.map_batches(replicate, batch_format="pyarrow"),
        keys + [_SALT],
        left_types={**left_types, _SALT: pa.int32()},
        right_types=right_types,
        how=how, hash_fn=hash_fn,
    )
    return joined.drop_columns([_SALT])


def grouped_mad(ds, key_cols: list[str], value_col: str, *,
                z: float = 3.0):
    """Per-group robust dispersion: median, median absolute deviation
    (Hampel's MAD — the 50%-breakdown outlier scale a mean/std pair
    lacks), group size, and the count of ``|x − med| > z·mad`` outliers
    (the Hampel identifier at cutoff ``z``).

    Float-EXACT despite float inputs: both the median and the MAD are
    SELECTION-based (``rank = max(1, ceil(q·n))`` — the
    :func:`winsorize_values` / DuckDB ``quantile_disc`` convention), the
    deviation is one IEEE subtraction + abs, and the cutoff is one IEEE
    multiply — every arithmetic op is a single deterministic rounding
    that DuckDB replays bitwise, so the oracle hash-compare is exact.

    Physical plan: ONE group-key ``cluster_apply`` over the projected
    (keys, value) pairs; each group is co-located, so median, MAD and
    the outlier count all happen block-locally (python loops over
    GROUPS, numpy over rows). Output is one row per group.

    → key_cols + (med, mad, n, n_outliers).
    """
    import math

    import numpy as np

    def stats_fn(block: pa.Table) -> pa.Table:
        tbl = block.sort_by(
            [(k, "ascending") for k in key_cols]
            + [(value_col, "ascending")]
        )
        keys_np = [
            tbl.column(k).to_numpy(zero_copy_only=False) for k in key_cols
        ]
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
        vtype = tbl.column(value_col).type
        n_rows = len(vals)
        if n_rows == 0:
            return pa.table(
                {**{k: pa.array([], tbl.column(k).type) for k in key_cols},
                 "med": pa.array([], vtype), "mad": pa.array([], vtype),
                 "n": pa.array([], pa.int64()),
                 "n_outliers": pa.array([], pa.int64())}
            )
        change = np.zeros(n_rows - 1, dtype=bool)
        for arr in keys_np:
            change |= arr[1:] != arr[:-1]
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n_rows]))
        meds, mads, ns, outs = [], [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            med = vals[s + max(1, math.ceil(0.5 * n)) - 1]
            dev = np.abs(vals[s:e] - med)
            mad = np.sort(dev, kind="stable")[max(1, math.ceil(0.5 * n)) - 1]
            meds.append(med)
            mads.append(mad)
            ns.append(n)
            outs.append(int(np.count_nonzero(dev > z * mad)))
        return pa.table(
            {**{k: pa.array(keys_np[ki][starts], tbl.column(k).type)
                for ki, k in enumerate(key_cols)},
             "med": pa.array(meds, vtype), "mad": pa.array(mads, vtype),
             "n": pa.array(ns, pa.int64()),
             "n_outliers": pa.array(outs, pa.int64())}
        )

    def proj_fn(b: pa.Table) -> pa.Table:
        # float64 BEFORE any arithmetic: DuckDB computes in DOUBLE, and a
        # float32 subtraction rounds differently than cast-then-subtract
        # (the cast itself is exact) — the same promotion order keeps the
        # lattice bitwise.
        cols = {k: b.column(k) for k in key_cols}
        cols[value_col] = b.column(value_col).cast(pa.float64())
        return pa.table(cols)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")
    return cluster_apply(proj, key_cols, stats_fn)


def winsorize_values(ds, key_cols: list[str], value_col: str, *,
                     q_lo: float = 0.05, q_hi: float = 0.95,
                     carry_cols: list[str] | None = None):
    """Per-group winsorization: clamp ``value_col`` into the group's
    [q_lo, q_hi] discrete quantiles. SELECTION-based (the bounds are
    actual data values at ``rank = max(1, ceil(q·n))`` — the same
    convention as :func:`grouped_percentiles` / DuckDB ``quantile_disc``)
    and the clamp is a pure min/max, so the result is float-EXACT: no
    arithmetic ever touches the values.

    Physical plan: one group-key ``cluster_apply`` over (keys, value)
    computes per-group bounds (block-local Arrow sort, numpy boundary
    walk — python loops over GROUPS, not rows), then one ``cluster_join``
    attaches the bounds row (one per group) back to the full rows for a
    vectorized clamp — two int-key exchanges. At corpus scale the first
    exchange carries only the projected (keys, value) pair, not the rows.

    → carry_cols + key_cols + ``{value_col}_w``.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    carry = list(carry_cols or [])

    def bounds_fn(block: pa.Table) -> pa.Table:
        tbl = block.sort_by(
            [(k, "ascending") for k in key_cols]
            + [(value_col, "ascending")]
        )
        keys_np = [
            tbl.column(k).to_numpy(zero_copy_only=False) for k in key_cols
        ]
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
        n_rows = len(vals)
        if n_rows == 0:
            return pa.table(
                {**{k: pa.array([], tbl.column(k).type) for k in key_cols},
                 "lo": pa.array([], tbl.column(value_col).type),
                 "hi": pa.array([], tbl.column(value_col).type)}
            )
        change = np.zeros(n_rows - 1, dtype=bool)
        for arr in keys_np:
            change |= arr[1:] != arr[:-1]
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n_rows]))
        los, his = [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            los.append(vals[s + max(1, math.ceil(q_lo * n)) - 1])
            his.append(vals[s + max(1, math.ceil(q_hi * n)) - 1])
        return pa.table(
            {**{k: pa.array(keys_np[ki][starts],
                            tbl.column(k).type)
                for ki, k in enumerate(key_cols)},
             "lo": pa.array(los, tbl.column(value_col).type),
             "hi": pa.array(his, tbl.column(value_col).type)}
        )

    proj = ds.map_batches(
        lambda b: b.select(key_cols + [value_col]), batch_format="pyarrow"
    )
    bounds = cluster_apply(proj, key_cols, bounds_fn)

    in_schema = ds.schema()
    base = getattr(in_schema, "base_schema", in_schema)
    left_types = {
        c: base.field(c).type for c in carry + key_cols + [value_col]
    }
    vtype = base.field(value_col).type
    joined = cluster_join(
        ds.map_batches(
            lambda b: b.select(carry + key_cols + [value_col]),
            batch_format="pyarrow",
        ),
        bounds, key_cols,
        left_types=left_types,
        right_types={"lo": vtype, "hi": vtype},
    )

    def clamp(b: pa.Table) -> pa.Table:
        w = pc.min_element_wise(
            pc.max_element_wise(b.column(value_col), b.column("lo")),
            b.column("hi"),
        )
        return pa.table(
            {**{c: b.column(c) for c in carry + key_cols},
             f"{value_col}_w": w}
        )

    return joined.map_batches(clamp, batch_format="pyarrow")


def grouped_mode(ds, key_cols: list[str], value_col: str):
    """Per-group MODE with a deterministic tie-break (highest count, then
    smallest value — SQL ``ROW_NUMBER() OVER (ORDER BY n DESC, v ASC)``):
    → key_cols + (``mode_<value_col>``, ``n``).

    Physical plan: two-phase grouped count over (keys, value) — the
    combiner collapses repeats before the wire — then ONE key-group
    ``cluster_apply`` that takes each group's first row under the
    (n desc, value asc) block-local sort. The second exchange carries one
    row per DISTINCT (key, value), never per input row.
    """

    counts = grouped_agg(ds, key_cols + [value_col],
                         [("n", value_col, "count")])

    def first_per_group(block: pa.Table) -> pa.Table:
        srt = block.sort_by(
            [(k, "ascending") for k in key_cols]
            + [("n", "descending"), (value_col, "ascending")]
        )
        import numpy as np

        keys_np = [
            srt.column(k).to_numpy(zero_copy_only=False) for k in key_cols
        ]
        n_rows = srt.num_rows
        if n_rows == 0:
            return pa.table(
                {**{k: pa.array([], srt.column(k).type) for k in key_cols},
                 f"mode_{value_col}": pa.array(
                     [], srt.column(value_col).type),
                 "n": pa.array([], pa.int64())}
            )
        # first row of each group = any key differs from the previous row
        head = np.ones(n_rows, dtype=bool)
        change = np.zeros(n_rows - 1, dtype=bool)
        for arr in keys_np:
            change |= arr[1:] != arr[:-1]
        head[1:] = change
        firsts = srt.take(pa.array(np.flatnonzero(head)))
        return pa.table(
            {**{k: firsts.column(k) for k in key_cols},
             f"mode_{value_col}": firsts.column(value_col),
             "n": firsts.column("n").cast(pa.int64())}
        )

    return cluster_apply(counts, key_cols, first_per_group)


def ntile_values(ds, key_cols: list[str], value_col: str, *,
                 n_buckets: int = 4, order_cols: list[str] | None = None):
    """Exact per-group NTILE: rows of each group are ranked under the
    (value, *order_cols) TOTAL order (callers must pass a tie-breaking
    id column, or equal rows make the rank — and thus the bucket —
    nondeterministic) and dealt into ``n_buckets`` with SQL's remainder
    rule: the first ``n mod b`` buckets get ``⌈n/b⌉`` rows, the rest
    ``⌊n/b⌋``. 1-based buckets, exactly DuckDB's ``NTILE``.

    Physical plan: ONE group-key ``cluster_apply`` — block-local Arrow
    sort, numpy group boundaries, vectorized bucket assignment from the
    closed-form rank→bucket map. The exchange carries only the projected
    (keys, value, order) columns.

    → key_cols + order_cols + value_col + ``bucket``:int64.
    """
    import numpy as np

    order_cols = list(order_cols or [])

    def assign(block: pa.Table) -> pa.Table:
        srt = block.sort_by(
            [(k, "ascending") for k in key_cols]
            + [(value_col, "ascending")]
            + [(c, "ascending") for c in order_cols]
        )
        n_rows = srt.num_rows
        if n_rows == 0:
            return srt.append_column("bucket", pa.array([], pa.int64()))
        keys_np = [
            srt.column(k).to_numpy(zero_copy_only=False) for k in key_cols
        ]
        change = np.zeros(n_rows - 1, dtype=bool)
        for arr in keys_np:
            change |= arr[1:] != arr[:-1]
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n_rows]))
        # rank within group (0-based)
        group_start_per_row = np.repeat(starts, ends - starts)
        rank = np.arange(n_rows) - group_start_per_row
        n_per_row = np.repeat(ends - starts, ends - starts)
        big = n_per_row // n_buckets + 1          # rows in the first r buckets
        r = n_per_row % n_buckets
        cutoff = r * big                          # ranks below this → big buckets
        small = np.maximum(n_per_row // n_buckets, 1)
        bucket = np.where(
            rank < cutoff,
            rank // np.maximum(big, 1) + 1,
            r + (rank - cutoff) // small + 1,
        )
        return srt.append_column("bucket", pa.array(bucket, pa.int64()))

    proj = ds.map_batches(
        lambda b: b.select(key_cols + [value_col] + order_cols),
        batch_format="pyarrow",
    )
    return cluster_apply(proj, key_cols, assign)


def pareto_frontier(ds, x_col: str, y_col: str, *,
                    carry_cols: list[str] | None = None):
    """2-D Pareto frontier (skyline), both dimensions MAXIMIZED: keep
    rows not dominated — q dominates p iff q.x ≥ p.x ∧ q.y ≥ p.y with at
    least one strict. Exact duplicates of a frontier point all survive
    (mutual non-domination), matching the SQL NOT-EXISTS definition.

    Skylines are decomposable — skyline(S) = skyline(skyline(S₁) ∪
    skyline(S₂)) — so the plan is: per-block skyline (one map, numpy:
    sort by (x desc, y desc), survive iff y == its x-group max AND y >
    the strictly-greater-x prefix max), then the tiny union coalesces to
    one block for the identical final pass. Partitioning assumption
    (documented per the custom-operator brief): the FRONTIER fits one
    block — frontier size on real 2-D data is O(log n) in expectation;
    the corpus never coalesces.

    → carry_cols + x_col + y_col, frontier rows only.
    """
    import numpy as np

    carry = list(carry_cols or [])

    def block_skyline(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return block
        x = block.column(x_col).to_numpy(zero_copy_only=False)
        y = block.column(y_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((-y, -x))
        xs, ys = x[order], y[order]
        grp_head = np.ones(n, dtype=bool)
        grp_head[1:] = xs[1:] != xs[:-1]
        grp_id = np.cumsum(grp_head) - 1
        # per x-group max y = y of the group's first row (y desc inside x)
        grp_max_y = ys[grp_head][grp_id]
        # prefix max y over STRICTLY greater x = running max up to the
        # previous group's end
        run_max_at_head = np.maximum.accumulate(ys[grp_head])
        # compare in the column's native dtype (a float -inf sentinel
        # would promote int64 y to float64 and lose precision past 2^53)
        has_prefix = grp_id >= 1
        beats_prefix = np.ones(n, dtype=bool)
        beats_prefix[has_prefix] = (
            ys[has_prefix] > run_max_at_head[grp_id[has_prefix] - 1]
        )
        survive = (ys == grp_max_y) & beats_prefix
        keep_idx = order[survive]
        return block.take(pa.array(np.sort(keep_idx)))

    local = ds.map_batches(
        lambda b, _c=carry: block_skyline(b.select(_c + [x_col, y_col])),
        batch_format="pyarrow",
    )
    return local.repartition(1).map_batches(
        block_skyline, batch_format="pyarrow", batch_size=None
    )


def value_ranks(ds, value_col: str, *, carry_cols: list[str] | None = None,
                max_domain: int = 1_000_000):
    """Exact GLOBAL rank statistics for a bounded-domain integer column
    WITHOUT a global sort: two-phase histogram over the value domain
    (combiner collapses repeats), a driver-side cumulative sum over the
    ≤ ``max_domain`` distinct values, then a broadcast probe — the rank
    of every row is the count of strictly-smaller values. The histogram
    is bounded by the VALUE DOMAIN, never the corpus (the same trick as
    ``grouped_percentiles``); raises if the domain exceeds
    ``max_domain`` rather than silently collecting big state.

    → carry_cols + value_col + (``n_smaller``:int64, ``n_total``:int64);
    percent-rank / CDF position are consumer-side ratios.
    """
    import pyarrow.compute as pc

    carry = list(carry_cols or [])

    hist = grouped_agg(
        ds.map_batches(
            lambda b: b.select([value_col]), batch_format="pyarrow"
        ),
        [value_col], [("c", value_col, "count")],
    ).take_all()
    if len(hist) > max_domain:
        raise ValueError(
            f"value_ranks: {len(hist)} distinct values exceeds "
            f"max_domain={max_domain}"
        )
    hist.sort(key=lambda r: r[value_col])
    total = sum(r["c"] for r in hist)
    lookup, below = {}, 0
    for r in hist:
        lookup[r[value_col]] = (below, total)
        below += r["c"]

    return broadcast_lookup_join(
        ds.map_batches(
            lambda b, _c=carry: b.select(_c + [value_col]),
            batch_format="pyarrow",
        ),
        lookup, value_col,
        {"n_smaller": pa.int64(), "n_total": pa.int64()},
    )


def grouped_corr(ds, key_cols: list[str], x_col: str, y_col: str):
    """Per-group Pearson correlation from EXACT integer moment sums —
    the distributed form of ``corr(x, y) GROUP BY keys`` for
    integer-valued inputs (callers pre-scale decimals, e.g. cents).

    Float-EXACT oracle parity: the five moments (Σx, Σy, Σx², Σy², Σxy)
    and n accumulate as int64 — associative, order-free, no rounding —
    and the final value is a PINNED IEEE expression over them
    (n·Σxy − Σx·Σy, two products + one subtract, over a sqrt of the
    matching variance products, one division), which DuckDB replays
    operation for operation. int64 headroom: Σx² caps at
    n·max(x)² — callers keep n·max² < 2⁶³ (the lineitem-cents entry is
    ~10⁵ safety margin at sf0.1; re-scale inputs for wider domains).

    Physical plan: a batch combiner collapses every block to one partial
    row per group key (six int64 columns), then ONE group-key
    ``cluster_apply`` sums partials and emits the final expression —
    the pre-aggregate-before-exchange pattern; bytes on the wire are
    O(groups × batches), never O(rows).

    → key_cols + (n, corr). Groups with zero variance on either side
    emit corr = 0.0 (DuckDB's corr() yields NULL there; the SQL mirror
    wraps in COALESCE(..., 0.0)).
    """
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        base = pa.table(
            {**{k: batch.column(k) for k in key_cols},
             "n_p": pa.array(np.ones(len(x), dtype=np.int64)),
             "sx": pa.array(x), "sy": pa.array(y),
             "sxx": pa.array(x * x), "syy": pa.array(y * y),
             "sxy": pa.array(x * y)}
        )
        agg = base.group_by(key_cols).aggregate(
            [(c, "sum") for c in ("n_p", "sx", "sy", "sxx", "syy", "sxy")]
        )
        return pa.table(
            {**{k: agg.column(k) for k in key_cols},
             **{c: agg.column(f"{c}_sum")
                for c in ("n_p", "sx", "sy", "sxx", "syy", "sxy")}}
        )

    def finish(block: pa.Table) -> pa.Table:
        raw = block.group_by(key_cols).aggregate(
            [(c, "sum") for c in ("n_p", "sx", "sy", "sxx", "syy", "sxy")]
        )
        agg = pa.table(
            {**{k: raw.column(k) for k in key_cols},
             "n": raw.column("n_p_sum"),
             **{c: raw.column(f"{c}_sum")
                for c in ("sx", "sy", "sxx", "syy", "sxy")}}
        )
        n = agg.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = agg.column("sx").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sy = agg.column("sy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sxx = agg.column("sxx").to_numpy(zero_copy_only=False).astype(
            np.float64)
        syy = agg.column("syy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sxy = agg.column("sxy").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # pinned op order (each line = one IEEE rounding per element):
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        den = np.sqrt(vx * vy)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where(den == 0.0, 0.0, num / den)
        return pa.table(
            {**{k: agg.column(k) for k in key_cols},
             "n": agg.column("n").cast(pa.int64()),
             "corr": pa.array(corr, pa.float64())}
        )

    projected = ds.map_batches(
        lambda b: b.select(key_cols + [x_col, y_col]),
        batch_format="pyarrow",
    )
    return cluster_apply(
        projected.map_batches(partial, batch_format="pyarrow"),
        key_cols, finish,
    )


def consecutive_gaps(ds, key_col: str, ts_col: str, id_col: str):
    """Per-key inter-event gap statistics: rows of each key are ordered
    by the (ts, id) total order (the id tie-break makes it
    deterministic, so a SQL LAG() window replays it exactly) and the
    consecutive timestamp differences aggregate to n_gaps / min / max /
    sum in exact integer microseconds — the repeat-purchase-interval /
    crawl-revisit-cadence primitive. Keys with a single row emit
    nothing (no gaps), matching SQL's WHERE gap IS NOT NULL.

    Physical plan: ONE key ``cluster_apply`` — block-local Arrow sort,
    one numpy shifted difference masked at key boundaries, per-key
    reduction via ``np.minimum/maximum/add.at`` over the boundary
    segments; output is key-count-sized. All sums int64, order-free.

    → (key, n_gaps:int64, min_gap_us:int64, max_gap_us:int64,
       sum_gap_us:int64).
    """
    import numpy as np
    import pyarrow.compute as pc

    def gaps(block: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            block,
            sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                       (id_col, "ascending")],
        )
        s = block.take(idx)
        n = s.num_rows
        empty = pa.table(
            {key_col: pa.array([], pa.int64()),
             "n_gaps": pa.array([], pa.int64()),
             "min_gap_us": pa.array([], pa.int64()),
             "max_gap_us": pa.array([], pa.int64()),
             "sum_gap_us": pa.array([], pa.int64())}
        )
        if n < 2:
            return empty
        key = s.column(key_col).to_numpy(zero_copy_only=False)
        t = s.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        same = key[1:] == key[:-1]
        if not same.any():
            return empty
        d = (t[1:] - t[:-1])[same]
        owner = key[1:][same]
        # segment-reduce per key over the (sorted) owner runs
        starts = np.concatenate(
            ([0], np.flatnonzero(owner[1:] != owner[:-1]) + 1)
        )
        ends = np.concatenate((starts[1:], [len(owner)]))
        ks = owner[starts]
        mins = np.minimum.reduceat(d, starts)
        maxs = np.maximum.reduceat(d, starts)
        sums = np.add.reduceat(d, starts)
        return pa.table(
            {key_col: pa.array(ks, pa.int64()),
             "n_gaps": pa.array(ends - starts, pa.int64()),
             "min_gap_us": pa.array(mins, pa.int64()),
             "max_gap_us": pa.array(maxs, pa.int64()),
             "sum_gap_us": pa.array(sums, pa.int64())}
        )

    proj = ds.map_batches(
        lambda b: b.select([key_col, ts_col, id_col]),
        batch_format="pyarrow",
    )
    return cluster_apply(proj, [key_col], gaps)
