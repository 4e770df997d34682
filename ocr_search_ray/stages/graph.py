"""Graph operators over edge tables (connected components).

Near-dup pipelines end with pair lists (``minhash_lsh_pairs``,
``simhash_neardup``, ``embedding_neardup``); turning pairs into DEDUP
CLUSTERS (keep one representative per component) is a connected-components
problem. This is the iterative hash-min label propagation algorithm —
the standard MapReduce/Pregel formulation:

- labels start as ``node → node``;
- each round, only nodes whose label CHANGED last round send it to their
  neighbors (delta propagation — the ``pagerank_fixed`` partial-table
  trick applied to label propagation: after round 1 the changed set
  shrinks geometrically, so the per-round edge join touches a sliver of
  the edge list instead of all of it);
- every node takes the min over its current label and the incoming
  messages (ONE keyed exchange: labels tagged old ∪ messages, block-local
  min + old/new compare — which also yields next round's changed set for
  free, replacing the old separate label-sum convergence pass);
- converged when the changed set is empty (labels are monotone
  non-increasing, so a label value propagates the round it first appears
  — the delta scheme reaches the identical fixpoint).

Rounds needed = max component diameter; near-dup clusters are shallow
(pairs/stars), so 2-4 rounds in practice. Each round MATERIALIZES the
update table — required for any iterative fixpoint on a lazy lineage
(otherwise round k re-executes rounds 1..k-1); the table is int columns,
object-store-resident and spillable, never driver-resident (the driver
holds one changed-count int per round).
"""

from __future__ import annotations

import pyarrow as pa

from .relational import cluster_join, grouped_agg


def connected_components(edges, *, src_col: str = "src",
                         dst_col: str = "dst", max_iters: int = 50,
                         n_blocks: int | None = None):
    """→ (node, component): component = min node id in the component.
    Nodes are the ids appearing in ``edges`` (int type).

    ``n_blocks``: optional width for the iterated label table. Every
    round's exchanges inherit the input block count, so a small edge set
    should run narrow (fewer Ray tasks per round); at corpus scale leave
    None (inherit the read parallelism)."""
    import pyarrow.compute as pc

    # symmetric edge list, built once (u→v and v→u)
    def sym(batch: pa.Table) -> pa.Table:
        u = batch.column(src_col).cast(pa.int64())
        v = batch.column(dst_col).cast(pa.int64())
        return pa.concat_tables(
            [pa.table({"u": u, "v": v}), pa.table({"u": v, "v": u})]
        ).combine_chunks()

    edges_sym = edges.map_batches(sym, batch_format="pyarrow")
    if n_blocks is not None:
        edges_sym = edges_sym.repartition(n_blocks)
    edges_sym = edges_sym.materialize()

    from .relational import cluster_apply

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("u"), "lab": batch.column("u")}
        )

    labels = grouped_agg(
        edges_sym.map_batches(init_labels, batch_format="pyarrow"),
        ["node"], [("lab", "lab", "min")],
    ).materialize()
    changed = labels  # round 0: every node announces its initial label

    def block_update(block: pa.Table) -> pa.Table:
        """Per node (co-located by the keyed exchange): new = min over the
        old label + incoming messages; emit the old/new compare so the
        changed set falls out of the same pass."""
        agg = block.group_by("node").aggregate([("lab", "min")])
        old = block.filter(
            pc.equal(block.column("is_old"), 1)
        ).select(["node", "lab"]).rename_columns(["node", "old_lab"])
        j = pa.table(
            {"node": agg.column("node"), "lab": agg.column("lab_min")}
        ).join(old, keys=["node"], join_type="inner")
        return pa.table(
            {
                "node": j.column("node"),
                "lab": j.column("lab"),
                "chg": pc.less(j.column("lab"), j.column("old_lab")),
            }
        )

    for _ in range(max_iters):
        # messages ONLY from last round's changed labels: after round 1
        # this joins a shrinking sliver of the edge list, not all of it
        msgs = cluster_join(
            edges_sym, changed.map_batches(
                lambda b: pa.table(
                    {"u": b.column("node"), "lab": b.column("lab")}
                ),
                batch_format="pyarrow",
            ),
            ["u"],
            left_types={"u": pa.int64(), "v": pa.int64()},
            right_types={"lab": pa.int64()},
        )
        tagged = labels.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "lab": b.column("lab"),
                 "is_old": pa.repeat(pa.scalar(1, pa.int8()), b.num_rows)}
            ),
            batch_format="pyarrow",
        ).union(
            msgs.map_batches(
                lambda b: pa.table(
                    {"node": b.column("v"), "lab": b.column("lab"),
                     "is_old": pa.repeat(pa.scalar(0, pa.int8()),
                                         b.num_rows)}
                ),
                batch_format="pyarrow",
            )
        )
        upd = cluster_apply(tagged, ["node"], block_update).materialize()
        # labels stays a LAZY one-map view over the materialized update
        # table (each round's lineage is one select deep — no re-execution
        # cascade, no extra per-round materialize pass)
        labels = upd.map_batches(
            lambda b: b.select(["node", "lab"]), batch_format="pyarrow"
        )
        changed = upd.map_batches(
            lambda b: b.filter(b.column("chg")).select(["node", "lab"]),
            batch_format="pyarrow",
        ).materialize()
        if changed.count() == 0:
            break

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("node"), "component": batch.column("lab")}
        )

    return labels.map_batches(project, batch_format="pyarrow")


def pagerank_fixed(edges, *, iters: int = 3, scale: int = 10**12,
                   src_col: str = "src", dst_col: str = "dst"):
    """PageRank in exact int64 fixed-point — the iterative-algorithm
    pattern with a bit-exact relational oracle (floats would make the
    oracle hash-compare fragile; every op here is an integer floor, so
    DuckDB replays the identical lattice).

    Semantics (damping 0.85, teleport 0.15, ``iters`` synchronous
    rounds):

    - nodes = distinct(src ∪ dst); N = |nodes|
    - pr_0(v)     = scale // N
    - share_k(u)  = pr_k(u) // outdeg(u)
    - pr_{k+1}(v) = (15 * (scale // N)) // 100
                    + (85 * Σ_{u→v} share_k(u)) // 100
      (Σ over int64 is order-free; nodes with no in-edges keep the
      teleport term. Dangling nodes — no out-edges — leak their mass,
      the simple-PageRank convention; document or add self-loops.)

    Scale shape: out-degrees attach to the EDGE table once
    (``cluster_join``, materialized); each round is one pr⋈edges join,
    one grouped share-sum and one left join back onto the node table —
    three int-key exchanges, all datasets. Each round materializes the
    pr table (two int64 columns, object-store-resident — the same
    iterative-fixpoint requirement as ``connected_components``); the
    driver holds only N.

    → (node:int64, pr_units:int64) with pr = pr_units / scale.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    # edges feeds FOUR scans (src nodes, dst nodes, outdeg, join left) —
    # pin once (CLAUDE.md: Ray re-executes lineage per consumer)
    edges = edges.materialize()

    def srcs(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(src_col).cast(pa.int64())})

    def dsts(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(dst_col).cast(pa.int64())})

    nodes = cluster_apply(
        edges.map_batches(srcs, batch_format="pyarrow").union(
            edges.map_batches(dsts, batch_format="pyarrow")
        ),
        ["node"],
        lambda block: block.group_by(["node"]).aggregate([]),
    ).materialize()
    n_nodes = nodes.count()
    pr0 = scale // n_nodes
    teleport = (15 * pr0) // 100

    outdeg = grouped_agg(
        edges.map_batches(
            lambda b: pa.table({src_col: b.column(src_col).cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        [src_col], [("outdeg", src_col, "count")],
    )
    edges_w_deg = cluster_join(
        edges.map_batches(
            lambda b: pa.table(
                {src_col: b.column(src_col).cast(pa.int64()),
                 dst_col: b.column(dst_col).cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        outdeg,
        [src_col],
        left_types={src_col: pa.int64(), dst_col: pa.int64()},
        right_types={"outdeg": pa.int64()},
    ).materialize()

    # pr is kept PARTIAL between rounds: only nodes that received
    # in-edge mass have rows; every absent node's pr is a closed-form
    # default (pr0 before round 1, the bare teleport term after — a node
    # with no in-edges gets exactly that every round). This removes the
    # per-round left join onto the node table; nodes join back ONCE at
    # the end. Round 0's shares need no join at all (pr is uniform).
    pr = None
    default = pr0
    for _ in range(iters):
        if pr is None:
            contribs = edges_w_deg.map_batches(
                lambda b: pa.table(
                    {dst_col: b.column(dst_col),
                     "share": pc.divide(pr0, b.column("outdeg"))}
                ),
                batch_format="pyarrow",
            )
        else:
            contribs = cluster_join(
                edges_w_deg,
                pr.map_batches(
                    lambda b: pa.table(
                        {src_col: b.column("node"), "pr": b.column("pr")}
                    ),
                    batch_format="pyarrow",
                ),
                [src_col],
                left_types={src_col: pa.int64(), dst_col: pa.int64(),
                            "outdeg": pa.int64()},
                right_types={"pr": pa.int64()},
                how="left",
            ).map_batches(
                lambda b, _d=default: pa.table(
                    {dst_col: b.column(dst_col),
                     "share": pc.divide(
                         pc.fill_null(b.column("pr"), _d),
                         b.column("outdeg"))}
                ),
                batch_format="pyarrow",
            )
        sums = grouped_agg(contribs, [dst_col],
                           [("in_sum", "share", "sum")])
        pr = sums.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column(dst_col),
                    "pr": pc.add(
                        teleport,
                        pc.divide(pc.multiply(b.column("in_sum"), 85), 100),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        default = teleport

    final = cluster_join(
        nodes,
        pr.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "pr": b.column("pr")}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        left_types={"node": pa.int64()},
        right_types={"pr": pa.int64()},
        how="left",
    )
    return final.map_batches(
        lambda b, _d=default: pa.table(
            {"node": b.column("node"),
             "pr_units": pc.fill_null(b.column("pr"), _d)}
        ),
        batch_format="pyarrow",
    )


def hits_fixed(edges, *, iters: int = 2, scale: int = 10**6,
               src_col: str = "src", dst_col: str = "dst"):
    """HITS (Kleinberg 1999 hubs-and-authorities) in exact int64
    fixed-point — the authority/hub companion to ``pagerank_fixed``
    (reference has no graph ops; this is a beyond-reference web-curation
    operator: authority scores rank pages for crawl/curation priority).

    All-integer lattice so a DuckDB oracle replays it bit-exactly:

    - nodes = distinct(src ∪ dst); edges are a MULTISET (duplicate links
      count twice, matching the SQL's SUM over the edge table).
    - h_0(u) = scale for every node.
    - per synchronous round:
        a(v)  = Σ_{u→v} h(u)           (raw authority)
        a'(v) = a(v) // max(1, Σ_v a(v) // scale)
        h(u)  = Σ_{u→v} a'(v)          (raw hub, from CURRENT a')
        h'(u) = h(u) // max(1, Σ_u h(u) // scale)
      The divisor form (never ``x * scale // total``) keeps every
      intermediate ≤ Σ raw ≈ E·scale — no int64 overflow at any corpus
      size where E·scale < 2^63 (scale 10^6 → 9·10^12 edges headroom).
    - output: (node, auth_units, hub_units), absent mass filled with 0
      (no in-edges → auth 0, no out-edges → hub 0).

    Scale shape: round 1's authority needs NO join (h_0 uniform → a_1 =
    scale · indeg, one grouped count); each subsequent half-step is one
    edge⋈score ``cluster_join`` + one grouped sum — 2 int-key exchanges
    per half-step, 4 per round. Per-round totals are two driver scalars
    (``Dataset.sum``, a tree aggregate); score tables are materialized
    per half-step (iterative-fixpoint requirement, same as
    ``pagerank_fixed``) and stay object-store-resident — the driver
    never holds a node table.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    edges = edges.materialize()

    def srcs(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(src_col).cast(pa.int64())})

    def dsts(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(dst_col).cast(pa.int64())})

    nodes = cluster_apply(
        edges.map_batches(srcs, batch_format="pyarrow").union(
            edges.map_batches(dsts, batch_format="pyarrow")
        ),
        ["node"],
        lambda block: block.group_by(["node"]).aggregate([]),
    )

    e64 = edges.map_batches(
        lambda b: pa.table(
            {src_col: b.column(src_col).cast(pa.int64()),
             dst_col: b.column(dst_col).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def _normalized(raw, col):
        """raw (node, col) → materialized normalized table; floor-divide
        by max(1, total // scale). Two consumers (sum + map) → pin."""
        raw = raw.materialize()
        total = int(raw.sum(col) or 0)
        div = max(1, total // scale)
        return raw.map_batches(
            lambda b, _d=div: pa.table(
                {"node": b.column("node"),
                 col: pc.divide(b.column(col), _d)}
            ),
            batch_format="pyarrow",
        ).materialize()

    def _propagate(scores, score_col, join_key, out_key, out_col):
        """Σ of ``scores`` over edges: join on ``join_key``, sum grouped
        by ``out_key`` (auth: join src, group dst; hub: join dst, group
        src)."""
        joined = cluster_join(
            e64,
            scores.map_batches(
                lambda b: pa.table(
                    {join_key: b.column("node"),
                     score_col: b.column(score_col)}
                ),
                batch_format="pyarrow",
            ),
            [join_key],
            left_types={src_col: pa.int64(), dst_col: pa.int64()},
            right_types={score_col: pa.int64()},
        )
        summed = grouped_agg(
            joined.map_batches(
                lambda b: pa.table(
                    {"node": b.column(out_key),
                     out_col: b.column(score_col)}
                ),
                batch_format="pyarrow",
            ),
            ["node"], [(out_col, out_col, "sum")],
        )
        return summed

    # round 1 authority: h_0 uniform → a_1(v) = scale * indeg(v)
    a_raw = grouped_agg(
        e64.map_batches(
            lambda b: pa.table({"node": b.column(dst_col)}),
            batch_format="pyarrow",
        ),
        ["node"], [("auth", "node", "count")],
    ).map_batches(
        lambda b: pa.table(
            {"node": b.column("node"),
             "auth": pc.multiply(b.column("auth"), scale)}
        ),
        batch_format="pyarrow",
    )
    auth = hub = None
    for i in range(iters):
        auth = _normalized(a_raw, "auth")
        hub = _normalized(
            _propagate(auth, "auth", dst_col, src_col, "hub"), "hub"
        )
        if i < iters - 1:
            a_raw = _propagate(hub, "hub", src_col, dst_col, "auth")

    with_auth = cluster_join(
        nodes, auth, ["node"],
        left_types={"node": pa.int64()},
        right_types={"auth": pa.int64()},
        how="left",
    )
    final = cluster_join(
        with_auth, hub, ["node"],
        left_types={"node": pa.int64(), "auth": pa.int64()},
        right_types={"hub": pa.int64()},
        how="left",
    )
    return final.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"),
             "auth_units": pc.fill_null(b.column("auth"), 0),
             "hub_units": pc.fill_null(b.column("hub"), 0)}
        ),
        batch_format="pyarrow",
    )


def triangle_counts(edges, *, src_col: str = "src", dst_col: str = "dst",
                    with_degree: bool = False):
    """Exact per-node triangle counts via degree-ordered orientation
    (Latapy 2008 / the standard MapReduce edge-iterator): orient every
    distinct undirected edge from its (deg, node)-smaller endpoint to the
    larger, generate wedges only between OUT-edges of each node, close
    them against the oriented edge list. Orientation bounds every node's
    out-degree by O(√E), so wedge fan-out is O(E^1.5) worst-case instead
    of Σ deg² — the bound that keeps hub nodes (deg 10^6 web hubs) from
    emitting 10^12 wedges.

    Physical plan (all int-key exchanges, nothing driver-resident):
    canonicalize + distinct (1 ``cluster_apply``), degree count (1
    ``grouped_agg``), two deg-attach ``cluster_join`` passes, block-local
    wedge emission inside one src-key ``cluster_apply`` (numpy
    ``triu_indices`` per co-located out-neighbor list, emitted ONLY in
    orientation order — the half that can close), closure = one
    composite-key ``cluster_join`` against the oriented edges, final
    per-node ``grouped_agg``. Self-loops dropped; duplicate/multigraph
    edges collapse at the distinct step.

    → (node:int64, triangles:int64) for every node with ≥1 edge;
    ``with_degree=True`` appends the simple-graph degree (deg:int64) —
    free, since the node spine IS the degree table.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def canon(b: pa.Table) -> pa.Table:
        u = b.column(src_col).cast(pa.int64())
        v = b.column(dst_col).cast(pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

    ce = cluster_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda blk: blk.group_by(["u", "v"]).aggregate([]),
    ).materialize()  # feeds deg + the u-attach join

    endpoints = ce.map_batches(
        lambda b: pa.table({"node": b.column("u")}), batch_format="pyarrow"
    ).union(
        ce.map_batches(
            lambda b: pa.table({"node": b.column("v")}),
            batch_format="pyarrow",
        )
    )
    deg = grouped_agg(endpoints, ["node"], [("deg", "node", "count")])
    deg = deg.materialize()  # feeds two attach joins + the node spine

    with_du = cluster_join(
        ce,
        deg.map_batches(
            lambda b: pa.table({"u": b.column("node"), "du": b.column("deg")}),
            batch_format="pyarrow",
        ),
        ["u"],
        left_types={"u": pa.int64(), "v": pa.int64()},
        right_types={"du": pa.int64()},
    )
    with_both = cluster_join(
        with_du,
        deg.map_batches(
            lambda b: pa.table({"v": b.column("node"), "dv": b.column("deg")}),
            batch_format="pyarrow",
        ),
        ["v"],
        left_types={"u": pa.int64(), "v": pa.int64(), "du": pa.int64()},
        right_types={"dv": pa.int64()},
    )

    def orient(b: pa.Table) -> pa.Table:
        u, v = b.column("u"), b.column("v")
        du, dv = b.column("du"), b.column("dv")
        u_first = pc.or_(
            pc.less(du, dv),
            pc.and_(pc.equal(du, dv), pc.less(u, v)),
        )
        return pa.table(
            {
                "a": pc.if_else(u_first, u, v),
                "b": pc.if_else(u_first, v, u),
                "bd": pc.if_else(u_first, dv, du),  # (deg, node) order key
            }
        )

    o = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(blk: pa.Table) -> pa.Table:
        a = blk.column("a").to_numpy(zero_copy_only=False)
        nb = blk.column("b").to_numpy(zero_copy_only=False)
        bd = blk.column("bd").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, bd, a))
        a, nb = a[order], nb[order]
        outs_b, outs_c, outs_a = [], [], []
        bounds = np.flatnonzero(np.diff(a)) + 1
        for lo, hi in zip(
            np.concatenate(([0], bounds)),
            np.concatenate((bounds, [len(a)])),
        ):
            g = hi - lo
            if g < 2:
                continue
            i, j = np.triu_indices(g, k=1)
            grp = nb[lo:hi]
            outs_b.append(grp[i])  # precedes grp[j] in (deg, node) order
            outs_c.append(grp[j])
            outs_a.append(np.full(len(i), a[lo], dtype=np.int64))
        if not outs_b:
            return pa.table(
                {"b": pa.array([], pa.int64()), "c": pa.array([], pa.int64()),
                 "apex": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "b": pa.array(np.concatenate(outs_b), pa.int64()),
                "c": pa.array(np.concatenate(outs_c), pa.int64()),
                "apex": pa.array(np.concatenate(outs_a), pa.int64()),
            }
        )

    w = cluster_apply(o, ["a"], wedges)

    closed = cluster_join(
        w,
        o.map_batches(
            lambda t: pa.table(
                {"b": t.column("a"), "c": t.column("b"),
                 "cl": pa.repeat(pa.scalar(1, pa.int8()), t.num_rows)}
            ),
            batch_format="pyarrow",
        ),
        ["b", "c"],
        left_types={"b": pa.int64(), "c": pa.int64(), "apex": pa.int64()},
        right_types={"cl": pa.int8()},
    )

    members = closed.map_batches(
        lambda t: pa.table(
            {"node": pa.chunked_array(
                [t.column("apex").combine_chunks(),
                 t.column("b").combine_chunks(),
                 t.column("c").combine_chunks()]
            )}
        ),
        batch_format="pyarrow",
    )
    cnt = grouped_agg(members, ["node"], [("triangles", "node", "count")])

    if with_degree:
        spine = deg.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"),
                 "deg": b.column("deg").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        final = cluster_join(
            spine, cnt, ["node"],
            left_types={"node": pa.int64(), "deg": pa.int64()},
            right_types={"triangles": pa.int64()},
            how="left",
        )
        return final.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"),
                 "deg": b.column("deg"),
                 "triangles": pc.fill_null(b.column("triangles"), 0)}
            ),
            batch_format="pyarrow",
        )
    spine = deg.map_batches(
        lambda b: pa.table({"node": b.column("node")}), batch_format="pyarrow"
    )
    final = cluster_join(
        spine, cnt, ["node"],
        left_types={"node": pa.int64()},
        right_types={"triangles": pa.int64()},
        how="left",
    )
    return final.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"),
             "triangles": pc.fill_null(b.column("triangles"), 0)}
        ),
        batch_format="pyarrow",
    )


def kcore_peel(edges, *, k: int = 2, rounds: int = 6,
               src_col: str = "src", dst_col: str = "dst",
               n_blocks: int | None = None):
    """Bounded synchronous k-core peeling: ``rounds`` iterations of
    (degree count → drop nodes with deg < k → restrict edges to
    surviving endpoints) over the simple undirected graph (self-loops
    dropped, duplicate edges collapsed). PRE-REGISTERED fixed round
    count so a DuckDB oracle can replay it as an unrolled CTE chain —
    when a round is a no-op the result has converged and equals the true
    k-core (peel depth on web graphs is shallow; callers pick ``rounds``
    ≥ expected depth, and the final-degree invariant min(deg) ≥ k
    certifies convergence).

    Physical plan per round: one endpoint-union ``grouped_agg`` (degree),
    one filter, two ``cluster_join`` semi-join passes (edge survival on
    each endpoint) — 3 int-key exchanges; the edge table shrinks
    monotonically and is materialized per round (iterative-fixpoint
    requirement). Driver holds nothing.

    ``n_blocks``: per-round width PIN for the iterated tables. Every
    cluster exchange emits as many partitions as it receives blocks, and
    each round's joins UNION two sides — unpinned, block count grows ~5×
    per round (measured 3→375 blocks in 3 rounds; wall went exponential
    on ms-scale tasks). Defaults to the canonical edge table's own block
    count, the same rule as ``connected_components``.

    → (node:int64, deg:int64): degrees within the final surviving edge
    set (== the k-core when converged).
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def canon(b: pa.Table) -> pa.Table:
        u = b.column(src_col).cast(pa.int64())
        v = b.column(dst_col).cast(pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

    e = cluster_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda blk: blk.group_by(["u", "v"]).aggregate([]),
    ).materialize()
    if n_blocks is None:
        n_blocks = max(1, e.num_blocks())

    def degrees(edge_ds):
        endpoints = edge_ds.map_batches(
            lambda b: pa.table({"node": b.column("u")}),
            batch_format="pyarrow",
        ).union(
            edge_ds.map_batches(
                lambda b: pa.table({"node": b.column("v")}),
                batch_format="pyarrow",
            )
        )
        return grouped_agg(endpoints, ["node"], [("deg", "node", "count")])

    for _ in range(rounds):
        keep = degrees(e).map_batches(
            lambda b, _k=k: b.filter(
                pc.greater_equal(b.column("deg"), _k)
            ).select(["node"]),
            batch_format="pyarrow",
        )
        keep = keep.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"),
                 "ok": pa.repeat(pa.scalar(1, pa.int8()), b.num_rows)}
            ),
            batch_format="pyarrow",
        ).repartition(n_blocks).materialize()  # probes both endpoint joins
        e_u = cluster_join(
            e,
            keep.map_batches(
                lambda b: pa.table(
                    {"u": b.column("node"), "oku": b.column("ok")}
                ),
                batch_format="pyarrow",
            ),
            ["u"],
            left_types={"u": pa.int64(), "v": pa.int64()},
            right_types={"oku": pa.int8()},
        )
        e = cluster_join(
            e_u.map_batches(
                lambda b: b.select(["u", "v"]), batch_format="pyarrow"
            ),
            keep.map_batches(
                lambda b: pa.table(
                    {"v": b.column("node"), "okv": b.column("ok")}
                ),
                batch_format="pyarrow",
            ),
            ["v"],
            left_types={"u": pa.int64(), "v": pa.int64()},
            right_types={"okv": pa.int8()},
        ).map_batches(
            lambda b: b.select(["u", "v"]), batch_format="pyarrow"
        ).repartition(n_blocks).materialize()

    return degrees(e)


def ppr_fixed(edges, seeds, *, iters: int = 2, scale: int = 10**12,
              src_col: str = "src", dst_col: str = "dst"):
    """Personalized PageRank (Haveliwala's topic-sensitive variant) in
    exact int64 fixed-point — teleport mass goes ONLY to ``seeds`` (a
    dataset with a ``node`` column), so scores rank nodes by proximity to
    the seed set (crawl frontier prioritization, seed-based curation).

    Integer lattice (damping 0.85, ``iters`` synchronous rounds):

    - S = distinct seed nodes; pr_0(v) = scale // |S| for v ∈ S else 0
    - tele(v) = (15 · (scale // |S|)) // 100 for v ∈ S else 0
    - pr_{k+1}(v) = tele(v) + (85 · Σ_{u→v} pr_k(u) // outdeg(u)) // 100

    Scale shape vs ``pagerank_fixed``: absent mass is ZERO here (not a
    closed-form default), so each round is an INNER join of the edge
    table against the current pr table — rounds touch only the reachable
    frontier, which grows from |S| outward instead of starting
    corpus-wide. pr_{k+1} materializes as union(tele rows, floored
    share-sum rows) → one grouped sum; the driver holds |S| and N only.

    → (node:int64, ppr_units:int64) over all nodes (0 where unreached).
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    edges = edges.materialize()

    def srcs(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(src_col).cast(pa.int64())})

    def dsts(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(dst_col).cast(pa.int64())})

    nodes = cluster_apply(
        edges.map_batches(srcs, batch_format="pyarrow").union(
            edges.map_batches(dsts, batch_format="pyarrow")
        ),
        ["node"],
        lambda block: block.group_by(["node"]).aggregate([]),
    ).materialize()

    seed_tbl = cluster_apply(
        seeds.map_batches(
            lambda b: pa.table({"node": b.column("node").cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["node"],
        lambda block: block.group_by(["node"]).aggregate([]),
    ).materialize()
    n_seeds = seed_tbl.count()
    pr0 = scale // n_seeds
    tele_unit = (15 * pr0) // 100

    outdeg = grouped_agg(
        edges.map_batches(
            lambda b: pa.table({src_col: b.column(src_col).cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        [src_col], [("outdeg", src_col, "count")],
    )
    edges_w_deg = cluster_join(
        edges.map_batches(
            lambda b: pa.table(
                {src_col: b.column(src_col).cast(pa.int64()),
                 dst_col: b.column(dst_col).cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        outdeg,
        [src_col],
        left_types={src_col: pa.int64(), dst_col: pa.int64()},
        right_types={"outdeg": pa.int64()},
    ).materialize()

    tele_rows = seed_tbl.map_batches(
        lambda b, _t=tele_unit: pa.table(
            {"node": b.column("node"),
             "pr": pa.repeat(pa.scalar(_t, pa.int64()), b.num_rows)}
        ),
        batch_format="pyarrow",
    ).materialize()

    pr = seed_tbl.map_batches(
        lambda b, _p=pr0: pa.table(
            {"node": b.column("node"),
             "pr": pa.repeat(pa.scalar(_p, pa.int64()), b.num_rows)}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        shares = cluster_join(
            edges_w_deg,
            pr.map_batches(
                lambda b: pa.table(
                    {src_col: b.column("node"), "pr": b.column("pr")}
                ),
                batch_format="pyarrow",
            ),
            [src_col],
            left_types={src_col: pa.int64(), dst_col: pa.int64(),
                        "outdeg": pa.int64()},
            right_types={"pr": pa.int64()},
        ).map_batches(
            lambda b: pa.table(
                {dst_col: b.column(dst_col),
                 "share": pc.divide(b.column("pr"), b.column("outdeg"))}
            ),
            batch_format="pyarrow",
        )
        sums = grouped_agg(shares, [dst_col], [("in_sum", "share", "sum")])
        damped = sums.map_batches(
            lambda b: pa.table(
                {"node": b.column(dst_col),
                 "pr": pc.divide(pc.multiply(b.column("in_sum"), 85), 100)}
            ),
            batch_format="pyarrow",
        )
        pr = grouped_agg(
            tele_rows.union(damped), ["node"], [("pr", "pr", "sum")]
        ).materialize()

    final = cluster_join(
        nodes, pr, ["node"],
        left_types={"node": pa.int64()},
        right_types={"pr": pa.int64()},
        how="left",
    )
    return final.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"),
             "ppr_units": pc.fill_null(b.column("pr"), 0)}
        ),
        batch_format="pyarrow",
    )


def bfs_hops(edges, seeds, *, max_hops: int = 4,
             src_col: str = "src", dst_col: str = "dst",
             n_blocks: int | None = None):
    """Multi-source BFS hop distances over a DIRECTED edge table: for
    every node reachable from the seed set within ``max_hops`` link
    follows, the minimum hop count (0 for seeds). The crawl-frontier /
    seed-expansion primitive (how far is every page from a trusted seed
    set — TrustRank-style distance features, wiki-distance curation
    signals); the reference has no graph ops, this is a
    beyond-reference web-curation operator.

    Frontier-delta plan (the ``connected_components`` trick applied to
    BFS, where it is the textbook formulation): the per-round join
    touches ONLY last round's newly-discovered frontier, never the
    visited set —

    - dist_0 = distinct seeds at hops 0; frontier_0 = dist_0
    - per round h: candidates = frontier ⋈ edges on src (one
      ``cluster_join``) → distinct dst (one ``cluster_apply``
      group_by); new = candidates ANTI dist (one ``cluster_join``,
      visited-set subtraction WITHOUT driver state); dist += new at
      hops h; frontier = new
    - stop early when new is empty (driver holds one count per round).

    BFS min-hop correctness needs no min-merge: a node enters dist the
    first round it is reachable, and the anti-join guarantees it never
    re-enters — so hops is exactly the shortest distance. Every
    exchange is int64-keyed; dist/frontier materialize per round
    (iterative-fixpoint requirement) and stay object-store-resident.

    ``n_blocks``: width pin for the iterated tables (same growth issue
    as ``kcore_peel`` — per-round unions/joins multiply block counts on
    small inputs; defaults to the edge table's own block count).

    → (node:int64, hops:int64), one row per reached node.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    e64 = edges.map_batches(
        lambda b: pa.table(
            {src_col: b.column(src_col).cast(pa.int64()),
             dst_col: b.column(dst_col).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    if n_blocks is None:
        n_blocks = max(1, e64.num_blocks())

    def with_hops(h):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {"node": b.column("node"),
                 "hops": pa.repeat(pa.scalar(h, pa.int64()), b.num_rows)}
            )
        return f

    dist = cluster_apply(
        seeds.map_batches(
            lambda b: pa.table({"node": b.column("node").cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["node"],
        lambda blk: blk.group_by(["node"]).aggregate([]),
    ).map_batches(with_hops(0), batch_format="pyarrow") \
     .repartition(n_blocks).materialize()
    frontier = dist

    for h in range(1, max_hops + 1):
        reached = cluster_join(
            e64,
            frontier.map_batches(
                lambda b: pa.table({src_col: b.column("node")}),
                batch_format="pyarrow",
            ),
            [src_col],
            left_types={src_col: pa.int64(), dst_col: pa.int64()},
            right_types={},
            how="semi",
        )
        cand = cluster_apply(
            reached.map_batches(
                lambda b: pa.table({"node": b.column(dst_col)}),
                batch_format="pyarrow",
            ),
            ["node"],
            lambda blk: blk.group_by(["node"]).aggregate([]),
        )
        new = cluster_join(
            cand, dist, ["node"],
            left_types={"node": pa.int64()},
            right_types={},
            how="anti",
        ).map_batches(with_hops(h), batch_format="pyarrow") \
         .repartition(n_blocks).materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).repartition(n_blocks).materialize()
        frontier = new

    return dist


def cocitation_counts(edges, *, src_col: str = "src", dst_col: str = "dst",
                      max_out: int = 10_000):
    """Co-citation counts (Small 1973): for every unordered pair of
    targets, how many distinct sources link to BOTH — the classic
    relatedness signal on web/citation graphs (its transpose on in-edges
    is bibliographic coupling). Duplicate edges collapse first (distinct
    src→dst), so a source counts once per pair.

    A source with out-degree d emits d·(d−1)/2 pairs — ``max_out`` drops
    degenerate hub apexes (the same guard as ``ngram_jaccard_pairs``'s
    shingle-df cap; at the default it never binds below 10k-target hubs,
    and the drop is LOGGED in the physical sense that the docstring and
    parameter make the bound explicit rather than silent).

    Physical plan: distinct edges (1 ``cluster_apply`` group_by), pair
    emission inside one src-key ``cluster_apply`` (numpy
    ``triu_indices`` over each apex's sorted target list), one grouped
    count on the (a, b) pair key — 3 int-key exchanges.

    → (node1:int64, node2:int64, n_common_sources:int64), node1 < node2.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {"s": b.column(src_col).cast(pa.int64()),
             "d": b.column(dst_col).cast(pa.int64())}
        )

    dedup = cluster_apply(
        edges.map_batches(project, batch_format="pyarrow"),
        ["s", "d"],
        lambda blk: blk.group_by(["s", "d"]).aggregate([]),
    )

    def pairs(block: pa.Table) -> pa.Table:
        s = block.column("s").to_numpy(zero_copy_only=False)
        d = block.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(s)) + 1, [len(s)])
        )
        o1, o2 = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            g = hi - lo
            if g < 2 or g > max_out:
                continue
            i, j = np.triu_indices(g, k=1)
            grp = d[lo:hi]
            o1.append(grp[i])
            o2.append(grp[j])
        if not o1:
            return pa.table(
                {"node1": pa.array([], pa.int64()),
                 "node2": pa.array([], pa.int64())}
            )
        return pa.table(
            {"node1": pa.array(np.concatenate(o1), pa.int64()),
             "node2": pa.array(np.concatenate(o2), pa.int64())}
        )

    emitted = cluster_apply(dedup, ["s"], pairs)
    return grouped_agg(
        emitted, ["node1", "node2"],
        [("n_common_sources", "node1", "count")],
    )


def clustering_coefficient(edges, *, src_col: str = "src",
                           dst_col: str = "dst"):
    """Per-node LOCAL clustering coefficient (Watts–Strogatz 1998):
    coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the simple undirected
    graph — the canonical "how clique-like is this node's neighborhood"
    signal (link farms cluster near 1.0; organic hubs near 0).

    Physical plan: ``triangle_counts(with_degree=True)`` (degree-ordered
    orientation, O(E^1.5) wedge bound — see its docstring) plus ONE
    stateless vectorized map; no additional exchange. Nodes with
    deg < 2 emit 0.0.

    Float-EXACT oracle parity: coeff = (2.0·tri) / (deg·(deg−1.0)) with
    each line one IEEE rounding — DuckDB replays the identical
    expression.

    → (node:int64, deg:int64, triangles:int64, coeff:float64).
    """
    import numpy as np
    import pyarrow.compute as pc  # noqa: F401  (kept for parity w/ file)

    base = triangle_counts(
        edges, src_col=src_col, dst_col=dst_col, with_degree=True
    )

    def finish(b: pa.Table) -> pa.Table:
        deg = b.column("deg").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tri = b.column("triangles").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # pinned op order (one IEEE rounding per line):
        num = 2.0 * tri
        den = deg * (deg - 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            coeff = np.where(den == 0.0, 0.0, num / den)
        return pa.table(
            {"node": b.column("node"), "deg": b.column("deg"),
             "triangles": b.column("triangles"),
             "coeff": pa.array(coeff, pa.float64())}
        )

    return base.map_batches(finish, batch_format="pyarrow")


def assortativity(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the SYMMETRIZED edge list of
    the simple undirected graph — positive on social graphs (hubs link
    hubs), negative on the web/biology (hubs link leaves). One scalar
    row out; the web-graph topology audit.

    Physical plan: canonicalize + distinct (1 ``cluster_apply``), degree
    count (1 ``grouped_agg``), two deg-attach ``cluster_join`` passes
    (the ``triangle_counts`` prologue), then each edge contributes BOTH
    (du,dv) and (dv,du) to exact int64 moment sums via the
    ``grouped_corr`` combiner — bytes on the wire are O(batches), never
    O(edges), and the final Pearson expression is pinned-IEEE
    (``grouped_corr`` docstring) so DuckDB replays it bit-for-bit.
    int64 headroom: Σ(du·dv) caps at 2·E·max_deg² — the caller's graph
    must keep that under 2⁶³ (web graphs: E≈10¹², max_deg≈10⁶ needs the
    same cents-style rescale documented in ``grouped_corr``).

    → one row (n_pairs:int64, assortativity:float64); n_pairs = 2·E.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply, grouped_corr

    def canon(b: pa.Table) -> pa.Table:
        u = b.column(src_col).cast(pa.int64())
        v = b.column(dst_col).cast(pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

    ce = cluster_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda blk: blk.group_by(["u", "v"]).aggregate([]),
    ).materialize()  # consumed by deg AND the attach join

    endpoints = ce.map_batches(
        lambda b: pa.table({"node": b.column("u")}), batch_format="pyarrow"
    ).union(
        ce.map_batches(
            lambda b: pa.table({"node": b.column("v")}),
            batch_format="pyarrow",
        )
    )
    deg = grouped_agg(
        endpoints, ["node"], [("deg", "node", "count")]
    ).materialize()  # consumed by two attach joins

    with_du = cluster_join(
        ce,
        deg.map_batches(
            lambda b: pa.table({"u": b.column("node"), "du": b.column("deg")}),
            batch_format="pyarrow",
        ),
        ["u"],
        left_types={"u": pa.int64(), "v": pa.int64()},
        right_types={"du": pa.int64()},
    )
    with_both = cluster_join(
        with_du,
        deg.map_batches(
            lambda b: pa.table({"v": b.column("node"), "dv": b.column("deg")}),
            batch_format="pyarrow",
        ),
        ["v"],
        left_types={"u": pa.int64(), "v": pa.int64(), "du": pa.int64()},
        right_types={"dv": pa.int64()},
    )

    def symmetrize(b: pa.Table) -> pa.Table:
        du = b.column("du").combine_chunks()
        dv = b.column("dv").combine_chunks()
        one = pa.repeat(pa.scalar(1, pa.int8()), 2 * b.num_rows)
        return pa.table(
            {"g": one,
             "x": pa.chunked_array([du, dv]),
             "y": pa.chunked_array([dv, du])}
        )

    corr = grouped_corr(
        with_both.map_batches(symmetrize, batch_format="pyarrow"),
        ["g"], "x", "y",
    )
    return corr.map_batches(
        lambda b: pa.table(
            {"n_pairs": b.column("n"), "assortativity": b.column("corr")}
        ),
        batch_format="pyarrow",
    )


def fof_counts(edges, *, src_col: str = "src", dst_col: str = "dst",
               max_deg: int = 10_000):
    """Distance-2 neighbor counts ("friends of friends"): per node, how
    many DISTINCT nodes sit at shortest-path distance exactly 2 — the
    classic link-prediction candidate volume / 2-hop reach metric.

    Physical plan (all int-key exchanges): canonicalize + distinct
    (1 ``cluster_apply``), symmetrize to full adjacency, wedge emission
    inside one mid-key ``cluster_apply`` (numpy ``triu_indices`` per
    co-located neighbor list, BOTH orientations — distance-2 needs every
    wedge, orientation can't halve it), distinct (a,c) pairs
    (1 ``cluster_apply`` group_by), ANTI ``cluster_join`` against the
    adjacency (drops pairs that are also direct edges — those are
    distance 1), final per-node ``grouped_agg``. A mid node of degree d
    emits d·(d−1) wedge pairs — ``max_deg`` bounds hub fan-out exactly
    like ``cocitation_counts.max_out`` (explicit, documented drop).

    → (node:int64, n_fof:int64), nodes with ≥1 distance-2 neighbor.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def canon(b: pa.Table) -> pa.Table:
        u = b.column(src_col).cast(pa.int64())
        v = b.column(dst_col).cast(pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

    ce = cluster_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda blk: blk.group_by(["u", "v"]).aggregate([]),
    ).materialize()  # consumed by wedges AND the anti probe

    adj = ce.map_batches(
        lambda b: pa.table(
            {"mid": pa.chunked_array(
                [b.column("u").combine_chunks(),
                 b.column("v").combine_chunks()]
            ),
             "nbr": pa.chunked_array(
                [b.column("v").combine_chunks(),
                 b.column("u").combine_chunks()]
            )}
        ),
        batch_format="pyarrow",
    )

    def wedges(blk: pa.Table) -> pa.Table:
        m = blk.column("mid").to_numpy(zero_copy_only=False)
        nb = blk.column("nbr").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, m))
        m, nb = m[order], nb[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(m)) + 1, [len(m)])
        )
        o1, o2 = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            g = hi - lo
            if g < 2 or g > max_deg:
                continue
            i, j = np.triu_indices(g, k=1)
            grp = nb[lo:hi]
            o1.append(grp[i])
            o2.append(grp[j])
        if not o1:
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        return pa.table(
            {"a": pa.array(np.concatenate(o1), pa.int64()),
             "c": pa.array(np.concatenate(o2), pa.int64())}
        )

    pair_dedup = cluster_apply(
        cluster_apply(adj, ["mid"], wedges),
        ["a", "c"],
        lambda blk: blk.group_by(["a", "c"]).aggregate([]),
    )
    # distance exactly 2: drop pairs that are ALSO direct edges
    # ((a,c) is canonical a<c by construction: wedge lists are sorted)
    d2 = cluster_join(
        pair_dedup,
        ce.map_batches(
            lambda b: pa.table({"a": b.column("u"), "c": b.column("v")}),
            batch_format="pyarrow",
        ),
        ["a", "c"],
        left_types={"a": pa.int64(), "c": pa.int64()},
        right_types={},
        how="anti",
    )
    both = d2.map_batches(
        lambda b: pa.table(
            {"node": pa.chunked_array(
                [b.column("a").combine_chunks(),
                 b.column("c").combine_chunks()]
            )}
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(both, ["node"], [("n_fof", "node", "count")])


def reciprocity(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Directed-graph reciprocity: the fraction of distinct directed
    non-loop edges u→v whose reverse v→u is also present — the
    crawl-graph mutuality audit (blog rings reciprocate; news sites
    don't).

    Physical plan: distinct directed edges (1 ``cluster_apply``
    group_by), then ONE canonical-pair-key ``cluster_apply`` counts each
    unordered pair's orientation multiplicity (1 or 2) block-locally and
    emits one partial row per block; a final tiny merge sums partials.
    n_reciprocated counts EDGES (each mutual pair contributes 2), per
    the standard definition; ratio = one pinned IEEE division.

    → one row (n_edges:int64, n_reciprocated:int64, reciprocity:float64).
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def project(b: pa.Table) -> pa.Table:
        s = b.column(src_col).cast(pa.int64())
        d = b.column(dst_col).cast(pa.int64())
        return pa.table({"s": s, "d": d}).filter(pc.not_equal(s, d))

    dedup = cluster_apply(
        edges.map_batches(project, batch_format="pyarrow"),
        ["s", "d"],
        lambda blk: blk.group_by(["s", "d"]).aggregate([]),
    )

    def add_pair_key(b: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(b.column("s"), b.column("d"))
        hi = pc.max_element_wise(b.column("s"), b.column("d"))
        return pa.table({"lo": lo, "hi": hi})

    def block_partial(blk: pa.Table) -> pa.Table:
        g = blk.group_by(["lo", "hi"]).aggregate([([], "count_all")])
        cnt = g.column("count_all")
        n_edges = blk.num_rows
        n_recip = pc.sum(
            pc.if_else(pc.equal(cnt, 2), cnt, pa.scalar(0, cnt.type))
        ).as_py() or 0
        return pa.table(
            {"n_edges_p": pa.array([n_edges], pa.int64()),
             "n_recip_p": pa.array([int(n_recip)], pa.int64())}
        )

    import ray.data as rd

    # zero seed: an input with no surviving edges still yields the one
    # scalar row (block_partial is never invoked on zero blocks)
    seed = rd.from_arrow(
        pa.table(
            {"n_edges_p": pa.array([0], pa.int64()),
             "n_recip_p": pa.array([0], pa.int64())}
        )
    )
    partials = cluster_apply(
        dedup.map_batches(add_pair_key, batch_format="pyarrow"),
        ["lo", "hi"], block_partial,
    ).union(seed)

    def finish(b: pa.Table) -> pa.Table:
        ne = int(pc.sum(b.column("n_edges_p")).as_py() or 0)
        nr = int(pc.sum(b.column("n_recip_p")).as_py() or 0)
        ratio = 0.0 if ne == 0 else float(nr) / float(ne)
        return pa.table(
            {"n_edges": pa.array([ne], pa.int64()),
             "n_reciprocated": pa.array([nr], pa.int64()),
             "reciprocity": pa.array([ratio], pa.float64())}
        )

    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow"
    )


def label_propagation(edges, *, rounds: int = 3,
                      src_col: str = "src", dst_col: str = "dst"):
    """Bounded synchronous label propagation (Raghavan 2007 LPA with the
    deterministic (count DESC, label ASC) tie-break): every node starts
    labeled by its own id; each round it adopts the most frequent label
    among its NEIGHBORS (not itself). Fixed ``rounds`` + the total
    tie-break order make the result deterministic and SQL-replayable as
    unrolled ROW_NUMBER() rounds — the community-detection counterpart
    of ``kcore_peel``'s bounded unrolling.

    Physical plan per round (all int-key): one u-key ``cluster_join``
    (labels onto the symmetrized edges) and one v-key ``cluster_apply``
    (block-local (node,label) tally + first-row argmax under the
    (count DESC, label ASC) sort) — 2 exchanges/round; the label table
    (two int64 columns) materializes per round, the
    iterative-fixpoint requirement shared with ``connected_components``.
    Driver state: none.

    → (node:int64, label:int64) for every node with ≥1 non-loop edge.
    """
    import pyarrow.compute as pc

    from .relational import cluster_apply

    def canon(b: pa.Table) -> pa.Table:
        u = b.column(src_col).cast(pa.int64())
        v = b.column(dst_col).cast(pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

    ce = cluster_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda blk: blk.group_by(["u", "v"]).aggregate([]),
    )
    sym = ce.map_batches(
        lambda b: pa.table(
            {"u": pa.chunked_array(
                [b.column("u").combine_chunks(),
                 b.column("v").combine_chunks()]
            ),
             "v": pa.chunked_array(
                [b.column("v").combine_chunks(),
                 b.column("u").combine_chunks()]
            )}
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed once per round

    labels = grouped_agg(
        sym.map_batches(
            lambda b: pa.table({"node": b.column("u"),
                                "lab": b.column("u")}),
            batch_format="pyarrow",
        ),
        ["node"], [("lab", "lab", "min")],
    ).materialize()

    def argmax_label(blk: pa.Table) -> pa.Table:
        tally = blk.group_by(["node", "lab"]).aggregate([([], "count_all")])
        srt = tally.sort_by(
            [("node", "ascending"), ("count_all", "descending"),
             ("lab", "ascending")]
        )
        import numpy as np

        nodes = srt.column("node").to_numpy(zero_copy_only=False)
        keep = np.concatenate(([True], nodes[1:] != nodes[:-1]))
        first = srt.filter(pa.array(keep))
        return pa.table(
            {"node": first.column("node"), "lab": first.column("lab")}
        )

    for _ in range(rounds):
        msgs = cluster_join(
            sym,
            labels.map_batches(
                lambda b: pa.table(
                    {"u": b.column("node"), "lab": b.column("lab")}
                ),
                batch_format="pyarrow",
            ),
            ["u"],
            left_types={"u": pa.int64(), "v": pa.int64()},
            right_types={"lab": pa.int64()},
        ).map_batches(
            lambda b: pa.table(
                {"node": b.column("v"), "lab": b.column("lab")}
            ),
            batch_format="pyarrow",
        )
        labels = cluster_apply(msgs, ["node"], argmax_label).materialize()

    return labels.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "label": b.column("lab")}
        ),
        batch_format="pyarrow",
    )
