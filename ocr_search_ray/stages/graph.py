"""Graph operators over edge tables (connected components).

Near-dup pipelines end with pair lists (``minhash_lsh_pairs``,
``simhash_neardup``, ``embedding_neardup``); turning pairs into DEDUP
CLUSTERS (keep one representative per component) is a connected-components
problem. This is the iterative hash-min label propagation algorithm —
the standard MapReduce/Pregel formulation:

- labels start as ``node → node``;
- each round, every node takes the min label over itself and its
  neighbors (one ``cluster_join`` of the symmetric edge list against the
  label table + one grouped min — both int-key exchanges, nothing on the
  driver);
- converged when the label sum stops decreasing (labels are monotone
  non-increasing, so the int64 sum is a fixpoint witness — one cheap
  aggregate per round, O(1) driver state).

Rounds needed = max component diameter; near-dup clusters are shallow
(pairs/stars), so 2-4 rounds in practice. Each round MATERIALIZES the
label table — required for any iterative fixpoint on a lazy lineage
(otherwise round k re-executes rounds 1..k-1); the table is two int
columns, object-store-resident and spillable, never driver-resident.
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

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("u"), "lab": batch.column("u")}
        )

    labels = grouped_agg(
        edges_sym.map_batches(init_labels, batch_format="pyarrow"),
        ["node"], [("lab", "lab", "min")],
    ).materialize()

    def label_sum(ds) -> int:
        def partial(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"s": pa.array([pc.sum(batch.column("lab")).as_py() or 0],
                               pa.int64())}
            )

        return sum(
            r["s"] for r in
            ds.map_batches(partial, batch_format="pyarrow").take_all()
        )

    prev = label_sum(labels)
    for _ in range(max_iters):
        msgs = cluster_join(
            edges_sym, labels.map_batches(
                lambda b: b.rename_columns(["u", "lab"]),
                batch_format="pyarrow",
            ),
            ["u"],
            left_types={"u": pa.int64(), "v": pa.int64()},
            right_types={"lab": pa.int64()},
        )

        def msg_to_label(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("v"), "lab": batch.column("lab")}
            )

        candidates = msgs.map_batches(
            msg_to_label, batch_format="pyarrow"
        ).union(labels)
        labels = grouped_agg(
            candidates, ["node"], [("lab", "lab", "min")]
        ).materialize()
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("node"), "component": batch.column("lab")}
        )

    return labels.map_batches(project, batch_format="pyarrow")
