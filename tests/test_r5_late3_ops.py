"""Brute-force replays for the late-r5 wave 3 operators: clustering
coefficient, degree assortativity, distance-2 (friends-of-friends)
counts, directed reciprocity, and last-touch attribution."""

import itertools
import math

import pyarrow as pa
import ray


def _edges_ds(pairs):
    src = pa.array([a for a, _ in pairs], pa.int64())
    dst = pa.array([b for _, b in pairs], pa.int64())
    return ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)


def _simple(pairs):
    """Canonical undirected simple graph as a set of (u<v) tuples."""
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _adj(simple):
    adj = {}
    for u, v in simple:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


# graph with triangles (0,1,2), (1,2,3), a pendant 4, dupes + self-loop
PAIRS = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (3, 4),
         (1, 0), (2, 2), (0, 1)]


def test_clustering_coefficient_matches_brute_force(ray_session):
    from ocr_search_ray.stages.graph import clustering_coefficient

    simple = _simple(PAIRS)
    adj = _adj(simple)
    out = {r["node"]: r for r in
           clustering_coefficient(_edges_ds(PAIRS)).take_all()}
    assert set(out) == set(adj)
    for node, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1 for a, b in itertools.combinations(sorted(nbrs), 2)
            if (min(a, b), max(a, b)) in simple
        )
        assert out[node]["deg"] == deg
        assert out[node]["triangles"] == tri
        expect = 0.0 if deg < 2 else (2.0 * tri) / (deg * (deg - 1.0))
        assert out[node]["coeff"] == expect


def test_assortativity_matches_brute_force(ray_session):
    from ocr_search_ray.stages.graph import assortativity

    simple = _simple(PAIRS)
    adj = _adj(simple)
    xs, ys = [], []
    for u, v in simple:
        xs += [len(adj[u]), len(adj[v])]
        ys += [len(adj[v]), len(adj[u])]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    syy = float(sum(y * y for y in ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    expect = 0.0 if den == 0 else num / den
    (row,) = assortativity(_edges_ds(PAIRS)).take_all()
    assert row["n_pairs"] == len(xs)
    assert row["assortativity"] == expect


def test_fof_counts_matches_brute_force(ray_session):
    from ocr_search_ray.stages.graph import fof_counts

    simple = _simple(PAIRS)
    adj = _adj(simple)
    expect = {}
    for node, nbrs in adj.items():
        two_hop = set()
        for m in nbrs:
            two_hop |= adj[m]
        two_hop -= nbrs
        two_hop.discard(node)
        if two_hop:
            expect[node] = len(two_hop)
    out = {r["node"]: r["n_fof"] for r in
           fof_counts(_edges_ds(PAIRS)).take_all()}
    assert out == expect


def test_fof_counts_max_deg_guard_drops_hub_mids(ray_session):
    from ocr_search_ray.stages.graph import fof_counts

    # star: hub 0 with leaves 1..5 — every leaf pair is distance 2
    star = [(0, i) for i in range(1, 6)]
    full = {r["node"]: r["n_fof"] for r in
            fof_counts(_edges_ds(star)).take_all()}
    assert full == {i: 4 for i in range(1, 6)}
    # hub degree 5 > max_deg=4: no wedges can be emitted at all
    guarded = fof_counts(_edges_ds(star), max_deg=4).take_all()
    assert guarded == []


def test_reciprocity_matches_brute_force(ray_session):
    from ocr_search_ray.stages.graph import reciprocity

    directed = [(1, 2), (2, 1), (3, 4), (4, 5), (5, 4), (6, 6),
                (1, 2), (7, 8)]  # dupes + self-loop dropped
    de = {(a, b) for a, b in directed if a != b}
    n_recip = sum(1 for a, b in de if (b, a) in de)
    (row,) = reciprocity(_edges_ds(directed)).take_all()
    assert row["n_edges"] == len(de)
    assert row["n_reciprocated"] == n_recip
    assert row["reciprocity"] == float(n_recip) / float(len(de))


def test_reciprocity_empty_after_loop_drop(ray_session):
    from ocr_search_ray.stages.graph import reciprocity

    (row,) = reciprocity(_edges_ds([(5, 5), (9, 9)])).take_all()
    assert row["n_edges"] == 0 and row["n_reciprocated"] == 0
    assert row["reciprocity"] == 0.0


def _events_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows],
                               pa.timestamp("us")).cast(pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_last_touch_attribution_brute_force(ray_session):
    from ocr_search_ray.stages.sessionize import last_touch_attribution

    rows = [
        # user 1: view -> purchase (credit view); then purchase again with
        # no new touch in between -> the SAME view is still last touch
        (1, 1000, 1, "view"), (1, 2000, 2, "purchase"),
        (1, 3000, 3, "purchase"),
        # user 2: purchase first (direct), then click -> purchase
        (2, 1000, 4, "purchase"), (2, 2000, 5, "click"),
        (2, 3000, 6, "purchase"),
        # user 3: tie on ts — event_id orders click(7) before purchase(8)
        (3, 5000, 7, "click"), (3, 5000, 8, "purchase"),
        # user 4: touch only, no purchase — contributes nothing
        (4, 1000, 9, "view"),
    ]
    out = {r["channel"]: r["n_conversions"] for r in
           last_touch_attribution(_events_ds(rows)).take_all()}
    assert out == {"view": 2, "click": 2, "direct": 1}


def test_last_touch_attribution_all_direct(ray_session):
    from ocr_search_ray.stages.sessionize import last_touch_attribution

    rows = [(1, 1000, 1, "purchase"), (2, 1000, 2, "purchase")]
    out = {r["channel"]: r["n_conversions"] for r in
           last_touch_attribution(_events_ds(rows)).take_all()}
    assert out == {"direct": 2}


def test_triangle_counts_with_degree_parity(ray_session):
    from ocr_search_ray.stages.graph import triangle_counts

    plain = {r["node"]: r["triangles"] for r in
             triangle_counts(_edges_ds(PAIRS)).take_all()}
    withd = {r["node"]: (r["deg"], r["triangles"]) for r in
             triangle_counts(_edges_ds(PAIRS),
                             with_degree=True).take_all()}
    adj = _adj(_simple(PAIRS))
    assert {n: t for n, (_, t) in withd.items()} == plain
    assert {n: d for n, (d, _) in withd.items()} == {
        n: len(v) for n, v in adj.items()
    }


def test_label_propagation_brute_force(ray_session):
    from ocr_search_ray.stages.graph import label_propagation

    # two triangles bridged by one edge + dupes/self-loop noise
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3),
             (0, 0), (1, 0)]
    rounds = 3
    simple = _simple(pairs)
    adj = _adj(simple)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[lab[m]] = counts.get(lab[m], 0) + 1
            new[n] = min(
                (l for l in counts),
                key=lambda l: (-counts[l], l),
            )
        lab = new
    out = {r["node"]: r["label"] for r in
           label_propagation(_edges_ds(pairs), rounds=rounds).take_all()}
    assert out == lab


def test_char_profile_brute_force(ray_session):
    import collections

    from ocr_search_ray.stages.textstats import char_profile

    texts = ["aabbbc", "zzz", "abcé", "", "  x  "]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(2)
    out = {r["doc_id"]: r for r in char_profile(ds).take_all()}
    # non-ASCII doc 2 and empty doc 3 are excluded
    assert set(out) == {0, 1, 4}
    for i in (0, 1, 4):
        c = collections.Counter(texts[i])
        top_char = min(c, key=lambda ch: (-c[ch], ch))
        assert out[i]["n_bytes"] == len(texts[i])
        assert out[i]["n_distinct"] == len(c)
        assert out[i]["top_count"] == c[top_char]
        assert out[i]["top_char"] == top_char


def test_consecutive_gaps_brute_force(ray_session):
    from ocr_search_ray.stages.relational import consecutive_gaps

    rows = [
        (1, 100, 1), (1, 400, 2), (1, 250, 3),   # unsorted input
        (2, 50, 4),                                # single row -> no gaps
        (3, 10, 5), (3, 10, 6), (3, 40, 7),        # tie broken by id
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([r[0] for r in rows], pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "id": pa.array([r[2] for r in rows], pa.int64())}
        )
    ).repartition(3)
    out = {r["k"]: r for r in
           consecutive_gaps(ds, "k", "ts", "id").take_all()}
    assert set(out) == {1, 3}
    # key 1 sorted: 100, 250, 400 -> gaps 150, 150
    assert out[1]["n_gaps"] == 2
    assert out[1]["min_gap_us"] == 150 and out[1]["max_gap_us"] == 150
    assert out[1]["sum_gap_us"] == 300
    # key 3 sorted: (10,5), (10,6), (40,7) -> gaps 0, 30
    assert out[3]["n_gaps"] == 2
    assert out[3]["min_gap_us"] == 0 and out[3]["max_gap_us"] == 30
    assert out[3]["sum_gap_us"] == 30
