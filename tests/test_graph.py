"""Connected-components dedup clustering (stages/graph.py): the one-task
union-find path and the iterative hash-min label-propagation path must
produce identical labelings (cluster_id = min node id per component), and
attach_cluster_sizes must count exactly."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawler_ray.stages.graph import attach_cluster_sizes, connected_components


def _random_graph(n_nodes=400, n_edges=600, seed=11):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    v = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    keep = u != v
    return u[keep], v[keep]


def _truth(u, v):
    """Reference labeling via a plain python DSU."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    nodes = sorted(set(u.tolist()) | set(v.tolist()))
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


def _labels_of(ds):
    return {r["node"]: r["cluster_id"] for r in ds.take_all()}


def test_union_find_path_matches_truth(ray_session):
    u, v = _random_graph()
    edges = rd.from_arrow(pa.table({"u": u, "v": v}))
    got = _labels_of(connected_components(edges))
    assert got == _truth(u, v)


def test_iterative_path_matches_union_find(ray_session):
    """Force the distributed label-propagation path (threshold 0) and pin
    it against the union-find labeling — the two paths are interchangeable
    by construction (both emit min-node cluster ids)."""
    u, v = _random_graph(n_nodes=40, n_edges=48, seed=3)
    edges = rd.from_arrow(pa.table({"u": u, "v": v}))
    fast = _labels_of(connected_components(edges))
    slow = _labels_of(
        connected_components(edges, single_task_edges=0, n_buckets=4)
    )
    assert fast == slow == _truth(u, v)


def test_chain_graph_needs_multiple_iterations(ray_session):
    """A path graph (diameter >> 1) exercises the convergence loop: labels
    must propagate the min to the far end."""
    n = 6
    u = np.arange(n - 1, dtype=np.int64) + 100
    v = np.arange(1, n, dtype=np.int64) + 100
    edges = rd.from_arrow(pa.table({"u": u, "v": v}))
    got = _labels_of(
        connected_components(edges, single_task_edges=0, n_buckets=4)
    )
    assert set(got.values()) == {100}
    assert len(got) == n


def test_iterative_blocks_stay_bounded_over_deep_propagation(ray_session):
    """Regression: the per-iteration labels dataset must be repartitioned
    before materializing — without it the join+union+groupby chain roughly
    DOUBLES the block count every round (12 -> 28 -> 60 -> 124 -> ...) and
    a diameter-10 graph effectively never converges.  A 16-node chain
    (needs several propagation rounds) must finish with the labels block
    count at the bounded rblocks value, not 2^iterations."""
    n = 16
    u = np.arange(n - 1, dtype=np.int64)
    v = np.arange(1, n, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"u": u, "v": v})).repartition(8)
    out = connected_components(edges, single_task_edges=0, n_buckets=4)
    got = _labels_of(out)
    assert set(got.values()) == {0}
    assert len(got) == n
    # rblocks for 16 nodes is 1; a compounding loop would sit at 100+
    assert out.materialize().num_blocks() <= 4


def test_attach_cluster_sizes_counts_exactly(ray_session):
    u, v = _random_graph(n_nodes=200, n_edges=260, seed=7)
    edges = rd.from_arrow(pa.table({"u": u, "v": v}))
    comp = connected_components(edges)
    rows = attach_cluster_sizes(comp).take_all()
    truth = _truth(u, v)
    from collections import Counter

    want_sizes = Counter(truth.values())
    assert len(rows) == len(truth)
    for r in rows:
        assert truth[r["node"]] == r["cluster_id"]
        assert r["cluster_size"] == want_sizes[r["cluster_id"]]


# ---------------------------------------------------------------- triangles


def _tri_truth(pairs) -> int:
    """Brute-force triangle count over an explicit edge list."""
    import itertools

    adj: dict[int, set[int]] = {}
    for x, y in pairs:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    n = 0
    for x, y in pairs:
        n += len(adj[x] & adj[y])
    return n // 3  # each triangle counted once per edge


def test_triangle_count_clique(ray_session):
    from math import comb

    from crawler_ray.stages.graph import triangle_count

    k = 8
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    edges = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    n_tri, n_edges = triangle_count(edges, "a", "b")
    assert n_edges == comb(k, 2)
    assert n_tri == comb(k, 3)


def test_triangle_count_star_has_none(ray_session):
    # hot-vertex case the orientation exists for: a degree-k hub has zero
    # triangles and, oriented, generates zero wedges at the hub
    from crawler_ray.stages.graph import triangle_count

    leaves = list(range(1, 400))
    edges = rd.from_arrow(pa.table({
        "a": pa.array([0] * len(leaves), pa.int64()),
        "b": pa.array(leaves, pa.int64()),
    }))
    n_tri, n_edges = triangle_count(edges, "a", "b")
    assert (n_tri, n_edges) == (0, len(leaves))


def test_triangle_count_random_matches_bruteforce(ray_session):
    import random

    from crawler_ray.stages.graph import triangle_count

    rng = random.Random(11)
    pairs = set()
    while len(pairs) < 300:
        x, y = rng.randrange(60), rng.randrange(60)
        if x != y:
            pairs.add((min(x, y), max(x, y)))
    pairs = sorted(pairs)
    # endpoint order must not matter: flip half the edges
    flipped = [(y, x) if i % 2 else (x, y) for i, (x, y) in enumerate(pairs)]
    edges = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in flipped], pa.int64()),
        "b": pa.array([p[1] for p in flipped], pa.int64()),
    })).repartition(4)
    n_tri, n_edges = triangle_count(edges, "a", "b")
    assert n_edges == len(pairs)
    assert n_tri == _tri_truth(pairs)
