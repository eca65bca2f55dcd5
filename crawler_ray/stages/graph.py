"""Distributed graph primitives for dedup clustering.

A large-scale dedup pipeline doesn't stop at near-dup PAIRS — keeping one
document per duplicate cluster needs the pairs resolved into CONNECTED
COMPONENTS.  :func:`connected_components` is a hybrid:

- **edge set fits one task** (the overwhelmingly common case: near-dup
  pairs are orders of magnitude fewer than documents): one Ray task runs
  array-based union-find (path halving, O(E α)) over the edge blocks and
  returns the labeling as a single Arrow block — zero shuffles, nothing on
  the driver.
- **edge set beyond the threshold**: hash-min label propagation (the
  Pregel/GraphX formulation) as an iterative Ray Data program — per
  iteration one partitioned hash join (edge.dst -> labels) and one
  ``groupby(node).min(lbl)``; the driver sees only the per-iteration
  label-sum scalar used for convergence (labels decrease monotonically,
  so an unchanged sum IS the fixpoint).  Iterations are bounded by the
  graph diameter; duplicate clusters are near-cliques, so 2-3 is typical.

Both paths emit ``cluster_id = min node id in the component`` —
deterministic at any parallelism, so the two paths are interchangeable
(and pinned equal in tests/test_graph.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from crawler_ray.stages.join import hash_join

#: edges at or below this run the one-task union-find path.  2M edges is
#: ~32 MB of int64 pairs — trivial for one worker; a graph past this is
#: genuinely large and takes the iterative path.
SINGLE_TASK_EDGES = 2_000_000


@ray.remote
def _cc_union_find(refs: list) -> pa.Table:
    """Union-find (path halving + union by root order) over edge blocks.

    Node ids are factorized to a dense range so the DSU is two numpy
    arrays; cluster_id = MIN original node id per component.
    """
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(
            t, preserve_index=False
        )
        for t in ray.get(refs)
    ]  # Ray may hand back pandas-formatted blocks despite to_arrow_refs
    tables = [t for t in tables if len(t)]
    if not tables:
        return pa.table(
            {"node": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(tables)
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    codes, uniq = pd.factorize(np.concatenate([u, v]))
    n = len(uniq)
    cu, cv = codes[: len(u)], codes[len(u):]
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(cu, cv):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(int(i)) for i in range(n)], dtype=np.int64)
    # cluster_id = min ORIGINAL node id per root
    df = pd.DataFrame({"root": roots, "node": uniq.astype(np.int64)})
    min_per_root = df.groupby("root")["node"].transform("min")
    return pa.table(
        {
            "node": pa.array(df["node"].to_numpy(), type=pa.int64()),
            "cluster_id": pa.array(min_per_root.to_numpy(), type=pa.int64()),
        }
    )


def connected_components(
    edges: "rd.Dataset",
    src: str = "u",
    dst: str = "v",
    max_iters: int = 50,
    single_task_edges: int = SINGLE_TASK_EDGES,
    n_buckets: int = 32,
) -> "rd.Dataset":
    """Connected components of an undirected graph given as an edge list.

    Args:
        edges: Dataset with two integer node columns (``src``, ``dst``).
        max_iters: hard bound on propagation rounds for the iterative path
            (>= graph diameter for an exact answer).
        single_task_edges: at or below this edge count the labeling runs
            as ONE union-find task (zero shuffles).

    Returns:
        Dataset ``(node, cluster_id)``, ``cluster_id`` = MINIMUM node id
        in the component — deterministic at any parallelism.
    """

    def _sym(t: pa.Table) -> pa.Table:
        a = pa.concat_arrays(t[src].cast(pa.int64()).chunks)
        b = pa.concat_arrays(t[dst].cast(pa.int64()).chunks)
        return pa.table(
            {"u": pa.concat_arrays([a, b]), "v": pa.concat_arrays([b, a])}
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    n_edges = sym.count()  # symmetric: 2x input pairs

    if n_edges <= 2 * single_task_edges:
        out_ref = _cc_union_find.remote(sym.to_arrow_refs())
        return rd.from_arrow_refs([out_ref])

    # ---- iterative hash-min label propagation (the 10^9-edge path) ------
    def _init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"], "lbl": t["u"]})

    def _rename_min(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "lbl": t["min(lbl)"].cast(pa.int64())}
        )

    labels = (
        sym.map_batches(_init_labels, batch_format="pyarrow")
        .groupby("node")
        .min("lbl")
        .map_batches(_rename_min, batch_format="pyarrow")
        .materialize()
    )
    # bound the per-iteration block count: the join+union+groupby chain
    # roughly doubles blocks every round, and materialize() pins that
    # growth into the next iteration's input — without this repartition a
    # 10-round propagation compounds to ~1000x the blocks and the loop
    # stops terminating (same fix as the PageRank loop's rblocks)
    n_nodes = labels.count()
    rblocks = int(max(1, min(512, n_nodes // 100_000 + 1)))
    labels = labels.repartition(rblocks).materialize()
    prev_sum = labels.sum("lbl")

    for _ in range(max_iters):
        # neighbor labels: edge (u, v) contributes labels[v] as a candidate
        # label for u (symmetric edges cover both directions)
        j = hash_join(sym, labels, "v", "node", n_buckets=n_buckets)

        def _cand(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["u"], "lbl": t["lbl"]})

        labels = (
            j.map_batches(_cand, batch_format="pyarrow")
            .union(labels)
            .groupby("node")
            .min("lbl")
            .map_batches(_rename_min, batch_format="pyarrow")
            .repartition(rblocks)
            .materialize()
        )
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            break  # labels only decrease: equal sum == fixpoint
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "cluster_id": t["lbl"]}),
        batch_format="pyarrow",
    )


def attach_cluster_sizes(comp: "rd.Dataset", n_buckets: int = 64) -> "rd.Dataset":
    """(node, cluster_id) -> + cluster_size, via ONE bucket-grouped shuffle.

    Groups by a fixed-key hash BUCKET of cluster_id (O(CPUs) groups — Ray's
    map_groups costs ~1-2 ms per group, so grouping by cluster_id itself
    would melt at millions of clusters) and counts per cluster with a
    vectorized pandas transform inside each bucket."""
    def _bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cbucket"] = (
            pd.util.hash_array(df["cluster_id"].to_numpy()) % n_buckets
        ).astype("int64")
        return df

    def _sizes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cluster_size"] = (
            df.groupby("cluster_id")["cluster_id"].transform("size")
        ).astype("int64")
        return df.drop(columns=["cbucket"])

    return (
        comp.map_batches(_bucketed, batch_format="pandas")
        .groupby("cbucket")
        .map_groups(_sizes, batch_format="pandas")
    )


def triangle_count(edges: "rd.Dataset", a: str = "a", b: str = "b") -> tuple[int, int]:
    """Exact triangle count of an undirected graph via DEGREE-ORIENTED
    two-join closure (returns ``(n_triangles, n_edges)``).

    ``edges`` holds each undirected edge once (any endpoint order; no
    self-loops).  Every edge is directed from its lower ``(degree, id)``
    endpoint to the higher one, wedges are generated only between a
    vertex's OUT-edges, and a wedge ``(v, w)`` (ordered ``rank(v) <
    rank(w)``) closes iff the oriented edge ``v -> w`` exists.  Each
    triangle is counted exactly once (at its minimum-rank vertex), and the
    orientation bounds every out-degree by O(sqrt(m)) amortized — total
    wedge volume O(m^1.5), the optimal bound — where the UNORIENTED wedge
    join explodes on hot vertices (a near-dup hub of degree k generates
    O(k^2) wedges; oriented, a max-rank hub generates zero).

    All steps are partitioned Ray Data ops: a bucketed degree combine, two
    attach joins, the wedge self-join (per-bucket work bounded by the
    oriented out-degree cap), and a composite-key semi-join.  The driver
    holds only the two output scalars.
    """
    import pyarrow.compute as pc

    from crawler_ray.stages.combine import PARTIAL_BATCH, bucketed_combine
    from crawler_ray.stages.join import attach_unique

    edges = edges.select_columns([a, b]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0, 0

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t[a].combine_chunks().cast(pa.int64()),
             t[b].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"v": v})

    deg = bucketed_combine(
        edges.map_batches(endpoints, batch_format="pyarrow").map_batches(
            lambda df: df.groupby("v", sort=False)
            .size().rename("deg").reset_index(),
            batch_format="pandas", batch_size=PARTIAL_BATCH,
        ),
        ["v"], {"deg": ("deg", "sum")},
    ).map_batches(
        lambda t: t.select(["v", "deg"]), batch_format="pyarrow"
    ).materialize()  # consumed by BOTH attach joins — never re-run the
    # endpoint scan + combine shuffle through lineage

    with_da = attach_unique(
        edges,
        deg.map_batches(lambda t: t.rename_columns(["v", "deg_a"]),
                        batch_format="pyarrow"),
        a, "v", how="inner",
    )
    with_deg = attach_unique(
        with_da,
        deg.map_batches(lambda t: t.rename_columns(["v", "deg_b"]),
                        batch_format="pyarrow"),
        b, "v", how="inner",
    )

    def orient(t: pa.Table) -> pa.Table:
        av = t[a].combine_chunks().cast(pa.int64())
        bv = t[b].combine_chunks().cast(pa.int64())
        da, db = t["deg_a"], t["deg_b"]
        a_first = pc.or_(
            pc.less(da, db),
            pc.and_(pc.equal(da, db), pc.less(av, bv)),
        )
        return pa.table({
            "src": pc.if_else(a_first, av, bv),
            "dst": pc.if_else(a_first, bv, av),
            "dst_deg": pc.cast(pc.if_else(a_first, db, da), pa.int64()),
        })

    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    left = oriented.map_batches(
        lambda t: t.rename_columns(["src", "v", "v_deg"]),
        batch_format="pyarrow",
    )
    right = oriented.map_batches(
        lambda t: t.rename_columns(["src2", "w", "w_deg"]),
        batch_format="pyarrow",
    )
    wedges = hash_join(left, right, "src", "src2")

    def keep_ordered(t: pa.Table) -> pa.Table:
        # wedge (v, w) with rank(v) < rank(w): the closing edge, if any,
        # is oriented exactly v -> w
        lt = pc.or_(
            pc.less(t["v_deg"], t["w_deg"]),
            pc.and_(pc.equal(t["v_deg"], t["w_deg"]), pc.less(t["v"], t["w"])),
        )
        t = t.filter(lt)
        k = pc.binary_join_element_wise(
            pc.cast(t["v"], pa.string()), pc.cast(t["w"], pa.string()), "|"
        )
        return pa.table({"wkey": k})

    wk = wedges.map_batches(keep_ordered, batch_format="pyarrow")
    ek = oriented.map_batches(
        lambda t: pa.table({
            "ekey": pc.binary_join_element_wise(
                pc.cast(t["src"], pa.string()),
                pc.cast(t["dst"], pa.string()), "|",
            )
        }),
        batch_format="pyarrow",
    )
    n_tri = hash_join(wk, ek, "wkey", "ekey").count()
    return n_tri, n_edges
