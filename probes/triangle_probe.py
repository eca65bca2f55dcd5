"""Scale probe: degree-oriented triangle counting on adversarial graphs —
the planted near-dup structures (hub vertices, dense cliques) where an
UNORIENTED wedge join explodes.

Two graphs:
- **hub**: one vertex joined to H leaves plus a sparse random background.
  Unoriented, the hub alone generates C(H, 2) wedges (~5e9 pairs at the
  default H=100k — the join the old implementation would materialize);
  oriented, the hub is the maximum-rank endpoint of every incident edge,
  so it generates ZERO wedges and the probe finishes in seconds.
- **planted clique**: a k-clique (the shape of a near-dup cluster) inside
  a sparse background; the exact count C(k, 3) + background is verified.

Both report the ANALYTIC wedge volumes (exact join sizes, computed from
the degree sequences) for oriented vs unoriented, plus measured wall.

Run:  python probes/triangle_probe.py   (one JSON line on stdout)
Env:  PROBE_HUB_LEAVES (default 100_000), PROBE_CLIQUE_K (default 300),
      PROBE_BG_EDGES (default 200_000), RAY_GRAFT_CPUS (default 32)
Results are recorded in BASELINE.md (round-5 scale probes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _wedge_volumes(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """Exact (unoriented, oriented) wedge-join sizes for an edge list.

    Unoriented = sum over vertices of C(deg, 2) (the shared-endpoint join
    volume); oriented = sum of C(outdeg, 2) under low-(deg, id) -> high
    orientation."""
    verts, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(verts)).astype(np.int64)
    unoriented = int((deg * (deg - 1) // 2).sum())
    ia, ib = inv[: len(a)], inv[len(a):]
    # rank order: (degree, vertex id)
    a_first = (deg[ia] < deg[ib]) | ((deg[ia] == deg[ib]) & (verts[ia] < verts[ib]))
    src = np.where(a_first, ia, ib)
    outdeg = np.bincount(src, minlength=len(verts)).astype(np.int64)
    oriented = int((outdeg * (outdeg - 1) // 2).sum())
    return unoriented, oriented


def _run(name: str, a: np.ndarray, b: np.ndarray, expect: int | None) -> dict:
    from crawler_ray.stages.graph import triangle_count

    unor, orc = _wedge_volumes(a, b)
    edges = rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
    })).repartition(32)
    t0 = time.perf_counter()
    n_tri, n_edges = triangle_count(edges, "a", "b")
    wall = time.perf_counter() - t0
    ok = (expect is None) or (n_tri == expect)
    return {
        "graph": name, "n_edges": n_edges, "n_triangles": n_tri,
        "expected": expect, "ok": ok, "wall_sec": round(wall, 2),
        "wedges_unoriented": unor, "wedges_oriented": orc,
    }


def main() -> None:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    h = int(os.environ.get("PROBE_HUB_LEAVES", "100000"))
    k = int(os.environ.get("PROBE_CLIQUE_K", "300"))
    n_bg = int(os.environ.get("PROBE_BG_EDGES", "200000"))
    rng = np.random.default_rng(5)

    # background: sparse random edges over a disjoint vertex range, so the
    # planted structures' triangle counts stay analytic
    bg_lo = 10_000_000
    x = rng.integers(bg_lo, bg_lo + 4 * n_bg, size=n_bg * 2)
    y = rng.integers(bg_lo, bg_lo + 4 * n_bg, size=n_bg * 2)
    keep = x != y
    bx, by = np.minimum(x[keep], y[keep]), np.maximum(x[keep], y[keep])
    bg = np.unique(np.stack([bx, by], axis=1), axis=0)[:n_bg]
    # brute-force background truth (sparse: adjacency-set intersection)
    adj: dict[int, set[int]] = {}
    for u, v in bg:
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    bg_tri = sum(len(adj[int(u)] & adj[int(v)]) for u, v in bg) // 3

    # hub graph: star + background
    hub_a = np.concatenate([np.zeros(h, np.int64), bg[:, 0]])
    hub_b = np.concatenate([np.arange(1, h + 1, dtype=np.int64), bg[:, 1]])
    r_hub = _run("hub", hub_a, hub_b, expect=bg_tri)

    # planted clique + background
    ci, cj = np.triu_indices(k, 1)
    cl_a = np.concatenate([ci.astype(np.int64), bg[:, 0]])
    cl_b = np.concatenate([cj.astype(np.int64), bg[:, 1]])
    expect_cl = k * (k - 1) * (k - 2) // 6 + bg_tri
    r_cl = _run("planted_clique", cl_a, cl_b, expect=expect_cl)

    out = {
        "metric": "triangle_probe",
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "graphs": [r_hub, r_cl],
        "ok": r_hub["ok"] and r_cl["ok"],
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
