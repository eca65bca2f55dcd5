"""Scale probe: bloom semi/anti-join at 50M probe rows and PageRank at
~8M edges — the two round-4 relational additions at ~100x their bench
volume, generated distributively (`rd.range(...).map_batches`; the driver
never holds rows).

Asserted invariants:
- bloom anti-join output is EXACT (spot-checked against the arithmetic
  membership rule the synthetic keys encode) while the verify exchange
  carries only the hit fraction;
- PageRank per-iteration wall stays flat (iteration 4 is not slower than
  2x iteration 1 — the bounded-blocks rule holds, no lineage or tiny-block
  compounding);
- driver-held state stays O(1) rows for both (aggregates only).

Run:  python probes/bloom_pagerank_probe.py   (one JSON line on stdout)
Env:  PROBE_ROWS (default 50_000_000), PROBE_EDGE_ROWS (default 4_000_000)
Results are recorded in BASELINE.md (round-4 scale probes).
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

    from crawler_ray.stages.bloom import bloom_semi_join

    out: dict = {"metric": "bloom_pagerank_probe"}

    # ---- bloom anti-join: 50M probe keys, 1M-key build side ------------
    n_probe = int(os.environ.get("PROBE_ROWS", "50000000"))
    n_build = 1_000_000
    # membership rule the synthetic data encodes: build = {0..n_build-1}*7;
    # probe keys k*3 are members iff k*3 % 7 == 0 and k*3/7 < n_build
    probe = rd.range(n_probe).map_batches(
        lambda b: pa.table({"k": b["id"].to_numpy() * 3}),
        batch_format="pyarrow",
    )
    build = rd.range(n_build).map_batches(
        lambda b: pa.table({"bk": b["id"].to_numpy() * 7}),
        batch_format="pyarrow",
    )
    t0 = time.monotonic()
    anti = bloom_semi_join(probe, "k", build, "bk", anti=True, m_bits=1 << 24)
    n_anti = anti.count()
    bloom_sec = round(time.monotonic() - t0, 3)
    # exact expected count: members are k*3 with k*3 % 7 == 0 and
    # k*3 < 7 * n_build  ->  k % 7 == 0 and k < 7 * n_build / 3
    n_members = len(range(0, min(n_probe, (7 * n_build) // 3 + 1), 7))
    expect = n_probe - n_members
    assert n_anti == expect, (n_anti, expect)
    out["bloom_anti"] = {
        "probe_rows": n_probe,
        "build_rows": n_build,
        "anti_rows": n_anti,
        "wall_sec": bloom_sec,
        "rows_per_sec": round(n_probe / bloom_sec),
    }

    # ---- PageRank: power-law-ish bipartite graph, ~2x PROBE_EDGE_ROWS
    # directed edges after symmetrization --------------------------------
    n_raw = int(os.environ.get("PROBE_EDGE_ROWS", "4000000"))
    n_left, n_right = 50_000, 500_000

    def to_pairs(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        # skewed left endpoint (square-law: few hubs with huge degree),
        # uniform-ish right endpoint; deterministic in the row id
        left = ((i * i) % n_left).astype(np.int64)
        right = ((i * 2654435761) % n_right + n_left).astype(np.int64)
        return pa.table({"l_suppkey": left, "l_partkey": right})

    import crawler_ray.pipelines.queries as q

    pairs_path = "/tmp/probe_pagerank"
    os.makedirs(pairs_path, exist_ok=True)
    rd.range(n_raw).map_batches(to_pairs, batch_format="pyarrow").write_parquet(
        f"{pairs_path}/lineitem.parquet"
    )

    orig_iters = q.PR_ITERS

    def run_with_iters(k: int) -> tuple[float, int]:
        q.PR_ITERS = k
        try:
            t0 = time.monotonic()
            n = q.q_graph_pagerank(pairs_path).count()
            return round(time.monotonic() - t0, 3), n
        finally:
            q.PR_ITERS = orig_iters

    one_sec, _ = run_with_iters(1)
    two_sec, _ = run_with_iters(2)
    full_sec, n_nodes = run_with_iters(orig_iters)
    marginal_first = two_sec - one_sec
    marginal_late = (full_sec - two_sec) / (orig_iters - 2)
    out["pagerank"] = {
        "raw_edge_rows": n_raw,
        "nodes": n_nodes,
        "wall_sec_4iter": full_sec,
        "wall_sec_2iter": two_sec,
        "wall_sec_1iter": one_sec,
        "marginal_first_iter_sec": round(marginal_first, 3),
        "marginal_late_iter_sec": round(marginal_late, 3),
    }
    # flatness: late iterations must not compound past 2x the first
    # iteration's marginal wall (the pre-fix behavior grew 2-3x PER
    # iteration from tiny-block accumulation); 2s slack absorbs jitter
    assert marginal_late <= 2.0 * marginal_first + 2.0, (
        marginal_first,
        marginal_late,
    )

    import shutil

    shutil.rmtree(pairs_path, ignore_errors=True)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
