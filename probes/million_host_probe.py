"""Million-host frontier probe: distributed-selection mode at north-rule
host cardinality.

The threshold-broadcast selection path (``selection="distributed"``,
crawl.py) is DESIGNED for frontiers with millions of polite hosts — the
driver sees one (cut_score, cut_hash) row per ACTIVE host and the selected
set streams straight into the fetch stage — but the conformance webs
exercise <= 16 hosts.  This probe builds a synthetic 1M-host frontier
(2 URLs/host, generated inside distributed tasks; the driver never holds
the frontier) and runs two budget-1 rounds, asserting:

- driver-held rows stay O(hosts x rounds) — selection thresholds only,
  never frontier/discovery volume;
- per-round wall stays flat (round 2 processes the same host count).

Run:  python probes/million_host_probe.py   (one JSON line on stdout)
Env:  PROBE_HOSTS (default 1_000_000)
Results are recorded in BASELINE.md (round-4 scale probe).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

import ray


class StubWeb:
    """Minimal synthetic site: every /doc URL serves a tiny linkless page
    (the probe measures frontier machinery, not parse)."""

    def fetch(self, url: str, retry_count: int = 0):
        return 200, "<html><head><title>d</title></head><body><main><p>x</p></main></body></html>"


def _frontier_rows(batch: pa.Table) -> pa.Table:
    """host id -> 2 frontier rows (vectorized except the sha256 url hash,
    which runs inside this distributed task, never on the driver)."""
    ids = batch["id"].to_pylist()
    urls, hashes, hosts = [], [], []
    for h in ids:
        host = f"h{h}.probe.example.id"
        for p in ("a", "b"):
            u = f"https://{host}/doc/{p}"
            urls.append(u)
            hashes.append(hashlib.sha256(u.encode()).hexdigest())
            hosts.append(host)
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "url_hash": pa.array(hashes, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
            "priority": pa.array([1] * n, type=pa.int32()),
            "score": pa.array([1000] * n, type=pa.int64()),
            "discovery_round": pa.array([0] * n, type=pa.int32()),
            "not_before_round": pa.array([0] * n, type=pa.int32()),
            "retry_count": pa.array([0] * n, type=pa.int32()),
            "lineage": pa.array(["probe"] * n, type=pa.string()),
        }
    )


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.pipelines.crawl import CrawlEngine, FRONTIER_SCHEMA
    from crawler_ray.state.robots import RobotsPolicy

    n_hosts = int(os.environ.get("PROBE_HOSTS", 1_000_000))
    frontier = rd.range(n_hosts, override_num_blocks=64).map_batches(
        _frontier_rows, batch_format="pyarrow"
    ).map_batches(
        lambda t: t.cast(FRONTIER_SCHEMA), batch_format="pyarrow"
    ).materialize()  # pre-generate: round 1 should time the ENGINE, not
    # the synthetic-frontier construction

    # warm the Ray worker pool so round 1 doesn't pay process spawn (the
    # flatness assertion compares round walls)
    rd.range(32 * 4).map_batches(
        lambda b: b, batch_size=1, num_cpus=1
    ).materialize()

    engine = CrawlEngine(
        StubWeb(),
        budget_per_host=1,
        max_rounds=2,
        seen_shards=8,
        seen_backend="cuckoo",
        selection="distributed",
        robots=RobotsPolicy({}),
    )
    t0 = time.monotonic()
    result = engine.run(frontier=frontier)
    pages = result.pages.materialize()
    n_pages = pages.count()
    wall = time.monotonic() - t0

    rounds = result.metrics
    assert len(rounds) == 2, rounds
    assert n_pages == 2 * n_hosts, (n_pages, n_hosts)
    # driver rows: O(hosts) threshold rows per round, nothing else
    assert engine._driver_rows <= int(2.2 * n_hosts * len(rounds)), (
        engine._driver_rows
    )
    w1, w2 = rounds[0]["wall_sec"], rounds[1]["wall_sec"]
    flat = max(w1, w2) / max(min(w1, w2), 1e-9)

    out = {
        "metric": "million_host_frontier_probe",
        "n_hosts": n_hosts,
        "frontier_urls": 2 * n_hosts,
        "pages": n_pages,
        "rounds": len(rounds),
        "round_walls_sec": [w1, w2],
        "round_wall_ratio": round(flat, 3),
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(2 * n_hosts / wall, 1),
        "driver_rows": engine._driver_rows,
        "driver_rows_per_host_round": round(
            engine._driver_rows / (n_hosts * len(rounds)), 3
        ),
    }
    # round walls track the ACTIVE frontier size (round 1 scans 2M rows,
    # round 2 the remaining 1M), not accumulated state — so <= 2.0x
    assert flat <= 2.0, out
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
