"""Engine-bound crawl probe: the flagship loop at 20x the bench corpus.

The sf0.1 bench is network-bound by design (200 ms simulated RTT); this
probe removes the RTT so the measured pages/s is the ENGINE's ceiling —
parse + frontier bookkeeping + seen-set + selection at a 110k-page scale
(two orders above the conformance webs, 20x the bench).  Politeness budget
and round semantics stay identical to the bench; the seen set runs the
cuckoo backend sized for the corpus (auto-grow covers mis-sizing anyway).

Run:  python probes/crawl_engine_probe.py   (one JSON line on stdout)
Results are recorded in BASELINE.md (round-3 scale probe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.miniweb import MiniWeb

    n_docs = int(os.environ.get("PROBE_DOCS", 110_000))
    # details_per_list=256 keeps the BFS listing-chain depth ~27 so the
    # probe measures the ENGINE per-page cost, not (chain depth) x (the
    # ~2 s/round orchestration floor the bench already characterizes)
    web = MiniWeb(n_docs=n_docs, n_hosts=16, words_per_doc=600,
                  details_per_list=256)
    engine = CrawlEngine(
        web,
        budget_per_host=4096,
        max_rounds=64,
        seen_shards=8,
        seen_backend="cuckoo",
        net_latency_sec=0.0,
    )
    t0 = time.monotonic()
    result = engine.run()
    pages = result.pages.materialize()
    n_pages = pages.count()
    wall = time.monotonic() - t0
    out = {
        "metric": "crawl_engine_probe",
        "n_docs": n_docs,
        "n_hosts": 16,
        "pages": n_pages,
        "urls_seen": result.seen_count,
        "rounds": len(result.metrics),
        "wall_sec": round(wall, 2),
        "pages_per_sec": round(n_pages / wall, 1),
        "driver_rows": engine._driver_rows,
    }
    assert n_pages >= n_docs  # every doc page + listing pages fetched
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
