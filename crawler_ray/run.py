"""CLI entry point — the ``ray job submit`` surface.

Reference analogue: ``POST /api/v1/jobs`` with an inline_config workflow or
a website template (SURVEY.md §3.2); here a job is a JSON config file:

    python -m crawler_ray.run --config job.json [--output /tmp/out]

Config shapes:

1. flagship frontier crawl::

    {"kind": "crawl", "n_docs": 500, "budget_per_host": 64,
     "max_rounds": 64, "seen_backend": "cuckoo",
     "checkpoint_dir": "/tmp/ckpt", "resume": false}

2. declarative workflow (the reference's step API)::

    {"kind": "workflow", "n_docs": 100, "seed_url": null,
     "variables": {...},
     "steps": [{"name": ..., "type": "crawl"|"scrape", ...}]}

3. offline checkpoint maintenance (between crawl sessions)::

    {"kind": "compact", "checkpoint_dir": "/tmp/ckpt",
     "retention_root": null, "retention_keep": null,
     "retention_min_value": null}

4. REAL crawl over HTTP (no synthetic web; urllib client per fetch actor)::

    {"kind": "crawl", "fetch_backend": "http",
     "seeds": ["https://example.org/"],
     "robots": "fetch",               // fetch /robots.txt per seed host
     "http_timeout": 30, "requests_per_second": 2,
     "budget_per_host": 64, "max_rounds": 64}

Outputs land under ``--output`` as parquet (documents / items) plus a
``result.json`` summary.  Owns its Ray session (guarded init) — the only
module besides bench.py and the test fixture that does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawler_ray.run")
    ap.add_argument("--config", required=True)
    ap.add_argument("--output", default="/tmp/crawler_ray_out")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = json.load(f)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    os.makedirs(args.output, exist_ok=True)
    summary: dict = {"kind": cfg.get("kind", "crawl")}

    from crawler_ray.sources.miniweb import MiniWeb

    # "http" fetch backend = a REAL crawl/workflow (urllib opener per
    # actor/worker; no synthetic web is built).  Everything else runs
    # against the deterministic miniweb, as before.
    use_http = cfg.get("fetch_backend") == "http"
    if use_http and cfg.get("kind", "crawl") == "crawl" and not cfg.get("seeds"):
        # without seeds the crawl would resolve synthetic hostnames over
        # the live network and "succeed" with zero pages — refuse loudly
        raise SystemExit('fetch_backend "http" requires non-empty "seeds"')
    web = None
    if not use_http:
        web = MiniWeb(
            n_docs=int(cfg.get("n_docs", 500)),
            n_hosts=int(cfg.get("n_hosts", 4)),
            words_per_doc=int(cfg.get("words_per_doc", 60)),
        )

    if cfg.get("kind", "crawl") == "crawl":
        from crawler_ray.pipelines.crawl import CrawlEngine
        from crawler_ray.stages.dedupe import mark_duplicates

        kwargs = dict(
            budget_per_host=int(cfg.get("budget_per_host", 64)),
            max_rounds=int(cfg.get("max_rounds", 64)),
            seen_shards=int(cfg.get("seen_shards", 4)),
            seen_backend=cfg.get("seen_backend", "exact"),
            checkpoint_dir=cfg.get("checkpoint_dir"),
            requests_per_second=cfg.get("requests_per_second"),
        )
        if use_http:
            from crawler_ray.state.robots import RobotsPolicy
            from crawler_ray.stages.http_fetch import HttpClient

            seeds = list(cfg.get("seeds") or [])
            kwargs.update(
                fetch_backend="http",
                http_timeout=float(cfg.get("http_timeout", 30.0)),
                seeds=seeds,
            )
            if cfg.get("robots", "fetch") == "fetch":
                # per-seed scheme: an http-only host must not be probed
                # over https (error -> silent allow-all)
                kwargs["robots"] = RobotsPolicy.fetched_for_seeds(
                    seeds, HttpClient(timeout=kwargs["http_timeout"])
                )
            elif cfg.get("robots") == "allow_all":
                kwargs["robots"] = RobotsPolicy()
        if cfg.get("resume") and cfg.get("checkpoint_dir"):
            result = CrawlEngine.resume(web, cfg["checkpoint_dir"], **{
                k: v for k, v in kwargs.items() if k != "checkpoint_dir"
            })
        else:
            result = CrawlEngine(web, **kwargs).run()
        marked = mark_duplicates(result.pages)
        marked.write_parquet(os.path.join(args.output, "documents"))
        summary.update(
            pages=sum(m["selected"] for m in result.metrics),
            urls_seen=result.seen_count,
            rounds=len(result.metrics),
            dead_letters=len(result.dlq_rows),
            metrics=result.metrics,
        )
    elif cfg["kind"] == "compact":
        # offline checkpoint maintenance (docstring: run BETWEEN crawl
        # sessions): fold old rounds into base/, optionally sweep aged
        # output partitions elsewhere via retention
        from crawler_ray.pipelines.crawl import CrawlEngine

        summary.update(CrawlEngine.compact_checkpoint(cfg["checkpoint_dir"]))
        if cfg.get("retention_root"):
            from crawler_ray.sources.storage import retention_sweep

            summary["swept"] = retention_sweep(
                cfg["retention_root"],
                keep=cfg.get("retention_keep"),
                min_value=cfg.get("retention_min_value"),
                partition_key=cfg.get("retention_key", "round"),
            )
    elif cfg["kind"] == "workflow":
        from crawler_ray.pipelines.workflow import WorkflowRunner

        backend = web
        if use_http:
            # real HTTP workflow: the step configs carry their own seed
            # URLs, so no seeds key is needed at the job level
            from crawler_ray.stages.http_fetch import HttpClient

            backend = HttpClient(timeout=float(cfg.get("http_timeout", 30.0)))
        ctx = WorkflowRunner(backend).run(
            cfg["steps"], seed_url=cfg.get("seed_url"),
            variables=cfg.get("variables"),
        )
        with open(os.path.join(args.output, "context.json"), "w") as f:
            json.dump(
                {"steps": ctx["steps"], "execution_order": ctx["execution_order"],
                 "metadata": ctx["metadata"]}, f, ensure_ascii=False, default=str,
            )
        summary.update(execution_order=ctx["execution_order"])
    else:
        raise SystemExit(f"unknown config kind: {cfg['kind']!r}")

    with open(os.path.join(args.output, "result.json"), "w") as f:
        json.dump(summary, f, default=str)
    print(json.dumps({k: v for k, v in summary.items() if k != "metrics"}))
    if owns_session:  # never tear down a caller's (e.g. a test's) session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
