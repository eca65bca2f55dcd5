"""Checkpoint / resume: a crawl killed mid-run must continue from its last
durable round and converge to the exact same result (north_rule: "resumable
from per-partition checkpoints with lineage + metrics")."""

import json
import os
import shutil

import pytest

from crawler_ray.sources.miniweb import MiniWeb

WEB = MiniWeb(n_docs=36, n_hosts=2, dead_link_every=2)
BUDGET = 6


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _run_full(ckpt_dir=None):
    from crawler_ray.pipelines.crawl import CrawlEngine

    return CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
    ).run()


def test_checkpoint_layout_and_manifests(ray_session, ckpt_dir):
    res = _run_full(ckpt_dir)
    rounds = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("round="))
    assert len(rounds) >= 3
    for d in rounds:
        base = os.path.join(ckpt_dir, d)
        assert os.path.isdir(os.path.join(base, "frontier"))
        with open(os.path.join(base, "manifest.json")) as f:
            m = json.load(f)
        assert {"round", "frontier", "selected", "pages_ok", "wall_sec"} <= set(m)
    # metrics in result match manifests
    assert len(res.metrics) == len(rounds)


def test_resume_after_partial_run(ray_session, ckpt_dir, tmp_path):
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()

    # run only the first 3 rounds (simulated kill), then resume
    partial = CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=3, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
    ).run()
    assert len(partial.metrics) == 3

    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]
    assert resumed.seen == baseline.seen
    assert resumed.pages.count() == baseline.pages.count()


def test_resume_with_incomplete_last_round(ray_session, ckpt_dir):
    """A round dir with a frontier snapshot but no manifest (crash mid-round)
    is replayed; the result still matches a clean run."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()
    CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=4, seen_shards=2,
        checkpoint_dir=ckpt_dir,
    ).run()
    # simulate a crash during round 2: drop manifests for rounds >= 2
    for d in sorted(os.listdir(ckpt_dir)):
        if d.startswith("round=") and int(d.split("=")[1]) >= 2:
            m = os.path.join(ckpt_dir, d, "manifest.json")
            if os.path.exists(m):
                os.remove(m)
    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert resumed.seen == baseline.seen
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]
    assert resumed.pages.count() == baseline.pages.count()

    # a SECOND crash + resume over already-written round dirs must not
    # duplicate rows (Ray write_parquet appends into existing dirs — the
    # writers clear their target first)
    for d in sorted(os.listdir(ckpt_dir)):
        if d.startswith("round=") and int(d.split("=")[1]) >= 2:
            m = os.path.join(ckpt_dir, d, "manifest.json")
            if os.path.exists(m):
                os.remove(m)
    resumed2 = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert resumed2.pages.count() == baseline.pages.count()
    assert resumed2.seen == baseline.seen


def test_mid_round_cancel_and_resume(ray_session, ckpt_dir):
    """Cooperative mid-round cancel (reference T8): the engine stops at a
    stage boundary inside a round, discards that round's uncommitted state,
    and a resume replays it from the frontier snapshot — no duplicate
    pages, final result equal to an uninterrupted run."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()

    calls = {"n": 0}

    def cancel_mid_round_1():
        calls["n"] += 1
        return calls["n"] >= 5  # trips after round 1's fetch/parse stage

    engine = CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
        cancel_check=cancel_mid_round_1,
    )
    partial = engine.run()
    assert engine.cancelled
    n_committed = len(partial.metrics)
    assert 0 < n_committed < len(baseline.metrics)
    # only committed rounds contributed pages
    assert partial.pages.count() == sum(m["pages_ok"] for m in partial.metrics)

    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert resumed.seen == baseline.seen
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]
    assert resumed.pages.count() == baseline.pages.count()
