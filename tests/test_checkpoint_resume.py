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


def test_frontier_snapshot_buckets_match_scalar_formula(ray_session, tmp_path):
    """The vectorized bucketizer must reproduce the scalar formula
    bucket_of(host, salt=int(url_hash[:4],16) % salt_k[host]) row-for-row,
    including mega-host salting, on a skewed web."""
    import os

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl import CrawlEngine, bucket_of

    web = MiniWeb(n_docs=80, n_hosts=3, mega_share=0.8, details_per_list=40)
    ck = str(tmp_path / "ck")
    CrawlEngine(
        web, budget_per_host=1, max_rounds=3, seen_shards=2,
        checkpoint_dir=ck,
    ).run()
    checked = salted = 0
    for rdir in sorted(os.listdir(ck)):
        fdir = os.path.join(ck, rdir, "frontier")
        if not os.path.isdir(fdir):
            continue
        t = pq.read_table(fdir)
        if t.num_rows == 0:
            continue
        # recompute salt_k exactly as _write_frontier_snapshot does
        counts = {}
        for h in t["host"].to_pylist():
            counts[h] = counts.get(h, 0) + 1
        avg = max(1, sum(counts.values()) // max(1, len(counts)))
        salt_k = {h: -(-n // avg) for h, n in counts.items() if n > 2 * avg}
        n_buckets = 8  # max(frontier_blocks=8 default, 8) in the snapshot
        for host, uh, b in zip(
            t["host"].to_pylist(), t["url_hash"].to_pylist(),
            t["bucket"].to_pylist(),
        ):
            salt = (int(uh[:4], 16) % salt_k[host]) if host in salt_k else 0
            if salt:
                salted += 1
            assert int(b) == bucket_of(host, n_buckets, salt=salt)
            checked += 1
    assert checked > 0
    assert salted > 0  # the mega-host salting branch really ran


def test_compacted_checkpoint_resumes_identically(ray_session, ckpt_dir, tmp_path):
    """compact_checkpoint folds old rounds into base/ and sweeps their
    dirs; resuming from the compacted checkpoint must produce the exact
    same crawl as resuming from the uncompacted one."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()

    CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=3, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
    ).run()
    # compact: rounds 0..1 fold into base/, round 2 stays
    summary = CrawlEngine.compact_checkpoint(ckpt_dir)
    assert summary["compacted_rounds"] == 2
    rounds = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("round="))
    assert rounds == ["round=0002"]  # only the latest complete round stays
    assert os.path.isdir(os.path.join(ckpt_dir, "base", "seen_delta", "n=2"))
    # idempotent re-run (crash-replay of compaction converges)
    assert CrawlEngine.compact_checkpoint(ckpt_dir)["compacted_rounds"] == 0

    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]
    assert resumed.seen == baseline.seen
    assert resumed.pages.count() == baseline.pages.count()
    assert len(resumed.metrics) == len(baseline.metrics)


def test_compacted_checkpoint_reroutes_on_shard_change(ray_session, ckpt_dir):
    """Resuming a compacted checkpoint with a DIFFERENT seen-shard count
    exercises the n=<writer> group reroute path."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()
    CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=3, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
    ).run()
    CrawlEngine.compact_checkpoint(ckpt_dir)
    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=3,
        record_history=True,
    )
    assert resumed.seen == baseline.seen
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]


def test_resume_tolerates_crash_leftovers_and_double_manifests(
    ray_session, ckpt_dir, tmp_path
):
    """Two compaction crash windows must not corrupt resume: a half-swept
    round dir with a malformed name is ignored, and a folded round whose
    dir survived (crash between base/manifests.json and the sweep) is not
    double-counted."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    baseline = _run_full()
    CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=3, seen_shards=2,
        checkpoint_dir=ckpt_dir, record_history=True,
    ).run()
    # preserve round 1 as it was, compact, then "crash-restore" it so the
    # folded round exists in BOTH base/ and its own dir
    saved = str(tmp_path / "saved_round")
    shutil.copytree(os.path.join(ckpt_dir, "round=0001"), saved)
    CrawlEngine.compact_checkpoint(ckpt_dir)
    shutil.copytree(saved, os.path.join(ckpt_dir, "round=0001"))
    # malformed leftover names must be ignored by every scanner
    os.makedirs(os.path.join(ckpt_dir, "round=0001.old-dead99"))
    os.makedirs(os.path.join(ckpt_dir, ".trash-round=0000-beef00"))

    resumed = CrawlEngine.resume(
        WEB, ckpt_dir, budget_per_host=BUDGET, max_rounds=40, seen_shards=2,
        record_history=True,
    )
    assert len(resumed.metrics) == len(baseline.metrics)  # no double-count
    assert [(r, h) for r, h, _ in resumed.order] == [
        (r, h) for r, h, _ in baseline.order
    ]
    assert resumed.seen == baseline.seen
    # re-running compaction also converges on this state
    CrawlEngine.compact_checkpoint(ckpt_dir)
