"""Scale invariants of the flagship crawl's driver process.

The frontier loop must never serialize per-URL data through the driver in
unbounded quantity: discoveries per round ~ pages x avg-links (a broad crawl
discovers 100x the politeness budget per round), so they flow worker-task ->
seen shard (Arrow blocks) -> next frontier (ObjectRefs via from_arrow_refs)
without driver materialization.  ``CrawlEngine._driver_rows`` counts every
per-URL row the engine collects onto the driver; these tests pin it to the
budget-bounded selection metadata, independent of discovery volume.

Also: "distributed" selection mode (per-host threshold broadcast instead of
driver-side final top-B) must match the golden interpreter exactly.
"""

import pytest

from crawler_ray.pipelines.golden import golden_crawl
from crawler_ray.sources.miniweb import MiniWeb

# one list page fans out to ~100 detail links + the paginator window while
# the budget admits ONE fetch per round: discoveries >> budget
FANOUT_WEB = MiniWeb(n_docs=400, n_hosts=1, details_per_list=100)


def test_discoveries_never_materialize_on_driver(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine

    engine = CrawlEngine(
        FANOUT_WEB, budget_per_host=1, max_rounds=3, seen_shards=2
    )
    res = engine.run()
    n_rounds = len(res.metrics)
    # the crawl really is discovery-heavy: the round-0 list page alone
    # discovers ~100 URLs against a budget of 1 fetch/round
    fetched = sum(m["selected"] for m in res.metrics)
    assert fetched <= n_rounds  # budget 1/host/round
    assert res.seen_count >= 100
    # driver-held per-URL rows are bounded by selection metadata (partial
    # winners + failures), NOT by the discovered-URL volume
    assert engine._driver_rows <= 16 * n_rounds, (
        engine._driver_rows, res.seen_count
    )


def test_distributed_mode_driver_rows_are_thresholds_only(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine

    engine = CrawlEngine(
        FANOUT_WEB, budget_per_host=1, max_rounds=3, seen_shards=2,
        selection="distributed",
    )
    res = engine.run()
    n_rounds = len(res.metrics)
    assert res.seen_count >= 100
    # per round: one threshold row per active host (1 host here)
    assert engine._driver_rows <= 2 * n_rounds, engine._driver_rows


@pytest.mark.parametrize(
    "web,budget",
    [
        (MiniWeb(n_docs=48, n_hosts=3, dead_link_every=2), 4),
        # skew + flaky pages exercise retries/DLQ through the vectorized
        # distributed classification path
        (MiniWeb(n_docs=64, n_hosts=4, mega_share=0.7, dead_link_every=2,
                 flaky_every=9), 2),
    ],
    ids=["plain", "skewed-flaky"],
)
def test_distributed_selection_conformance(ray_session, web, budget):
    """Threshold-broadcast selection must reproduce the golden interpreter
    bit-for-bit: order, seen set, and DLQ."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    g = golden_crawl(web, budget_per_host=budget, max_rounds=40)
    res = CrawlEngine(
        web, budget_per_host=budget, max_rounds=40, seen_shards=3,
        selection="distributed", record_history=True,
    ).run()
    assert [(r, h) for r, h, _ in g.order] == [(r, h) for r, h, _ in res.order]
    assert g.seen == res.seen
    gd = {(d["url_hash"], d["status"], d["round"]) for d in g.dlq}
    rd_ = {(d["url_hash"], d["status"], d["round"]) for d in res.dlq_rows}
    assert gd == rd_


def test_distributed_checkpoint_order_parquet_resume(ray_session, tmp_path):
    """Distributed mode writes the per-round crawl order as parquet (no
    driver collection); resume must rebuild the exact golden order from it."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    web = MiniWeb(n_docs=30, n_hosts=2, dead_link_every=3)
    g = golden_crawl(web, budget_per_host=3, max_rounds=30)
    ck = str(tmp_path / "ck")
    CrawlEngine(
        web, budget_per_host=3, max_rounds=30, seen_shards=2,
        selection="distributed", checkpoint_dir=ck,
    ).run()
    resumed = CrawlEngine.resume(
        web, ck, budget_per_host=3, max_rounds=30, seen_shards=2,
        selection="distributed", record_history=True,
    )
    assert [(r, h) for r, h, _ in g.order] == [
        (r, h) for r, h, _ in resumed.order
    ]
    assert g.seen == resumed.seen


def test_checkpointed_mode_keeps_discoveries_off_driver(ray_session, tmp_path):
    """Round-4 directive: WITH checkpoint_dir set (the resume path — the
    mode mandatory at 100x scale), per-round seen deltas must be persisted
    SHARD-SIDE as parquet (one file per shard per round), never drained to
    the driver; driver-held per-URL rows stay bounded by selection
    metadata, independent of discovery volume."""
    import os

    from crawler_ray.pipelines.crawl import CrawlEngine

    ck = str(tmp_path / "ck")
    engine = CrawlEngine(
        FANOUT_WEB, budget_per_host=1, max_rounds=3, seen_shards=2,
        checkpoint_dir=ck,
    )
    res = engine.run()
    n_rounds = len(res.metrics)
    assert res.seen_count >= 100          # discovery-heavy by construction
    assert engine._driver_rows <= 16 * n_rounds, (
        engine._driver_rows, res.seen_count
    )
    # the checkpoint layout holds the full delta as per-shard parquet
    import pyarrow.parquet as pq

    total = 0
    for rr in range(n_rounds):
        sdir = os.path.join(ck, f"round={rr:04d}", "seen_delta")
        files = sorted(os.listdir(sdir))
        assert files == ["shard=0.parquet", "shard=1.parquet"]
        total += sum(
            pq.read_metadata(os.path.join(sdir, f)).num_rows for f in files
        )
        assert not os.path.exists(
            os.path.join(ck, f"round={rr:04d}", "seen_delta.json")
        )
    assert total == res.seen_count


def test_checkpointed_resume_loads_deltas_shard_side(ray_session, tmp_path):
    """Resume from a truncated checkpoint: deltas bulk-load shard->shard
    (driver rows stay bounded) and the resumed crawl matches a fresh
    golden-equivalent run's seen count exactly."""
    import os

    from crawler_ray.pipelines.crawl import CrawlEngine

    web = MiniWeb(n_docs=60, n_hosts=2, dead_link_every=3)
    ck = str(tmp_path / "ck")
    full = CrawlEngine(
        web, budget_per_host=2, max_rounds=40, seen_shards=2,
        checkpoint_dir=ck,
    ).run()
    rounds = sorted(d for d in os.listdir(ck) if d.startswith("round="))
    assert len(rounds) >= 4
    # drop the tail: everything after the first two completed rounds
    for d in rounds[2:]:
        manifest = os.path.join(ck, d, "manifest.json")
        if os.path.exists(manifest):
            os.remove(manifest)
    resumed = CrawlEngine.resume(
        web, ck, budget_per_host=2, max_rounds=40, seen_shards=2,
    )
    assert resumed.seen_count == full.seen_count
    assert resumed.pages.count() == full.pages.count()


def test_checkpointed_resume_reroutes_across_shard_counts(ray_session, tmp_path):
    """A checkpoint written with 2 shards must resume correctly into an
    engine with 3 shards: every shard scans all delta files and keeps only
    its own hash range (vectorized ownership filter)."""
    import os

    from crawler_ray.pipelines.crawl import CrawlEngine

    web = MiniWeb(n_docs=40, n_hosts=2, dead_link_every=3)
    g = golden_crawl(web, budget_per_host=2, max_rounds=40)
    ck = str(tmp_path / "ck")
    CrawlEngine(
        web, budget_per_host=2, max_rounds=40, seen_shards=2,
        checkpoint_dir=ck,
    ).run()
    # truncate to force a real resume with prior-round delta loading
    rounds = sorted(d for d in os.listdir(ck) if d.startswith("round="))
    for d in rounds[2:]:
        manifest = os.path.join(ck, d, "manifest.json")
        if os.path.exists(manifest):
            os.remove(manifest)
    resumed = CrawlEngine.resume(
        web, ck, budget_per_host=2, max_rounds=40, seen_shards=3,
        record_history=True,
    )
    assert g.seen == resumed.seen
