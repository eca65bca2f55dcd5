"""Global per-host rate-limit layer (state/ratelimit.py): fixed-window
semantics vs the reference RateLimiter (redis_cache.py:360-463), the
aggregate cap across a fetch pool, and engine integration (a salted
mega-host split across actors stays under one cap)."""

from __future__ import annotations

import time

import pytest

from crawler_ray.state.ratelimit import GlobalRateLimiter, RateLimitWindow


class FakeClock:
    def __init__(self) -> None:
        self.t = 100.0

    def __call__(self) -> float:
        return self.t


# --------------------------------------------------- window semantics (pure)


def test_window_grants_up_to_cap():
    clk = FakeClock()
    w = RateLimitWindow(max_requests=5, period_sec=10.0, clock=clk)
    assert w.acquire("h", 3) == (3, 0.0)
    granted, retry = w.acquire("h", 4)
    assert granted == 2              # only 2 left in this window
    assert retry == pytest.approx(10.0)
    assert w.acquire("h", 1) == (0, pytest.approx(10.0))
    assert w.is_rate_limited("h")
    assert w.get_count("h") == 5


def test_window_expiry_resets_counter():
    clk = FakeClock()
    w = RateLimitWindow(max_requests=2, period_sec=5.0, clock=clk)
    w.acquire("h", 2)
    assert w.is_rate_limited("h")
    clk.t += 5.0                     # window lapses (reference EXPIRE)
    assert w.get_count("h") == 0
    assert not w.is_rate_limited("h")
    assert w.acquire("h", 2) == (2, 0.0)


def test_window_retry_after_counts_down():
    clk = FakeClock()
    w = RateLimitWindow(max_requests=1, period_sec=8.0, clock=clk)
    w.acquire("h", 1)
    clk.t += 3.0
    _, retry = w.acquire("h", 1)
    assert retry == pytest.approx(5.0)


def test_window_hosts_independent_and_reset():
    clk = FakeClock()
    w = RateLimitWindow(max_requests=1, period_sec=10.0, clock=clk)
    w.acquire("a", 1)
    assert not w.is_rate_limited("b")
    assert w.acquire("b", 1) == (1, 0.0)
    assert w.reset("a")              # reference reset: counter dropped
    assert w.acquire("a", 1) == (1, 0.0)


def test_window_prune_and_snapshot():
    clk = FakeClock()
    w = RateLimitWindow(max_requests=3, period_sec=5.0, clock=clk)
    w.acquire("old", 2)
    clk.t += 4.0
    w.acquire("new", 1)
    assert w.snapshot() == {"old": 2, "new": 1}
    clk.t += 2.0                     # "old" lapsed, "new" still live
    assert w.prune() == 1
    assert w.snapshot() == {"new": 1}


def test_window_validates_args():
    with pytest.raises(ValueError):
        RateLimitWindow(max_requests=0, period_sec=1.0)
    with pytest.raises(ValueError):
        RateLimitWindow(max_requests=1, period_sec=0.0)


# ------------------------------------------------ aggregate cap (real pool)


def test_aggregate_cap_across_concurrent_fetch_actors(ray_session):
    """The point of the layer: several fetch actors all hammering ONE host
    stay under the host's aggregate window cap — local token buckets alone
    would multiply the rate by the pool size.  Runs a real map_batches
    actor pool over blocks that ALL carry the same host and measures the
    wall clock the cap forces."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.miniweb import MiniWeb
    from crawler_ray.stages.fetch import SyntheticFetcher

    web = MiniWeb(n_docs=24, n_hosts=1)
    per_window, period = 8, 0.5
    limiter = GlobalRateLimiter(per_window, period, n_shards=2)
    urls = [f"https://h0.example.org/doc/{i}" for i in range(24)]
    tbl = pa.table(
        {
            "url": pa.array(urls),
            "retry_count": pa.array([0] * len(urls), type=pa.int32()),
            "host": pa.array(["h0.example.org"] * len(urls)),
        }
    )
    # 4 blocks -> up to 4 concurrent actors on the SAME host
    slices = [tbl.slice(i * 6, 6) for i in range(4)]
    t0 = time.monotonic()
    out = (
        rd.from_arrow(slices)
        .map_batches(
            SyntheticFetcher,
            fn_constructor_kwargs={"web": web, "global_limiter": limiter},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=4,
            num_cpus=1,
        )
        .count()
    )
    wall = time.monotonic() - t0
    assert out == 24
    # 24 requests at 8/window need at least 3 windows => 2 full waits.
    # With only LOCAL buckets (or none) the 4 actors would finish the
    # synthetic fetches in well under one period.
    assert wall >= 2 * period - 0.05, f"cap not enforced: wall={wall:.2f}s"


def test_acquire_some_blocks_until_window(ray_session):
    limiter = GlobalRateLimiter(2, 0.3, n_shards=1)
    assert limiter.acquire_some("h", 5) == 2
    t0 = time.monotonic()
    assert limiter.acquire_some("h", 1) == 1   # must wait out the window
    assert time.monotonic() - t0 >= 0.2


# ------------------------------------------------------- engine integration


def test_crawl_with_global_rate_limit_matches_golden(ray_session):
    """global_rate_limit changes pacing, never results: order + seen set
    stay golden-identical while the window cap is enforced."""
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.pipelines.golden import golden_crawl
    from crawler_ray.sources.miniweb import MiniWeb

    web = MiniWeb(n_docs=12, n_hosts=2)
    g = golden_crawl(web, budget_per_host=4, max_rounds=20)
    res = CrawlEngine(
        web, budget_per_host=4, max_rounds=20, seen_shards=2,
        fetch_concurrency=2, record_history=True,
        global_rate_limit=(50, 0.2),
    ).run()
    assert [(r, h) for r, h, _ in g.order] == [(r, h) for r, h, _ in res.order]
    assert g.seen == res.seen


def test_distributed_selection_allows_rps_with_global_cap(ray_session):
    """Without the global layer, rps + distributed selection is rejected
    (host rows can't be serialized through one actor driver-side); with it,
    the combination is legal — the window actors own the aggregate cap."""
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.pipelines.golden import golden_crawl
    from crawler_ray.sources.miniweb import MiniWeb

    web = MiniWeb(n_docs=12, n_hosts=2)
    with pytest.raises(ValueError):
        CrawlEngine(web, selection="distributed", requests_per_second=50.0)
    g = golden_crawl(web, budget_per_host=4, max_rounds=20)
    res = CrawlEngine(
        web, budget_per_host=4, max_rounds=20, seen_shards=2,
        selection="distributed", requests_per_second=50.0,
        global_rate_limit=(50, 0.2), fetch_concurrency=2,
        record_history=True,
    ).run()
    assert g.seen == res.seen


def test_connections_never_bypass_rps_pacing():
    """With wall-clock rps politeness set, fetch connection waves must
    collapse to 1 — a wave of C sharing one RTT would multiply the host's
    effective request rate by C past the politeness contract."""
    import time

    import pyarrow as pa

    from crawler_ray.sources.miniweb import MiniWeb
    from crawler_ray.stages.fetch import SyntheticFetcher

    web = MiniWeb(n_docs=24, n_hosts=1)
    host = web.hosts()[0]
    urls = [f"https://{host}/doc/{i}" for i in range(1, 13)]
    batch = pa.table(
        {"url": urls, "retry_count": pa.array([0] * 12, type=pa.int32()),
         "host": [host] * 12}
    )
    # burst 1 + 10 rps => 12 requests need >= ~1.1 s regardless of conns
    f = SyntheticFetcher(web, requests_per_second=10, burst=1,
                         net_latency_sec=0.0, connections=8)
    t0 = time.monotonic()
    out = f(batch)
    wall = time.monotonic() - t0
    assert len(out) == 12
    assert wall >= 1.0, f"rps contract bypassed: wall={wall:.2f}s"
