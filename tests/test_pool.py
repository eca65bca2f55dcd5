"""FetcherPool conformance vs the reference browser-pool lifecycle
(browser_pool.py:117-1197): bounded FIFO acquisition with timeout,
least-loaded selection, crash detection + replacement with exponential
recovery backoff, health checks, and the pooled crawl mode end-to-end."""

import threading
import time

import pytest

from crawler_ray.sources.miniweb import MiniWeb
from crawler_ray.stages.pool import (
    FetcherPool,
    InstanceCrashError,
    PooledFetcher,
    SyntheticInstance,
)

WEB = MiniWeb(n_docs=24, n_hosts=2)
URL = WEB.seeds()[0]


def make_factory(**kw):
    made = []

    def factory():
        inst = SyntheticInstance(WEB, **kw)
        made.append(inst)
        return inst

    factory.made = made
    return factory


# ------------------------------------------------------------ acquisition
def test_acquire_release_and_capacity():
    pool = FetcherPool(make_factory(), pool_size=2, max_contexts_per=2)
    leases = [pool.acquire(timeout=1) for _ in range(4)]
    insts = [lease.__enter__() for lease in leases]
    # 4 slots over 2 instances, least-loaded spread: 2 contexts each
    assert sorted(i.index for i in insts) == [0, 0, 1, 1]
    with pytest.raises(TimeoutError):
        pool.acquire(timeout=0.05)
    assert pool.stats["timeouts"] == 1
    for lease in leases:
        lease.__exit__(None, None, None)
    with pool.acquire(timeout=1) as inst:  # capacity released
        assert inst.active_contexts == 1


def test_acquire_is_fifo_under_contention():
    pool = FetcherPool(make_factory(), pool_size=1, max_contexts_per=1)
    order = []
    first = pool.acquire(timeout=1)
    first.__enter__()

    def waiter(tag):
        with pool.acquire(timeout=5):
            order.append(tag)

    threads = [threading.Thread(target=waiter, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
        time.sleep(0.05)  # establish arrival order
    first.__exit__(None, None, None)
    for t in threads:
        t.join()
    assert sorted(order) == [0, 1, 2]  # all served exactly once


def test_least_loaded_selection():
    pool = FetcherPool(make_factory(), pool_size=2, max_contexts_per=4)
    a = pool.acquire()
    ia = a.__enter__()
    b = pool.acquire()
    ib = b.__enter__()
    # second acquire must land on the OTHER (emptier) instance
    assert ia.index != ib.index


# ------------------------------------------------------------ crash path
def test_crash_marks_and_replaces_instance():
    factory = make_factory(crash_after=2)
    pool = FetcherPool(factory, pool_size=1, max_contexts_per=2)
    with pool.acquire() as inst:
        inst.backend.fetch(URL)
        inst.backend.fetch(URL)
    with pytest.raises(InstanceCrashError):
        with pool.acquire() as inst:
            inst.backend.fetch(URL)
    # the lease reported the crash: instance replaced by a fresh backend
    assert pool.stats["crashes"] == 1
    assert pool.stats["replaced"] == 1
    assert len(factory.made) == 2
    assert factory.made[0].closed  # crashed backend was closed
    with pool.acquire() as inst:
        assert inst.backend is factory.made[1]
        assert inst.backend.fetch(URL)[0] == 200


def test_recovery_backoff_defers_replacement():
    now = [0.0]
    factory = make_factory(crash_after=0)  # every instance dies on first fetch
    pool = FetcherPool(factory, pool_size=1, max_contexts_per=1,
                       recovery_backoff_base=4.0, clock=lambda: now[0])

    def crash_once():
        with pytest.raises(InstanceCrashError):
            with pool.acquire() as inst:
                inst.backend.fetch(URL)

    crash_once()                      # attempt 1 -> replaced at t=0
    assert pool.stats["replaced"] == 1
    crash_once()                      # replacement has recovery_attempts=1,
    # backoff = 4^1 = 4s from t=0 -> NOT replaced yet
    assert pool.stats["replaced"] == 1
    h = pool.health_check()
    assert h["healthy"] == 0          # still dead, still in backoff
    now[0] = 5.0                      # past backoff
    h = pool.health_check()
    assert pool.stats["replaced"] == 2
    assert h["pool_size"] == 1


def test_health_check_replaces_dead_instances():
    factory = make_factory()
    pool = FetcherPool(factory, pool_size=2, max_contexts_per=2)
    factory.made[0]._dead = True      # silently dies (no fetch crash)
    h = pool.health_check()
    assert h["healthy"] == 1
    assert pool.stats["replaced"] == 1
    h2 = pool.health_check()
    assert h2["healthy"] == 2         # replacement is alive


def test_shutdown_closes_and_refuses():
    factory = make_factory()
    pool = FetcherPool(factory, pool_size=2)
    pool.shutdown()
    assert all(i.closed for i in factory.made)
    with pytest.raises(RuntimeError):
        pool.acquire()


# ------------------------------------------------------- batch fetcher
def test_pooled_fetcher_survives_crashes():
    fetcher = PooledFetcher(
        WEB, pool_size=2, max_contexts_per=2,
        factory=lambda: SyntheticInstance(WEB, crash_after=3),
    )
    import pyarrow as pa

    urls = [f"https://{WEB.hosts()[0]}/doc/{i}" for i in range(12)]
    batch = pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array([WEB.hosts()[0]] * len(urls)),
            "retry_count": pa.array([1] * len(urls), type=pa.int32()),
        }
    )
    out = fetcher(batch)
    statuses = out["status"].to_pylist()
    # every fetch succeeded despite instances crashing every 3 fetches
    # (crash -> replace -> retry); retry_count=1 skips flaky-500s
    assert statuses == [200] * len(urls)
    assert fetcher.pool.stats["replaced"] >= 2


def test_pooled_crawl_matches_golden(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.pipelines.golden import golden_crawl

    web = MiniWeb(n_docs=30, n_hosts=2)
    g = golden_crawl(web, budget_per_host=4, max_rounds=40)
    res = CrawlEngine(
        web, budget_per_host=4, max_rounds=40, seen_shards=2,
        fetch_backend="pooled", fetch_concurrency=2, record_history=True,
    ).run()
    assert [(r, h) for r, h, _ in g.order] == [(r, h) for r, h, _ in res.order]
    assert g.seen == res.seen
    assert res.pages.count() == len(g.pages)
