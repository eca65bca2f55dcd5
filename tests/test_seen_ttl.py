"""Seen-set TTL (dedup-window) semantics.

Reference: the Redis URL-dedup keyspace sets a 24 h TTL per key
(``/root/reference/crawler/services/redis_cache.py:26-75``,
``config/settings.py:72-75``) so a scheduler-driven recrawl revisits pages
once their dedup window lapses.  Here:

- ``exact`` backend: per-hash stamps, exact expiry.
- ``cuckoo`` backend: generational filters — an entry lives at least ``ttl``
  and at most ``1.5 x ttl`` (3 generations rotating every ttl/2).
- Engine: ``CrawlEngine(seen_ttl=..., clock=...)`` sweeps at run start; a
  second scheduled run within the window fetches nothing, after the window
  it re-fetches, and partial expiry matches the golden interpreter's
  ``initial_seen`` knob bit-for-bit.
"""

from datetime import datetime, timedelta, timezone

from crawler_ray.pipelines.golden import golden_crawl
from crawler_ray.sources.miniweb import MiniWeb
from crawler_ray.state.scheduler import ScheduledJob, Scheduler
from crawler_ray.state.seen import SeenShard
from crawler_ray.testing import FakeClock


H1, H2, H3 = "a" * 64, "b" * 64, "c" * 64


class TestShardTTL:
    def test_exact_expiry_is_per_stamp(self):
        s = SeenShard("exact", ttl=200.0)
        s.seen_and_add([H1], now=0.0)
        s.seen_and_add([H2], now=150.0)
        assert s.expire(now=100.0) == 0          # window still open
        assert not s.seen_and_add([H1], now=100.0).any()
        assert s.expire(now=250.0) == 1          # H1 (stamp 0) lapsed
        assert s.seen_and_add([H1], now=250.0).all()   # re-admitted
        assert not s.seen_and_add([H2], now=250.0).any()  # stamp 150 alive

    def test_exact_no_ttl_never_expires(self):
        s = SeenShard("exact")
        s.seen_and_add([H1], now=0.0)
        assert s.expire(now=1e12) == 0
        assert not s.seen_and_add([H1]).any()

    def test_cuckoo_generations_bound_lifetime(self):
        # ttl=900 => window 450; lifetime in [ttl, 1.5*ttl]
        s = SeenShard("cuckoo", capacity=1 << 12, ttl=900.0)
        s.expire(now=0.0)                        # opens the window clock
        s.seen_and_add([H1], now=0.0)
        s.expire(now=450.0)
        assert not s.seen_and_add([H1], now=450.0).any()   # >= ttl guaranteed
        s.expire(now=900.0)
        assert not s.seen_and_add([H1], now=900.0).any()
        s.expire(now=1350.0)                     # third rotation drops gen(H1)
        assert s.seen_and_add([H1], now=1350.0).all()      # <= 1.5*ttl

    def test_cuckoo_long_idle_resets_wholesale(self):
        s = SeenShard("cuckoo", capacity=1 << 12, ttl=900.0)
        s.expire(now=0.0)
        s.seen_and_add([H1, H2, H3], now=0.0)
        assert s.expire(now=50_000.0) >= 1       # every generation stale
        assert s.seen_and_add([H1, H2, H3], now=50_000.0).all()


WEB = MiniWeb(n_docs=24, n_hosts=2, dead_link_every=3)
KW = dict(budget_per_host=3, max_rounds=30)


def _order(res):
    return [(r, h) for r, h, _ in res.order]


def test_recrawl_after_expiry_matches_fresh_golden(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine

    g = golden_crawl(WEB, **KW)
    clk = FakeClock(0.0)
    eng = CrawlEngine(
        WEB, seen_shards=2, seen_ttl=1000.0, clock=clk,
        record_history=True, **KW,
    )
    r1 = eng.run()
    assert _order(r1) == _order(g)

    # second run INSIDE the dedup window: every seed still seen -> no fetches
    clk.t = 400.0
    r2 = eng.run()
    assert r2.order == [] and r2.seen_count == 0

    # window lapsed (run-1 stamps at t=0, cutoff 1500-1000=500): full recrawl
    clk.t = 1500.0
    r3 = eng.run()
    assert _order(r3) == _order(g)
    assert r3.seen == g.seen


def test_partial_expiry_matches_golden_initial_seen(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine

    fresh = golden_crawl(WEB, **KW)
    pre = set(sorted(fresh.seen)[::3])   # a third of the corpus already seen

    clk = FakeClock(0.0)
    eng = CrawlEngine(
        WEB, seen_shards=2, seen_ttl=1000.0, clock=clk,
        record_history=True, **KW,
    )
    eng.seen.add_bulk(sorted(pre), now=0.0)   # stamped t=0
    eng.seen.drain_new()

    clk.t = 400.0                             # run-1 additions stamped t=400
    g1 = golden_crawl(WEB, initial_seen=pre, **KW)
    r1 = eng.run()
    assert _order(r1) == _order(g1)
    assert r1.seen == g1.seen - pre           # engine drains only NEW hashes

    # t=1100: cutoff 100 -> pre (stamp 0) expired, run-1 additions alive.
    # The sequential spec for that state is initial_seen = run-1's additions.
    clk.t = 1100.0
    g2 = golden_crawl(WEB, initial_seen=g1.seen - pre, **KW)
    r2 = eng.run()
    assert _order(r2) == _order(g2)
    assert r2.seen == g2.seen - (g1.seen - pre)


def test_scheduler_driven_recrawl_respects_window(ray_session):
    """S8 x TTL integration: an hourly schedule with a 30-min dedup window
    re-fetches every fire; with a 2 h window the second fire fetches
    nothing (all seeds still inside the window)."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    web = MiniWeb(n_docs=10, n_hosts=1)
    t0 = datetime(2026, 1, 1, 0, 0, tzinfo=timezone.utc)

    def run_schedule(ttl_sec):
        clk = FakeClock(0.0)
        eng = CrawlEngine(
            web, budget_per_host=4, max_rounds=20, seen_shards=2,
            seen_ttl=ttl_sec, clock=clk, record_history=True,
        )
        pages_per_fire = []

        def submit(sub) -> bool:
            clk.t = (sub.fired_at - t0).total_seconds()
            pages_per_fire.append(len(eng.run().order))
            return True

        now = [t0]
        sch = Scheduler(
            [ScheduledJob("j1", "site", "0 * * * *", next_run_time=t0)],
            submit, clock=lambda: now[0],
        )
        sch.tick()                      # fires at t0
        now[0] = t0 + timedelta(hours=1)
        sch.tick()                      # fires at t0 + 1 h
        return pages_per_fire

    expired = run_schedule(ttl_sec=1800.0)
    assert len(expired) == 2 and expired[0] > 0 and expired[1] == expired[0]

    fresh = run_schedule(ttl_sec=7200.0)
    assert len(fresh) == 2 and fresh[0] > 0 and fresh[1] == 0
