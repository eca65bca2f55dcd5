"""Live log streaming (state/logbus.py): the Ray-native analogue of the
reference's NATS crawl-log fan-out (log_publisher.py:21-35) — bounded
ring-buffer topics, cursor-polled tails, at-most-once under lag, and the
CrawlEngine integration (per-round events visible while the run advances,
sync-flushed run_complete)."""

from __future__ import annotations

import pytest

from crawler_ray.state.logbus import LogBus


def test_publish_tail_roundtrip(ray_session):
    bus = LogBus()
    bus.publish_sync("t", {"a": 1}, {"a": 2})
    recs, cur = bus.tail("t")
    assert [r["a"] for r in recs] == [1, 2]
    assert all("ts" in r for r in recs)
    # cursor resumes after the read — no re-delivery
    recs2, cur2 = bus.tail("t", cur)
    assert recs2 == [] and cur2 == cur
    bus.publish_sync("t", {"a": 3})
    recs3, _ = bus.tail("t", cur)
    assert [r["a"] for r in recs3] == [3]


def test_ring_buffer_drops_oldest_not_newest(ray_session):
    bus = LogBus(capacity=5)
    last = 0
    for i in range(12):
        last = bus.publish_sync("t", {"i": i})
    recs, _ = bus.tail("t", 0)  # lagged cursor: resumes at oldest retained
    assert [r["i"] for r in recs] == [7, 8, 9, 10, 11]
    assert last == 12


def test_topics_are_independent(ray_session):
    bus = LogBus()
    bus.publish_sync("a", {"x": 1})
    bus.publish_sync("b", {"y": 2})
    assert bus.topics() == ["a", "b"]
    assert bus.tail("a")[0][0]["x"] == 1
    assert bus.tail("b")[0][0]["y"] == 2
    assert bus.tail("missing") == ([], 0)


def test_crawl_engine_streams_round_events(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.miniweb import MiniWeb

    web = MiniWeb(n_docs=24, n_hosts=2, dead_link_every=2)
    bus = LogBus()
    res = CrawlEngine(
        web, budget_per_host=4, max_rounds=20, seen_shards=2,
        record_history=True, log_bus=bus,
    ).run()

    # run_complete is publish_sync'd last, so every round event is visible
    run_recs, _ = bus.tail("run")
    assert [r["event"] for r in run_recs] == ["run_complete"]
    assert run_recs[0]["rounds"] == len(res.metrics)

    rounds, _ = bus.tail("rounds")
    assert len(rounds) == len(res.metrics)
    assert [r["round"] for r in rounds] == [m["round"] for m in res.metrics]
    for r, m in zip(rounds, res.metrics):
        assert r["pages_ok"] == m["pages_ok"]

    dlq, _ = bus.tail("dlq")
    assert {(d["url_hash"], d["round"]) for d in dlq} == {
        (d["url_hash"], d["round"]) for d in res.dlq_rows
    }
    assert len(dlq) > 0  # the miniweb must actually exercise the DLQ
