"""North-rule conformance: the Ray crawl engine must reproduce the golden
(sequential reference-semantics) interpreter exactly on the same mini-web,
same seed list, same politeness budget:

- crawl ORDER: identical (round, url_hash) sequence;
- URL-SEEN SET: identical final set;
- DLQ: identical failure records;
- per-row span-sequence equality (kind, text, media_ref, order) and identical
  content_hash / simhash — the BASELINE.json input_hint invariant.
"""

import pytest

from crawler_ray.functions.simhash import from_signed
from crawler_ray.pipelines.golden import golden_crawl
from crawler_ray.sources.miniweb import MiniWeb

WEB = MiniWeb(n_docs=48, n_hosts=3, dead_link_every=2)
BUDGET = 4
ROUNDS = 40


@pytest.fixture(scope="module")
def golden():
    return golden_crawl(WEB, budget_per_host=BUDGET, max_rounds=ROUNDS)


@pytest.fixture(scope="module")
def ray_crawl(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine

    engine = CrawlEngine(WEB, budget_per_host=BUDGET, max_rounds=ROUNDS, seen_shards=2, record_history=True)
    return engine.run()


def test_crawl_order_exact(golden, ray_crawl):
    assert [(r, h) for r, h, _ in golden.order] == [(r, h) for r, h, _ in ray_crawl.order]


def test_seen_set_exact(golden, ray_crawl):
    assert golden.seen == ray_crawl.seen


def test_dlq_exact(golden, ray_crawl):
    g = {(d["url_hash"], d["status"], d["round"]) for d in golden.dlq}
    r = {(d["url_hash"], d["status"], d["round"]) for d in ray_crawl.dlq_rows}
    assert g == r
    assert len(golden.dlq) > 0  # the mini-web must actually exercise the DLQ


def test_span_sequence_equality(golden, ray_crawl):
    gpages = {p["url_hash"]: p for p in golden.pages}
    rows = ray_crawl.pages.take_all()
    assert len(rows) == len(golden.pages)
    for row in rows:
        gp = gpages[row["url_hash"]]
        gsp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in gp["spans"]]
        rsp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        assert gsp == rsp, row["url"]
        assert gp["content_hash"] == row["content_hash"]
        assert gp["simhash"] == from_signed(int(row["simhash"]))


def test_robots_never_fetched(golden, ray_crawl):
    assert not any("/private/" in u for _, _, u in ray_crawl.order)
    assert not any("/private/" in u for _, _, u in golden.order)


def test_duplicate_marking_exact_and_fuzzy(golden, ray_crawl):
    from crawler_ray.stages.dedupe import mark_duplicates

    marked = mark_duplicates(ray_crawl.pages)
    gp = {p["url_hash"]: p for p in golden.pages}
    rows = marked.take_all()
    n_dups = 0
    for row in rows:
        p = gp[row["url_hash"]]
        assert bool(p["is_duplicate"]) == bool(row["is_duplicate"]), row["url"]
        assert p["duplicate_of"] == row["duplicate_of"], row["url"]
        gs = p["similarity_score"]
        rs = row["similarity_score"]
        assert (gs is None) == (rs is None) and (gs or 0) == (rs or 0), row["url"]
        n_dups += bool(row["is_duplicate"])
    assert n_dups > 0  # the mini-web must exercise both dup paths


@pytest.mark.parametrize(
    "web,budget",
    [
        # skewed: 4 hosts, mega-host with 70% of docs, tight budget
        (MiniWeb(n_docs=64, n_hosts=4, mega_share=0.7, dead_link_every=2,
                 flaky_every=9), 2),
        # dup-heavy: aggressive dup/near-dup chains, generous budget
        (MiniWeb(n_docs=40, n_hosts=2, dup_every=5, near_dup_every=7), 16),
    ],
    ids=["skewed-tight", "dup-heavy-wide"],
)
def test_conformance_other_configs(ray_session, web, budget):
    """Order + seen-set equality must hold across web shapes and budgets,
    not just the module fixture's configuration."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    g = golden_crawl(web, budget_per_host=budget, max_rounds=60)
    res = CrawlEngine(web, budget_per_host=budget, max_rounds=60, seen_shards=3, record_history=True).run()
    assert [(r, h) for r, h, _ in g.order] == [(r, h) for r, h, _ in res.order]
    assert g.seen == res.seen


def test_rate_limited_actor_pool_mode(golden, ray_session):
    """requests_per_second engages the actor-pool fetch path with per-host
    token buckets (reference local_rate_limiter semantics); results must be
    identical to the task path — pacing affects wall clock only."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    small = MiniWeb(n_docs=12, n_hosts=2)
    g = golden_crawl(small, budget_per_host=4, max_rounds=20)
    engine = CrawlEngine(
        small, budget_per_host=4, max_rounds=20, seen_shards=2,
        requests_per_second=50.0, fetch_concurrency=2, record_history=True,
    )
    res = engine.run()
    assert [(r, h) for r, h, _ in g.order] == [(r, h) for r, h, _ in res.order]
    assert g.seen == res.seen


def test_retries_recorded(golden, ray_crawl):
    # flaky pages appear twice in the order (initial 500 + retry success)
    from collections import Counter

    counts = Counter(h for _, h, _ in ray_crawl.order)
    assert any(c > 1 for c in counts.values())


def test_default_mode_keeps_driver_state_bounded(ray_session, golden):
    """Without record_history, the engine must not accumulate the crawl
    order or seen log on the driver (O(all-URLs-ever) state), while still
    reporting an exact seen_count."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    res = CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=ROUNDS, seen_shards=2
    ).run()
    assert res.order == []
    assert res.seen == set()
    assert res.seen_count == len(golden.seen)
    assert res.pages.count() == sum(m["pages_ok"] for m in res.metrics)


def test_custom_classification_rules_conformance(ray_session):
    """Custom ErrorClassificationRule list (reference retry_policy.py:364-516)
    changes retry/DLQ behavior identically in the golden interpreter and the
    Ray engine: 500s become permanent ("hard_down", no retries), 404s become
    retryable ("maybe_up", retried then dead-lettered)."""
    from crawler_ray.functions.backoff import ErrorClassificationRule
    from crawler_ray.pipelines.crawl import CrawlEngine

    rules = [
        ErrorClassificationRule(
            "hard-down", lambda e, s: s == 500, "hard_down",
            "500s are permanent here", is_retryable=False,
        ),
        ErrorClassificationRule(
            "maybe-up", lambda e, s: s == 404, "maybe_up",
            "404s might come back", is_retryable=True,
        ),
    ]
    g = golden_crawl(WEB, budget_per_host=BUDGET, max_rounds=ROUNDS,
                     classification_rules=rules)
    engine = CrawlEngine(WEB, budget_per_host=BUDGET, max_rounds=ROUNDS,
                         seen_shards=2, record_history=True,
                         classification_rules=rules)
    r = engine.run()

    assert [(rd_, h) for rd_, h, _ in g.order] == [
        (rd_, h) for rd_, h, _ in r.order
    ]
    assert g.seen == r.seen
    gd = {(d["url_hash"], d["status"], d["round"], d["error_category"])
          for d in g.dlq}
    rd2 = {(d["url_hash"], d["status"], d["round"], d["error_category"])
           for d in r.dlq_rows}
    assert gd == rd2
    # the rules actually fired: every 404 DLQ row carries the custom
    # category and a retry_count > 0 (it was retried); 500s were never
    # retried (retry_count == 0) and carry theirs
    cats = {d["error_category"] for d in r.dlq_rows}
    assert cats <= {"hard_down", "maybe_up"} and len(cats) == 2
    assert all(d["retry_count"] > 0 for d in r.dlq_rows
               if d["error_category"] == "maybe_up")
    assert all(d["retry_count"] == 0 for d in r.dlq_rows
               if d["error_category"] == "hard_down")
    # and the rule-driven crawl genuinely diverges from the default one
    g_default = golden_crawl(WEB, budget_per_host=BUDGET, max_rounds=ROUNDS)
    assert {d["error_category"] for d in g_default.dlq} == {"not_found"}
    assert len(g.dlq) != len(g_default.dlq)


def test_connection_waves_conformance(golden, ray_session):
    """fetch_connections overlaps network latency inside fetch tasks (waves
    of C in-flight requests share one RTT) — it must change WALL TIME only:
    order, seen set, DLQ and page payloads stay golden-identical."""
    from crawler_ray.pipelines.crawl import CrawlEngine

    res = CrawlEngine(
        WEB, budget_per_host=BUDGET, max_rounds=ROUNDS, seen_shards=2,
        record_history=True, fetch_connections=8, net_latency_sec=0.001,
    ).run()
    assert [(r, h) for r, h, _ in golden.order] == [
        (r, h) for r, h, _ in res.order
    ]
    assert golden.seen == res.seen
    g = {(d["url_hash"], d["status"], d["round"]) for d in golden.dlq}
    assert g == {(d["url_hash"], d["status"], d["round"]) for d in res.dlq_rows}
