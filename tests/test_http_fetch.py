"""HTTP fetch backend (stages/http_fetch.py): request semantics vs the
reference HTTPExecutor (http_executor.py:68-231) via the transport seam —
method/header/cookie/param/body passthrough, per-request timeout, redirect
following (incl. the 301/302/303 method demotion), status + body +
Retry-After capture, and error taxonomy.  The conformance test runs the
FULL crawl engine through the HTTP backend against a miniweb transport."""

from __future__ import annotations

import pyarrow as pa
import pytest

from crawler_ray.stages.http_fetch import HttpFetcher, MiniWebTransport


def _batch(urls, hosts=None):
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts or ["h"] * len(urls), pa.string()),
        "retry_count": pa.array([0] * len(urls), pa.int32()),
    })


class RecordingTransport:
    """Scripted transport: records every request, replays a response list."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests: list[dict] = []

    def __call__(self, request):
        self.requests.append(dict(request))
        r = self.responses[min(len(self.requests) - 1, len(self.responses) - 1)]
        if isinstance(r, Exception):
            raise r
        return r


def test_request_passthrough():
    tr = RecordingTransport([(200, "ok", {})])
    f = HttpFetcher(
        transport=tr, timeout=7.5, http_method="post",
        headers={"X-Job": "42"}, params={"q": "news", "page": "2"},
        data={"a": "1"}, cookies={"sid": "abc", "lang": "id"},
    )
    out = f(_batch(["http://ex.test/api?v=1"]))
    assert out["status"].to_pylist() == [200]
    assert out["html"].to_pylist() == ["ok"]
    req = tr.requests[0]
    assert req["method"] == "POST"
    assert req["timeout"] == 7.5
    assert req["url"] == "http://ex.test/api?v=1&q=news&page=2"
    assert req["headers"]["X-Job"] == "42"
    assert req["headers"]["Cookie"] == "sid=abc; lang=id"
    assert req["body"] == b"a=1"
    assert req["headers"]["Content-Type"] == "application/x-www-form-urlencoded"


def test_json_body():
    tr = RecordingTransport([(200, "ok", {})])
    f = HttpFetcher(transport=tr, http_method="PUT", json_body={"k": [1, 2]})
    f(_batch(["http://ex.test/x"]))
    req = tr.requests[0]
    assert req["body"] == b'{"k": [1, 2]}'
    assert req["headers"]["Content-Type"] == "application/json"


def test_redirect_follow_relative_and_capture_final_url():
    tr = RecordingTransport([
        (302, "", {"Location": "/moved"}),
        (301, "", {"Location": "http://other.test/final"}),
        (200, "done", {}),
    ])
    f = HttpFetcher(transport=tr, extended=True)
    out = f(_batch(["http://ex.test/a/b"]))
    assert out["status"].to_pylist() == [200]
    assert out["html"].to_pylist() == ["done"]
    assert out["final_url"].to_pylist() == ["http://other.test/final"]
    assert [r["url"] for r in tr.requests] == [
        "http://ex.test/a/b",
        "http://ex.test/moved",
        "http://other.test/final",
    ]


def test_redirect_303_demotes_post_to_get_307_preserves():
    tr = RecordingTransport([
        (303, "", {"Location": "/see-other"}),
        (200, "ok", {}),
    ])
    f = HttpFetcher(transport=tr, http_method="POST", data="payload")
    f(_batch(["http://ex.test/submit"]))
    assert tr.requests[0]["method"] == "POST"
    assert tr.requests[0]["body"] == b"payload"
    assert tr.requests[1]["method"] == "GET"
    assert tr.requests[1]["body"] is None

    tr2 = RecordingTransport([
        (307, "", {"Location": "/temp"}),
        (200, "ok", {}),
    ])
    f2 = HttpFetcher(transport=tr2, http_method="POST", data="payload")
    f2(_batch(["http://ex.test/submit"]))
    assert tr2.requests[1]["method"] == "POST"
    assert tr2.requests[1]["body"] == b"payload"


def test_redirect_loop_capped():
    tr = RecordingTransport([(302, "", {"Location": "/again"})])
    f = HttpFetcher(transport=tr, extended=True)
    out = f(_batch(["http://ex.test/loop"]))
    assert out["status"].to_pylist() == [0]
    assert out["fetch_error"].to_pylist() == ["too many redirects"]
    assert len(tr.requests) == 21  # initial + MAX_REDIRECTS hops


def test_no_follow_when_disabled():
    tr = RecordingTransport([(302, "moved", {"Location": "/x"})])
    f = HttpFetcher(transport=tr, follow_redirects=False)
    out = f(_batch(["http://ex.test/a"]))
    assert out["status"].to_pylist() == [302]
    assert len(tr.requests) == 1


def test_retry_after_capture_seconds_and_invalid():
    tr = RecordingTransport([
        (429, "slow down", {"Retry-After": "120"}),
        (503, "maintenance", {"retry-after": "not-a-date"}),
        (200, "fine", {}),
    ])
    f = HttpFetcher(transport=tr, extended=True)
    out = f(_batch(["http://a.test/1", "http://a.test/2", "http://a.test/3"]))
    assert out["status"].to_pylist() == [429, 503, 200]
    assert out["retry_after_sec"].to_pylist() == [120, -1, -1]
    assert out["html"].to_pylist() == ["slow down", "maintenance", "fine"]


def test_timeout_and_request_error_taxonomy():
    tr = RecordingTransport([
        TimeoutError("read timed out"),
        OSError("connection refused"),
    ])
    f = HttpFetcher(transport=tr, extended=True)
    out = f(_batch(["http://t.test/1", "http://t.test/2"]))
    assert out["status"].to_pylist() == [0, 0]
    errs = out["fetch_error"].to_pylist()
    assert errs[0].startswith("timeout:")
    assert errs[1].startswith("request error:")


def test_body_charset_decode():
    raw = "ünïcode".encode("latin-1")
    tr = RecordingTransport([
        (200, raw, {"Content-Type": "text/html; charset=latin-1"}),
    ])
    f = HttpFetcher(transport=tr)
    out = f(_batch(["http://c.test/x"]))
    assert out["html"].to_pylist() == ["ünïcode"]


def test_extras_align_under_connection_waves():
    # the politeness engine (waves) must not desync the extended columns
    tr = RecordingTransport([(200, "ok", {"Retry-After": "5"})])
    f = HttpFetcher(transport=tr, connections=3, extended=True)
    urls = [f"http://w.test/{i}" for i in range(8)]
    out = f(_batch(urls, hosts=["w"] * 8))
    assert out["retry_after_sec"].to_pylist() == [5] * 8
    assert out["final_url"].to_pylist() == urls


# ---------------------------------------------------------------- conformance


def test_http_backend_matches_golden(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.pipelines.golden import golden_crawl
    from crawler_ray.sources.miniweb import MiniWeb

    web = MiniWeb(n_docs=36, n_hosts=3, dead_link_every=2)
    golden = golden_crawl(web, budget_per_host=4, max_rounds=30)
    res = CrawlEngine(
        web, budget_per_host=4, max_rounds=30, seen_shards=2,
        record_history=True, fetch_backend="http",
        http_transport=MiniWebTransport(web),
    ).run()
    assert [(r, h) for r, h, _ in golden.order] == [
        (r, h) for r, h, _ in res.order
    ]
    assert golden.seen == res.seen
    g = {(d["url_hash"], d["status"], d["round"]) for d in golden.dlq}
    r = {(d["url_hash"], d["status"], d["round"]) for d in res.dlq_rows}
    assert g == r and len(g) > 0


def test_redirect_301_preserves_non_post_methods():
    # httpx _redirect_method: 301/302 demote only POST; PUT keeps its body
    tr = RecordingTransport([
        (301, "", {"Location": "/perm"}),
        (200, "ok", {}),
    ])
    f = HttpFetcher(transport=tr, http_method="PUT", data="payload")
    f(_batch(["http://ex.test/doc"]))
    assert tr.requests[1]["method"] == "PUT"
    assert tr.requests[1]["body"] == b"payload"


def test_redirect_303_preserves_head():
    tr = RecordingTransport([
        (303, "", {"Location": "/other"}),
        (200, "", {}),
    ])
    f = HttpFetcher(transport=tr, http_method="HEAD")
    f(_batch(["http://ex.test/h"]))
    assert tr.requests[1]["method"] == "HEAD"


def test_malformed_response_and_bad_url_are_per_row_errors():
    import http.client

    tr = RecordingTransport([
        http.client.BadStatusLine("garbage"),
        ValueError("unknown url type: 'mailto:x@y'"),
        (200, "fine", {}),
    ])
    f = HttpFetcher(transport=tr, extended=True)
    out = f(_batch(["http://m.test/1", "mailto:x@y", "http://m.test/3"]))
    assert out["status"].to_pylist() == [0, 0, 200]
    errs = out["fetch_error"].to_pylist()
    assert "BadStatusLine" in errs[0]
    assert "ValueError" in errs[1]
    assert errs[2] == ""


def test_workflow_runs_over_http_client(ray_session):
    # HttpClient satisfies the engine-wide fetch-backend protocol, so a
    # declarative workflow runs over (transport-mocked) HTTP end-to-end;
    # results must equal the same workflow run directly on the miniweb
    from crawler_ray.pipelines.workflow import WorkflowRunner
    from crawler_ray.sources.miniweb import MiniWeb
    from crawler_ray.stages.http_fetch import HttpClient

    web = MiniWeb(n_docs=20, n_hosts=2)
    seed = "https://putusan.example.id/list?page=1"
    steps = [
        {
            "name": "daftar",
            "type": "crawl",
            "config": {"seed_url": seed,
                       "pagination": {"enabled": True, "max_pages": 2}},
            "selectors": {"urls": {"selector": "a::attr(href)",
                                   "multiple": True}},
        },
        {
            "name": "detail",
            "type": "scrape",
            "input_from": "daftar.urls",
            "selectors": {"title": "title"},
        },
    ]
    direct = WorkflowRunner(web).run(steps)
    http = WorkflowRunner(
        HttpClient(transport=MiniWebTransport(web))
    ).run(steps)
    d_items = sorted(i["_url"] for i in direct["steps"]["detail"]["items"])
    h_items = sorted(i["_url"] for i in http["steps"]["detail"]["items"])
    assert d_items == h_items and len(h_items) > 0
    assert (direct["steps"]["detail"]["success_count"]
            == http["steps"]["detail"]["success_count"])


def test_http_client_pickles_without_opener():
    import pickle

    from crawler_ray.stages.http_fetch import HttpClient

    c = HttpClient(timeout=5.0, headers={"X": "1"})
    c._ensure_opener()
    c.extras.append(("u", -1, ""))
    c2 = pickle.loads(pickle.dumps(c))
    assert c2._opener is None and c2._jar is None and c2.extras == []
    assert c2.timeout == 5.0 and c2.headers["X"] == "1"
    assert c2._ensure_opener() is not None  # rebuilds lazily


def test_robots_fetched_over_http_client():
    from crawler_ray.state.robots import RobotsPolicy
    from crawler_ray.stages.http_fetch import HttpClient

    def site(request):
        url = request["url"]
        if url == "https://a.test/robots.txt":
            return 200, "Disallow: /private\n", {}
        if url == "https://b.test/robots.txt":
            return 404, "not here", {}
        raise AssertionError(url)

    pol = RobotsPolicy.fetched(
        ["a.test", "b.test", "a.test"], HttpClient(transport=site)
    )
    assert not pol.allowed("https://a.test/private/x")
    assert pol.allowed("https://a.test/public")
    assert pol.allowed("https://b.test/private/x")  # 404 robots = allow-all


def test_real_http_crawl_with_explicit_seeds_and_fetched_robots(ray_session):
    # web=None end-to-end: seeds + live-fetched robots + HTTP transport —
    # the CLI's "real crawl" configuration, against a scripted site
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.state.robots import RobotsPolicy
    from crawler_ray.stages.http_fetch import HttpClient

    PAGES = {
        "https://site.test/robots.txt": "Disallow: /private\n",
        "https://site.test/": (
            "<html><title>Home</title><body>"
            '<a href="/a">a</a> <a href="/private/x">p</a></body></html>'
        ),
        "https://site.test/a": (
            "<html><title>A</title><body><p>leaf</p></body></html>"
        ),
        "https://site.test/private/x": (
            "<html><title>P</title><body><p>secret</p></body></html>"
        ),
    }
    fetched_urls: list[str] = []

    class Site:
        def __call__(self, request):
            fetched_urls.append(request["url"])
            body = PAGES.get(request["url"])
            return (200, body, {}) if body is not None else (404, "", {})

    robots = RobotsPolicy.fetched(["site.test"], HttpClient(transport=Site()))
    res = CrawlEngine(
        None, seeds=["https://site.test/"], robots=robots,
        budget_per_host=4, max_rounds=5, seen_shards=2,
        fetch_backend="http", http_transport=Site(),
    ).run()
    urls = [r["url"] for r in res.pages.take_all()]
    assert "https://site.test/" in urls and "https://site.test/a" in urls
    assert all("/private/" not in u for u in urls)


def test_threaded_waves_overlap_and_preserve_order():
    # connections>1 in pure budget mode runs the wave on a thread pool:
    # wall must beat sequential, outputs stay in row order, extras aligned
    import threading
    import time as _t

    lock = threading.Lock()
    inflight = {"now": 0, "max": 0}

    def slow_site(request):
        with lock:
            inflight["now"] += 1
            inflight["max"] = max(inflight["max"], inflight["now"])
        _t.sleep(0.05)
        with lock:
            inflight["now"] -= 1
        i = request["url"].rsplit("/", 1)[1]
        return 200, f"page-{i}", {"Retry-After": i}

    f = HttpFetcher(transport=slow_site, connections=4, extended=True)
    urls = [f"http://w.test/{i}" for i in range(12)]
    t0 = _t.perf_counter()
    out = f(_batch(urls, hosts=["w"] * 12))
    wall = _t.perf_counter() - t0
    assert out["html"].to_pylist() == [f"page-{i}" for i in range(12)]
    assert out["retry_after_sec"].to_pylist() == list(range(12))
    assert inflight["max"] >= 2          # genuinely concurrent
    assert wall < 12 * 0.05              # beats sequential (0.6 s)


def test_redirect_302_demotes_every_non_head_method():
    # httpx _client.py: "Turn 302s into GETs" applies to PUT/DELETE too
    tr = RecordingTransport([
        (302, "", {"Location": "/found"}),
        (200, "ok", {}),
    ])
    f = HttpFetcher(transport=tr, http_method="PUT", data="payload")
    f(_batch(["http://ex.test/doc"]))
    assert tr.requests[1]["method"] == "GET"
    assert tr.requests[1]["body"] is None

    tr2 = RecordingTransport([
        (302, "", {"Location": "/found"}),
        (200, "", {}),
    ])
    f2 = HttpFetcher(transport=tr2, http_method="HEAD")
    f2(_batch(["http://ex.test/doc"]))
    assert tr2.requests[1]["method"] == "HEAD"


def test_robots_fetched_for_seeds_uses_seed_scheme():
    from crawler_ray.state.robots import RobotsPolicy
    from crawler_ray.stages.http_fetch import HttpClient

    asked: list[str] = []

    def site(request):
        asked.append(request["url"])
        if request["url"] == "http://plain.test/robots.txt":
            return 200, "Disallow: /x\n", {}
        return 200, "", {}

    pol = RobotsPolicy.fetched_for_seeds(
        ["http://plain.test/start", "https://tls.test/start"],
        HttpClient(transport=site),
    )
    assert "http://plain.test/robots.txt" in asked
    assert "https://tls.test/robots.txt" in asked
    assert not pol.allowed("http://plain.test/x/1")
    assert pol.allowed("https://tls.test/anything")


def test_engine_rejects_empty_seed_list():
    from crawler_ray.pipelines.crawl import CrawlEngine

    with pytest.raises(ValueError, match="non-empty seeds"):
        CrawlEngine(None, seeds=[], fetch_backend="http")
    with pytest.raises(ValueError, match="non-empty seeds"):
        CrawlEngine(None, fetch_backend="http")


def test_cli_rejects_http_without_seeds(tmp_path):
    import json as _json

    from crawler_ray.run import main

    cfgp = tmp_path / "job.json"
    cfgp.write_text(_json.dumps({"kind": "crawl", "fetch_backend": "http"}))
    with pytest.raises(SystemExit, match="requires non-empty"):
        main(["--config", str(cfgp), "--output", str(tmp_path / "out")])
