"""JSON-API fetch path (reference S2, api_executor.py:21-229): dot-path
selector navigation over parsed JSON bodies, API-crawl pagination, and the
reference's error semantics (parse failure -> error entry, missing path ->
None)."""

import json

from crawler_ray.functions.selectors import json_path_soft
from crawler_ray.pipelines.workflow import WorkflowRunner
from crawler_ray.sources.miniweb import MiniWeb

WEB = MiniWeb(n_docs=60)
HOST = WEB.hosts()[0]


def test_api_endpoints_shape():
    status, body = WEB.fetch(f"https://{HOST}/api/docs?page=1")
    assert status == 200
    data = json.loads(body)
    assert data["meta"]["page"] == 1
    assert data["meta"]["host"] == HOST
    assert len(data["items"]) == WEB.details_per_list
    # JSON title matches the HTML <title> of the same doc
    _, html = WEB.fetch(data["items"][0]["url"])
    assert data["items"][0]["title"] in html
    # detail endpoint mirrors the HTML paragraphs
    status, detail = WEB.fetch(data["items"][0]["api_url"])
    assert status == 200
    d = json.loads(detail)
    assert d["paragraphs"] == WEB.doc_body_paragraphs(HOST, d["id"])
    assert d["meta"]["n_paragraphs"] == len(d["paragraphs"])
    # out-of-range pages/docs 404
    assert WEB.fetch(f"https://{HOST}/api/docs?page=9999")[0] == 404
    assert WEB.fetch(f"https://{HOST}/api/doc/99999")[0] == 404


def test_json_path_soft_reference_semantics():
    data = {"data": {"items": [{"title": "Hello"}]}}
    assert json_path_soft(data, "data.items.0.title") == "Hello"
    assert json_path_soft(data, "data.items.5.title") is None   # OOB index
    assert json_path_soft(data, "data.missing.x") is None       # missing key
    assert json_path_soft(data, "data.items.title") is None     # non-int on list
    assert json_path_soft(data, "data.items.0.title.deeper") is None
    assert json_path_soft(data, "") == data


def test_api_crawl_collects_item_urls_in_order(ray_session):
    ctx = WorkflowRunner(WEB).run(
        [
            {
                "name": "api", "type": "crawl", "method": "api",
                "config": {
                    "seed_url": f"https://{HOST}/api/docs?page=1",
                    "pagination": {"enabled": True, "max_pages": 3},
                },
                "selectors": {"urls": "items"},
            }
        ]
    )
    urls = ctx["steps"]["api"]["urls"]
    expected = []
    for page in (1, 2, 3):
        status, body = WEB.fetch(f"https://{HOST}/api/docs?page={page}")
        if status != 200:
            continue
        for item in json.loads(body)["items"]:
            if item["url"] not in expected:
                expected.append(item["url"])
    assert urls == expected
    assert ctx["steps"]["api"]["_crawl_metadata"]["total_urls"] == len(expected)


def test_api_crawl_to_api_scrape_dot_paths(ray_session):
    """API crawl via item_url_key -> API scrape with nested dot-path
    selectors, incl. missing-path -> None and flaky-500 error entries."""
    ctx = WorkflowRunner(WEB).run(
        [
            {
                "name": "listing", "type": "crawl", "method": "api",
                "config": {
                    "seed_url": f"https://{HOST}/api/docs?page=1",
                    "pagination": {"enabled": True, "max_pages": 2},
                    "item_url_key": "api_url",
                },
                "selectors": {"urls": "items"},
            },
            {
                "name": "detail", "type": "scrape", "method": "api",
                "input_from": "listing.urls",
                "selectors": {
                    "title": "title",
                    "n_paragraphs": "meta.n_paragraphs",
                    "first_para": "paragraphs.0",
                    "nope": "does.not.exist",
                },
            },
        ]
    )
    urls = ctx["steps"]["listing"]["urls"]
    assert all("/api/doc/" in u for u in urls)
    out = ctx["steps"]["detail"]
    # sequential expectation
    exp_items, exp_errs = [], []
    for u in urls:
        status, body = WEB.fetch(u, retry_count=0)
        if status != 200 or not body:
            exp_errs.append(u)
            continue
        d = json.loads(body)
        exp_items.append(
            {"_url": u, "title": d["title"],
             "n_paragraphs": d["meta"]["n_paragraphs"],
             "first_para": d["paragraphs"][0], "nope": None}
        )
    assert out["items"] == exp_items
    assert out["error_count"] == len(exp_errs)
    assert all(v["nope"] is None for v in out["items"])


def test_api_scrape_on_html_body_records_parse_errors(ray_session):
    ctx = WorkflowRunner(WEB).run(
        [
            {
                "name": "seeds", "type": "crawl", "method": "api",
                "config": {"seed_url": f"https://{HOST}/api/docs?page=1"},
                "selectors": {"urls": "items"},   # item url -> HTML pages
            },
            {
                "name": "api_pages", "type": "scrape", "method": "api",
                "input_from": "seeds.urls",
                "selectors": {"title": "nope.not.there"},
            },
        ]
    )
    out = ctx["steps"]["api_pages"]
    n_urls = len(ctx["steps"]["seeds"]["urls"])
    assert out["success_count"] == 0
    # HTML bodies fail JSON parsing (flaky docs may 500 -> HTTP error instead)
    assert out["error_count"] == n_urls
    assert any("Failed to parse JSON" in e for e in out["errors"])
    assert len(out["errors"]) <= 5  # reference truncation
