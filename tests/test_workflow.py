"""Workflow orchestration over the mini-web: validation, crawl->scrape data
passing, conditions, ordering quirks (reference integration suite analogue:
tests/integration/test_step_orchestrator.py)."""

import pytest

from crawler_ray.pipelines.workflow import Step, WorkflowRunner, validate_workflow
from crawler_ray.sources.miniweb import MiniWeb

WEB = MiniWeb(n_docs=30, n_hosts=2)
SEED = "https://putusan.example.id/list?page=1"


class TestValidation:
    def test_topo_order(self):
        steps = [
            Step("c", "scrape", input_from="b.items"),
            Step("a", "crawl"),
            Step("b", "scrape", input_from="a.urls"),
        ]
        assert [s.name for s in validate_workflow(steps)] == ["a", "b", "c"]

    def test_duplicate_names(self):
        with pytest.raises(ValueError, match="duplicate"):
            validate_workflow([Step("a", "crawl"), Step("a", "crawl")])

    def test_missing_dep(self):
        with pytest.raises(ValueError, match="unknown"):
            validate_workflow([Step("a", "scrape", input_from="nope.items")])

    def test_cycle(self):
        with pytest.raises(ValueError, match="cycle"):
            validate_workflow(
                [Step("a", "crawl", depends_on=["b"]), Step("b", "crawl", depends_on=["a"])]
            )


@pytest.fixture(scope="module")
def crawl_scrape_result(ray_session):
    runner = WorkflowRunner(WEB)
    return runner.run(
        [
            {
                "name": "daftar",
                "type": "crawl",
                "config": {
                    "seed_url": SEED,
                    "pagination": {"enabled": True, "max_pages": 3},
                },
                "selectors": {"urls": {"selector": "a::attr(href)", "multiple": True}},
            },
            {
                "name": "detail",
                "type": "scrape",
                "input_from": "daftar.urls",
                "selectors": {
                    "title": "title",
                    "paragraphs": {"selector": "article p", "multiple": True},
                },
            },
        ],
    )


def test_crawl_step_outputs(crawl_scrape_result):
    out = crawl_scrape_result["steps"]["daftar"]
    meta = out["_crawl_metadata"]
    # the mega-host has 15 docs / 10-per-list = 2 real list pages: the
    # in-order chain fetches p1, p2 (both OK), then p3 404s -> early stop.
    # pages_crawled counts SUCCESSES (reference crawl_executor.py:148-171),
    # pages_fetched counts attempts including the stopping page.
    assert meta["pages_crawled"] == 2
    assert meta["pages_failed"] == 0
    assert meta["pages_planned"] == 3
    assert meta["pages_fetched"] == 3
    assert "404" in meta["stop_reason"]
    urls = out["urls"]
    assert len(urls) == len(set(urls))  # first-wins distinct
    assert any("/doc/" in u for u in urls)
    # order-preserving: a url discovered on page 1 precedes page-2-only urls
    assert urls == sorted(urls, key=lambda u: urls.index(u))


def test_scrape_step_items(crawl_scrape_result):
    out = crawl_scrape_result["steps"]["detail"]
    assert out["success_count"] > 0
    assert len(out["errors"]) <= 5
    item = next(i for i in out["items"] if "/doc/" in i["_url"])
    assert item["title"].startswith("Dokumen")
    assert len(item["paragraphs"]) >= 1


def test_execution_order(crawl_scrape_result):
    assert crawl_scrape_result["execution_order"] == ["daftar", "detail"]


def test_conditions_and_variables(ray_session):
    runner = WorkflowRunner(WEB)
    ctx = runner.run(
        [
            {
                "name": "crawl1",
                "type": "crawl",
                "config": {"seed_url": "https://{{host}}/list?page=1"},
            },
            {
                "name": "never",
                "type": "scrape",
                "input_from": "crawl1.urls",
                "skip_if": "{{crawl1._crawl_metadata.total_urls}} exists",
            },
            {
                "name": "always",
                "type": "scrape",
                "input_from": "crawl1.urls",
                "run_only_if": "{{crawl1._crawl_metadata.pages_crawled}} == '1'",
            },
        ],
        variables={"host": "host1.example.id"},
    )
    assert ctx["metadata"]["never"]["skipped"] is True
    assert ctx["metadata"]["always"]["skipped"] is False
    assert "always" in ctx["steps"]


def _two_step_workflow(extra_scrape_cfg=None):
    return [
        {
            "name": "daftar",
            "type": "crawl",
            "config": {
                "seed_url": SEED,
                "pagination": {"enabled": True, "max_pages": 3},
            },
            "selectors": {"urls": {"selector": "a::attr(href)", "multiple": True}},
        },
        {
            "name": "detail",
            "type": "scrape",
            "input_from": "daftar.urls",
            "config": dict(extra_scrape_cfg or {}),
            "selectors": {
                "title": "title",
                "paragraphs": {"selector": "article p", "multiple": True},
            },
        },
    ]


def test_scrape_dataset_mode_identical_items(ray_session):
    """Opt-in ``{"output": "dataset"}`` scrape keeps items distributed: the
    result carries an ``items_ds`` Dataset with byte-identical rows to list
    mode, and the driver collects only O(blocks) counters + <= 5 error
    samples (never the items)."""
    import json

    list_runner = WorkflowRunner(WEB)
    ds_runner = WorkflowRunner(WEB)
    out_list = list_runner.run(_two_step_workflow())["steps"]["detail"]
    out_ds = ds_runner.run(
        _two_step_workflow({"output": "dataset"})
    )["steps"]["detail"]

    assert out_ds["items"] is None
    rows = out_ds["items_ds"].take_all()
    ds_items = [json.loads(r["item"]) for r in rows if r["item"] is not None]
    assert ds_items == out_list["items"]
    assert out_ds["success_count"] == out_list["success_count"]
    assert out_ds["error_count"] == out_list["error_count"]
    assert out_ds["errors"] == out_list["errors"]
    assert out_ds["error_categories"] == out_list["error_categories"]
    # the list-mode runner pulled every item row; dataset mode pulled only
    # per-block counters and bounded error samples
    n_rows = out_list["success_count"] + out_list["error_count"]
    assert list_runner._driver_items >= n_rows
    assert ds_runner._driver_items < n_rows
    assert ds_runner._driver_items <= 64 + 5  # blocks cap + error samples


def test_scrape_error_categories_with_custom_rules(ray_session):
    """WorkflowRunner accepts an ErrorClassificationRule list (reference
    retry_policy.py:364-516); matched failures carry the rule's category in
    error_categories, unmatched ones the standard classifier's."""
    from crawler_ray.functions.backoff import ErrorClassificationRule

    rules = [
        ErrorClassificationRule(
            "gone-forever", lambda e, s: s == 404, "gone_forever",
            "this site's 404s never recover", is_retryable=False,
        ),
    ]
    web = MiniWeb(n_docs=30, n_hosts=2, dead_link_every=2)
    base = WorkflowRunner(web).run(_two_step_workflow())["steps"]["detail"]
    ruled = WorkflowRunner(web, classification_rules=rules).run(
        _two_step_workflow()
    )["steps"]["detail"]
    assert base["error_count"] == ruled["error_count"]
    assert base["error_categories"].get("not_found", 0) > 0
    assert "not_found" not in ruled["error_categories"]
    assert ruled["error_categories"]["gone_forever"] == base[
        "error_categories"
    ]["not_found"]


def test_workflow_cancellation_between_steps(ray_session):
    """Cancellation polls BETWEEN steps (reference step_orchestrator.py:
    149-167): completed steps stay in the context, the first step after the
    flag flips is marked cancelled and nothing beyond it runs."""
    flags = {"cancel": False}

    def cancel_check():
        return flags["cancel"]

    runner = WorkflowRunner(WEB, cancel_check=cancel_check)
    steps = _two_step_workflow()

    # uncancelled baseline: both steps run
    ctx = runner.run(steps)
    assert ctx["execution_order"] == ["daftar", "detail"]
    assert "cancelled" not in ctx["metadata"]

    # flip the flag after the first step completes: the crawl step's output
    # survives, the scrape step never runs
    class FlipAfterFirst:
        def __init__(self):
            self.calls = 0

        def __call__(self):
            self.calls += 1
            return self.calls > 1  # False before step 1, True before step 2

    runner = WorkflowRunner(WEB, cancel_check=FlipAfterFirst())
    ctx = runner.run(steps)
    assert ctx["execution_order"] == ["daftar"]
    assert ctx["metadata"]["cancelled"] is True
    assert ctx["metadata"]["detail"] == {"skipped": True, "reason": "cancelled"}
    assert "daftar" in ctx["steps"] and "detail" not in ctx["steps"]
