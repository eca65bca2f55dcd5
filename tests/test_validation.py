"""Step I/O validation conformance (reference M11,
step_validator.py:41-360): typed per-step-type input/output checks with
reference error messages, plus the quarantine path for invalid rows."""

import pytest

from crawler_ray.functions.validation import (
    StepValidationError,
    StepValidator,
    partition_valid_urls,
)
from crawler_ray.pipelines.workflow import WorkflowRunner
from crawler_ray.sources.miniweb import MiniWeb

WEB = MiniWeb(n_docs=20, n_hosts=2)
HOST = WEB.hosts()[0]
V = StepValidator()


# --------------------------------------------------------------- unit level
def test_crawl_input_rules():
    assert V.validate_input("s", "crawl", "https://x/") == []
    assert V.validate_input("s", "crawl", ["https://x/", "ignored"]) == []
    for bad, msg in [
        ("", "URL cannot be empty string"),
        ([], "URL list cannot be empty"),
        ([42], "First URL in list must be a string"),
        (["  "], "First URL in list cannot be empty string"),
    ]:
        with pytest.raises(StepValidationError) as e:
            V.validate_input("daftar", "crawl", bad)
        assert msg in str(e.value)
        assert "Step 'daftar' input validation failed" in str(e.value)


def test_scrape_input_rules():
    assert V.validate_input("s", "scrape", ["https://a/", "https://b/"]) == []
    with pytest.raises(StepValidationError) as e:
        V.validate_input("detail", "scrape", ["https://a/", 7, " "])
    m = str(e.value)
    assert "URL at index 1 must be a string, got int" in m
    assert "URL at index 2 cannot be empty string" in m


def test_selector_shape_rules():
    with pytest.raises(StepValidationError) as e:
        V.validate_input("s", "scrape", ["https://a/"],
                         selectors={"t": "", "p": {"multiple": True}, "x": 5})
    m = str(e.value)
    assert "Selector 't' cannot be empty string" in m
    assert "Selector 'p' must have a non-empty 'selector' string" in m
    assert "Selector 'x' must be a string or dict, got int" in m


def test_output_rules():
    assert V.validate_output("s", "crawl", {"urls": []}, {"pages_crawled": 1}) == []
    with pytest.raises(StepValidationError):
        V.validate_output("s", "crawl", {}, {})           # no extracted field
    with pytest.raises(StepValidationError):
        V.validate_output("s", "scrape", {"items": "nope"})  # items not a list
    with pytest.raises(StepValidationError) as e:
        V.validate_output("s", "scrape", {"items": []},
                          {"total_urls": 3, "successful_urls": -1,
                           "failed_urls": 1})
    assert "must be a non-negative integer" in str(e.value)
    # strict=False returns the error list instead of raising
    errs = V.validate_output("s", "crawl", {}, {}, strict=False)
    assert errs == ["Crawl step must extract at least one field"]


def test_partition_valid_urls_quarantine():
    valid, quarantined = partition_valid_urls(["https://a/", 7, "", "https://b/"])
    assert valid == ["https://a/", "https://b/"]
    assert [q["index"] for q in quarantined] == [1, 2]
    assert "must be a string" in quarantined[0]["reason"]


# ----------------------------------------------------------- workflow level
def test_workflow_rejects_empty_seed_url(ray_session):
    with pytest.raises(StepValidationError) as e:
        WorkflowRunner(WEB).run(
            [{"name": "daftar", "type": "crawl",
              "config": {"seed_url": "   "}}]
        )
    assert "input validation failed" in str(e.value)


def test_workflow_rejects_malformed_selector(ray_session):
    with pytest.raises(StepValidationError) as e:
        WorkflowRunner(WEB).run(
            [
                {"name": "daftar", "type": "crawl",
                 "config": {"seed_url": f"https://{HOST}/list?page=1"}},
                {"name": "detail", "type": "scrape", "input_from": "daftar.urls",
                 "selectors": {"title": {"multiple": True}}},
            ]
        )
    assert "Selector 'title' must have a non-empty 'selector' string" in str(e.value)


def test_workflow_quarantines_invalid_rows(ray_session):
    """Quarantine mode: bad rows are reported in the step output, good rows
    still scraped — the distributed alternative to failing the whole step
    (without the flag, the same input raises StepValidationError)."""
    from crawler_ray.pipelines.workflow import Step

    runner = WorkflowRunner(WEB)
    good = [f"https://{HOST}/doc/1", f"https://{HOST}/doc/2"]
    poisoned = [good[0], None, "   ", good[1]]
    context = {"steps": {"prev": {"urls": poisoned}}, "variables": {}}

    step = Step(name="detail", type="scrape", input_from="prev.urls",
                config={"quarantine": True}, selectors={"title": "title"})
    out = runner._run_scrape(step, context)
    assert [i["_url"] for i in out["items"]] == good
    assert [q["index"] for q in out["quarantined"]] == [1, 2]
    assert all(i["title"] for i in out["items"])

    strict_step = Step(name="detail", type="scrape", input_from="prev.urls",
                       selectors={"title": "title"})
    with pytest.raises(StepValidationError) as e:
        runner._run_scrape(strict_step, context)
    assert "URL at index 1 must be a string" in str(e.value)
