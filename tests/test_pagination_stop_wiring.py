"""Early-stop pagination wiring (VERDICT r3 missing #1).

The paginated crawl step must fetch pages IN ORDER and terminate the chain
on the reference's stop conditions (circular URL, identical content,
consecutive near-empty pages, 404/403/5xx) — matching
``/root/reference/crawler/services/pagination.py:213-252``: the stopping
page is never yielded, and NO later page is fetched.  ``pages_fetched`` in
the step metadata is the chain's fetch counter, asserted here against the
reference's sequential loop count.
"""

from crawler_ray.pipelines.workflow import WorkflowRunner
from crawler_ray.sources.miniweb import PagedStubWeb as FakePagedWeb


def _run(web, max_pages, **pag_extra):
    runner = WorkflowRunner(web)
    ctx = runner.run(
        [
            {
                "name": "daftar",
                "type": "crawl",
                "config": {
                    "seed_url": "https://site.example.id/list?page=1",
                    "pagination": {"enabled": True, "max_pages": max_pages,
                                   **pag_extra},
                },
            }
        ]
    )
    return ctx["steps"]["daftar"]["_crawl_metadata"]


def _reference_loop(web, urls, min_len=100, max_empty=2):
    """The reference's sequential stop-detection loop, run directly against
    the same StopScan kernel — the golden for the chain semantics."""
    from crawler_ray.functions.pagination import StopScan

    scan = StopScan(min_content_length=min_len, max_empty_responses=max_empty)
    fetches = 0
    yielded = []
    for u in urls:
        status, body = web.fetch(u, 0)
        fetches += 1
        stop, reason = scan.check(status, body or "", u)
        if stop:
            return fetches, yielded, reason
        yielded.append((u, status, body))
    return fetches, yielded, ""


def test_identical_content_stops_the_chain(ray_session):
    """3 real pages, max_pages=100: page 4 repeats page 3's content ->
    duplicate-content stop at the 4th fetch, exactly like the reference."""
    from crawler_ray.functions.pagination import detect_pattern

    gold_web = FakePagedWeb(real_pages=3, mode="identical")
    seed = "https://site.example.id/list?page=1"
    urls = [seed] + detect_pattern(seed).pages(seed, max_pages=100)
    gold_fetches, gold_yielded, gold_reason = _reference_loop(gold_web, urls)
    assert gold_fetches == 4 and len(gold_yielded) == 3
    assert "Duplicate content" in gold_reason

    web = FakePagedWeb(real_pages=3, mode="identical")
    meta = _run(web, max_pages=100)
    assert meta["pages_fetched"] == gold_fetches        # NOT 100
    assert meta["pages_crawled"] == len(gold_yielded)
    assert meta["pages_planned"] == 100
    assert meta["stop_reason"] == gold_reason


def test_empty_page_run_stops_the_chain(ray_session):
    """Pages past the end serve near-empty 200s: the second consecutive
    empty page triggers the stop; the FIRST empty page is still yielded
    (reference: check happens before yield, stop only at the threshold)."""
    gold_web = FakePagedWeb(real_pages=3, mode="empty")
    from crawler_ray.functions.pagination import detect_pattern

    seed = "https://site.example.id/list?page=1"
    urls = [seed] + detect_pattern(seed).pages(seed, max_pages=50)
    gold_fetches, gold_yielded, gold_reason = _reference_loop(gold_web, urls)
    assert gold_fetches == 5 and len(gold_yielded) == 4
    assert "consecutive empty" in gold_reason

    meta = _run(FakePagedWeb(real_pages=3, mode="empty"), max_pages=50)
    assert meta["pages_fetched"] == gold_fetches
    assert meta["pages_crawled"] == len(gold_yielded)
    assert meta["stop_reason"] == gold_reason


def test_circular_pagination_stops_the_chain(ray_session):
    """A chain whose URL list revisits an earlier URL (selector-follow /
    redirect loops produce these) stops at the revisit — drive the chain
    kernel directly with a duplicated URL."""
    from crawler_ray.pipelines.workflow import _pagination_chain

    web = FakePagedWeb(real_pages=5, mode="ok404")
    urls = [
        "https://site.example.id/list?page=1",
        "https://site.example.id/list?page=2",
        "https://site.example.id/list?page=1",   # loop back
        "https://site.example.id/list?page=3",   # never reached
    ]
    meta, table = _pagination_chain(web, urls, 100, 2)
    assert meta["pages_fetched"] == 3
    assert "Circular pagination" in meta["stop_reason"]
    assert table.num_rows == 2  # the revisited page is not yielded


def test_template_strategy_matches_reference_url_list(ray_session):
    """url_template defines the page list OUTRIGHT: generate
    start_page..max_pages and do NOT prepend the seed
    (reference services/pagination.py:76-101 generate_range)."""
    web = FakePagedWeb(real_pages=3, mode="ok404")
    meta = _run(
        web, max_pages=5,
        url_template="https://site.example.id/list?page={page}",
        start_page=2,
    )
    # planned = pages 2..5 (4 urls, seed NOT prepended); pages 2,3 OK,
    # page 4 404s -> stop at the 3rd fetch
    assert meta["pagination_strategy"] == "template"
    assert meta["pages_planned"] == 4
    assert meta["pages_fetched"] == 3
    assert meta["pages_crawled"] == 2


def test_selector_strategy_single_page_with_warning(ray_session):
    """No detectable pattern + a pagination selector: seed-only crawl with
    the reference's warning (seed_url_crawler.py:759-779)."""
    runner = WorkflowRunner(FakePagedWeb(real_pages=3, mode="ok404"))
    ctx = runner.run(
        [
            {
                "name": "daftar",
                "type": "crawl",
                "config": {
                    # path has no page carrier -> detect_pattern -> None
                    "seed_url": "https://site.example.id/list",
                    "pagination": {"enabled": True, "max_pages": 10,
                                   "selector": "a.next::attr(href)"},
                },
            }
        ]
    )
    out = ctx["steps"]["daftar"]
    meta = out["_crawl_metadata"]
    assert meta["pagination_strategy"] == "selector"
    assert meta["pages_planned"] == 1
    assert any("no additional pages" in w for w in out["_warnings"])


def test_404_stop_and_opt_out(ray_session):
    """Truncation case: 404 at page 4 stops at the 4th fetch; with
    stop_detection disabled the step fetches the whole planned list."""
    meta = _run(FakePagedWeb(real_pages=3, mode="ok404"), max_pages=20)
    assert meta["pages_fetched"] == 4
    assert meta["pages_crawled"] == 3
    assert "404" in meta["stop_reason"]

    web = FakePagedWeb(real_pages=3, mode="ok404")
    meta = _run(web, max_pages=20, stop_detection=False)
    assert "pages_fetched" not in meta
    assert meta["pages_planned"] == 20
    assert meta["pages_crawled"] == 3      # successes only
    assert meta["pages_failed"] == 17
