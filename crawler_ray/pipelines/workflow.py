"""Declarative multi-step workflow execution (the reference's user-facing
pipeline API) on Ray Data.

Reference lifecycle (``/root/reference/crawler/services/step_orchestrator.py:
122-180``, §3.1 of SURVEY.md): a job is a list of step dicts (type crawl |
scrape, method, config, selectors, input_from, skip_if / run_only_if);
steps are validated + topologically ordered (Kahn,
``dependency_validator.py:181-226``), then run sequentially, threading a
context of variables + step outputs.  Inside a step the reference fetches
URLs with asyncio batches of 100 (``scrape_executor.py:46,125-144``); here a
step IS a Ray Dataset pipeline (``map_batches`` fetch + selector
extraction), so intra-step parallelism is the cluster, while step ordering
stays sequential (it is a data dependency).

Reference quirks preserved deliberately:
- a crawl step uses only the FIRST seed of a list
  (``crawl_executor.py:101-117``);
- crawl-step URL dedup is ORDER-PRESERVING first-wins
  (``crawl_executor.py:173-174``: ``list(dict.fromkeys(urls))`` — here keyed
  by (page_idx, dom_idx) so the distributed result is identical);
- scrape errors keep only the first 5 messages
  (``scrape_executor.py:209-211``);
- when ``skip_if`` is present it alone decides (``run_only_if`` ignored);
  condition-evaluation errors yield False, meaning run for skip_if but
  skip for run_only_if (``step_orchestrator.py:389-444`` +
  ``condition_evaluator.py:80-88``).

Scale note: step outputs (URL lists / item lists) live in the driver context
exactly as the reference holds them in its StepExecutionContext — bounded by
pagination caps and page size.  Unbounded-frontier crawling is the flagship
:mod:`crawler_ray.pipelines.crawl` engine, not this API.
"""

from __future__ import annotations

import json
import time
from collections import Counter
from dataclasses import dataclass, field as dc_field
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crawler_ray.functions import html as H
from crawler_ray.functions.conditions import should_run
from crawler_ray.functions.pagination import (
    StopScan,
    detect_pattern,
    pagination_strategy,
    template_pattern,
)
from crawler_ray.functions.selectors import extract_fields, json_path, json_path_soft
from crawler_ray.functions.validation import StepValidator, partition_valid_urls
from crawler_ray.functions.variables import resolve
from crawler_ray.stages.fetch import SyntheticFetcher

SCRAPE_FETCH_BATCH = 100  # reference scrape gather batch (scrape_executor.py:46)


def _pagination_chain(web, urls: list[str], min_content_length: int,
                      max_empty_responses: int):
    """Sequential pagination chain with early stop — the reference's
    ``PaginationService.crawl_with_stop_detection`` loop
    (``/root/reference/crawler/services/pagination.py:213-252``): pages are
    fetched strictly IN ORDER; every response runs through the stop
    detector (404/403/5xx, circular URL, identical content, consecutive
    near-empty pages); the page that triggers the stop is NOT yielded and
    no later page is fetched.  The chain's sequential state (StopScan)
    lives in this one task — SURVEY §7.4: per-chain state never goes in a
    stateless map.

    Runs as a Ray task with ``num_returns=2``: (meta, yielded-pages Arrow
    table) — the table stays in the object store for ``from_arrow_refs``.
    """
    fetcher = SyntheticFetcher(web)
    scan = StopScan(min_content_length=min_content_length,
                    max_empty_responses=max_empty_responses)
    cols = {"url": [], "host": [], "retry_count": [], "page_idx": [],
            "status": [], "html": []}
    fetches = 0
    stop_reason = ""
    for i, u in enumerate(urls):
        host = u.split("/", 3)[2].lower() if "://" in u else ""
        res = fetcher(pa.table(
            {
                "url": pa.array([u], type=pa.string()),
                "host": pa.array([host], type=pa.string()),
                "retry_count": pa.array([0], type=pa.int32()),
                "page_idx": pa.array([i], type=pa.int64()),
            }
        ))
        fetches += 1
        status = res["status"][0].as_py()
        html = res["html"][0].as_py() or ""
        stop, reason = scan.check(status, html, u)
        if stop:
            stop_reason = reason
            break
        cols["url"].append(u)
        cols["host"].append(host)
        cols["retry_count"].append(0)
        cols["page_idx"].append(i)
        cols["status"].append(status)
        cols["html"].append(html)
    table = pa.table(
        {
            "url": pa.array(cols["url"], type=pa.string()),
            "host": pa.array(cols["host"], type=pa.string()),
            "retry_count": pa.array(cols["retry_count"], type=pa.int32()),
            "page_idx": pa.array(cols["page_idx"], type=pa.int64()),
            "status": pa.array(cols["status"], type=pa.int32()),
            "html": pa.array(cols["html"], type=pa.string()),
        }
    )
    return {"pages_fetched": fetches, "stop_reason": stop_reason}, table


@dataclass
class Step:
    name: str
    type: str                       # crawl | scrape
    method: str = "http"            # http | api (browser -> unsupported here)
    config: dict = dc_field(default_factory=dict)
    selectors: dict = dc_field(default_factory=dict)
    input_from: str = ""            # "step.field" dot path
    skip_if: str = ""
    run_only_if: str = ""
    depends_on: list[str] = dc_field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "Step":
        return cls(
            name=d["name"], type=d["type"], method=d.get("method", "http"),
            config=d.get("config", {}), selectors=d.get("selectors", {}),
            input_from=d.get("input_from", ""), skip_if=d.get("skip_if", ""),
            run_only_if=d.get("run_only_if", ""),
            depends_on=list(d.get("depends_on", [])),
        )


def validate_workflow(steps: list[Step]) -> list[Step]:
    """Kahn topological order; duplicate names, unknown deps, and cycles
    raise ValueError (dependency_validator.py:27-226)."""
    names = [s.name for s in steps]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate step names: {dupes}")
    deps: dict[str, set[str]] = {}
    for s in steps:
        wanted = set(s.depends_on)
        if s.input_from:
            wanted.add(s.input_from.split(".")[0])
        missing = wanted - set(names)
        if missing:
            raise ValueError(f"step '{s.name}' depends on unknown steps: {sorted(missing)}")
        deps[s.name] = wanted
    order: list[Step] = []
    ready = [s for s in steps if not deps[s.name]]
    done: set[str] = set()
    while ready:
        s = ready.pop(0)
        order.append(s)
        done.add(s.name)
        for t in steps:
            if t.name not in done and t not in ready and deps[t.name] <= done:
                ready.append(t)
    if len(order) != len(steps):
        stuck = sorted(set(names) - {s.name for s in order})
        raise ValueError(f"dependency cycle among steps: {stuck}")
    return order


class WorkflowRunner:
    """Executes a validated workflow against a fetch backend: anything
    satisfying ``fetch(url, retry_count) -> (status, html)`` — the
    mini-web in this sandbox, or ``stages/http_fetch.py::HttpClient`` for
    real HTTP (tests/test_http_fetch.py runs this workflow engine through
    HttpClient against a transport-mocked web end-to-end)."""

    def __init__(self, web, fetch_batch_size: int = SCRAPE_FETCH_BATCH,
                 max_pages_default: int = 100,
                 classification_rules=None,
                 cancel_check=None) -> None:
        self.web = web
        self.fetch_batch_size = fetch_batch_size
        self.max_pages_default = max_pages_default
        # cooperative cancellation polled between steps (reference
        # JobCancellationFlag, step_orchestrator.py:149-167)
        self.cancel_check = cancel_check
        # user-extension seam (reference retry_policy.py:364-516): custom
        # ErrorClassificationRule list applied — first match wins — when
        # classifying failed fetches in scrape steps; falls back to the
        # standard status classifier.  Evaluated per DISTINCT status inside
        # each batch, never per row.
        self.classification_rules = list(classification_rules or [])
        # diagnostic: per-item rows collected onto the driver (tests assert
        # dataset-mode scrapes keep this O(error samples), not O(items))
        self._driver_items = 0

    # ------------------------------------------------------------ fetch
    def _fetch_ds(self, urls: list[str]) -> "rd.Dataset":
        tbl = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "host": pa.array(
                    [u.split("/", 3)[2].lower() if "://" in u else "" for u in urls],
                    type=pa.string(),
                ),
                "retry_count": pa.array([0] * len(urls), type=pa.int32()),
                "page_idx": pa.array(range(len(urls)), type=pa.int64()),
            }
        )
        n_blocks = max(1, min(64, len(urls) // max(1, self.fetch_batch_size // 4)))
        web = self.web
        return (
            rd.from_arrow(tbl)
            .repartition(n_blocks)
            .map_batches(
                lambda t, web=web: SyntheticFetcher(web)(t),
                batch_format="pyarrow", batch_size=self.fetch_batch_size,
            )
        )

    # ------------------------------------------------------------ steps
    def _run_crawl(self, step: Step, context: dict, seed_url: str | None) -> dict:
        cfg = step.config
        seeds = cfg.get("seed_urls") or ([cfg["seed_url"]] if cfg.get("seed_url") else [])
        if not seeds and seed_url:
            seeds = [seed_url]
        if not seeds:
            raise ValueError(f"crawl step '{step.name}' has no seed URL")
        # typed input validation (reference M11, step_validator.py:41-72):
        # empty/garbage seeds and malformed selector specs raise
        # StepValidationError before any fetch happens
        StepValidator().validate_input(step.name, "crawl", seeds,
                                       selectors=step.selectors)
        seed = seeds[0]  # reference quirk: first seed only

        pag = cfg.get("pagination", {})
        strategy = pagination_strategy(seed, pag)
        urls = [seed]
        if strategy == "template":
            # reference semantics (services/pagination.py:76-101): the
            # template DEFINES the page list — generate start_page..max_pages
            # and do NOT prepend the seed URL
            max_pages = int(pag.get("max_pages", self.max_pages_default))
            start = int(pag.get("start_page", 1))
            pattern = template_pattern(pag["url_template"], start)
            urls = pattern.pages(seed, start=start, max_pages=max_pages)
        elif strategy == "auto_detected":
            # seed + detected pages current+1..max (pagination.py:103-123)
            max_pages = int(pag.get("max_pages", self.max_pages_default))
            urls = [seed] + detect_pattern(seed).pages(seed, max_pages=max_pages)
        # strategy "selector": no URL pattern — seed only; the reference
        # defers DOM-based next-link following to the worker and warns when
        # no additional pages result (seed_url_crawler.py:759-779)

        link_selector = None
        link_field = cfg.get("url_field", "urls")
        for fname, spec in (step.selectors or {}).items():
            link_field = fname
            link_selector = spec
            break

        if step.method == "api":
            # JSON-API crawl: parse each page's body as JSON, navigate the
            # (dot-path) selector to the item list, take each item's URL
            # (string items directly; dict items via cfg["item_url_key"],
            # default "url").  Reference: api_executor.py:21-229 +
            # selector_processor.py:178-226.
            item_path = link_selector if isinstance(link_selector, str) else "items"
            url_key = cfg.get("item_url_key", "url")

            def extract_links_api(t: pa.Table) -> pa.Table:
                import json as _json
                from urllib.parse import urljoin

                rows_page, rows_dom, rows_url = [], [], []
                for url, body, status, pidx in zip(
                    t["url"].to_pylist(), t["html"].to_pylist(),
                    t["status"].to_pylist(), t["page_idx"].to_pylist(),
                ):
                    if status != 200 or not body:
                        continue
                    try:
                        data = _json.loads(body)
                    except ValueError:
                        continue  # reference: JSON parse failure -> error page
                    found = json_path_soft(data, item_path)
                    if not isinstance(found, list):
                        continue
                    for di, item in enumerate(found):
                        link = (
                            item if isinstance(item, str)
                            else (item or {}).get(url_key)
                            if isinstance(item, dict) else None
                        )
                        if not link:
                            continue
                        rows_page.append(pidx)
                        rows_dom.append(di)
                        rows_url.append(urljoin(url, link))
                return pa.table(
                    {
                        "page_idx": pa.array(rows_page, type=pa.int64()),
                        "dom_idx": pa.array(rows_dom, type=pa.int64()),
                        "url": pa.array(rows_url, type=pa.string()),
                    }
                )

        def extract_links(t: pa.Table) -> pa.Table:
            rows_page, rows_dom, rows_url, titles = [], [], [], []
            for url, html_body, status, pidx in zip(
                t["url"].to_pylist(), t["html"].to_pylist(),
                t["status"].to_pylist(), t["page_idx"].to_pylist(),
            ):
                if status != 200 or not html_body:
                    continue
                if link_selector is not None:
                    spec = link_selector if isinstance(link_selector, dict) else {
                        "selector": link_selector, "multiple": True
                    }
                    spec = {**spec, "multiple": True}
                    found = extract_fields(html_body, {"x": spec})["x"]
                else:
                    spans = H.parse_spans(html_body)
                    found = [u for u, _ in H.extract_links(spans, url)]
                from urllib.parse import urljoin

                for di, link in enumerate(found):
                    rows_page.append(pidx)
                    rows_dom.append(di)
                    rows_url.append(urljoin(url, link))
                    titles.append("")
            return pa.table(
                {
                    "page_idx": pa.array(rows_page, type=pa.int64()),
                    "dom_idx": pa.array(rows_dom, type=pa.int64()),
                    "url": pa.array(rows_url, type=pa.string()),
                }
            )

        chain_meta = None
        if (pag.get("enabled") and strategy != "disabled"
                and pag.get("stop_detection", True)):
            # in-order pagination with early stop (SURVEY §2.9 contract;
            # reference services/pagination.py:213-252): ONE sequential
            # task owns the chain's StopScan state, so a site with 3 real
            # pages and max_pages=100 costs ~4 fetches, not 100
            import ray

            meta_ref, tbl_ref = (
                ray.remote(_pagination_chain)
                .options(num_returns=2)
                .remote(
                    self.web, urls,
                    int(pag.get("min_content_length", 100)),
                    int(pag.get("max_empty_responses", 2)),
                )
            )
            chain_meta = ray.get(meta_ref)
            fetched = rd.from_arrow_refs([tbl_ref])
        else:
            # parallel fetch (stop detection disabled / single seed);
            # materialize so the link pass and the status tally below share
            # one fetch execution (politeness: never fetch a page twice)
            fetched = self._fetch_ds(urls).materialize()
        link_fn = extract_links_api if step.method == "api" else extract_links
        links = fetched.map_batches(link_fn, batch_format="pyarrow")
        rows = links.take_all()
        # order-preserving first-wins distinct (crawl_executor.py:173-174)
        rows.sort(key=lambda r: (r["page_idx"], r["dom_idx"]))
        seen: set[str] = set()
        ordered: list[str] = []
        for r in rows:
            if r["url"] not in seen:
                seen.add(r["url"])
                ordered.append(r["url"])
        # per-page success tally (reference crawl_executor.py:148-171
        # counts pages_crawled/pages_failed over fetch RESULTS, not the
        # planned URL list) — bounded by max_pages, blocks already resident
        def _page_tally(t: pa.Table) -> pa.Table:
            ok = pc.fill_null(
                pc.and_(
                    pc.equal(t["status"], 200),
                    pc.not_equal(pc.fill_null(t["html"], ""), ""),
                ),
                False,
            )
            n_ok_ = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
            return pa.table(
                {
                    "n": pa.array([len(t)], type=pa.int64()),
                    "n_ok": pa.array([n_ok_], type=pa.int64()),
                }
            )

        tallies = fetched.map_batches(_page_tally, batch_format="pyarrow").take_all()
        n_pages = sum(r["n"] for r in tallies)
        n_ok = sum(r["n_ok"] for r in tallies)
        crawl_meta = {
            "pages_crawled": n_ok,
            "pages_failed": n_pages - n_ok,
            "pages_planned": len(urls),
            "total_urls": len(ordered),
            "duplicate_urls": len(rows) - len(ordered),
            "pagination_strategy": strategy,
        }
        if chain_meta is not None:
            crawl_meta["pages_fetched"] = chain_meta["pages_fetched"]
            crawl_meta["stop_reason"] = chain_meta["stop_reason"]
        warnings = []
        if strategy == "selector" and n_pages <= 1:
            # reference seed_url_crawler.py:759-779: selector-based
            # pagination is DOM-follow territory the URL generator can't
            # expand — surface the same warning instead of silently
            # single-paging
            warnings.append(
                f"Pagination selector '{pag.get('selector')}' configured "
                "but no additional pages found"
            )
        out = {link_field: ordered, "_crawl_metadata": crawl_meta}
        if warnings:
            out["_warnings"] = warnings
        # typed output validation (step_validator.py:113-143)
        StepValidator().validate_output(
            step.name, "crawl", {link_field: ordered}, out["_crawl_metadata"]
        )
        return out

    def _run_scrape(self, step: Step, context: dict) -> dict:
        if not step.input_from:
            raise ValueError(f"scrape step '{step.name}' needs input_from")
        source = json_path(
            {"steps": context["steps"]}, "steps." + step.input_from
        )
        urls = source if isinstance(source, list) else [source]
        selectors = step.selectors or {}
        # typed input validation (step_validator.py:75-107); quarantine mode
        # (config {"quarantine": true}) splits bad rows out instead of
        # failing the whole distributed step
        quarantined: list[dict] = []
        if step.config.get("quarantine"):
            urls, quarantined = partition_valid_urls(urls)
            # urls already partitioned; still validate the selector specs
            StepValidator().validate_input(step.name, "scrape", None,
                                           selectors=selectors)
        else:
            StepValidator().validate_input(step.name, "scrape", urls,
                                           selectors=selectors)

        method = step.method
        rules = self.classification_rules

        def scrape(t: pa.Table) -> pa.Table:
            import json as _json

            from crawler_ray.functions.backoff import classify_with_custom_rules

            items, errs, cats = [], [], []
            status_cats: dict[int, str] = {}  # classify once per distinct status
            for url, html_body, status in zip(
                t["url"].to_pylist(), t["html"].to_pylist(), t["status"].to_pylist()
            ):
                if status != 200 or not html_body:
                    errs.append(f"HTTP {status}: {url}")
                    if status not in status_cats:
                        status_cats[status] = classify_with_custom_rules(
                            http_status=status, custom_rules=rules
                        )[0]
                    cats.append(status_cats[status])
                    continue
                if method == "api":
                    # JSON body + dot-path selectors (api_executor.py:162-176:
                    # parse failure is an error result, missing paths -> None)
                    try:
                        data = _json.loads(html_body)
                    except ValueError as e:
                        errs.append(f"Failed to parse JSON response: {url}")
                        cats.append(classify_with_custom_rules(
                            exc=e, custom_rules=rules)[0])
                        continue
                    fields = {
                        name: json_path_soft(data, path)
                        for name, path in (selectors or {}).items()
                    }
                else:
                    fields = extract_fields(html_body, selectors) if selectors else {}
                items.append({"_url": url, **{k: v for k, v in fields.items()}})
            return pa.table(
                {
                    "item": pa.array(
                        [_json.dumps(i, ensure_ascii=False) for i in items]
                        + [None] * len(errs),
                        type=pa.string(),
                    ),
                    "error": pa.array([None] * len(items) + errs, type=pa.string()),
                    "error_category": pa.array(
                        [None] * len(items) + cats, type=pa.string()
                    ),
                }
            )

        import json as _json

        out_ds = self._fetch_ds(urls).map_batches(scrape, batch_format="pyarrow")
        if step.config.get("output") == "dataset":
            # Scale mode (opt-in): items stay a distributed Dataset — the
            # driver sees only O(blocks) count rows and <= 5 error samples,
            # never the items themselves.  Identical row content to list
            # mode (tests/test_workflow.py::test_scrape_dataset_mode).
            out_ds = out_ds.materialize()
            count_rows = out_ds.map_batches(
                lambda t: pa.table(
                    {
                        "n_ok": pa.array(
                            [len(t) - t["item"].null_count], pa.int64()
                        ),
                        "n_err": pa.array([t["item"].null_count], pa.int64()),
                        "cats": pa.array(
                            [json.dumps(dict(Counter(
                                c for c in t["error_category"].to_pylist()
                                if c is not None
                            )))],
                            pa.string(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            ).take_all()
            err_rows = out_ds.map_batches(
                lambda t: t.filter(pc.is_valid(t["error"]))
                .select(["error", "error_category"]),
                batch_format="pyarrow",
            ).limit(5).take_all()
            self._driver_items += len(count_rows) + len(err_rows)
            out = {
                "items": None,
                "items_ds": out_ds,
                "success_count": int(sum(r["n_ok"] for r in count_rows)),
                "error_count": int(sum(r["n_err"] for r in count_rows)),
                "errors": [r["error"] for r in err_rows],
                "error_categories": dict(sum(
                    (Counter(json.loads(r["cats"])) for r in count_rows),
                    Counter(),
                )),
                "quarantined": quarantined,
            }
            StepValidator().validate_output(
                step.name, "scrape", {"items": []},
                {"total_urls": len(urls),
                 "successful_urls": out["success_count"],
                 "failed_urls": out["error_count"]},
            )
            return out

        out_rows = out_ds.take_all()
        self._driver_items += len(out_rows)
        items = [_json.loads(r["item"]) for r in out_rows if r["item"] is not None]
        errors = [r["error"] for r in out_rows if r["error"] is not None]
        out = {
            "items": items,
            "success_count": len(items),
            "error_count": len(errors),
            "errors": errors[:5],  # reference truncation (scrape_executor.py:209-211)
            "error_categories": dict(
                Counter(
                    r["error_category"]
                    for r in out_rows
                    if r["error_category"] is not None
                )
            ),
            "quarantined": quarantined,
        }
        # typed output validation (step_validator.py:146-184)
        StepValidator().validate_output(
            step.name, "scrape", {"items": out["items"]},
            {"total_urls": len(urls), "successful_urls": out["success_count"],
             "failed_urls": out["error_count"]},
        )
        return out

    # ------------------------------------------------------------ run
    def run(self, steps: list[Step | dict], seed_url: str | None = None,
            variables: dict | None = None) -> dict:
        steps = [s if isinstance(s, Step) else Step.from_dict(s) for s in steps]
        ordered = validate_workflow(steps)
        context: dict = {"variables": dict(variables or {}), "steps": {},
                         "execution_order": [], "metadata": {}}
        for step_i, step in enumerate(ordered):
            if self.cancel_check is not None and self.cancel_check():
                # reference step_orchestrator.py:149-167: cancellation is
                # polled BETWEEN steps (the <5 s responsiveness target is a
                # between-steps/pages contract); completed steps stay in
                # the context, the remainder is marked cancelled
                context["metadata"]["cancelled"] = True
                # mark EVERY remaining step (not just the next one): a
                # consumer distinguishing cancelled-from-never-defined must
                # find an entry for each unexecuted step
                for rest in ordered[step_i:]:
                    context["metadata"][rest.name] = {
                        "skipped": True, "reason": "cancelled",
                    }
                break
            cfg = {"skip_if": step.skip_if or None, "run_only_if": step.run_only_if or None}
            cfg = {k: v for k, v in cfg.items() if v}
            if not should_run(cfg, context):
                context["metadata"][step.name] = {"skipped": True}
                continue
            resolved = Step(
                name=step.name, type=step.type, method=step.method,
                config=resolve(step.config, context),
                selectors=resolve(step.selectors, context),
                input_from=step.input_from,
            )
            t0 = time.monotonic()
            if step.type == "crawl":
                output = self._run_crawl(resolved, context, seed_url)
            elif step.type == "scrape":
                output = self._run_scrape(resolved, context)
            else:
                raise ValueError(f"unsupported step type {step.type!r}")
            context["steps"][step.name] = output
            context["execution_order"].append(step.name)
            context["metadata"][step.name] = {
                "skipped": False, "wall_sec": round(time.monotonic() - t0, 3),
            }
        return context
