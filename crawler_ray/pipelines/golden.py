"""Sequential golden interpreter — the executable specification of crawl
semantics that the distributed Ray engine must reproduce exactly.

The reference crawler is sequential-by-queue: one NATS message at a time,
seed order -> pagination order -> DOM order, first-wins URL dedup, retries
re-enqueued at the lowest priority (SURVEY.md §2.9, §3.1;
``/root/reference/crawler/services/step_executors/crawl_executor.py:132-174``,
``priority_queue.py:89-155``, ``job_retry_handler.py:41-160``).  A parallel
engine cannot replay a continuous-time token bucket tick-for-tick, so the
conformance contract discretizes politeness into ROUNDS — the reference's
token bucket at r req/s over a time slice of B/r seconds admits exactly B
fetches per host per slice, which is this spec's per-round budget:

Round r (r = 0, 1, ...):
1. candidates = frontier rows with ``not_before_round <= r``.
2. Per host, order by ``(score, url_hash)`` and select the first
   ``budget_per_host`` rows.  ``score = (10 - priority) * 10^12 +
   discovery_round`` (the reference ZSET formula, priority_queue.py:89-155,
   with the discovery round standing in for the enqueue timestamp — in the
   sequential reference the enqueue time IS the discovery time).
3. Fetch the selected set.  The crawl order is the selected set sorted by
   ``(score, url_hash)``; this is the reference's ZPOPMIN order restricted
   to one slice.
4. Status handling (``retry_policy.py`` semantics, discretized):
   - 200: parse; emit page; extract links in DOM order.
   - 404: non-retryable -> dead-letter.
   - 429/5xx: retryable; retry_count < max_retries -> re-enqueue at
     PRIORITY_RETRY (0) with ``not_before_round = r + 1 + 2^retry_count``
     (exponential backoff in rounds, no jitter in conformance mode), else
     dead-letter.
5. Discovered links: resolve relative, canonicalize + hash
   (crawler_ray.functions.url), drop invalid and robots-disallowed, then
   first-wins dedup: keep one row per url_hash — the minimum by
   ``(score, parent_hash, dom_idx)`` — then drop every hash already in the
   seen set (seen = every hash ever enqueued; seeds included).  Survivors
   join the frontier with priority 5 (PRIORITY_SCHEDULED) and
   ``discovery_round = r + 1``.
6. Pages are marked duplicates in crawl order: exact match on content_hash
   (similarity 100), else min-(hamming,rank) simhash match at distance <= 3
   (similarity = clamp(int((1 - d/64)*100))), mirroring
   ``result_persistence.py:213-264``.

Hashing note: both exact hash and simhash are computed over
``normalize_for_hash(html)`` — the reference computes the exact hash over
raw content (``result_persistence.py:327-346``) but its normalizer exists
precisely to stabilize hashing (``content_normalizer.py:1-9``); hashing the
normalized text makes exact dedup meaningful when pages embed dynamic
chrome.

This module is intentionally simple, single-threaded Python — readable as a
spec, and the oracle for tests/test_crawl_conformance.py.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from crawler_ray.functions import html as H
from crawler_ray.functions.simhash import hamming_distance, simhash
from crawler_ray.functions.url import normalize_and_hash
from crawler_ray.state.robots import RobotsPolicy

PRIORITY_SEED = 10        # manual trigger (priority_queue.py:43)
PRIORITY_DISCOVERED = 5   # scheduled default (priority_queue.py:45)
PRIORITY_RETRY = 0        # retry (priority_queue.py:47)
PRIORITY_MULT = 10**12
MAX_RETRIES = 3


def score_of(priority: int, discovery_round: int) -> int:
    p = max(0, min(10, priority))
    return (10 - p) * PRIORITY_MULT + discovery_round


def backoff_rounds(retry_count: int) -> int:
    """Deterministic exponential backoff measured in rounds (2^k, cap 8)."""
    return min(2 ** retry_count, 8)


def _classify(status: int, rules) -> tuple[str, bool]:
    """(category, retryable) for a failed fetch — the sequential twin of the
    engine's ``crawl._status_decisions`` (same rule-first, golden-fallback
    order; reference retry_policy.py:420-516)."""
    from crawler_ray.functions.backoff import is_retryable as _bk_retryable

    for rule in rules or ():
        try:
            if rule.predicate(None, status):
                retry = (rule.is_retryable if rule.is_retryable is not None
                         else _bk_retryable(rule.category))
                return rule.category, retry
        except Exception:
            continue
    retry = status == 429 or status >= 500
    return ("server_error" if retry else "not_found", retry)


@dataclass
class FrontierRow:
    url: str
    url_hash: str
    host: str
    priority: int
    score: int
    discovery_round: int
    not_before_round: int = 0
    retry_count: int = 0
    lineage: str = ""          # parent url_hash ('' for seeds)


@dataclass
class GoldenResult:
    order: list[tuple[int, str, str]] = field(default_factory=list)  # (round, url_hash, url)
    pages: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    dlq: list[dict] = field(default_factory=list)
    rounds: int = 0


def golden_crawl(
    web,
    budget_per_host: int = 4,
    max_rounds: int = 64,
    robots: RobotsPolicy | None = None,
    max_retries: int = MAX_RETRIES,
    initial_seen: set[str] | None = None,
    classification_rules=None,
) -> GoldenResult:
    """Run the crawl spec sequentially over a MiniWeb.

    ``initial_seen`` pre-populates the URL-seen set — the sequential spec
    for a SECOND scheduled run whose previous visit is still inside the
    dedup-window TTL (reference: 24 h Redis key expiry,
    ``/root/reference/crawler/services/redis_cache.py:26-75``).  Hashes in
    it are never enqueued (seeds included); a fully-expired window is
    simply ``initial_seen=None``.
    """
    robots = robots if robots is not None else RobotsPolicy.for_miniweb(web)
    res = GoldenResult()
    if initial_seen:
        res.seen.update(initial_seen)
    frontier: list[FrontierRow] = []

    for seed in web.seeds():
        norm, uh = normalize_and_hash(seed)
        from urllib.parse import urlparse

        if not robots.allowed(norm):
            continue
        if uh in res.seen:
            continue
        res.seen.add(uh)
        frontier.append(
            FrontierRow(norm, uh, urlparse(norm).netloc.lower(),
                        PRIORITY_SEED, score_of(PRIORITY_SEED, 0), 0)
        )

    for r in range(max_rounds):
        candidates = [f for f in frontier if f.not_before_round <= r]
        if not candidates:
            if not frontier:
                break
            res.rounds = r + 1
            continue

        by_host: dict[str, list[FrontierRow]] = {}
        for f in candidates:
            by_host.setdefault(f.host, []).append(f)
        selected: list[FrontierRow] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda f: (f.score, f.url_hash))
            selected.extend(rows[:budget_per_host])

        selected.sort(key=lambda f: (f.score, f.url_hash))
        sel_hashes = {f.url_hash for f in selected}
        frontier = [f for f in frontier if f.url_hash not in sel_hashes]

        discoveries: dict[str, tuple] = {}  # url_hash -> (sortkey, row)
        for f in selected:
            res.order.append((r, f.url_hash, f.url))
            status, html_body = web.fetch(f.url, retry_count=f.retry_count)
            if status == 200:
                spans = H.parse_spans(html_body)
                normalized = H.normalize_spans_text(spans)
                res.pages.append(
                    {
                        "round": r, "url": f.url, "url_hash": f.url_hash,
                        "host": f.host, "status": status,
                        "title": H.page_title(spans), "spans": spans,
                        "content_hash": hashlib.sha256(normalized.encode()).hexdigest(),
                        "simhash": simhash(normalized) if normalized else 0,
                        "retry_count": f.retry_count, "lineage": f.lineage,
                    }
                )
                for dom_idx, (link, span_idx) in enumerate(H.extract_links(spans, f.url)):
                    try:
                        lnorm, lh = normalize_and_hash(link)
                    except ValueError:
                        continue
                    if not robots.allowed(lnorm):
                        continue
                    from urllib.parse import urlparse

                    child_score = score_of(PRIORITY_DISCOVERED, r + 1)
                    sortkey = (child_score, f.url_hash, dom_idx)
                    prev = discoveries.get(lh)
                    if prev is None or sortkey < prev[0]:
                        discoveries[lh] = (
                            sortkey,
                            FrontierRow(lnorm, lh, urlparse(lnorm).netloc.lower(),
                                        PRIORITY_DISCOVERED, child_score, r + 1,
                                        lineage=f.url_hash),
                        )
            else:
                # failure classification: custom rules first (reference
                # retry_policy.py:420-516), else the golden coarse spec
                # (429/5xx retryable "server_error", other "not_found")
                category, retryable = _classify(
                    status, classification_rules
                )
                if retryable and f.retry_count < max_retries:
                    nb = r + 1 + backoff_rounds(f.retry_count)
                    frontier.append(
                        FrontierRow(f.url, f.url_hash, f.host, PRIORITY_RETRY,
                                    score_of(PRIORITY_RETRY, r + 1), r + 1,
                                    not_before_round=nb,
                                    retry_count=f.retry_count + 1,
                                    lineage=f.lineage)
                    )
                else:
                    res.dlq.append({"url": f.url, "url_hash": f.url_hash,
                                    "status": status, "round": r,
                                    "error_category": category,
                                    "retry_count": f.retry_count})

        for lh, (_, row) in discoveries.items():
            if lh not in res.seen:
                res.seen.add(lh)
                frontier.append(row)
        res.rounds = r + 1
        if not frontier:
            break

    mark_duplicates(res.pages)
    return res


def mark_duplicates(pages: list[dict]) -> None:
    """In crawl order: exact content_hash match, else best simhash match at
    Hamming distance <= 3 (reference result_persistence.py:213-264)."""
    first_by_hash: dict[str, str] = {}
    prior: list[tuple[int, str]] = []  # (simhash, url_hash) in crawl order
    for p in pages:
        ch = p["content_hash"]
        canon = first_by_hash.get(ch)
        if canon is not None:
            p["is_duplicate"] = True
            p["duplicate_of"] = canon
            p["similarity_score"] = 100
        else:
            best = None  # (distance, rank)
            for rank, (fp, uh) in enumerate(prior):
                d = int(hamming_distance(int(p["simhash"]), fp))
                if d <= 3 and (best is None or (d, rank) < best[:2]):
                    best = (d, rank, uh)
            if best is not None:
                p["is_duplicate"] = True
                p["duplicate_of"] = best[2]
                p["similarity_score"] = max(0, min(100, int((1 - best[0] / 64) * 100)))
            else:
                p["is_duplicate"] = False
                p["duplicate_of"] = None
                p["similarity_score"] = None
            first_by_hash[ch] = p["url_hash"]
            prior.append((int(p["simhash"]), p["url_hash"]))
