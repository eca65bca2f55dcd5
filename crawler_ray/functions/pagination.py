"""Pagination URL algebra: pattern detection, URL generation, stop detection.

Semantics mirror the reference (``/root/reference/crawler/utils/pagination.py``):

- detection order: query param (page/p/offset/start/skip/from, with offset
  increment inferred from limit/size, default 20) -> path segment (/page/5,
  /p/5) -> last-number-in-path embedded form (/list5.html, /products-p3),
  accepting 1..9999 only (pagination.py:174-356);
- generation: replace the page carrier in the seed URL (offset-based patterns
  emit offset = (page-1) * increment); template patterns substitute
  ``{page}`` (pagination.py:69-166);
- stop detection per sequence: 404/403/5xx stop; URL revisit (circular)
  stops; < min_content_length bytes twice in a row stops; exact duplicate
  page content stops (pagination.py:441-537).

The detector/generator are pure (usable inside ``map_batches``); the stop
detector is per-pagination-chain state that lives in the fetch actor owning
the host (SURVEY.md §7.4: per-host sequential state).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

QUERY_PAGE_PARAMS = ("page", "p", "offset", "start", "skip", "from")
PATH_SEGMENT_WORDS = ("page", "p")
DEFAULT_OFFSET_INCREMENT = 20
MAX_EMBEDDED_PAGE = 9999
_EMBEDDED_RE = re.compile(r"^(.*\D)(\d+)(\D*)$")


@dataclass(frozen=True)
class PagePattern:
    """One detected/configured pagination pattern.

    ``kind`` ∈ {query, path_segment, path_embedded, template}; the remaining
    fields are kind-specific carriers.
    """

    kind: str
    current_page: int
    param: str = ""            # query: parameter name
    increment: int = 1         # query/offset: page size
    segment_index: int = -1    # path_segment: index in path parts
    prefix: str = ""           # path_embedded
    suffix: str = ""           # path_embedded
    template: str = ""         # template: contains {page}

    def page_url(self, seed_url: str, page: int) -> str:
        u = urlparse(seed_url)
        if self.kind == "query":
            q = parse_qs(u.query, keep_blank_values=True)
            value = (page - 1) * self.increment if self.param == "offset" else page
            q[self.param] = [str(value)]
            query = urlencode({k: v[0] for k, v in q.items()})
            return urlunparse((u.scheme, u.netloc, u.path, u.params, query, u.fragment))
        if self.kind == "path_segment":
            parts = u.path.split("/")
            if 0 <= self.segment_index < len(parts):
                parts[self.segment_index] = str(page)
            return urlunparse(
                (u.scheme, u.netloc, "/".join(parts), u.params, u.query, u.fragment)
            )
        if self.kind == "path_embedded":
            return urlunparse(
                (u.scheme, u.netloc, f"{self.prefix}{page}{self.suffix}",
                 u.params, u.query, u.fragment)
            )
        if self.kind == "template":
            return self.template.replace("{page}", str(page))
        raise ValueError(f"unknown pattern kind {self.kind}")

    def pages(self, seed_url: str, start: int | None = None,
              end: int | None = None, max_pages: int = 100) -> list[str]:
        """URL list for pages [start, end] (defaults: current+1 .. max_pages).

        This is the reference's upfront pagination expansion
        (``PaginationURLGenerator.generate_range``, pagination.py:403-420).
        """
        lo = self.current_page + 1 if start is None else start
        hi = min(max_pages if end is None else end, max_pages)
        return [self.page_url(seed_url, p) for p in range(lo, hi + 1)]


def detect_pattern(seed_url: str) -> PagePattern | None:
    """Detect the pagination carrier in a seed URL (None if undetectable)."""
    if not seed_url or not isinstance(seed_url, str):
        raise ValueError("seed_url must be a non-empty string")
    u = urlparse(seed_url.strip())
    if not u.scheme or not u.netloc:
        raise ValueError(f"URL must have scheme and hostname: {seed_url}")

    if u.query:
        q = parse_qs(u.query)
        for name in QUERY_PAGE_PARAMS:
            if name in q:
                try:
                    value = int(q[name][0])
                except (ValueError, IndexError):
                    continue
                if name == "offset":
                    inc = DEFAULT_OFFSET_INCREMENT
                    for size_key in ("limit", "size"):
                        if size_key in q:
                            try:
                                inc = int(q[size_key][0])
                                break
                            except (ValueError, IndexError):
                                pass
                    return PagePattern("query", value // inc + 1, param=name,
                                       increment=inc)
                return PagePattern("query", value, param=name)

    parts = u.path.split("/")
    for i, part in enumerate(parts):
        if part.lower() in PATH_SEGMENT_WORDS and i + 1 < len(parts):
            try:
                page = int(parts[i + 1])
            except ValueError:
                continue
            return PagePattern("path_segment", page, segment_index=i + 1)

    if any(c.isdigit() for c in u.path):
        m = _EMBEDDED_RE.search(u.path)
        if m:
            page = int(m.group(2))
            if 1 <= page <= MAX_EMBEDDED_PAGE:
                return PagePattern("path_embedded", page, prefix=m.group(1),
                                   suffix=m.group(3))
    return None


def template_pattern(template: str, current_page: int = 1) -> PagePattern:
    """Explicit user-supplied ``{page}`` template (pagination.py:144-166)."""
    if "{page}" not in template:
        raise ValueError("template must contain {page}")
    return PagePattern("template", current_page, template=template)


@dataclass
class StopScan:
    """Per-pagination-chain stop detector (pagination.py:441-537).

    Sequential state: lives inside the fetch actor that owns the host's
    pagination chain, never in a stateless map.
    """

    min_content_length: int = 100
    max_empty_responses: int = 2
    seen_hashes: set = field(default_factory=set)
    seen_urls: set = field(default_factory=set)
    consecutive_empty: int = 0

    def check(self, status: int, content: bytes | str, url: str) -> tuple[bool, str]:
        if status == 404:
            return True, "404 Not Found - end of pagination"
        if status == 403:
            return True, "403 Forbidden - access denied"
        if status >= 500:
            return True, f"Server error: HTTP {status}"
        if url in self.seen_urls:
            return True, f"Circular pagination detected: revisited {url}"
        self.seen_urls.add(url)
        data = content if isinstance(content, bytes) else content.encode("utf-8")
        if len(data) < self.min_content_length:
            self.consecutive_empty += 1
            if self.consecutive_empty >= self.max_empty_responses:
                return True, (
                    f"{self.consecutive_empty} consecutive empty responses "
                    f"(< {self.min_content_length} bytes)"
                )
        else:
            self.consecutive_empty = 0
        if data:
            h = hashlib.sha256(data).hexdigest()
            if h in self.seen_hashes:
                return True, "Duplicate content detected (identical page)"
            self.seen_hashes.add(h)
        return False, ""

    def reset(self) -> None:
        self.seen_hashes.clear()
        self.seen_urls.clear()
        self.consecutive_empty = 0


def pagination_strategy(seed_url: str, pag: dict | None) -> str:
    """Which pagination strategy a crawl step will use — reference
    ``PaginationService.get_pagination_strategy``
    (``services/pagination.py:292-316``): "disabled" | "template" |
    "auto_detected" | "selector"."""
    pag = pag or {}
    if not pag.get("enabled"):
        return "disabled"
    if pag.get("url_template"):
        return "template"
    if detect_pattern(seed_url) is not None:
        return "auto_detected"
    if pag.get("selector"):
        return "selector"
    return "disabled"
