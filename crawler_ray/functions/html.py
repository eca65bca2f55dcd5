"""Minimal HTML parsing to interleaved spans, links, and normalized text.

The reference extracts page structure with BeautifulSoup/lxml
(``/root/reference/crawler/services/html_parser.py:15-355``,
``url_extractor.py:54-288``) and normalizes content for hashing with a
boilerplate/ad/timestamp scrubbing pipeline
(``content_normalizer.py:22-424``).  Neither bs4 nor lxml exists in this
environment, so this module implements the needed subset on stdlib
``html.parser``:

- :func:`parse_spans` — one DOM-ordered pass producing the interleaved
  span records of the target data model (BASELINE.json input_hint):
  ``kind ∈ {title, text, link, media}``; ``link`` spans carry the raw href
  in ``text``; ``media`` spans carry ``media_ref`` and empty text; ``offset``
  strictly increasing in document order.
- :func:`normalize_for_hash` — the reference's ``normalize_for_hash``
  semantics (``content_normalizer.py:399-424``): drop boilerplate tags and
  ad/tracking-classed subtrees and comments, prefer <main>/<article>-ish
  containers, scrub timestamp patterns, collapse whitespace, lowercase.

Both are pure per-row functions used inside ``map_batches`` parse stages.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

# Tags whose subtrees are boilerplate, never content
# (mirrors content_normalizer.py:37-50).
BOILERPLATE_TAGS = {
    "nav", "header", "footer", "aside", "sidebar", "menu",
    "noscript", "iframe", "script", "style", "link", "meta",
}

# class/id substring regexes marking ad/tracking chrome
# (mirrors content_normalizer.py:53-75).
AD_CLASS_RE = re.compile(
    r"(?:ad[_-]|ads[_-]|advert|sponsor|promo|banner|cookie[_-]|gdpr|consent|"
    r"popup|modal|overlay|tracking|analytics|social[_-]share|share[_-]buttons?|"
    r"related[_-]|recommend|newsletter|subscription)",
    re.IGNORECASE,
)

# dynamic-content scrubbing regexes (mirrors content_normalizer.py:78-100);
# applied in order — datetime before bare date.
TIMESTAMP_RES = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"\d{4}[-/]\d{2}[-/]\d{2}[T\s]\d{2}:\d{2}(:\d{2})?([+-]\d{2}:?\d{2}|Z)?",
        r"\d{4}[-/]\d{2}[-/]\d{2}",
        r"\b\d{1,2}:\d{2}(:\d{2})?\b",
        r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|"
        r"Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
        r"Dec(?:ember)?)\s+\d{1,2},?\s+\d{4}",
        r"\d+\s+(?:second|minute|hour|day|week|month|year)s?\s+ago",
        r"(?:updated|posted|published)\s+(?:yesterday|today|just now)",
        r"\d+[\d,.]*[KMB]?\s+(?:views?|likes?|comments?|reads?)",
        r"(?:last\s+)?(?:updated|modified|posted|published)[\s:]+.*?ago",
    )
]

# Necessary-condition substring guards per TIMESTAMP_RES entry: a pattern
# whose guard words are absent from the (lowercased) text cannot match, so
# its 20 KB regex scan is skipped — the word-anchored patterns rarely fire
# on legal-document corpora while the digit patterns fire constantly.
_TIMESTAMP_GUARDS = [
    None,                                     # ISO datetime (digit-anchored)
    None,                                     # ISO date
    None,                                     # HH:MM
    ("jan", "feb", "mar", "apr", "may", "jun",
     "jul", "aug", "sep", "oct", "nov", "dec"),
    ("ago",),
    ("updated", "posted", "published"),
    ("view", "like", "comment", "read"),
    ("ago",),
]
# guards are coupled to TIMESTAMP_RES by position only — a pattern added
# without a guard entry would be silently skipped by zip truncation
assert len(_TIMESTAMP_GUARDS) == len(TIMESTAMP_RES), (
    "every TIMESTAMP_RES pattern needs a guard entry (or None)"
)


def scrub_timestamps(text: str) -> str:
    """Apply TIMESTAMP_RES in order, skipping patterns whose guard words
    are absent from the CURRENT text (guards are necessary conditions, and
    the lowercased guard text is recomputed after every substitution that
    changed the text, so the result is exactly the sequential-sub result —
    a deletion that fuses fragments into a guard word re-enables the
    guarded pattern just as the unguarded loop would)."""
    low = text.lower()
    for rx, guard in zip(TIMESTAMP_RES, _TIMESTAMP_GUARDS):
        if guard is not None and not any(g in low for g in guard):
            continue
        new = rx.sub("", text)
        if new != text:
            text = new
            low = text.lower()
    return text


MAIN_CONTENT_TAGS = ("main", "article")
# tags with no closing tag: must never open a skip scope (no end tag would
# ever close it, swallowing all following content)
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
_WS = re.compile(r"\s+")


class _SpanCollector(HTMLParser):
    """Single-pass DOM-order collector of title/text/link/media spans."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._offset = 0
        self._in_title = 0
        # Boilerplate skip scope as a STACK of open tag names (not a raw
        # depth counter): real-world HTML relies on implicit closes, so a
        # stray end tag must not exit the scope early, and an unclosed
        # inner tag (e.g. "<nav><p>x</nav>") must not wedge the scope open
        # — the scope closes when the boilerplate tag's own end tag (or any
        # enclosing tracked tag) arrives, popping unclosed inners with it.
        self._skip_stack: list[str] = []
        self._text_parts: list[str] = []

    def _flush_text(self) -> None:
        if self._text_parts:
            text = "".join(self._text_parts)
            self._text_parts = []
            # collapse whitespace runs; skip the regex when no run exists
            # (single spaces only) — equivalence: _WS.sub(" ", s) == s iff
            # s has no \n/\t/\r/\f/\v and no doubled space
            if ("\n" in text or "\t" in text or "\r" in text
                    or "  " in text or "\f" in text or "\x0b" in text):
                text = _WS.sub(" ", text)
            text = text.strip()
            if text:
                self._emit("text", text=text)

    def _emit(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": self._offset}
        )
        self._offset += max(1, len(text) + len(media_ref))

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip_stack:
            if tag not in VOID_TAGS:
                self._skip_stack.append(tag)
            return
        ad = dict(attrs)
        marker = f"{ad.get('class', '')} {ad.get('id', '')}"
        if tag in BOILERPLATE_TAGS or AD_CLASS_RE.search(marker):
            if tag not in VOID_TAGS:      # void tags (meta/link/...) have no
                self._skip_stack = [tag]  # end tag to close a skip scope
            return
        if tag == "title":
            self._flush_text()
            self._in_title += 1
        elif tag == "a":
            self._flush_text()
            href = ad.get("href")
            if href:
                self._emit("link", text=href)
        elif tag in ("img", "video", "audio", "source"):
            self._flush_text()
            src = ad.get("src")
            if src:
                self._emit("media", media_ref=src)
        elif tag in ("p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr"):
            self._flush_text()

    def handle_endtag(self, tag: str) -> None:
        if self._skip_stack:
            if tag in self._skip_stack:
                # pop through the LAST matching open tag: implicitly closes
                # any unclosed inner tags (p/li/tr-style) along the way
                idx = len(self._skip_stack) - 1 - self._skip_stack[::-1].index(tag)
                del self._skip_stack[idx:]
            # stray end tag (not open in the scope): ignore, stay skipping
            return
        if tag == "title" and self._in_title:
            self._in_title -= 1
        elif tag in ("p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr"):
            self._flush_text()

    def handle_data(self, data: str) -> None:
        if self._skip_stack:
            return
        if self._in_title:
            t = _WS.sub(" ", data).strip()
            if t:
                self._emit("title", text=t)
        else:
            self._text_parts.append(data)

    def close(self) -> None:
        super().close()
        self._flush_text()


def parse_spans(html: str) -> list[dict]:
    """HTML -> DOM-ordered interleaved spans (kind, text, media_ref, offset)."""
    c = _SpanCollector()
    c.feed(html or "")
    c.close()
    return c.spans


def extract_links(spans: list[dict], base_url: str) -> list[tuple[str, int]]:
    """(absolute_url, dom_idx) for every link span, relative hrefs resolved.

    Mirrors the reference's relative->absolute urljoin at extraction time
    (``url_extractor.py:121-173``, ``crawl_executor.py:305-340``).
    """
    out = []
    for i, s in enumerate(spans):
        if s["kind"] == "link":
            out.append((urljoin(base_url, s["text"]), i))
    return out


def page_title(spans: list[dict]) -> str:
    for s in spans:
        if s["kind"] == "title":
            return s["text"]
    return ""


def page_text(spans: list[dict]) -> str:
    """Concatenated text spans (the extractable content of the page)."""
    return " ".join(s["text"] for s in spans if s["kind"] in ("title", "text"))


class _MainContentFinder(HTMLParser):
    """Locates the char range of the first <main>/<article> subtree."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth = 0
        self.capture: list[str] | None = None
        self.result: str | None = None

    def handle_starttag(self, tag, attrs):
        if self.capture is not None:
            self.capture.append(self.get_starttag_text() or "")
            if tag in MAIN_CONTENT_TAGS:
                self.depth += 1
        elif tag in MAIN_CONTENT_TAGS and self.result is None:
            self.capture = []
            self.depth = 1

    def handle_endtag(self, tag):
        if self.capture is not None:
            if tag in MAIN_CONTENT_TAGS:
                self.depth -= 1
                if self.depth == 0:
                    self.result = "".join(self.capture)
                    self.capture = None
                    return
            self.capture.append(f"</{tag}>")

    def handle_data(self, data):
        if self.capture is not None:
            self.capture.append(data)


def normalize_spans_text(spans: list[dict]) -> str:
    """Stable hash text derived from already-parsed spans: title+text spans
    (boilerplate/ad subtrees were skipped during span collection), timestamp
    scrub, whitespace collapse, lowercase.  The engine's hot path — one
    parse per page instead of three (parse_spans + main-content re-parse);
    the golden interpreter uses the same function, so conformance is exact.
    """
    text = " ".join(s["text"] for s in spans if s["kind"] in ("title", "text"))
    return _WS.sub(" ", scrub_timestamps(text)).strip().lower()


def normalize_for_hash(html: str) -> str:
    """Stable text for duplicate hashing (reference normalize_for_hash).

    Pipeline order follows ``content_normalizer.py:122-183``: strip
    boilerplate/ad subtrees and comments (the span collector already skips
    them), prefer the main-content subtree, join text, scrub timestamps,
    collapse whitespace, lowercase.
    """
    if not html:
        return ""
    finder = _MainContentFinder()
    finder.feed(html)
    finder.close()
    scope = finder.result if finder.result is not None else html
    text = " ".join(
        s["text"] for s in parse_spans(scope) if s["kind"] in ("title", "text")
    )
    return _WS.sub(" ", scrub_timestamps(text)).strip().lower()
