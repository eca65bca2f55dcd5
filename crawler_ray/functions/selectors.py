"""Selector extraction: CSS-lite, XPath-lite, and JSON dot-path.

Reference semantics (``/root/reference/crawler/services/selector_processor.py:
34-305``, engine ``html_parser.py:15-355``):

- a selector config maps field names to selector strings; each extracts a
  single value or (``multiple: true``) a list;
- selector type auto-detection: a leading ``/`` means XPath, otherwise CSS
  (``selector_processor.py:228-243``); JSON documents use dot-paths with
  numeric list indices (``selector_processor.py:178-226``);
- extraction targets text content by default; ``::attr(name)`` (CSS) or a
  trailing ``/@name`` (XPath) extract an attribute.

BeautifulSoup/lxml are unavailable here, so this module implements a small
DOM tree on stdlib ``html.parser`` plus the selector subset the reference's
configs actually use:

- CSS: ``tag``, ``.class``, ``#id``, ``tag.class``, ``[attr]``,
  ``[attr=value]``, descendant combinator (spaces), child combinator
  (``>``), ``::attr(name)`` / ``::text`` pseudo-extractors;
- XPath: absolute paths ``/a/b`` and ``//b`` descent, positional ``[n]``
  (1-indexed), ``@attr`` leaf, ``text()`` leaf.

Pure functions -> usable directly inside ``map_batches`` parse stages.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Any

_WS = re.compile(r"\s+")
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


@dataclass
class Node:
    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text_parts: list[str] = field(default_factory=list)
    parent: "Node | None" = None

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def text(self) -> str:
        parts: list[str] = []

        def walk(n: Node) -> None:
            for item in n._ordered_content():
                if isinstance(item, str):
                    parts.append(item)
                else:
                    walk(item)

        walk(self)
        return _WS.sub(" ", "".join(parts)).strip()

    # children and text interleave in document order
    def _ordered_content(self):
        return self._content

    def __post_init__(self):
        self._content: list[Any] = []

    def iter_descendants(self):
        for item in self._content:
            if isinstance(item, Node):
                yield item
                yield from item.iter_descendants()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("__root__")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        self.stack[-1]._content.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        self.stack[-1]._content.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1]._content.append(data)


def parse_dom(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root


# ------------------------------------------------------------------ CSS-lite
_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attr>\[[^\]]+\])?$"
)


def _match_simple(node: Node, simple: str) -> bool:
    m = _SIMPLE_RE.match(simple)
    if not m:
        return False
    tag = m.group("tag")
    if tag and tag != "*" and node.tag != tag.lower():
        return False
    if m.group("id") and node.attrs.get("id") != m.group("id")[1:]:
        return False
    for cls in (m.group("classes") or "").split(".")[1:]:
        if cls not in node.classes:
            return False
    attr = m.group("attr")
    if attr:
        inner = attr[1:-1]
        if "=" in inner:
            name, value = inner.split("=", 1)
            if node.attrs.get(name.strip()) != value.strip().strip("'\""):
                return False
        elif inner.strip() not in node.attrs:
            return False
    return True


def css_select(root: Node, selector: str) -> list[Node]:
    """All nodes matching a CSS-lite selector (document order)."""
    selector = selector.strip()
    # split on child combinator first, keeping descendant groups
    parts = [p.strip() for p in re.split(r"\s*>\s*", selector)]
    chains = [p.split() for p in parts]  # each part: descendant chain

    def match_descendant_chain(nodes: list[Node], chain: list[str]) -> list[Node]:
        current = nodes
        for simple in chain:
            nxt: list[Node] = []
            seen = set()
            for n in current:
                for d in n.iter_descendants():
                    if id(d) not in seen and _match_simple(d, simple):
                        nxt.append(d)
                        seen.add(id(d))
            current = nxt
        return current

    current = [root]
    for i, chain in enumerate(chains):
        if i == 0:
            current = match_descendant_chain(current, chain)
        else:
            # child combinator between part i-1 and part i: first simple of
            # this chain must be a DIRECT child, the rest descend
            nxt = []
            seen = set()
            for n in current:
                for c in n.children:
                    if id(c) not in seen and _match_simple(c, chain[0]):
                        nxt.append(c)
                        seen.add(id(c))
            current = match_descendant_chain(nxt, chain[1:]) if len(chain) > 1 else nxt
    return current


# ---------------------------------------------------------------- XPath-lite
def xpath_select(root: Node, path: str) -> tuple[list[Node], str | None]:
    """Nodes for an XPath-lite expression; returns (nodes, attr_leaf).

    ``/a/b`` is root-anchored (child steps); ``//a`` at any position means
    descend.  Implemented by marking descendant steps with a sentinel so a
    single leading slash stays a child-of-root step.
    """
    attr_leaf = None
    work = path.replace("//", "/\x00")
    if work.startswith("/"):
        work = work[1:]  # root anchor: first step is a CHILD of the root
    steps = work.split("/")
    current = [root]
    descend_next = False
    for raw in steps:
        if raw.startswith("\x00"):
            descend_next = True
            raw = raw[1:]
        if raw == "":
            continue
        if raw.startswith("@"):
            attr_leaf = raw[1:]
            continue
        if raw == "text()":
            attr_leaf = "::text"
            continue
        m = re.match(r"^([\w*-]+)(?:\[(\d+)\])?$", raw)
        if not m:
            return [], None
        tag, idx = m.group(1), m.group(2)
        nxt: list[Node] = []
        for n in current:
            pool = list(n.iter_descendants()) if descend_next else n.children
            matched = [c for c in pool if tag == "*" or c.tag == tag.lower()]
            if idx is not None:
                i = int(idx) - 1
                matched = [matched[i]] if 0 <= i < len(matched) else []
            nxt.extend(matched)
        current = nxt
        descend_next = False
    return current, attr_leaf


# ------------------------------------------------------------------ JSON path
def json_path(data: Any, path: str) -> Any:
    """Dot-path navigation with numeric list indices
    (selector_processor.py:178-226); raises KeyError/IndexError on misses."""
    value = data
    for seg in path.split("."):
        if isinstance(value, dict):
            value = value[seg]
        elif isinstance(value, list):
            value = value[int(seg)]
        else:
            raise KeyError(f"cannot navigate into {type(value).__name__} at {seg!r}")
    return value


def json_path_soft(data: Any, path: str) -> Any:
    """Reference-parity dot-path navigation: ``None`` on any miss instead of
    raising (selector_processor.py:178-226 returns None and logs)."""
    if not path:
        return data
    value = data
    for seg in path.split("."):
        if value is None:
            return None
        if isinstance(value, list):
            try:
                idx = int(seg)
            except (ValueError, TypeError):
                return None
            value = value[idx] if 0 <= idx < len(value) else None
        elif isinstance(value, dict):
            value = value.get(seg)
        else:
            return None
    return value


# ------------------------------------------------------------------ frontend
def detect_selector_type(selector: str) -> str:
    """Leading '/' -> xpath, else css (selector_processor.py:228-243)."""
    return "xpath" if selector.lstrip().startswith("/") else "css"


def _node_value(node: Node, attr: str | None) -> str | None:
    if attr is None or attr == "::text":
        return node.text()
    return node.attrs.get(attr)


def extract_field(html_or_dom: str | Node, selector: str,
                  multiple: bool = False) -> str | list[str] | None:
    """Extract one field with auto-detected selector type.

    CSS ``::attr(name)`` / ``::text`` suffixes and XPath ``/@name`` /
    ``/text()`` leaves choose the value; otherwise normalized text content.
    Missing -> None (or [] when multiple).
    """
    dom = html_or_dom if isinstance(html_or_dom, Node) else parse_dom(html_or_dom)
    attr = None
    if detect_selector_type(selector) == "xpath":
        nodes, attr = xpath_select(dom, selector.strip())
    else:
        sel = selector.strip()
        m = re.search(r"::attr\(([\w-]+)\)\s*$", sel)
        if m:
            attr = m.group(1)
            sel = sel[: m.start()].strip()
        elif sel.endswith("::text"):
            attr = "::text"
            sel = sel[: -len("::text")].strip()
        nodes = css_select(dom, sel)
    values = [v for v in (_node_value(n, attr) for n in nodes) if v is not None]
    if multiple:
        return values
    return values[0] if values else None


def extract_fields(html: str, selectors: dict[str, Any]) -> dict[str, Any]:
    """Apply a selector config {field: selector | {selector, multiple}} to a
    page (the reference's per-page extraction contract,
    selector_processor.py:34-91); one DOM parse shared by all fields."""
    dom = parse_dom(html)
    out: dict[str, Any] = {}
    for name, spec in selectors.items():
        if isinstance(spec, str):
            out[name] = extract_field(dom, spec)
        else:
            out[name] = extract_field(
                dom, spec["selector"], multiple=bool(spec.get("multiple"))
            )
    return out
