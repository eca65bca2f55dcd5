"""HTML parsing regressions + the M5 content-normalizer library function."""

from crawler_ray.functions.html import (
    normalize_for_hash,
    normalize_spans_text,
    page_text,
    page_title,
    parse_spans,
)


def test_void_boilerplate_tags_do_not_swallow_content():
    """<meta>/<link> are boilerplate AND void: they must not open a skip
    scope (regression: title/text after them was silently dropped)."""
    html = (
        '<html><head><meta charset="utf-8"><title>Hello</title>'
        '<link rel="stylesheet" href="s.css"></head>'
        "<body><p>World</p></body></html>"
    )
    spans = parse_spans(html)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("title", "Hello"), ("text", "World"),
    ]


def test_void_tags_inside_skip_scope():
    """A void tag inside a skipped subtree must not unbalance the scope."""
    html = (
        "<html><body><nav><img src='x.png'><a href='/x'>menu</a></nav>"
        "<p>Content</p></body></html>"
    )
    spans = parse_spans(html)
    assert [(s["kind"], s["text"]) for s in spans] == [("text", "Content")]


def test_span_offsets_strictly_increasing():
    html = (
        "<html><title>T</title><body><p>a</p><a href='/x'>l</a>"
        "<img src='m.png'><p>b</p></body></html>"
    )
    offs = [s["offset"] for s in parse_spans(html)]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_ad_subtree_removed():
    html = (
        "<html><body><div class='ad-banner'><p>buy</p></div>"
        "<article><p>real</p></article></body></html>"
    )
    assert page_text(parse_spans(html)) == "real"


def test_normalize_for_hash_main_content_and_timestamps():
    """The library M5 function: main-content scope + timestamp scrub +
    lowercase (content_normalizer.py:399-424 semantics).  The engine's hot
    path uses normalize_spans_text; this keeps the full-HTML variant
    exercised."""
    html = (
        "<html><body><nav>menu chrome</nav>"
        "<article><h1>Judul</h1><p>Body published 2024-01-15 14:30:00 text"
        "</p></article>"
        "<footer>ignored</footer></body></html>"
    )
    out = normalize_for_hash(html)
    assert out == "judul body published text"
    assert normalize_for_hash("") == ""


def test_normalize_spans_text_consistency():
    html = "<html><title>A B</title><body><p>C 12:30 D</p></body></html>"
    spans = parse_spans(html)
    assert normalize_spans_text(spans) == "a b c d"
    assert page_title(spans) == "A B"


def test_skip_scope_survives_unbalanced_markup():
    """ADVICE: an unclosed inner tag inside boilerplate must not swallow the
    rest of the document, and a stray end tag must not exit the scope."""
    from crawler_ray.functions.html import parse_spans

    # unclosed <p> inside <nav>: </nav> implicitly closes it
    spans = parse_spans("<html><nav><p>menu</nav><article><p>body</p></article></html>")
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["body"]

    # stray </div> inside <nav> must NOT end the skip scope early
    spans = parse_spans("<html><nav>menu</div>still menu</nav><p>real</p></html>")
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["real"]

    # nested boilerplate with implicit closes all the way down
    spans = parse_spans(
        "<html><footer><ul><li>a<li>b</footer><p>content</p></html>"
    )
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["content"]

    # unclosed boilerplate at EOF still swallows only its own subtree
    spans = parse_spans("<html><p>before</p><nav><p>menu")
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["before"]
