"""Selector engine tests (CSS-lite, XPath-lite, JSON path) mirroring the
reference selector semantics (selector_processor.py, html_parser.py)."""

import pytest

from crawler_ray.functions.selectors import (
    css_select,
    detect_selector_type,
    extract_field,
    extract_fields,
    json_path,
    parse_dom,
    xpath_select,
)

HTML = """
<html><head><title>Daftar Putusan</title></head>
<body>
  <div id="content" class="main wrapper">
    <article class="post featured">
      <h1>Putusan 123</h1>
      <p class="meta">Nomor <span class="num">123/PID/2024</span></p>
      <a href="/doc/1" class="doc-link">Dokumen 1</a>
      <a href="/doc/2" class="doc-link">Dokumen 2</a>
      <img src="/media/x.png">
    </article>
    <aside><a href="/other" class="nav-link">lain</a></aside>
  </div>
  <ul class="daftar">
    <li><a href="/a">A</a></li>
    <li><a href="/b">B</a></li>
  </ul>
</body></html>
"""


class TestCss:
    def test_tag(self):
        dom = parse_dom(HTML)
        assert len(css_select(dom, "a")) == 5

    def test_class(self):
        dom = parse_dom(HTML)
        assert len(css_select(dom, ".doc-link")) == 2
        assert len(css_select(dom, "a.doc-link")) == 2

    def test_id(self):
        dom = parse_dom(HTML)
        assert css_select(dom, "#content")[0].tag == "div"

    def test_descendant(self):
        dom = parse_dom(HTML)
        assert len(css_select(dom, "article a")) == 2
        assert len(css_select(dom, "ul.daftar a")) == 2

    def test_child_combinator(self):
        dom = parse_dom(HTML)
        assert len(css_select(dom, "ul.daftar > li")) == 2
        assert css_select(dom, "article > h1")[0].text() == "Putusan 123"

    def test_attr_filter(self):
        dom = parse_dom(HTML)
        assert len(css_select(dom, "a[href=/doc/1]")) == 1
        assert len(css_select(dom, "img[src]")) == 1


class TestExtract:
    def test_text_default(self):
        assert extract_field(HTML, "h1") == "Putusan 123"
        assert extract_field(HTML, ".num") == "123/PID/2024"

    def test_attr_pseudo(self):
        assert extract_field(HTML, "a.doc-link::attr(href)") == "/doc/1"
        assert extract_field(HTML, "a.doc-link::attr(href)", multiple=True) == [
            "/doc/1", "/doc/2",
        ]

    def test_text_pseudo(self):
        assert extract_field(HTML, "p.meta::text") == "Nomor 123/PID/2024"

    def test_missing(self):
        assert extract_field(HTML, ".nope") is None
        assert extract_field(HTML, ".nope", multiple=True) == []

    def test_fields_config(self):
        out = extract_fields(
            HTML,
            {
                "title": "h1",
                "links": {"selector": "article a::attr(href)", "multiple": True},
                "number": ".num",
            },
        )
        assert out == {
            "title": "Putusan 123",
            "links": ["/doc/1", "/doc/2"],
            "number": "123/PID/2024",
        }


class TestXpath:
    def test_detect(self):
        assert detect_selector_type("/html/body") == "xpath"
        assert detect_selector_type("div.x") == "css"

    def test_absolute(self):
        assert extract_field(HTML, "/html/head/title") == "Daftar Putusan"

    def test_positional(self):
        dom = parse_dom(HTML)
        nodes, _ = xpath_select(dom, "/html/body/ul/li[2]")
        assert nodes[0].text() == "B"

    def test_descendant_and_attr(self):
        assert extract_field(HTML, "//article/a/@href") == "/doc/1"
        assert extract_field(HTML, "//span/text()") == "123/PID/2024"

    def test_wildcard(self):
        dom = parse_dom(HTML)
        nodes, _ = xpath_select(dom, "/html/body/*")
        assert [n.tag for n in nodes] == ["div", "ul"]

    def test_absolute_is_root_anchored(self):
        # regression: '/a/b' must NOT behave like '//a/b'
        dom = parse_dom(
            "<html><body><ul><li>top</li></ul>"
            "<div><ul><li>nested</li></ul></div></body></html>"
        )
        anchored, _ = xpath_select(dom, "/html/body/ul/li")
        assert [n.text() for n in anchored] == ["top"]
        descend, _ = xpath_select(dom, "//ul/li")
        assert [n.text() for n in descend] == ["top", "nested"]
        mid_descend, _ = xpath_select(dom, "/html/body/div//li")
        assert [n.text() for n in mid_descend] == ["nested"]


class TestJsonPath:
    DATA = {"items": [{"id": 1, "tags": ["a", "b"]}, {"id": 2}], "meta": {"n": 2}}

    def test_paths(self):
        assert json_path(self.DATA, "meta.n") == 2
        assert json_path(self.DATA, "items.0.id") == 1
        assert json_path(self.DATA, "items.1.id") == 2
        assert json_path(self.DATA, "items.0.tags.1") == "b"

    def test_missing(self):
        with pytest.raises((KeyError, IndexError)):
            json_path(self.DATA, "meta.missing")
        with pytest.raises((KeyError, IndexError)):
            json_path(self.DATA, "items.9.id")
