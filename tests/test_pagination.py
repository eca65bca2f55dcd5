"""Pagination algebra conformance (mirrors
/root/reference/tests/unit/utils/test_pagination.py expectations)."""

import pytest

from crawler_ray.functions.pagination import (
    PagePattern,
    StopScan,
    detect_pattern,
    template_pattern,
)


class TestDetect:
    def test_query_page(self):
        p = detect_pattern("https://example.com/products?page=5")
        assert p.kind == "query" and p.param == "page" and p.current_page == 5

    def test_query_p(self):
        p = detect_pattern("https://example.com/x?p=3&sort=date")
        assert p.kind == "query" and p.param == "p" and p.current_page == 3

    def test_offset_with_limit(self):
        p = detect_pattern("https://example.com/api?offset=40&limit=20")
        assert p.param == "offset" and p.increment == 20 and p.current_page == 3

    def test_offset_default_increment(self):
        p = detect_pattern("https://example.com/api?offset=40")
        assert p.increment == 20 and p.current_page == 3

    def test_path_segment(self):
        p = detect_pattern("https://example.com/products/page/3")
        assert p.kind == "path_segment" and p.current_page == 3

    def test_path_embedded_last_number(self):
        p = detect_pattern("https://example.com/archive2024-page3")
        assert p.kind == "path_embedded" and p.current_page == 3

    def test_path_embedded_html(self):
        p = detect_pattern("https://example.com/list5.html")
        assert p.current_page == 5 and p.suffix == ".html"

    def test_big_number_rejected(self):
        assert detect_pattern("https://example.com/article/123456") is None

    def test_no_pattern(self):
        assert detect_pattern("https://example.com/about") is None

    def test_invalid(self):
        with pytest.raises(ValueError):
            detect_pattern("not-a-url")


class TestGenerate:
    def test_query_roundtrip(self):
        p = detect_pattern("https://example.com/products?page=5")
        assert p.page_url("https://example.com/products?page=5", 6) == (
            "https://example.com/products?page=6"
        )

    def test_offset_generation(self):
        p = detect_pattern("https://example.com/api?offset=40&limit=20")
        url = p.page_url("https://example.com/api?offset=40&limit=20", 4)
        assert "offset=60" in url and "limit=20" in url

    def test_path_segment_generation(self):
        p = detect_pattern("https://example.com/products/page/3")
        assert p.page_url("https://example.com/products/page/3", 7) == (
            "https://example.com/products/page/7"
        )

    def test_embedded_generation(self):
        p = detect_pattern("https://example.com/list5.html")
        assert p.page_url("https://example.com/list5.html", 9) == (
            "https://example.com/list9.html"
        )

    def test_template(self):
        p = template_pattern("https://example.com/page/{page}?sort=x")
        assert p.page_url("ignored", 12) == "https://example.com/page/12?sort=x"
        with pytest.raises(ValueError):
            template_pattern("https://example.com/no-placeholder")

    def test_range_expansion(self):
        p = detect_pattern("https://example.com/x?page=1")
        urls = p.pages("https://example.com/x?page=1", max_pages=5)
        assert urls == [f"https://example.com/x?page={i}" for i in range(2, 6)]

    def test_max_pages_cap(self):
        p = PagePattern("query", 99, param="page")
        assert p.pages("https://e.com/?page=99", max_pages=100) == [
            "https://e.com/?page=100"
        ]


class TestStopScan:
    def test_http_stops(self):
        s = StopScan()
        assert s.check(404, b"x" * 200, "u1")[0]
        assert StopScan().check(403, b"x" * 200, "u1")[0]
        assert StopScan().check(500, b"x" * 200, "u1")[0]

    def test_circular(self):
        s = StopScan()
        assert not s.check(200, b"a" * 200, "u1")[0]
        stop, reason = s.check(200, b"b" * 200, "u1")
        assert stop and "Circular" in reason

    def test_consecutive_empty(self):
        s = StopScan(min_content_length=100, max_empty_responses=2)
        assert not s.check(200, b"short", "u1")[0]
        stop, reason = s.check(200, b"tiny", "u2")
        assert stop and "consecutive empty" in reason

    def test_empty_counter_resets(self):
        s = StopScan()
        s.check(200, b"short", "u1")
        s.check(200, b"c" * 200, "u2")
        assert not s.check(200, b"tiny2", "u3")[0]

    def test_duplicate_content(self):
        s = StopScan()
        assert not s.check(200, b"d" * 200, "u1")[0]
        stop, reason = s.check(200, b"d" * 200, "u2")
        assert stop and "Duplicate content" in reason

    def test_reset(self):
        s = StopScan()
        s.check(200, b"d" * 200, "u1")
        s.reset()
        assert not s.check(200, b"d" * 200, "u1")[0]
