"""Parse stage: fetched HTML -> interleaved spans + link candidates.

Stateless ``map_batches`` transform (reference analogues: selector
extraction ``/root/reference/crawler/services/selector_processor.py:34-305``,
URL extraction ``url_extractor.py:54-288``, content normalization
``content_normalizer.py:399-424``).  Emits the target data model of
BASELINE.json input_hint: ``spans: list<struct<kind, text, media_ref,
offset>>``, plus ``links: list<struct<url, dom_idx>>`` for the frontier,
``content_hash`` (sha256 of normalized text) and ``simhash`` (signed int64)
for the dedup joins.  The raw ``html`` column is dropped here — wide rows
must not travel past the parse stage (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from crawler_ray.functions import html as H
from crawler_ray.functions.simhash import simhash_batch, to_signed
from crawler_ray.functions.url import normalize_and_hash_batch

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
LINK_TYPE = pa.list_(pa.struct([("url", pa.string()), ("dom_idx", pa.int32())]))


def parse_fetched_batch(batch: pa.Table) -> pa.Table:
    """(url, html, status, ...) -> + (title, spans, links, content_hash,
    simhash); html dropped."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    statuses = batch["status"].to_pylist()

    all_spans, all_links, titles, norm_texts = [], [], [], []
    for url, html_body, status in zip(urls, htmls, statuses):
        if status != 200 or not html_body:
            all_spans.append([])
            all_links.append([])
            titles.append("")
            norm_texts.append("")
            continue
        spans = H.parse_spans(html_body)
        all_spans.append(spans)
        all_links.append(
            [{"url": u, "dom_idx": i} for i, (u, _) in enumerate(H.extract_links(spans, url))]
        )
        titles.append(H.page_title(spans))
        norm_texts.append(H.normalize_spans_text(spans))

    fps, _ = simhash_batch(norm_texts)
    content_hashes = [
        hashlib.sha256(t.encode()).hexdigest() if t else "" for t in norm_texts
    ]
    out = batch.drop_columns(["html"])
    return (
        out.append_column("title", pa.array(titles, type=pa.string()))
        .append_column("spans", pa.array(all_spans, type=SPAN_TYPE))
        .append_column("links", pa.array(all_links, type=LINK_TYPE))
        .append_column("content_hash", pa.array(content_hashes, type=pa.string()))
        .append_column("simhash", pa.array(to_signed(fps), type=pa.int64()))
    )


def explode_links(batch: pa.Table) -> pa.Table:
    """One row per discovered link with parent metadata, canonicalized.

    Output: parent_hash, parent_score, dom_idx, url (normalized), url_hash,
    host — invalid URLs already dropped.  The robots filter and the seen
    anti-join run downstream.
    """
    parents = batch["url_hash"].to_pylist()
    links_col = batch["links"].to_pylist()
    p_out, dom_out, raw = [], [], []
    for parent, links in zip(parents, links_col):
        for item in links or []:
            p_out.append(parent)
            dom_out.append(item["dom_idx"])
            raw.append(item["url"])
    norm, hashes, hosts = normalize_and_hash_batch(raw)
    t = pa.table(
        {
            "parent_hash": pa.array(p_out, type=pa.string()),
            "dom_idx": pa.array(dom_out, type=pa.int32()),
            "url": pa.array(norm, type=pa.string()),
            "url_hash": pa.array(hashes, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
        }
    )
    return t.filter(pc.is_valid(t["url_hash"]))
