"""First-class operators over INTERLEAVED text+media span documents.

The engine's document shape (the north-star input contract) is a table of
interleaved span documents::

    doc_id: string | int64
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

mirroring the reference extractor's ordered text/media span output (the
crawler emits pages as ordered sequences of text blocks and media
references; see /root/reference/crawler/utils/selector_processor.py and
the span assembly in services/crawl_executor.py — WHAT is computed, not
how).  The per-row invariant everything here preserves is SPAN-SEQUENCE
EQUALITY: (kind, text, media_ref) in offset order.

Everything in this module is vectorized Arrow/numpy — no Python loop over
rows or spans anywhere:

- :func:`synthesize_spans` — deterministic construction of the interleaved
  shape from flat text (the small-scale stand-in for a Lance span table;
  the rule is pure arithmetic so a SQL oracle can replay it exactly).
- :func:`flatten_spans` — ``list<struct>`` -> one row per span, parents
  carried via ``list_parent_indices`` + ``take`` (zero-copy where Arrow
  allows).
- :func:`reassemble_spans` — the inverse: span rows -> ``list<struct>``
  per document, ordered by ``offset``.  Batch-local by design: partition
  by ``doc_id`` upstream so each document's spans co-locate (the same
  assumption every per-doc operator in this engine documents).

Synthesis rule (replayed term-for-term by the SQL oracles in
pipelines/queries.py::SQL_SPAN_KIND_STATS / SQL_SPAN_BOILERPLATE):

- words = text split on a single space
- text span ``ci`` = words ``[ci*W, ci*W+W)`` joined by a space, for
  ``ci`` in ``0 .. ceil(n_words/W)-1`` (W = ``words_per_span``)
- after text span ``ci``, insert one media span iff
  ``(doc_id*31 + ci*7) % 5 == 0``, with ``kind='image'``, ``text=''``,
  ``media_ref='img://{doc_id}/{ci}'``
- ``offset`` = ordinal position within the document's final interleaved
  sequence (int32)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SPAN_FIELDS = ("kind", "text", "media_ref", "offset")

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


def synthesize_spans(
    t: pa.Table, words_per_span: int = 4, carry: tuple[str, ...] = ("source",)
) -> pa.Table:
    """Deterministically expand flat (doc_id, text) rows into interleaved
    span documents (see module docstring for the exact rule).

    Batch-local and embarrassingly parallel: every output row derives from
    exactly one input row, so this runs inside ``map_batches`` at any
    parallelism with no exchange.
    """
    t = t.combine_chunks()
    W = int(words_per_span)
    if t.num_rows == 0:
        cols = {"doc_id": t["doc_id"]}
        for c in carry:
            cols[c] = t[c]
        cols["spans"] = pa.array([], type=SPAN_TYPE)
        return pa.table(cols)
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    words = pc.split_pattern(t["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat_words = words.flatten()
    wc = pc.list_value_length(words).to_numpy().astype(np.int64)

    # --- text chunks: every W consecutive words of a doc, vectorized ----
    n_chunks = (wc + W - 1) // W
    doc_start_word = np.concatenate(([0], np.cumsum(wc)))[:-1]
    total_chunks = int(n_chunks.sum())
    doc_of_chunk = np.repeat(np.arange(len(wc)), n_chunks)
    chunk_first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    ci = np.arange(total_chunks) - chunk_first
    starts = doc_start_word[doc_of_chunk] + ci * W
    # chunk word-ranges tile the flat word array contiguously, so the list
    # offsets are just the starts plus the global end
    chunk_words = pa.ListArray.from_arrays(
        pa.array(np.append(starts, len(flat_words)), type=pa.int64()).cast(
            pa.int32()
        ),
        flat_words,
    )
    chunk_text = pc.binary_join(chunk_words, " ")

    # --- media insertion mask (pure arithmetic; SQL-replayable) ---------
    d_of_chunk = doc_id[doc_of_chunk]
    media = ((d_of_chunk * 31 + ci * 7) % 5) == 0
    media_idx = np.nonzero(media)[0]
    n_media = len(media_idx)

    # --- interleave: text chunk j at slot 2j, its media at slot 2j+1 ----
    slot = np.concatenate([np.arange(total_chunks) * 2, media_idx * 2 + 1])
    order = np.argsort(slot, kind="stable")
    total_rows = total_chunks + n_media

    kind = pa.concat_arrays(
        [
            pa.nulls(total_chunks, pa.string()).fill_null("text"),
            pa.nulls(n_media, pa.string()).fill_null("image"),
        ]
    ).take(pa.array(order))
    empty_text = pa.nulls(n_media, pa.string()).fill_null("")
    text_col = pa.concat_arrays(
        [chunk_text.combine_chunks() if isinstance(chunk_text, pa.ChunkedArray)
         else chunk_text, empty_text]
    ).take(pa.array(order))
    refs = (
        "img://"
        + pd.Series(d_of_chunk[media_idx]).astype(str)
        + "/"
        + pd.Series(ci[media_idx]).astype(str)
    ).to_numpy()
    ref_col = pa.concat_arrays(
        [pa.nulls(total_chunks, pa.string()).fill_null(""),
         pa.array(refs, type=pa.string())]
    ).take(pa.array(order))

    # --- per-doc ordinal offsets and the list structure -----------------
    rows_per_doc = n_chunks + np.bincount(
        doc_of_chunk[media_idx], minlength=len(wc)
    )
    doc_first_row = np.cumsum(rows_per_doc) - rows_per_doc
    offset = (
        np.arange(total_rows) - np.repeat(doc_first_row, rows_per_doc)
    ).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [kind, text_col, ref_col, pa.array(offset, type=pa.int32())],
        names=list(SPAN_FIELDS),
    )
    spans = pa.ListArray.from_arrays(
        pa.array(np.append(doc_first_row, total_rows), type=pa.int64()).cast(
            pa.int32()
        ),
        struct,
    )
    cols = {"doc_id": t["doc_id"]}
    for c in carry:
        cols[c] = t[c]
    cols["spans"] = spans
    return pa.table(cols)


def flatten_spans(t: pa.Table, carry: tuple[str, ...] = ("doc_id", "source")) -> pa.Table:
    """``list<struct>`` spans -> one row per span.

    Parent columns replicate via ``list_parent_indices`` + ``take``;
    struct fields flatten without copying values.  Batch-local.
    """
    t = t.combine_chunks()
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    cols = {c: pc.take(t[c], parent) for c in carry}
    flat = spans.flatten()
    for f in SPAN_FIELDS:
        cols[f] = flat.field(f)
    return pa.table(cols)


def reassemble_spans(
    t: pa.Table, carry: tuple[str, ...] = ("source",)
) -> pa.Table:
    """Span rows -> interleaved ``list<struct>`` documents (inverse of
    :func:`flatten_spans`): group by ``doc_id``, order by ``offset``.

    BATCH-LOCAL: assumes every document's spans sit in this batch
    (partition/bucket by ``doc_id`` upstream — the standard co-location
    contract).  Fully vectorized: one lexsort + run-length list assembly.
    """
    t = t.combine_chunks()
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    off = t["offset"].to_numpy(zero_copy_only=False)
    order = np.lexsort((off, doc))
    doc_s = doc[order]
    # run starts of each document in the sorted order
    is_start = np.empty(len(doc_s), bool)
    if len(doc_s):
        is_start[0] = True
        is_start[1:] = doc_s[1:] != doc_s[:-1]
    starts = np.nonzero(is_start)[0]

    idx = pa.array(order)
    struct = pa.StructArray.from_arrays(
        [t[f].combine_chunks().take(idx) for f in SPAN_FIELDS],
        names=list(SPAN_FIELDS),
    )
    spans = pa.ListArray.from_arrays(
        pa.array(np.append(starts, len(doc_s)), type=pa.int64()).cast(
            pa.int32()
        ),
        struct,
    )
    first = pa.array(order[starts])
    cols = {"doc_id": t["doc_id"].combine_chunks().take(first)}
    for c in carry:
        cols[c] = t[c].combine_chunks().take(first)
    cols["spans"] = spans
    return pa.table(cols)
