"""Interleaved span-document kernels (crawler_ray/stages/spans.py):
vectorized synthesis pinned against an independent per-row reference
implementation, and the flatten -> reassemble roundtrip checked for the
north-rule per-row invariant: SPAN-SEQUENCE EQUALITY (kind, text,
media_ref, offset order)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.stages.spans import (
    flatten_spans,
    reassemble_spans,
    synthesize_spans,
)

W = 4


def ref_spans(doc_id: int, text: str, w: int = W):
    """Sequential per-row reference of the synthesis rule."""
    words = text.split(" ")
    out = []
    for ci in range((len(words) + w - 1) // w):
        out.append(("text", " ".join(words[ci * w : ci * w + w]), "", len(out)))
        if (doc_id * 31 + ci * 7) % 5 == 0:
            out.append(("image", "", f"img://{doc_id}/{ci}", len(out)))
    return out


def spans_of(table: pa.Table):
    return {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
        for row in table.to_pylist()
    }


def make_table(ids, texts, sources=None):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": sources or ["s"] * len(ids),
            "text": texts,
        }
    )


def test_synthesis_matches_reference_rows():
    ids = [0, 1, 5, 7, 12, 999]
    texts = [
        "a b c d e f g h i",
        "one two three",
        " ".join(f"w{i}" for i in range(23)),
        "",
        "x",
        " ".join("tok" for _ in range(8)),
    ]
    got = spans_of(synthesize_spans(make_table(ids, texts), W))
    for d, txt in zip(ids, texts):
        assert got[d] == ref_spans(d, txt), d


def test_offsets_are_dense_ordinals():
    t = synthesize_spans(make_table([3, 4], ["a b c d e", "f g h"]), W)
    for row in t.to_pylist():
        offs = [s["offset"] for s in row["spans"]]
        assert offs == list(range(len(offs)))


def test_flatten_carries_parents_and_counts():
    t = make_table([1, 2], ["a b c d e f", "g h"], ["src1", "src2"])
    s = synthesize_spans(t, W)
    f = flatten_spans(s, carry=("doc_id", "source"))
    assert f.num_rows == sum(len(r["spans"]) for r in s.to_pylist())
    by_doc = f.to_pandas().groupby("doc_id")["source"].unique()
    assert list(by_doc[1]) == ["src1"] and list(by_doc[2]) == ["src2"]


def test_roundtrip_span_sequence_equality():
    rng = np.random.default_rng(7)
    ids = list(range(40))
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd"], size=rng.integers(1, 30)))
        for _ in ids
    ]
    s = synthesize_spans(make_table(ids, texts), W)
    f = flatten_spans(s, carry=("doc_id", "source"))
    # arbitrary row shuffle: reassembly must restore exact interleaving
    perm = rng.permutation(f.num_rows)
    r = reassemble_spans(f.take(pa.array(perm)), carry=("source",))
    assert spans_of(r) == spans_of(s)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcXYZ09", min_size=1, max_size=6),
            min_size=1,
            max_size=17,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_roundtrip_and_char_conservation(word_lists):
    ids = list(range(len(word_lists)))
    texts = [" ".join(ws) for ws in word_lists]
    s = synthesize_spans(make_table(ids, texts), W)
    got = spans_of(s)
    for d, txt in zip(ids, texts):
        assert got[d] == ref_spans(d, txt)
        # text spans rejoin to the original text
        joined = " ".join(t for k, t, _, _ in got[d] if k == "text")
        assert joined == txt
    f = flatten_spans(s, carry=("doc_id", "source"))
    r = reassemble_spans(f.take(pa.array(np.arange(f.num_rows)[::-1])))
    assert spans_of(r) == got


def test_empty_batch():
    t = make_table([], [])
    s = synthesize_spans(t, W)
    assert s.num_rows == 0
    f = flatten_spans(s)
    assert f.num_rows == 0


def test_reassemble_requires_colocated_docs_contract():
    # the documented contract: reassembly is batch-local; a batch holding
    # one doc reassembles that doc alone (no silent cross-batch merge)
    s = synthesize_spans(make_table([5], ["p q r s t"]), W)
    f = flatten_spans(s)
    r = reassemble_spans(f)
    assert spans_of(r) == spans_of(s)
