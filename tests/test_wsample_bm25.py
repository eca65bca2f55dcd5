"""Distribution/semantics properties of the weighted sampler and BM25
retrieval (value-exact oracle compares run in test_oracle.py)."""

import numpy as np
import pandas as pd


def test_weighted_sample_biases_toward_weight(ray_session, sf_dir):
    """A-ES sampling by l_quantity must overrepresent heavy rows: the
    sample's mean quantity should clearly exceed the population mean."""
    from crawler_ray.pipelines.queries import QUERIES, _read

    sample = QUERIES["lineitem_weighted_sample"](sf_dir).to_pandas()
    pop = _read(sf_dir, "lineitem", ["l_quantity"]).to_pandas()
    assert len(sample) == min(200, len(pop))
    # NB: the synthetic lineitem table is NOT key-unique on (l_orderkey,
    # l_linenumber) — duplicate identity rows share a race key and may both
    # appear, which is still exact w.r.t. the oracle (identical rows).
    assert sample["l_quantity"].mean() > pop["l_quantity"].mean() * 1.15


def test_weighted_sample_parallelism_invariant(ray_session, sf_dir):
    """The race key is a pure function of the row: re-running yields the
    identical sample regardless of block layout."""
    from crawler_ray.pipelines.queries import QUERIES

    a = QUERIES["lineitem_weighted_sample"](sf_dir).to_pandas()
    b = QUERIES["lineitem_weighted_sample"](sf_dir).to_pandas()
    key = ["l_orderkey", "l_linenumber"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_bm25_ranks_query_term_docs_first(ray_session, sf_dir):
    """Every positive-score doc must contain a query term, scores are
    non-increasing down the ranking, and the top doc beats the corpus
    median score."""
    from crawler_ray.functions.text import tokens_of
    from crawler_ray.pipelines.queries import BM25_QUERY_TERMS, QUERIES, _read

    top = QUERIES["doc_bm25_topk"](sf_dir).to_pandas()
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    ranked = top.sort_values(["score", "doc_id"],
                             ascending=[False, True]).reset_index(drop=True)
    assert (np.diff(ranked["score"].to_numpy()) <= 1e-12).all()
    qset = set(BM25_QUERY_TERMS)
    for _, row in ranked[ranked["score"] > 0].iterrows():
        assert qset & set(tokens_of(text_of[row["doc_id"]]))
