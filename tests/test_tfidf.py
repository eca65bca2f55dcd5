"""TF-IDF top-terms: broadcast path vs distributed-join path must agree
(the vocab threshold only changes the execution plan, never the answer)."""

from __future__ import annotations

import pandas as pd

from crawler_ray.pipelines import queries as Q


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[["doc_id", "token", "tf", "df", "tfidf", "rnk"]]
    return sorted(map(tuple, df.itertuples(index=False)))


def test_join_path_matches_broadcast_path(ray_session, sf_dir, monkeypatch):
    broadcast = Q.q_doc_tfidf_top_terms(sf_dir).to_pandas()
    monkeypatch.setattr(Q, "TFIDF_BROADCAST_VOCAB", 0)
    joined = Q.q_doc_tfidf_top_terms(sf_dir).to_pandas()
    assert _canon(broadcast) == _canon(joined)
    assert (broadcast["rnk"] <= Q.TFIDF_TOP_K).all()
    assert broadcast.groupby("doc_id").size().max() <= Q.TFIDF_TOP_K
