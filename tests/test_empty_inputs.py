"""Empty-input conformance: queries must match their oracles on ZERO-row
tables too (the oracle contract is exact equality, and several operators
have driver-side boundary computations — quantile boundaries, funnel
stage seeds — that only an empty corpus exercises)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, ray_session) -> str:
    """An sf directory whose documents/events tables have the real schemas
    but zero rows."""
    root = tmp_path_factory.mktemp("sf_empty")
    real = "/root/testdata/sf0.001"
    for name in ("documents", "events"):
        schema = pq.ParquetFile(os.path.join(real, f"{name}.parquet")).schema_arrow
        pq.write_table(schema.empty_table(), os.path.join(root, f"{name}.parquet"))
    return str(root)


def test_funnel_emits_zero_stage_rows(empty_sf_dir):
    from crawler_ray.pipelines.queries import FUNNEL_STAGES, q_events_funnel

    rows = sorted(q_events_funnel(empty_sf_dir).take_all(), key=lambda r: r["stage"])
    want = sorted(
        " > ".join(FUNNEL_STAGES[: i + 1]) for i in range(len(FUNNEL_STAGES))
    )
    assert [r["stage"] for r in rows] == want
    assert all(r["n_users"] == 0 for r in rows)


def test_topq_filter_empty_corpus(empty_sf_dir):
    from crawler_ray.pipelines.queries import q_doc_topq_filter

    out = q_doc_topq_filter(empty_sf_dir)
    assert out.count() == 0
    assert set(out.schema().names) == {"source", "n_kept", "sum_chars", "min_score"}


def test_window_rank_empty(empty_sf_dir):
    from crawler_ray.pipelines.queries import q_events_window_rank

    assert q_events_window_rank(empty_sf_dir).count() == 0


def test_pivot_empty(empty_sf_dir):
    from crawler_ray.pipelines.queries import q_events_pivot

    assert q_events_pivot(empty_sf_dir).count() == 0


def test_span_boilerplate_empty(empty_sf_dir):
    from crawler_ray.pipelines.queries import q_span_boilerplate

    assert q_span_boilerplate(empty_sf_dir).count() == 0


def test_round5b_queries_empty(empty_sf_dir):
    """The round-5b operators all emit zero rows on zero-row inputs
    (matching their oracles, which produce no rows from empty unnests,
    joins and groupbys)."""
    from crawler_ray.pipelines.queries import QUERIES

    for name in (
        "events_zscore",
        "doc_ngram_novelty",
        "doc_bigram_lm",
        "events_distinct_users",
        "doc_snapshot_diff",
    ):
        out = QUERIES[name](empty_sf_dir)
        assert out.count() == 0, name


def test_semdedup_empty(empty_sf_dir):
    import os

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.queries import QUERIES

    schema = pq.ParquetFile(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).schema_arrow
    pq.write_table(
        schema.empty_table(), os.path.join(empty_sf_dir, "embeddings.parquet")
    )
    assert QUERIES["emb_semdedup"](empty_sf_dir).count() == 0
    assert QUERIES["emb_kmeans_assign"](empty_sf_dir).count() == 0


def test_round5c_queries_empty(empty_sf_dir):
    """langid emits one 'und' row per doc (LEFT JOIN semantics) — zero
    docs, zero rows; substring dups emits one row per doc with >= 1
    window — zero docs, zero rows."""
    from crawler_ray.pipelines.queries import QUERIES

    assert QUERIES["doc_langid"](empty_sf_dir).count() == 0
    assert QUERIES["doc_substring_dups"](empty_sf_dir).count() == 0


def test_pmi_and_inverted_index_empty(empty_sf_dir):
    """Both emit corpus-level top-K tables — an empty corpus yields zero
    rows with the declared (typed) schemas, matching their SQL oracles."""
    from crawler_ray.pipelines.queries import QUERIES

    pmi = QUERIES["doc_pmi_collocations"](empty_sf_dir)
    assert pmi.count() == 0
    assert set(pmi.schema().names) == {
        "bigram", "n_pair", "n_left", "n_right", "pmi"
    }
    idx = QUERIES["doc_inverted_index"](empty_sf_dir)
    assert idx.count() == 0
    assert set(idx.schema().names) == {"token", "df", "cf", "top_doc", "top_tf"}


def test_round5d_queries_empty(empty_sf_dir):
    """doc_chunk / doc_dsir_weights / doc_pmi_collocations /
    doc_inverted_index / span_pack emit zero-row Datasets on a zero-row
    corpus (matching their oracles); doc_bpe_merges returns the typed
    empty merge TABLE and is asserted separately below."""
    from crawler_ray.pipelines.queries import QUERIES

    for name in (
        "doc_chunk",
        "doc_dsir_weights",
        "doc_pmi_collocations",
        "doc_inverted_index",
        "span_pack",
    ):
        out = QUERIES[name](empty_sf_dir)
        assert out.count() == 0, name

    bpe = QUERIES["doc_bpe_merges"](empty_sf_dir)
    assert bpe.num_rows == 0
    assert bpe.column_names == ["merge_rank", "s1", "s2", "n"]


def test_events_cube_empty_emits_zero_grand_total(empty_sf_dir):
    """SQL aggregates over an empty fine level yield one grand-total row
    (COALESCEd to zero in the oracle); the Ray side derives the same row
    from empty partial sums."""
    from crawler_ray.pipelines.queries import q_events_cube

    rows = q_events_cube(empty_sf_dir).to_pylist()
    assert rows == [
        {"event_type": "ALL", "dow": "ALL", "n": 0, "sum_value": 0.0}
    ]
