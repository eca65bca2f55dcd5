"""q_doc_bpe_merges is path-invariant: the driver-local merge loop
(vocab <= BPE_LOCAL_VOCAB) and the distributed per-round exchanges
produce the identical merge table.  Runs at the sf_dir fixture scale so
the GRAFT_ORACLE_SF end-of-round sweep exercises the invariance at the
swept scale too."""

from __future__ import annotations

import pandas as pd
import pytest


def test_bpe_local_and_distributed_paths_agree(ray_session, monkeypatch, sf_dir):
    from crawler_ray.pipelines import queries

    local = queries.q_doc_bpe_merges(sf_dir).to_pandas()
    assert len(local) == queries.BPE_MERGE_ROUNDS  # real text: no early stop

    monkeypatch.setattr(queries, "BPE_LOCAL_VOCAB", 0)
    dist = queries.q_doc_bpe_merges(sf_dir).to_pandas()

    pd.testing.assert_frame_equal(
        local.reset_index(drop=True), dist.reset_index(drop=True)
    )


def test_bpe_merge_is_left_to_right_non_overlapping(ray_session, tmp_path):
    """A planted overlap run ('aaaa', freq-weighted) merges as the
    reference BPE does: [aa, aa], never [a, aa, a]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import queries

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aaaa aaaa aaaa", "aaaa ab"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([14, 7], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = queries.q_doc_bpe_merges(str(tmp_path)).to_pandas()
    rows = list(out.itertuples(index=False))
    # round 1: (a,a) appears 3x per 'aaaa' (freq 4) + 1x in 'ab'?  no —
    # 'ab' has pair (a,b): counts (a,a)=3*4=12, (a,b)=1.  merge 'aa'.
    assert (rows[0].s1, rows[0].s2, rows[0].n) == ("a", "a", 12)
    # after the merge every 'aaaa' is [aa, aa] (left-to-right), so round
    # 2 sees (aa,aa)=4; 'ab' stays [a, b] giving (a,b)=1
    assert (rows[1].s1, rows[1].s2, rows[1].n) == ("aa", "aa", 4)
