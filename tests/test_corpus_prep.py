"""Semantics of the train/val/test split and the corpus-prep composite
(value-exact oracle compares run in test_oracle.py)."""

import hashlib

import numpy as np
import pandas as pd


def test_split_fractions_and_determinism(ray_session, sf_dir):
    """80/10/10 by salted hash: every doc labeled, fractions near target,
    and the assignment is a pure function of the id (re-run identical)."""
    from crawler_ray.pipelines.queries import QUERIES

    a = QUERIES["doc_split"](sf_dir).to_pandas()
    b = QUERIES["doc_split"](sf_dir).to_pandas()
    assert len(a) == 500 and set(a["split"]) <= {"train", "val", "test"}
    frac = a["split"].value_counts(normalize=True)
    assert 0.70 <= frac.get("train", 0) <= 0.90
    assert frac.get("val", 0) <= 0.20 and frac.get("test", 0) <= 0.20
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_split_is_salted_hash_of_id(ray_session, sf_dir):
    """The label depends only on md5('split:'+id) — spot-check rows against
    a direct recomputation (oracle parity is the md5 prefix rule)."""
    from crawler_ray.pipelines.queries import QUERIES

    out = QUERIES["doc_split"](sf_dir).to_pandas()
    for _, row in out.head(50).iterrows():
        hv = int.from_bytes(
            hashlib.md5(f"split:{int(row.doc_id)}".encode()).digest()[:4],
            "big",
        )
        want = (
            "train" if hv * 10 < (8 << 32)
            else "val" if hv * 10 < (9 << 32)
            else "test"
        )
        assert row.split == want


def test_prepare_corpus_dedups_echo_to_originals(ray_session, sf_dir):
    """The synthetic re-crawl echo must collapse: no surviving canonical
    carries an echoed id (min(doc_id) always picks the original), every
    survivor passes the gate, and hashes are unique."""
    from crawler_ray.pipelines.queries import (
        PREP_ECHO_OFFSET,
        PREP_MIN_CHARS,
        PREP_MIN_TOKENS,
        QUERIES,
        _read,
    )

    out = QUERIES["prepare_corpus"](sf_dir).to_pandas()
    assert (out["doc_id"] < PREP_ECHO_OFFSET).all()
    assert out["content_hash"].is_unique
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    # Fixture preconditions this test's exact-count assertions rest on
    # (the PIPELINE stays correct without them; only the counts below
    # would need loosening if the corpus generator ever changes):
    assert docs["doc_id"].max() < PREP_ECHO_OFFSET
    assert not docs["text"].duplicated().any()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    surv = out["doc_id"].map(text_of)
    n_tok = surv.str.count(" ").to_numpy() + 1
    assert (surv.str.len().to_numpy() >= PREP_MIN_CHARS).all()
    assert (n_tok >= PREP_MIN_TOKENS).all()
    # gated-out docs really exist (the gate does work on this corpus)
    n_gated = (
        (docs["text"].str.len() < PREP_MIN_CHARS)
        | (docs["text"].str.count(" ") + 1 < PREP_MIN_TOKENS)
    ).sum()
    assert n_gated > 0
    assert len(out) == len(docs) - n_gated


def test_prepare_corpus_split_matches_doc_split_rule(ray_session, sf_dir):
    """Both operators share one membership rule: survivors of the prep
    pipeline carry the same label doc_split assigns them."""
    from crawler_ray.pipelines.queries import QUERIES

    prep = QUERIES["prepare_corpus"](sf_dir).to_pandas()
    split = QUERIES["doc_split"](sf_dir).to_pandas()
    label_of = dict(zip(split["doc_id"], split["split"]))
    assert (prep["doc_id"].map(label_of) == prep["split"]).all()


def test_pack_sequences_prefix_scan_invariants(ray_session, sf_dir):
    """The distributed prefix scan must equal a single-process scan:
    seq ids are nondecreasing in doc order, start at 0, and match a
    direct pandas cumsum recomputation (the oracle re-checks via SQL)."""
    from crawler_ray.pipelines.queries import PACK_BUDGET, QUERIES

    out = (
        QUERIES["doc_pack_sequences"](sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 500
    run_before = out["n_tok"].cumsum() - out["n_tok"]
    expect = (run_before // PACK_BUDGET).to_numpy()
    assert (out["seq_id"].to_numpy() == expect).all()
    assert out["seq_id"].iloc[0] == 0
    assert (np.diff(out["seq_id"].to_numpy()) >= 0).all()
    assert out["seq_id"].nunique() > 1  # the budget actually cuts


def test_mixture_order_is_weighted_round_robin(ray_session, sf_dir):
    """Per-source ranks are dense 1..n_s in doc order, and in any prefix
    of the interleaved order each source's share tracks its weight."""
    from crawler_ray.pipelines.queries import MIX_SCALE, QUERIES

    out = QUERIES["doc_mixture_order"](sf_dir).to_pandas()
    assert len(out) == 500
    for s, grp in out.groupby("source"):
        g = grp.sort_values("doc_id")
        assert (g["src_rank"].to_numpy() == np.arange(1, len(g) + 1)).all()
        w = 1 + len(s) % 3
        assert (g["mix_key"].to_numpy()
                == g["src_rank"].to_numpy() * MIX_SCALE // w).all()
    # weighted fairness: after any cutoff K on mix_key, source s has
    # floor-ish K*w/MIX_SCALE docs (or all of them) — spot-check one cut
    cut = int(out["mix_key"].quantile(0.5))
    taken = out[out["mix_key"] <= cut].groupby("source").size()
    for s, grp in out.groupby("source"):
        w = 1 + len(s) % 3
        want = min(cut * w // MIX_SCALE, len(grp))
        assert abs(int(taken.get(s, 0)) - want) <= 1


def test_range_bucketed_balances_skewed_ids_without_overflow(ray_session):
    """Quantile boundaries keep buckets balanced under sparse/skewed ids
    (a value-range formula would put ALL rows in bucket 0 here and its
    int64 product would wrap at snowflake-scale spans)."""
    import ray.data as rd
    import pyarrow as pa

    from crawler_ray.pipelines.queries import (
        _exclusive_offsets,
        _range_bucketed,
    )

    ids = np.concatenate([np.arange(100_000), [10**18]])
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    ).materialize()
    bucketed = _range_bucketed(ds, "doc_id")
    counts = _exclusive_offsets(bucketed, (), None)
    sizes = np.diff([v for _, v in sorted(counts.items())] + [len(ids)])
    assert len(sizes) > 1 and sizes.max() <= len(ids) * 0.6
    df = bucketed.to_pandas().sort_values("doc_id")
    b = df["bucket"].to_numpy()
    assert (b >= 0).all() and (np.diff(b) >= 0).all()


def test_mixture_order_rejects_null_source(ray_session, tmp_path):
    """A null source has no weight/partition; the operator must fail
    loudly at the projection, not KeyError deep inside a worker."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from crawler_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "source": pa.array(["a", None]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with pytest.raises(Exception, match="null source"):
        QUERIES["doc_mixture_order"](str(tmp_path)).to_pandas()


def test_exclusive_offsets_carries_null_keys(ray_session):
    """House convention (stages/combine.py): a null key is a GROUP, not
    a row to silently discard — the keyed fold must count it."""
    import ray.data as rd
    import pyarrow as pa

    from crawler_ray.pipelines.queries import (
        _exclusive_offsets,
        _range_bucketed,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["a", None, "a", None]),
        }
    )
    bucketed = _range_bucketed(rd.from_arrow(t).materialize(), "doc_id")
    offs = _exclusive_offsets(bucketed, ("source",), None)
    a_buckets = sorted(k for k in offs if isinstance(k[0], str))
    null_buckets = sorted(
        (k for k in offs if not isinstance(k[0], str)), key=lambda k: k[-1]
    )
    assert a_buckets and null_buckets  # the null key survives the fold
    # exclusive offsets within each key are nondecreasing from 0
    for keyed in (a_buckets, null_buckets):
        vals = [offs[k] for k in keyed]
        assert vals[0] == 0 and vals == sorted(vals)
    # the null group really holds its 2 rows (nothing silently dropped)
    grp = bucketed.to_pandas().groupby("source", dropna=False).size()
    assert int(grp.get("a", 0)) == 2 and int(grp[grp.index.isna()].sum()) == 2
