"""Bloom-filter stage: kernel properties and the exactness of the
semi/anti joins built on it (the oracle test covers the query-level
outputs; these pin the stage invariants directly)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crawler_ray.stages.bloom import (
    _as_u64,
    bloom_build,
    bloom_semi_join,
    member_mask,
)

M_BITS = 1 << 14
K = 4


def _build_local(keys) -> bytes:
    ds = rd.from_arrow(pa.table({"k": keys}))
    return bloom_build(ds, "k", M_BITS, K)


def test_no_false_negatives_int(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    bloom = _build_local(keys)
    assert member_mask(keys, bloom, M_BITS, K).all()


def test_false_positive_rate_bounded(ray_session):
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**40, size=1000, dtype=np.int64)
    bloom = _build_local(members)
    probe = rng.integers(2**41, 2**42, size=20000, dtype=np.int64)
    fp = member_mask(probe, bloom, M_BITS, K).mean()
    # m/n = 16.4 bits/key, k=4 -> theoretical fp ~0.3%; allow generous slack
    assert fp < 0.05, fp


def test_string_keys_hash_deterministically(ray_session):
    keys = np.array([f"url-{i}" for i in range(500)], dtype=object)
    bloom = _build_local(keys)
    assert member_mask(keys, bloom, M_BITS, K).all()
    other = np.array([f"other-{i}" for i in range(5000)], dtype=object)
    assert member_mask(other, bloom, M_BITS, K).mean() < 0.05
    # _as_u64 must be a pure function of the value (cross-process stability)
    assert (_as_u64(keys[:10]) == _as_u64(keys[:10].copy())).all()


@pytest.mark.parametrize("anti", [False, True])
def test_semi_and_anti_join_exact(ray_session, anti):
    rng = np.random.default_rng(23)
    probe_keys = rng.integers(0, 300, size=4000, dtype=np.int64)
    build_keys = np.unique(rng.integers(0, 150, size=200, dtype=np.int64))
    probe = rd.from_arrow(
        pa.table({"k": probe_keys, "payload": np.arange(4000, dtype=np.int64)})
    ).repartition(8)
    build = rd.from_arrow(
        # duplicate build rows on purpose: the join must still be set-like
        pa.table({"bk": np.concatenate([build_keys, build_keys])})
    ).repartition(4)

    out = bloom_semi_join(
        probe, "k", build, "bk", anti=anti, m_bits=1 << 12, n_hashes=3
    ).to_pandas()

    member = np.isin(probe_keys, build_keys)
    want = pd.DataFrame(
        {"k": probe_keys[~member if anti else member],
         "payload": np.arange(4000)[~member if anti else member]}
    )
    got = out.sort_values("payload").reset_index(drop=True)
    want = want.sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "payload"]], want, check_dtype=False
    )


def test_reserved_column_rejected(ray_session):
    probe = rd.from_arrow(pa.table({"k": [1], "__hit": [1]}))
    build = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="__hit"):
        bloom_semi_join(probe, "k", build, "k")
