"""Property-based checks for the partitioned join layer: hash_join /
attach_unique must agree with a driver-side pandas merge on arbitrary
key/value data (types preserved, nulls handled, every bucket boundary
exercised)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import ray.data as rd

from crawler_ray.stages.join import attach_unique, bucket_ids, hash_join

keys = st.integers(min_value=-5, max_value=5)


def _df(ds, cols):
    """Ray quirk: to_pandas() of a zero-row dataset returns a column-less
    frame even when ds.schema() is fully typed — reapply the columns."""
    df = ds.to_pandas()
    if df.empty and not list(df.columns):
        assert ds.schema().names == cols  # the dataset itself kept its schema
        df = pd.DataFrame(columns=cols)
    return df


@st.composite
def join_inputs(draw):
    lkeys = draw(st.lists(keys, min_size=1, max_size=30))
    rkeys = draw(st.lists(keys, min_size=1, max_size=8, unique=True))
    return lkeys, rkeys


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(join_inputs())
def test_attach_unique_matches_pandas_left_merge(ray_session, inputs):
    lkeys, rkeys = inputs
    left = pd.DataFrame({"k": lkeys, "v": np.arange(len(lkeys), dtype=np.int32)})
    right = pd.DataFrame({"rk": rkeys,
                          "w": [f"w{k}" for k in rkeys]})
    got = (
        attach_unique(rd.from_pandas(left), rd.from_pandas(right),
                      "k", "rk", n_buckets=4, how="left")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk", how="left")
        .drop(columns=["rk"]).sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "v", "w"]], want[["k", "v", "w"]], check_dtype=False
    )
    # int32 value column survives the shuffle un-widened
    assert got["v"].dtype == np.int32


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(join_inputs())
def test_hash_join_inner_matches_pandas(ray_session, inputs):
    lkeys, rkeys = inputs
    left = pd.DataFrame({"k": lkeys, "v": range(len(lkeys))})
    right = pd.DataFrame({"rk": rkeys, "w": [k * 10 for k in rkeys]})
    got = (
        _df(hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      "k", "rk", n_buckets=4, how="inner"),
            ["k", "v", "w"])
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk", how="inner")
        .drop(columns=["rk"]).sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got[["k", "v", "w"]], want[["k", "v", "w"]], check_dtype=False
        )


@given(st.lists(st.one_of(st.integers(min_value=-2**40, max_value=2**40),
                          st.text(max_size=12)),
                min_size=1, max_size=60))
@settings(max_examples=50, deadline=None)
def test_bucket_ids_deterministic_and_in_range(values):
    # all-int or all-str (mixed-type key columns are not a join contract)
    if len({type(v) for v in values}) > 1:
        values = [str(v) for v in values]
    arr = np.asarray(values, dtype=object if isinstance(values[0], str) else None)
    b1 = bucket_ids(arr, 16)
    b2 = bucket_ids(np.asarray(list(values),
                               dtype=object if isinstance(values[0], str) else None), 16)
    assert (b1 == b2).all()
    assert ((0 <= b1) & (b1 < 16)).all()
    # equal values always agree on the bucket
    for v, b in zip(values, b1):
        assert b == bucket_ids(np.asarray([v], dtype=arr.dtype), 16)[0]


def test_attach_unique_rejects_payload_collision(ray_session):
    l = rd.from_pandas(pd.DataFrame({"k": [1], "w": [2]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1], "w": [3]}))
    with pytest.raises(ValueError, match="collision"):
        attach_unique(l, r, "k", "k")


def test_hash_join_cross_dtype_keys_match(ray_session):
    """int32 left key vs int64 right key (incl. negatives, whose raw-bit
    hashes differ by width) must still join: keys are normalized to one
    unified dtype before bucketing."""
    left = pd.DataFrame({"k": np.array([-1, 0, 3, 7], dtype=np.int32),
                         "v": np.arange(4)})
    right = pd.DataFrame({"rk": np.array([-1, 3, 9], dtype=np.int64),
                          "w": ["a", "b", "c"]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  "k", "rk", n_buckets=8, how="inner")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(got["k"]) == [-1, 3]
    assert list(got["w"]) == ["a", "b"]


def test_attach_unique_cross_dtype_keys_match(ray_session):
    left = pd.DataFrame({"k": np.array([-1, 5, 8], dtype=np.int64), "v": [1, 2, 3]})
    right = pd.DataFrame({"rk": np.array([-1, 8], dtype=np.int32), "w": ["x", "y"]})
    got = (
        attach_unique(rd.from_pandas(left), rd.from_pandas(right),
                      "k", "rk", n_buckets=8, how="left")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(got["w"].fillna("-")) == ["x", "-", "y"]


def test_hash_join_right_key_collides_with_left_payload(ray_session):
    """right_key shares its name with a NON-KEY left column: pandas suffixes
    right's key to rk__r, and the drop must remove THAT, not left's rk."""
    left = pd.DataFrame({"k": [1, 2], "rk": ["keep_a", "keep_b"]})
    right = pd.DataFrame({"rk": [1, 2], "w": [10, 20]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  "k", "rk", n_buckets=4, how="inner")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert sorted(got.columns) == ["k", "rk", "w"]
    assert list(got["rk"]) == ["keep_a", "keep_b"]  # LEFT's column survives
    assert list(got["w"]) == [10, 20]
