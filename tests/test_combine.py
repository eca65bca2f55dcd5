"""Unit tests for stages/combine.py — the hash-bucketed combine helpers.

Ground truth is a single-process pandas groupby over the same rows; the
helpers must match it exactly for every supported agg op, for string and
multi-column keys, and for any bucket count (bucketing only partitions the
key space — results are bucket-count invariant).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crawler_ray.stages.combine import (
    bucketed_combine,
    bucketed_distinct,
    n_buckets_for_cluster,
)


def _frame(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k1": rng.integers(0, 400, n).astype(np.int64),
            "k2": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
            "v": rng.normal(size=n),
            "w": rng.integers(-50, 50, n).astype(np.int64),
        }
    )


@pytest.mark.parametrize("n_buckets", [None, 4, 64])
def test_bucketed_combine_matches_pandas(ray_session, n_buckets):
    df = _frame()
    ds = rd.from_pandas(df).repartition(9)
    out = (
        bucketed_combine(
            ds,
            ["k1", "k2"],
            {
                "sum_v": ("v", "sum"),
                "min_w": ("w", "min"),
                "max_w": ("w", "max"),
                "n": ("v", "size"),
            },
            n_buckets=n_buckets,
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(
            sum_v=("v", "sum"),
            min_w=("w", "min"),
            max_w=("w", "max"),
            n=("v", "size"),
        )
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[exp.columns.tolist()], exp, check_dtype=False, atol=1e-9
    )


def test_bucketed_combine_string_key_arrow_input(ray_session):
    df = _frame(2000, seed=11)
    t = pa.Table.from_pandas(df, preserve_index=False)
    ds = rd.from_arrow(t).repartition(5)
    out = (
        bucketed_combine(ds, ["k2"], {"total": ("w", "sum")})
        .to_pandas()
        .sort_values("k2")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k2", as_index=False)
        .agg(total=("w", "sum"))
        .sort_values("k2")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_bucketed_distinct_marker(ray_session):
    df = _frame(3000, seed=3)
    ds = rd.from_pandas(df).repartition(7)
    out = bucketed_distinct(ds, "k1", marker="__hit").to_pandas()
    assert sorted(out.columns) == ["__hit", "k1"]
    assert (out["__hit"] == 1).all()
    assert out["k1"].is_unique
    assert set(out["k1"]) == set(df["k1"].unique())


def test_bucketed_distinct_no_marker(ray_session):
    df = _frame(1000, seed=5)
    ds = rd.from_pandas(df).repartition(3)
    out = bucketed_distinct(ds, "k2").to_pandas()
    assert out.columns.tolist() == ["k2"]
    assert sorted(out["k2"]) == sorted(df["k2"].unique())


def test_n_buckets_power_of_two(ray_session):
    n = n_buckets_for_cluster()
    assert n >= 32 and (n & (n - 1)) == 0


def test_bucketed_combine_keeps_null_key_group(ray_session):
    # SQL GROUP BY / Ray aggregate semantics: a null key is a group, not a
    # row to drop (regression: pandas groupby defaults to dropna=True)
    df = pd.DataFrame(
        {
            "k": ["a", None, "b", None, "a", None],
            "v": [1, 10, 100, 20, 2, 30],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        bucketed_combine(ds, ["k"], {"total": ("v", "sum")})
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out.loc[out["k"].isna(), "total"].iloc[0] == 60
    assert out.loc[out["k"] == "a", "total"].iloc[0] == 3
    assert out.loc[out["k"] == "b", "total"].iloc[0] == 100


def test_n_buckets_for_rows_scales_with_volume(ray_session):
    from crawler_ray.stages.combine import (
        TARGET_ROWS_PER_BUCKET,
        n_buckets_for_rows,
    )

    floor = n_buckets_for_cluster()
    # small / unknown inputs keep the CPU floor
    assert n_buckets_for_rows(None) == floor
    assert n_buckets_for_rows(0) == floor
    assert n_buckets_for_rows(100) == floor
    # large inputs grow the bucket count so max rows/bucket stays bounded:
    # with CPUs held fixed, 10x the rows means >= 10x/2 the buckets
    big = 400 * TARGET_ROWS_PER_BUCKET
    n_big = n_buckets_for_rows(big)
    assert n_big >= 400 and (n_big & (n_big - 1)) == 0
    assert big / n_big <= TARGET_ROWS_PER_BUCKET
    n_bigger = n_buckets_for_rows(big * 10)
    assert n_bigger >= n_big * 8
