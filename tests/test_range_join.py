"""range_count_join semantics: half-open trailing window [t-w, t), exact
boundary behavior at window multiples, empty build partitions, and
agreement with a brute-force O(n²) reference on random data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from crawler_ray.stages.join import range_count_join

W = 1_000_000  # 1 s window in µs


def _run(left: pd.DataFrame, right: pd.DataFrame) -> dict[int, int]:
    out = range_count_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key=("k", "k"),
        time=("t", "t"),
        window_us=W,
        id_col="rid",
        out_col="n",
    ).to_pandas()
    return dict(zip(out["rid"], out["n"]))


def _brute(left: pd.DataFrame, right: pd.DataFrame) -> dict[int, int]:
    res = {}
    for _, a in left.iterrows():
        res[a["rid"]] = int(
            (
                (right["k"] == a["k"])
                & (right["t"] >= a["t"] - W)
                & (right["t"] < a["t"])
            ).sum()
        )
    return res


def test_boundaries_exact(ray_session):
    # probe at t=3W exactly: window is [2W, 3W) — 2W included, 3W excluded
    left = pd.DataFrame({"rid": [1], "k": [7], "t": [3 * W]})
    right = pd.DataFrame(
        {"k": [7, 7, 7, 7, 8], "t": [2 * W - 1, 2 * W, 3 * W - 1, 3 * W, 2 * W]}
    )
    assert _run(left, right) == {1: 2}


def test_empty_build_side_yields_zero(ray_session):
    left = pd.DataFrame({"rid": [1, 2], "k": [1, 2], "t": [5 * W, 9 * W]})
    right = pd.DataFrame({"k": [3], "t": [5 * W]})
    assert _run(left, right) == {1: 0, 2: 0}


def test_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(11)
    n_l, n_r = 300, 500
    left = pd.DataFrame(
        {
            "rid": np.arange(n_l),
            "k": rng.integers(0, 8, n_l),
            "t": rng.integers(0, 20 * W, n_l),
        }
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 8, n_r), "t": rng.integers(0, 20 * W, n_r)}
    )
    assert _run(left, right) == _brute(left, right)


def test_every_left_row_present_even_with_no_matches(ray_session):
    left = pd.DataFrame({"rid": [10, 11], "k": [1, 1], "t": [0, W]})
    right = pd.DataFrame({"k": [1], "t": [10 * W]})
    got = _run(left, right)
    assert set(got) == {10, 11}
    assert all(v == 0 for v in got.values())
