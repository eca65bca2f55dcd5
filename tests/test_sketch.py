"""HyperLogLog accuracy, mergeability, serialization; distributed query."""

import numpy as np
import pytest

from crawler_ray.functions.sketch import HyperLogLog


def test_accuracy_across_scales():
    rng = np.random.default_rng(11)
    for n in (50, 1_000, 50_000):
        sk = HyperLogLog(p=12)
        sk.add_hashes(rng.integers(0, 1 << 64, size=n, dtype=np.uint64))
        est = sk.estimate()
        assert abs(est - n) / n < 0.08, (n, est)


def test_merge_equals_union():
    rng = np.random.default_rng(5)
    a_vals = rng.integers(0, 1 << 64, size=5000, dtype=np.uint64)
    b_vals = rng.integers(0, 1 << 64, size=5000, dtype=np.uint64)
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.add_hashes(a_vals)
    b.add_hashes(b_vals)
    u.add_hashes(np.concatenate([a_vals, b_vals]))
    merged = a.merge(b)
    assert merged.estimate() == pytest.approx(u.estimate())


def test_roundtrip_and_dedup():
    sk = HyperLogLog(p=10)
    sk.add_strings([f"user-{i % 100}" for i in range(10_000)])  # only 100 distinct
    est = HyperLogLog.from_bytes(sk.to_bytes()).estimate()
    assert abs(est - 100) / 100 < 0.1


def test_precision_validation():
    with pytest.raises(ValueError):
        HyperLogLog(p=2)
    with pytest.raises(ValueError):
        HyperLogLog(p=12).merge(HyperLogLog(p=10))


def test_distributed_hll_query(ray_session, sf_dir):
    import duckdb

    from crawler_ray.pipelines.queries import q_event_user_hll

    approx = {
        r["event_type"]: r["approx_distinct_users"]
        for r in q_event_user_hll(sf_dir).take_all()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / max(1, n) < 0.1, (k, n, approx[k])
