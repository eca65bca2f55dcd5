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


# ------------------------------------------------------------- RankSketch
def _interval_rank_err(xs_sorted: np.ndarray, v: float, q: float) -> float:
    """Distance from q to the rank INTERVAL of v (ties span an interval —
    a returned duplicate value is correct for every rank it covers)."""
    n = len(xs_sorted)
    lo = np.searchsorted(xs_sorted, v, "left") / n
    hi = np.searchsorted(xs_sorted, v, "right") / n
    return 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))


@pytest.mark.parametrize(
    "name",
    ["uniform", "zipf", "sorted", "reversed", "lognormal"],
)
def test_rank_sketch_accuracy(name):
    from crawler_ray.functions.sketch import RankSketch

    rng = np.random.default_rng(7)
    data = {
        "uniform": rng.uniform(0, 1, 200_000),
        "zipf": rng.zipf(1.5, 200_000).astype(float),
        "sorted": np.arange(200_000, dtype=float),
        "reversed": np.arange(200_000, dtype=float)[::-1],
        "lognormal": rng.lognormal(0, 2, 200_000),
    }[name]
    # simulate map_batches partials + arbitrary merge order
    sks = []
    for p in np.array_split(data, 37):
        s = RankSketch(k=256)
        s.add(p)
        sks.append(s)
    sk = sks[0]
    for s in sks[1:]:
        sk.merge(RankSketch.from_bytes(s.to_bytes()))  # serialized merge path
    xs = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        v = sk.quantiles([q])[0]
        assert _interval_rank_err(xs, v, q) <= 0.02, (name, q, v)
    # memory stays O(k log n), not O(n)
    assert sum(len(b) for b in sk.levels) < 4 * 256


def test_rank_sketch_merge_associative_and_empty():
    from crawler_ray.functions.sketch import RankSketch

    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, 30_000)
    a, b, c = RankSketch(), RankSketch(), RankSketch()
    a.add(data[:10_000]); b.add(data[10_000:20_000]); c.add(data[20_000:])
    left = RankSketch.from_bytes(a.to_bytes()).merge(b).merge(c)
    xs = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        assert _interval_rank_err(xs, left.quantiles([q])[0], q) <= 0.02
    with pytest.raises(ValueError):
        RankSketch().quantiles([0.5])
    with pytest.raises(ValueError):
        RankSketch(k=16).merge(RankSketch(k=32))


def test_price_quantiles_sketch_query(ray_session, sf_dir):
    import duckdb

    from crawler_ray.pipelines.queries import QUERIES

    out = QUERIES["price_quantiles_sketch"](sf_dir).to_pandas()
    con = duckdb.connect()
    xs = np.sort(
        con.sql(
            f"SELECT l_extendedprice FROM read_parquet('{sf_dir}/lineitem.parquet')"
        ).df()["l_extendedprice"].to_numpy()
    )
    assert len(out) == 5
    for q, v in zip(out["q"], out["val"]):
        assert _interval_rank_err(xs, v, q) <= 0.02, (q, v)


def test_bottom_k_sample_is_partition_invariant():
    """The round-4 price_quantiles_sketch rests on bottom-k-by-hash being a
    monoid: merging per-part bottom-ks equals the global bottom-k for ANY
    partitioning — so the distributed estimate is a pure function of the
    data (the property the DuckDB oracle depends on)."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(3)
    n, k = 5_000, 256
    vals = rng.lognormal(3, 1, size=n)
    keys = np.array(
        [hashlib.md5(f"{i}-{i % 7}".encode()).hexdigest() for i in range(n)],
        dtype=object,
    )

    def bottom_k(ks, vs):
        idx = np.argsort(ks, kind="stable")[:k]
        return ks[idx], vs[idx]

    g_keys, g_vals = bottom_k(keys, vals)
    for n_parts in (1, 3, 7, 64):
        cuts = np.linspace(0, n, n_parts + 1).astype(int)
        part_keys, part_vals = [], []
        for a, b in zip(cuts[:-1], cuts[1:]):
            pk, pv = bottom_k(keys[a:b], vals[a:b])
            part_keys.append(pk)
            part_vals.append(pv)
        m_keys, m_vals = bottom_k(
            np.concatenate(part_keys), np.concatenate(part_vals)
        )
        assert np.array_equal(m_keys, g_keys)
        assert np.array_equal(m_vals, g_vals)


# ---------------------------------------------------------------- Misra-Gries


def test_misra_gries_superset_guarantee():
    """Every token with count > n/(capacity+1) survives the batch summary,
    and the summary never holds more than `capacity` entries."""
    import pandas as pd

    from crawler_ray.functions.sketch import misra_gries

    rng = np.random.default_rng(3)
    # zipf-ish corpus, vocab far beyond capacity
    toks = pd.Series(
        [f"w{int(v)}" for v in rng.zipf(1.3, size=20_000) % 5_000]
    )
    cap = 16
    mg = misra_gries(toks, cap)
    assert len(mg) <= cap
    exact = toks.value_counts()
    heavy = exact[exact > len(toks) / (cap + 1)]
    assert set(heavy.index) <= set(mg.index)
    # retained counts never exceed exact counts and underestimate boundedly
    for t, c in mg.items():
        assert c <= exact[t]
        assert exact[t] - c <= len(toks) / (cap + 1)


def test_heavy_tokens_exact_on_large_vocab(ray_session, tmp_path):
    """End-to-end 2-pass heavy hitters on a synthetic corpus whose vocab
    (5k) dwarfs the MG capacity (64): result must equal the exact answer."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import queries as Q

    rng = np.random.default_rng(9)
    words = [f"w{int(v)}" for v in rng.zipf(1.2, size=60_000) % 5_000]
    docs = [" ".join(words[i : i + 60]) for i in range(0, len(words), 60)]
    pq.write_table(
        pa.table({"doc_id": list(range(len(docs))), "text": docs}),
        str(tmp_path / "documents.parquet"),
    )
    got = Q.q_doc_heavy_tokens(str(tmp_path)).to_pandas()
    toks = pd.Series(words)
    exact = toks.value_counts()
    want = exact[exact * Q.HH_FACTOR > len(toks)]
    assert dict(zip(got["token"], got["cnt"])) == want.to_dict()
