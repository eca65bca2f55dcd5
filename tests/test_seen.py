"""URL-seen state: cuckoo filter guarantees, shard offer/resolve
determinism, routing stability."""

import hashlib
import random

import numpy as np
import pyarrow as pa

from crawler_ray.state.seen import (
    CuckooFilter,
    SeenShard,
    shard_of,
    shard_of_batch,
)


def _hashes(n, salt=""):
    return [hashlib.sha256(f"{salt}{i}".encode()).hexdigest() for i in range(n)]


def _offer_tbl(rows):
    """rows: (url_hash, sortkey, url, host, parent)"""
    return pa.table(
        {
            "url_hash": pa.array([r[0] for r in rows], type=pa.string()),
            "sortkey": pa.array([r[1] for r in rows], type=pa.string()),
            "url": pa.array([r[2] for r in rows], type=pa.string()),
            "host": pa.array([r[3] for r in rows], type=pa.string()),
            "parent_hash": pa.array([r[4] for r in rows], type=pa.string()),
        }
    )


class TestCuckoo:
    def test_no_false_negatives(self):
        ck = CuckooFilter(capacity=1 << 14)
        rng = random.Random(1)
        vals = [rng.getrandbits(63) for _ in range(5000)]
        for v in vals:
            assert ck.add(v)
        assert all(ck.contains(v) for v in vals)

    def test_false_positive_rate(self):
        ck = CuckooFilter(capacity=1 << 14)
        rng = random.Random(2)
        for _ in range(5000):
            ck.add(rng.getrandbits(63))
        rng3 = random.Random(3)
        probe = [rng3.getrandbits(63) for _ in range(20000)]
        fp = sum(ck.contains(v) for v in probe)
        # 16-bit fingerprints, 4-slot buckets: expected FP ~ 8/2^16 ~ 1.2e-4
        assert fp / len(probe) < 1e-3, fp

    def test_count(self):
        ck = CuckooFilter(capacity=1 << 12)
        for i in range(100):
            ck.add(i * 7919 + 13)
        assert ck.count == 100


class TestSeenShard:
    def test_exact_first_wins(self):
        s = SeenShard("exact")
        m1 = s.seen_and_add(["a", "b", "a"])
        assert m1.tolist() == [True, True, False]
        m2 = s.seen_and_add(["b", "c"])
        assert m2.tolist() == [False, True]
        assert s.size() == 3
        assert sorted(s.drain_new()) == ["a", "b", "c"]
        assert s.drain_new() == []

    def test_offer_resolve_min_key_any_arrival_order(self):
        """The winner per hash is the minimum sortkey regardless of the
        order concurrent tasks offered in (round-local first-wins), and the
        resolved block is a FRONTIER_SCHEMA Arrow table built shard-side."""
        offers = [
            ("h1", "parentB:00000005", "uB", "hostx", "pB"),
            ("h1", "parentA:00000002", "uA", "hostx", "pA"),
            ("h2", "parentC:00000001", "uC", "hosty", "pC"),
            ("h1", "parentA:00000001", "uA1", "hostx", "pA"),
        ]
        for perm_seed in range(4):
            s = SeenShard("exact")
            shuffled = offers[:]
            random.Random(perm_seed).shuffle(shuffled)
            for row in shuffled:
                s.offer_table(_offer_tbl([row]))
            block = s.resolve_block(priority=5, score=123, discovery_round=7)
            assert block["url_hash"].to_pylist() == ["h1", "h2"]  # hash-sorted
            assert block["url"].to_pylist()[0] == "uA1"  # min key wins
            assert block["score"].to_pylist() == [123, 123]
            assert block["discovery_round"].to_pylist() == [7, 7]
            assert block["lineage"].to_pylist() == ["pA", "pC"]
            # resolved hashes are now seen: further offers are rejected
            s.offer_table(_offer_tbl([("h1", "parentZ:00000000", "uZ", "x", "z")]))
            assert len(s.resolve_block(5, 1, 8)) == 0

    def test_offer_skips_already_seen(self):
        s = SeenShard("exact")
        s.seen_and_add(["h1"])
        s.drain_new()
        s.offer_table(
            _offer_tbl(
                [("h1", "k1", "u1", "x", "p"), ("h2", "k2", "u2", "x", "p")]
            )
        )
        block = s.resolve_block(5, 1, 1)
        assert block["url_hash"].to_pylist() == ["h2"]
        assert s.drain_new() == ["h2"]

    def test_drain_count_matches_drain_new(self):
        s = SeenShard("exact")
        s.seen_and_add(["a", "b", "c"])
        assert s.drain_count() == 3
        assert s.drain_new() == []
        s.seen_and_add(["d"])
        assert s.drain_new() == ["d"]

    def test_cuckoo_resolve_block_filters_seen(self):
        s = SeenShard("cuckoo", capacity=1 << 12)
        s.seen_and_add(["f" * 64])
        s.drain_new()
        s.offer_table(
            _offer_tbl(
                [("f" * 64, "k", "u", "x", "p"), ("a" * 64, "k", "u2", "x", "p")]
            )
        )
        block = s.resolve_block(5, 1, 1)
        assert block["url_hash"].to_pylist() == ["a" * 64]

    def test_cuckoo_backend_shard(self):
        s = SeenShard("cuckoo", capacity=1 << 12)
        m = s.seen_and_add(_hashes(200))
        assert m.all()
        m2 = s.seen_and_add(_hashes(200))
        assert not m2.any()


def test_shard_routing_deterministic():
    hs = _hashes(1000)
    a = [shard_of(h, 8) for h in hs]
    b = [shard_of(h, 8) for h in hs]
    assert a == b
    # roughly balanced
    counts = np.bincount(a, minlength=8)
    assert counts.min() > 60


def test_shard_of_batch_matches_scalar():
    hs = _hashes(5000)
    for n in (2, 5, 8):
        vec = shard_of_batch(hs, n)
        assert vec.tolist() == [shard_of(h, n) for h in hs]
    assert shard_of_batch([], 4).tolist() == []


def test_cuckoo_gen_grows_past_load_instead_of_dropping():
    """Saturation must cost memory, not keys: pushing 3x a filter's
    capacity through one generation grows the chain and keeps EVERY key
    queryable (a saturated flat filter silently drops keys after its
    eviction budget)."""
    import numpy as np

    from crawler_ray.state.seen import _CuckooGen

    rng = np.random.default_rng(3)
    hv = np.unique(rng.integers(1, 1 << 63, size=120_000, dtype=np.uint64))
    g = _CuckooGen(1 << 16)  # 64k slots; ~120k keys forces repeated growth
    g.add_batch(hv)
    present = np.zeros(len(hv), dtype=bool)
    for f in g.filters:
        present |= f.contains_batch(hv)
    assert bool(present.all())
    assert len(g.filters) >= 2
    # scalar path grows too
    g2 = _CuckooGen(1 << 10)
    for x in hv[:3000]:
        g2.add(int(x))
    assert all(g2.contains(int(x)) for x in hv[:3000])
    assert len(g2.filters) >= 2


def test_add_batch_matches_scalar_membership():
    import numpy as np

    from crawler_ray.state.seen import CuckooFilter

    rng = np.random.default_rng(11)
    hv = np.unique(rng.integers(1, 1 << 63, size=50_000, dtype=np.uint64))
    fb = CuckooFilter(1 << 18)
    placed = fb.add_batch(hv)
    assert bool(placed.all())  # 50k into 256k slots: no evictions needed
    fs = CuckooFilter(1 << 18)
    for x in hv:
        fs.add(int(x))
    # identical membership verdicts between the two build paths
    probe = np.unique(rng.integers(1, 1 << 63, size=20_000, dtype=np.uint64))
    np.testing.assert_array_equal(
        fb.contains_batch(probe), fs.contains_batch(probe)
    )
    np.testing.assert_array_equal(
        fb.contains_batch(hv), fs.contains_batch(hv)
    )


def test_hex_batch_matches_scalar_for_short_hashes():
    """Batch and scalar key derivations must agree for ANY hash length —
    a left/right-alignment mismatch would split one URL's identity across
    the offer/resolve and seen_and_add insert paths."""
    import numpy as np
    import pyarrow as pa

    from crawler_ray.state.seen import (
        hex16_batch, hex16_from_arrow, shard_of, shard_of_batch,
    )

    hashes = ["abc", "deadbeef", "0123456789abcdef", "f" * 64, "1", "ABC7"]
    want = np.array([int(h[:16], 16) for h in hashes], dtype=np.uint64)
    np.testing.assert_array_equal(hex16_batch(hashes), want)
    np.testing.assert_array_equal(
        hex16_from_arrow(pa.chunked_array([pa.array(hashes)])), want
    )
    for n_shards in (2, 5, 8):
        want_sh = [shard_of(h, n_shards) for h in hashes]
        assert shard_of_batch(hashes, n_shards).tolist() == want_sh


def test_failed_eviction_chain_never_forgets_a_key():
    """Force eviction-chain failures on a tiny saturated filter: every key
    ever accepted must remain queryable (stash semantics)."""
    import numpy as np

    from crawler_ray.state.seen import CuckooFilter

    rng = np.random.default_rng(5)
    f = CuckooFilter(64)  # 64 buckets min is clamped; force heavy load
    inserted = []
    for x in rng.integers(1, 1 << 63, size=220, dtype=np.uint64):
        f.add(int(x))          # stash on chain failure, never drop
        inserted.append(int(x))
        assert all(f.contains(v) for v in inserted)
    assert all(f.contains(v) for v in inserted)
    # batch membership agrees, stash included
    arr = np.array(inserted, dtype=np.uint64)
    assert bool(f.contains_batch(arr).all())


def test_hexn_from_arrow_large_string_and_widths():
    """large_string columns (int64 offsets) must decode identically to
    string columns, and unsupported types must fail LOUDLY instead of
    silently misdecoding dedup keys (round-4 ADVICE)."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from crawler_ray.state.seen import hexn_from_arrow

    hashes = ["deadbeefcafef00d" * 4, "0123456789abcdef" * 4, "f" * 64]
    small = pa.array(hashes, type=pa.string())
    large = pa.array(hashes, type=pa.large_string())
    for width in (4, 8, 16):
        want = np.array([int(h[:width], 16) for h in hashes], dtype=np.uint64)
        np.testing.assert_array_equal(hexn_from_arrow(small, width), want)
        np.testing.assert_array_equal(hexn_from_arrow(large, width), want)
    # short values fall back per chunk, any width
    shorts = pa.array(["ab", "deadbeef"], type=pa.large_string())
    np.testing.assert_array_equal(
        hexn_from_arrow(shorts, 4),
        np.array([0xAB, 0xDEAD], dtype=np.uint64),
    )
    with pytest.raises(TypeError):
        hexn_from_arrow(pa.array([1, 2], type=pa.int64()), 16)
