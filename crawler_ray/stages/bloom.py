"""Bloom-filter build + membership kernels for semi/anti-join prefiltering.

At 100-TB scale a semi/anti-join's build side (the key set being probed
against) is often too large to broadcast exactly, but its 1-2 MB Bloom
summary is not: build the filter once with a global tree aggregate
(per-block bitmaps OR-merged), ``ray.put`` it, and test membership
vectorized inside the probe side's ``map_batches``.  Misses are EXACT
non-members (a Bloom filter has no false negatives), so an anti-join can
emit them with zero shuffle; only the hit fraction (true members plus the
~1 % false positives) continues into the exact distributed verify join —
the output is therefore exact, the Bloom filter only bounds how much data
the exchange carries.

Public-algorithm references: Bloom (CACM 13(7), 1970); Kirsch &
Mitzenmacher double hashing (ESA 2006); splitmix64 finalizer (Steele et
al., OOPSLA 2014).

Reference parity: the crawler uses the same membership-prefilter idea for
frontier dedup via its Redis seen set
(/root/reference/crawler/services/url_deduplicator.py); here it is exposed
as a relational semi/anti-join operator over arbitrary key columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import AggregateFn

from crawler_ray.stages.combine import bucketed_distinct
from crawler_ray.stages.join import attach_unique

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = 0x9E3779B97F4A7C15
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wrapping arithmetic)."""
    z = x + np.uint64((seed * _GOLDEN) & _MASK64)
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def _as_u64(keys) -> np.ndarray:
    """Normalize a key column to uint64: integer dtypes reinterpret
    losslessly; strings/objects go through pandas' deterministic
    vectorized siphash (fixed default hash key, stable across processes)."""
    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        return np.ascontiguousarray(arr).astype(np.int64, copy=False).view(np.uint64)
    return pd.util.hash_array(arr.astype(object))


def _positions(u64: np.ndarray, m_bits: int, n_hashes: int):
    """Kirsch-Mitzenmacher double hashing: k positions from two mixes."""
    h1 = _mix64(u64, 0x51ED)
    h2 = _mix64(u64, 0xA5A5) | np.uint64(1)
    for i in range(n_hashes):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def _set_bits(bitmap: np.ndarray, u64: np.ndarray, m_bits: int, n_hashes: int) -> None:
    for pos in _positions(u64, m_bits, n_hashes):
        np.bitwise_or.at(
            bitmap,
            (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )


def member_mask(keys, bloom, m_bits: int, n_hashes: int) -> np.ndarray:
    """Vectorized membership test; True = possibly present, False = certain
    miss.  ``bloom`` is the bytes payload from :func:`bloom_build` (or the
    uint64 view of it)."""
    bm = (
        np.frombuffer(bloom, dtype=np.uint64)
        if isinstance(bloom, (bytes, bytearray, memoryview))
        else bloom
    )
    u64 = _as_u64(keys)
    mask = np.ones(len(u64), dtype=bool)
    for pos in _positions(u64, m_bits, n_hashes):
        bit = (bm[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


def bloom_build(ds: "rd.Dataset", column: str, m_bits: int, n_hashes: int) -> bytes:
    """Build the filter over ``ds[column]`` with one global tree aggregate:
    each block folds its keys into an ``m_bits/8``-byte bitmap, merges are
    elementwise OR (commutative + associative, so merge order is free), and
    the driver receives ONE bitmap — O(m_bits), never O(keys)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    words = m_bits >> 6

    def _acc(bm: np.ndarray, block) -> np.ndarray:
        col = block[column]
        keys = col.to_numpy(zero_copy_only=False) if isinstance(block, pa.Table) else col.to_numpy()
        out = bm.copy()
        _set_bits(out, _as_u64(keys), m_bits, n_hashes)
        return out

    agg = AggregateFn(
        init=lambda _k: np.zeros(words, dtype=np.uint64),
        merge=np.bitwise_or,
        accumulate_block=_acc,
        finalize=lambda a: a.tobytes(),
        name="bloom",
    )
    return ds.aggregate(agg)["bloom"]


def bloom_semi_join(
    probe: "rd.Dataset",
    probe_key: str,
    build: "rd.Dataset",
    build_key: str,
    *,
    anti: bool = False,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> "rd.Dataset":
    """Exact semi (or anti) join: probe rows whose key is (not) present in
    build's key set; output columns = probe's columns.

    Shape at scale: the build side reduces to an ``m_bits``-bit broadcast
    plus a distinct-key dataset for the verify join; the probe side streams
    through a vectorized membership test.  Semi: only Bloom hits (true
    members + false positives) enter the partitioned verify join, which
    drops the false positives.  Anti: certain misses bypass the exchange
    entirely (streamed straight to the output) and only the hit fraction is
    checked — the anti path scans the probe input twice (two
    embarrassingly-parallel reads) in exchange for a shuffle that carries
    only the hit fraction instead of everything.
    """
    if "__hit" in probe.schema().names:
        raise ValueError("probe column name '__hit' is reserved by bloom_semi_join")

    bloom = bloom_build(build, build_key, m_bits, n_hashes)
    ref = ray.put(bloom)

    def _split(keep_hits: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = member_mask(
                t[probe_key].to_numpy(zero_copy_only=False), ray.get(ref), m_bits, n_hashes
            )
            return t.filter(pa.array(mask if keep_hits else ~mask))

        return fn

    hits = probe.map_batches(_split(True), batch_format="pyarrow")
    # distinct build keys + a non-null marker column for the verify join;
    # bucketed (not groupby().aggregate(): its reduce costs ~1 ms/group,
    # and build sides run to millions of distinct keys — see
    # stages/combine.py)
    distinct = bucketed_distinct(build, build_key, marker="__hit")

    if anti:
        checked = attach_unique(hits, distinct, probe_key, build_key, how="left")
        verified = checked.map_batches(
            lambda t: t.filter(pc.is_null(t["__hit"])).drop_columns(["__hit"]),
            batch_format="pyarrow",
        )
        misses = probe.map_batches(_split(False), batch_format="pyarrow")
        return misses.union(verified)

    joined = attach_unique(hits, distinct, probe_key, build_key, how="inner")
    return joined.map_batches(
        lambda t: t.drop_columns(["__hit"]), batch_format="pyarrow"
    )
