"""Mergeable sketches for approximate distributed aggregation.

HyperLogLog (Flajolet et al. 2007) with the standard bias corrections:
one sketch per ``map_batches`` partial, merged in a tiny final stage — the
canonical mergeable-sketch pattern for distinct counting at 100 TB scale
(e.g. distinct URLs per host, distinct content hashes) where an exact
``groupby().count()`` would shuffle every row.

RankSketch: a KLL-style compactor hierarchy (Karnin-Lang-Liberty 2016 /
Manku-Rajagopalan-Lindsay 1998 deterministic compaction) for quantiles
over UNBOUNDED value domains, where the exact counting-histogram path
(pipelines/queries.q_lineitem_quantiles) doesn't apply.  Level i items
each stand for 2^i inputs; compaction sorts a full buffer and promotes
alternating survivors one level up.  add/compact/merge/query are all
numpy-vectorized; merging is associative, so any map_batches partial /
tree-reduce order yields a valid sketch.

Registers are numpy uint8; add/merge are vectorized; hashing is the same
MD5-low-64 used across the engine (deterministic everywhere).
"""

from __future__ import annotations

import hashlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        """p register bits -> m = 2^p registers; std error ~ 1.04/sqrt(m)
        (p=12 -> ~1.6%)."""
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # ------------------------------------------------------------------ build
    def add_hashes(self, hashes: np.ndarray) -> None:
        """Add pre-hashed uint64 values (vectorized)."""
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1, computed with
        # an EXACT vectorized binary-search clz — float64 log2 rounds values
        # within 2^11 of 2^64 up to exactly 2^64 (rank 0 instead of 1),
        # which an integer-exact oracle recomputation can never reproduce
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            v = rest[nz].copy()
            clz = np.zeros(v.shape, dtype=np.uint8)
            for s in (32, 16, 8, 4, 2, 1):
                m = v < (np.uint64(1) << np.uint64(64 - s))
                clz[m] += np.uint8(s)
                v[m] = v[m] << np.uint64(s)
            rank[nz] = clz + np.uint8(1)
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "big")
                for v in values
            ),
            dtype=np.uint64,
        )
        if len(hs):
            self.add_hashes(hs)

    # ------------------------------------------------------------------ query
    def estimate(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        est = (0.7213 / (1 + 1.079 / m)) * m * m / np.power(2.0, -regs).sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small n
        return est

    # ------------------------------------------------------------------ merge
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        sk = cls(data[0])
        sk.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return sk

class RankSketch:
    """Mergeable quantile sketch (KLL-style deterministic compactors).

    ``k`` is the per-level buffer capacity; observed rank error on 1e5-1e7
    element streams is well under 1/k x const (tests/test_sketch.py asserts
    <= 2% at k=256 across uniform / zipf / sorted / reversed inputs).
    Deterministic: compaction keeps even-index survivors (MRL-style), so a
    given (partition, merge) order reproduces bit-identical sketches; the
    rank-error bound holds for ANY order.
    """

    def __init__(self, k: int = 256) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    # ------------------------------------------------------------------ build
    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) <= self.cap(i):
                i += 1
                continue
            buf = np.sort(buf, kind="stable")
            promoted = buf[::2]  # even-index survivors, weight doubles
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.empty(0, dtype=np.float64)
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def cap(self, level: int) -> int:
        # geometrically decaying capacities for the lower levels (KLL's
        # memory trick): the top levels keep the full k
        depth = len(self.levels) - 1 - level
        return max(8, int(self.k * (2.0 / 3.0) ** depth))

    # ------------------------------------------------------------------ merge
    def merge(self, other: "RankSketch") -> "RankSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compress()
        return self

    # ------------------------------------------------------------------ query
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([b for b in self.levels])
        wts = np.concatenate(
            [np.full(len(b), 1 << i, dtype=np.int64)
             for i, b in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantiles(self, qs) -> np.ndarray:
        """Approximate PERCENTILE_DISC: the stored value whose weighted rank
        covers q*(n-1)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        vals, wts = self._weighted()
        cum = np.cumsum(wts)
        total = cum[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = q * (total - 1)
            out[j] = vals[np.searchsorted(cum, target, side="right")]
        return out

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<iiq", self.k, len(self.levels), self.n)
        parts = [head]
        for b in self.levels:
            parts.append(struct.pack("<i", len(b)))
            parts.append(b.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "RankSketch":
        import struct

        k, nlev, n = struct.unpack_from("<iiq", data, 0)
        off = 16
        sk = cls(k)
        sk.levels = []
        sk.n = n
        for _ in range(nlev):
            (ln,) = struct.unpack_from("<i", data, off)
            off += 4
            sk.levels.append(
                np.frombuffer(data, dtype=np.float64, count=ln, offset=off).copy()
            )
            off += 8 * ln
        return sk


def misra_gries(tokens: "pd.Series", capacity: int) -> "pd.Series":
    """Misra-Gries heavy-hitter summary of one batch's token counts.

    Exact counts first (pandas value_counts), then the MG decrement: if more
    than ``capacity`` distinct tokens exist, subtract the (capacity+1)-th
    largest count from all and keep the strictly positive remainder — at
    most ``capacity`` survivors.  Each batch summary underestimates a
    token's batch count by at most ``n_batch / (capacity + 1)``, so summing
    per-batch summaries underestimates a global count by at most
    ``N / (capacity + 1)`` (Misra & Gries 1982; mergeability per Agarwal,
    Cormode et al., "Mergeable Summaries", PODS 2012).  Consequence used by
    the heavy-hitters query: every token with global count > N/(capacity+1)
    retains a positive summed count, so the union of per-batch survivors is
    a SUPERSET of the true heavy hitters — an exact second counting pass
    over that bounded candidate set makes the final answer exact.
    """
    import pandas as pd  # local: module keeps numpy-only imports at top

    counts = tokens.value_counts(sort=False)
    if len(counts) <= capacity:
        return counts
    vals = np.sort(counts.to_numpy())[::-1]
    d = int(vals[capacity])  # (capacity+1)-th largest
    kept = counts[counts > d] - d
    return kept
