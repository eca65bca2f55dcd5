"""Mergeable sketches for approximate distributed aggregation.

HyperLogLog (Flajolet et al. 2007) with the standard bias corrections:
one sketch per ``map_batches`` partial, merged in a tiny final stage — the
canonical mergeable-sketch pattern for distinct counting at 100 TB scale
(e.g. distinct URLs per host, distinct content hashes) where an exact
``groupby().count()`` would shuffle every row.

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
