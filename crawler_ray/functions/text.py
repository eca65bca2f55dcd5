"""Text-analysis kernels: shingling, MinHash signatures, LSH banding,
rolling-hash fingerprints.

These back the large-scale training-data dedup operators (MinHash+LSH,
n-gram Jaccard) that complement the reference's simhash near-dup path
(SURVEY.md §2.7).  All kernels are batch-first numpy.

MinHash (Broder '97): signature[i] = min over shingles s of
(a_i * h(s) + b_i) mod p, with h = low-64 md5 bits and p = 2^61 - 1
(Mersenne).  Collision probability per coordinate equals the Jaccard
similarity, so b bands of r rows catch a pair with probability
1 - (1 - j^r)^b; the defaults (96 perms = 48 bands x 2 rows) give
P(candidate) > 0.999999 at j = 0.5 — candidates are then verified with the
exact Jaccard, so band misses are the only error source.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)
DEFAULT_PERMS = 96
DEFAULT_ROWS_PER_BAND = 2


def tokens_of(text: str) -> list[str]:
    """Whitespace tokens of stripped text (matches DuckDB
    string_split_regex(trim(text), '\\s+') used by the oracles)."""
    return text.strip().split()


def shingles_of(tokens: list[str], k: int = 3) -> set[str]:
    """Distinct k-token shingles (space-joined); empty if fewer than k."""
    if len(tokens) < k:
        return set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def hash_shingles(shingles: set[str]) -> np.ndarray:
    """uint64 md5-low-bits hash per shingle."""
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "big")
    return out


class MinHasher:
    """Seeded permutation family; instantiate once per actor/batch fn."""

    def __init__(self, n_perms: int = DEFAULT_PERMS, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.n_perms = n_perms
        # odd multipliers, nonzero offsets, < 2^61
        self.a = (rng.integers(1, 1 << 60, size=n_perms, dtype=np.uint64) * 2 + 1) & MERSENNE61
        self.b = rng.integers(1, 1 << 60, size=n_perms, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """uint64[n_perms] signature (all-MAX for empty shingle sets)."""
        if len(shingle_hashes) == 0:
            return np.full(self.n_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) mod p, computed in python ints is slow; uint64 wrap-around
        # is fine as a hash family as long as both sides use the same family
        # (we never need SQL parity for signatures — only verified Jaccard).
        vals = self.a[:, None] * shingle_hashes[None, :] + self.b[:, None]
        vals %= MERSENNE61
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray, rows_per_band: int = DEFAULT_ROWS_PER_BAND) -> list[str]:
        """Hex digest per band of the signature (LSH bucket keys)."""
        n_bands = self.n_perms // rows_per_band
        bands = sig[: n_bands * rows_per_band].reshape(n_bands, rows_per_band)
        return [
            f"{i}:{hashlib.md5(bands[i].tobytes()).hexdigest()[:16]}"
            for i in range(n_bands)
        ]


def jaccard(a: set[str], b: set[str]) -> float:
    """Exact Jaccard of two shingle sets (0.0 when both empty)."""
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(tokens: list[str], window: int = 8, base: int = 1_000_003) -> int:
    """Winnowing-style document fingerprint: min rolling polynomial hash
    over token windows, mod 2^61-1 (document fingerprinting family)."""
    p = (1 << 61) - 1
    if not tokens:
        return 0
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "big") % p for t in tokens]
    if len(hs) < window:
        window = len(hs)
    best = None
    for i in range(len(hs) - window + 1):
        acc = 0
        for h in hs[i : i + window]:
            acc = (acc * base + h) % p
        if best is None or acc < best:
            best = acc
    return best
