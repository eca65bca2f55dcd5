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

    def batch_signatures(
        self, shingle_hashes: np.ndarray, counts: np.ndarray
    ) -> np.ndarray:
        """[n_docs, n_perms] signatures from the CONCATENATION of all docs'
        shingle hashes — ``counts[i]`` hashes belong to doc i, empty docs
        get the all-MAX signature.  One (a*x+b) mod p matrix per chunk and
        ``np.minimum.reduceat`` over doc boundaries replace the per-doc
        Python loop; chunks are sized so the dense [rows, n_perms] block
        stays ~64 MB regardless of batch size."""
        counts = np.asarray(counts, dtype=np.int64)
        n_docs = len(counts)
        out = np.full(
            (n_docs, self.n_perms), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        ends = np.cumsum(counts)
        starts = ends - counts
        nz = np.flatnonzero(counts)
        max_rows = max(1, (8 << 20) // self.n_perms)
        i = 0
        while i < len(nz):
            j, total = i, 0
            while j < len(nz) and (total == 0 or total + counts[nz[j]] <= max_rows):
                total += counts[nz[j]]
                j += 1
            docs = nz[i:j]
            base = starts[docs[0]]
            h = shingle_hashes[base : ends[docs[-1]]].astype(np.uint64, copy=False)
            vals = h[:, None] * self.a[None, :] + self.b[None, :]
            vals %= MERSENNE61
            out[docs] = np.minimum.reduceat(vals, starts[docs] - base, axis=0)
            i = j
        return out

    def band_key_matrix(
        self, sigs: np.ndarray, rows_per_band: int = DEFAULT_ROWS_PER_BAND
    ) -> np.ndarray:
        """[n_docs, n_bands] int64 band keys: each band's ``rows_per_band``
        signature words folded with a splitmix-style mix, the band index
        xor-folded in so keys never collide ACROSS bands except at ~2^-64
        (and any such collision only adds a candidate pair, which the exact
        Jaccard verify then rejects).  Vectorized replacement for the
        per-band md5 of :meth:`band_keys`."""
        n_bands = self.n_perms // rows_per_band
        b = sigs[:, : n_bands * rows_per_band].reshape(
            len(sigs), n_bands, rows_per_band
        )
        mix = b[:, :, 0].copy()
        for j in range(1, rows_per_band):
            mix = (mix * np.uint64(0x9E3779B97F4A7C15)) ^ (
                b[:, :, j] + np.uint64(0xC2B2AE3D27D4EB4F)
            )
        band_ids = np.arange(n_bands, dtype=np.uint64) * np.uint64(
            0xD6E8FEB86659FD93
        )
        return ((mix ^ band_ids[None, :]) * np.uint64(0xBF58476D1CE4E5B9)).view(
            np.int64
        )


def hash_shingles_batch(flat_shingles: list[str]) -> np.ndarray:
    """uint64 hash per shingle, vectorized (pandas siphash with its fixed
    default key — process- and machine-stable).  The MinHash family only
    needs a uniform stable hash, not md5 (signatures never require SQL
    parity — candidates are verified with the exact Jaccard), so this
    replaces the per-shingle md5 loop of :func:`hash_shingles` on the hot
    banding path."""
    import pandas as pd

    if not flat_shingles:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(flat_shingles, dtype=object))


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


def edit_distance_batch(a, b) -> np.ndarray:
    """Levenshtein distance for each aligned pair ``(a[i], b[i])``,
    vectorized ACROSS the pair axis (the scale axis): the classic DP runs
    as O(max_len_a x max_len_b) numpy steps, each touching all pairs at
    once — never a Python loop per pair.  Padded cells never feed the
    answer cell (DP cell (i, j) only reads cells with smaller i/j), so one
    shared DP over the padded code matrices is exact for every pair.

    Used by the fuzzy string-similarity join (queries.py
    ``part_fuzzy_pairs``); unit-tested against a scalar reference DP in
    tests/test_fuzzy_join.py."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b), dtype=np.int64, count=n)
    maxa, maxb = int(la.max()), int(lb.max())
    # numpy unicode arrays are fixed-width UCS4: a zero-copy-ish padded
    # code-point matrix per side
    A = (np.array(list(a), dtype=f"U{max(maxa, 1)}")
         .view(np.uint32).reshape(n, max(maxa, 1)))
    B = (np.array(list(b), dtype=f"U{max(maxb, 1)}")
         .view(np.uint32).reshape(n, max(maxb, 1)))
    ans = np.where(la == 0, lb, 0).astype(np.int64)
    ans[lb == 0] = la[lb == 0]
    prev = np.broadcast_to(np.arange(maxb + 1, dtype=np.int64), (n, maxb + 1)).copy()
    # rows where la == 0 were answered above; DP rows 1..maxa
    for i in range(1, maxa + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, maxb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        done = (la == i) & (lb > 0)
        if done.any():
            ans[done] = cur[done, lb[done]]
        prev = cur
    return ans


def edit_distance_within(a, b, dmax: int) -> np.ndarray:
    """``min(levenshtein(a[i], b[i]), dmax + 1)`` per aligned pair,
    vectorized across the pair axis with a THRESHOLD-BANDED DP (Ukkonen):
    a cell (i, j) with ``|i - j| > dmax`` can only lie on paths costing
    more than ``dmax``, so each DP row keeps just the ``2*dmax + 1``
    diagonal offsets — O(max_len x (2*dmax + 1)) numpy steps instead of
    O(max_len_a x max_len_b).  Exact for every pair whose distance is
    <= dmax (the join's verification contract); larger distances saturate
    at ``dmax + 1``.  Pairs with ``|len(a) - len(b)| > dmax`` short-circuit.
    """
    n = len(a)
    INF = np.int64(dmax + 1)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b), dtype=np.int64, count=n)
    maxa, maxb = int(la.max()), int(lb.max())
    A = (np.array(list(a), dtype=f"U{max(maxa, 1)}")
         .view(np.uint32).reshape(n, max(maxa, 1)))
    B = (np.array(list(b), dtype=f"U{max(maxb, 1)}")
         .view(np.uint32).reshape(n, max(maxb, 1)))
    w = 2 * dmax + 1
    ans = np.full(n, INF, dtype=np.int64)
    ans[la == 0] = np.minimum(lb, INF)[la == 0]
    # prev[:, o + dmax] = D[i-1][i-1+o]; row 0: D[0][j] = j
    prev = np.full((n, w), INF, dtype=np.int64)
    for o in range(0, dmax + 1):
        prev[:, o + dmax] = np.where(o <= lb, o, INF)
    for i in range(1, maxa + 1):
        cur = np.full((n, w), INF, dtype=np.int64)
        ai = A[:, i - 1]
        for oi in range(w):
            o = oi - dmax
            j = i + o
            if j < 0 or j > maxb:
                continue
            if j == 0:
                cur[:, oi] = np.where(i <= la, i, INF)
                continue
            # deletion: D[i-1][j] sits at offset o+1 of the previous row
            best = (prev[:, oi + 1] + 1) if oi + 1 < w else np.full(n, INF)
            # insertion: D[i][j-1] sits at offset o-1 of THIS row
            if oi - 1 >= 0:
                best = np.minimum(best, cur[:, oi - 1] + 1)
            # substitution/match: D[i-1][j-1] sits at the same offset
            cost = (ai != B[:, j - 1]).astype(np.int64)
            best = np.minimum(best, prev[:, oi] + cost)
            # cells outside either string are not part of any valid path
            cur[:, oi] = np.where((i <= la) & (j <= lb), best, INF)
        done = la == i
        if done.any():
            off = (lb - la + dmax)[done]
            valid = (off >= 0) & (off < w)
            idx = np.flatnonzero(done)
            ans[idx[valid]] = cur[idx[valid], off[valid]]
        prev = cur
    return np.minimum(ans, INF)
