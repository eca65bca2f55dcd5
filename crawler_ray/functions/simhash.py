"""Vectorized 64-bit simhash (Charikar 2002) for near-duplicate detection.

Bit-for-bit compatible with the reference implementation
(``/root/reference/crawler/utils/simhash.py:59-146``):

- tokenize: lowercase, replace ``[^\\w\\s]`` with spaces, split on whitespace;
- per-token hash: the LOW 64 bits of MD5 (``int(md5hex, 16) & (2**64-1)``,
  i.e. the last 8 digest bytes big-endian);
- each token occurrence votes +1/-1 per bit; fingerprint bit i is set when
  the vote sum at position i is strictly positive;
- distance = popcount(xor), similarity = (1 - d/64) * 100.

Unlike the reference (one Python object per text, one Python loop per bit),
this module computes a whole Arrow/numpy batch at once: unique tokens are
MD5-hashed once (with an LRU-ish cache that persists across batches when used
from an actor), bit matrices are numpy int8, and the per-document vote is a
``np.add.reduceat`` over token runs.  Signed<->unsigned int64 bridging (the
reference stores fingerprints in PG BIGINT,
``/root/reference/crawler/utils/simhash_helpers.py:8-50``) is a reinterpret
cast here.

Empty / token-less texts: the reference raises; a vectorized kernel cannot.
We return fingerprint 0 for them — callers that need reference behavior check
:func:`simhash_batch`'s validity mask.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

HASH_BITS = 64
_TOKEN_CLEAN = re.compile(r"[^\w\s]")
_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))
# popcount per byte, for numpy<2 which lacks np.bitwise_count
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def tokenize(text: str) -> list[str]:
    """Reference tokenization: lowercase, strip punctuation, whitespace split."""
    return _TOKEN_CLEAN.sub(" ", text.lower()).split()


def token_hash64(token: str) -> int:
    """Low 64 bits of MD5 (reference ``_hash_token``, simhash.py:82-102)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:], "big")


def simhash(text: str) -> int:
    """Scalar simhash of one text (unsigned 64-bit int); 0 if no tokens."""
    fps, valid = simhash_batch([text])
    return int(fps[0])


class _TokenHashCache:
    """str -> uint64 MD5-low-bits cache, bounded, reusable across batches."""

    def __init__(self, max_size: int = 1_000_000) -> None:
        self._cache: dict[str, int] = {}
        self._max = max_size

    def lookup(self, tokens: np.ndarray) -> np.ndarray:
        """Hash an array of unique token strings -> uint64 array."""
        cache = self._cache
        if len(cache) > self._max:
            cache.clear()
        out = np.empty(len(tokens), dtype=np.uint64)
        md5 = hashlib.md5
        for i, tok in enumerate(tokens):
            h = cache.get(tok)
            if h is None:
                h = int.from_bytes(md5(tok.encode("utf-8")).digest()[8:], "big")
                cache[tok] = h
            out[i] = h
        return out


_GLOBAL_CACHE = _TokenHashCache()


def simhash_batch(
    texts: list[str | None], cache: _TokenHashCache | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Simhash a batch of texts.

    Returns ``(fingerprints: uint64[n], valid: bool[n])`` where ``valid`` is
    False for None/empty/token-less rows (their fingerprint is 0).
    """
    cache = cache or _GLOBAL_CACHE
    n = len(texts)
    fps = np.zeros(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=bool)

    # flatten: token stream + run boundaries per doc
    all_tokens: list[str] = []
    doc_offsets = np.zeros(n + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        if t:
            toks = tokenize(t)
            all_tokens.extend(toks)
        doc_offsets[i + 1] = len(all_tokens)
    if not all_tokens:
        return fps, valid

    tok_arr = np.asarray(all_tokens, dtype=object)
    # hash-based distinct (pandas factorize) — same (codes, uniques)
    # contract as sort-based np.unique but O(n) instead of an O(n log n)
    # string argsort, which dominated parse wall at 2500-token pages
    inv, uniq = pd.factorize(tok_arr, sort=False)
    uniq = np.asarray(uniq, dtype=object)
    uniq_hashes = cache.lookup(uniq)                      # uint64[u]
    # bit matrix for unique tokens: 0/1 as float32 so per-doc bit counts
    # come from ONE BLAS matmul (exact: counts < 2^24 fit float32).
    # A per-token-row reduceat is ~100x slower at 2500-token pages.
    bits01 = (
        (uniq_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.float32)

    counts = np.diff(doc_offsets)
    nonempty = counts > 0
    ne_counts = counts[nonempty]
    n_ne = int(nonempty.sum())
    u = len(uniq)
    doc_of = np.repeat(np.arange(n_ne), ne_counts)

    # W[d, t] = multiplicity of unique token t in doc d; chunk docs so the
    # dense count matrix stays bounded (~64 MB) however large the batch
    chunk = max(1, (16 << 20) // max(1, u))
    bitsum = np.empty((n_ne, 64), dtype=np.float32)
    tok_pos = 0
    for lo in range(0, n_ne, chunk):
        hi = min(n_ne, lo + chunk)
        n_tok = int(ne_counts[lo:hi].sum())
        W = np.zeros((hi - lo, u), dtype=np.float32)
        np.add.at(
            W,
            (doc_of[tok_pos:tok_pos + n_tok] - lo,
             inv[tok_pos:tok_pos + n_tok]),
            1.0,
        )
        bitsum[lo:hi] = W @ bits01
        tok_pos += n_tok
    # vote sum = (+1 per set bit, -1 per clear bit) = 2*bitsum - n_tokens
    sums = 2.0 * bitsum - ne_counts[:, None].astype(np.float32)
    doc_fp = ((sums > 0).astype(np.uint64) * _BIT_WEIGHTS).sum(axis=1)

    fps[nonempty] = doc_fp
    valid[nonempty] = True
    return fps, valid


def hamming_distance(a: np.ndarray | int, b: np.ndarray | int) -> np.ndarray | int:
    """Popcount of xor; vectorized over uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    d = _POPCOUNT8[x.reshape(-1).view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1)
    return int(d) if np.isscalar(a) and np.isscalar(b) else d


def similarity_pct(distance: np.ndarray | int) -> np.ndarray | float:
    """(1 - d/64) * 100, the reference similarity metric (simhash.py:177-193)."""
    return (1.0 - np.asarray(distance) / HASH_BITS) * 100.0


def to_signed(fp: np.ndarray | int):
    """uint64 fingerprint -> signed int64 (PG BIGINT convention).

    Reference: /root/reference/crawler/utils/simhash_helpers.py:8-30.
    """
    if isinstance(fp, np.ndarray):
        return fp.astype(np.uint64).view(np.int64)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def from_signed(fp: np.ndarray | int):
    """signed int64 -> uint64 fingerprint.

    Reference: /root/reference/crawler/utils/simhash_helpers.py:33-50.
    """
    if isinstance(fp, np.ndarray):
        return fp.astype(np.int64).view(np.uint64)
    return fp + (1 << 64) if fp < 0 else fp


def band_keys(fps: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """Split fingerprints into ``n_bands`` contiguous bit bands for LSH.

    Two fingerprints at Hamming distance <= n_bands - 1 share at least one
    band (pigeonhole), so grouping by (band_id, band_value) bounds candidate
    generation for the near-dup join — this replaces the reference's O(N)
    full-scan XOR query (``/root/reference/sql/queries/content_hash.sql:67-78``)
    with a shuffle whose groups are tiny.

    Returns uint64[n, n_bands]: band values (band i = bits [i*w, (i+1)*w)).
    """
    fps = np.asarray(fps, dtype=np.uint64)
    width = HASH_BITS // n_bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(fps), n_bands), dtype=np.uint64)
    for b in range(n_bands):
        out[:, b] = (fps >> np.uint64(b * width)) & mask
    return out
