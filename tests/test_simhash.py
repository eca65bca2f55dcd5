"""Simhash conformance: the vectorized kernel must be bit-identical to a
direct sequential implementation of the reference algorithm
(/root/reference/crawler/utils/simhash.py:59-146)."""

import hashlib
import re

import numpy as np

from crawler_ray.functions.simhash import (
    band_keys,
    from_signed,
    hamming_distance,
    similarity_pct,
    simhash,
    simhash_batch,
    to_signed,
    token_hash64,
    tokenize,
)


def spec_simhash(text: str) -> int:
    """Sequential spec: the reference algorithm, written independently."""
    toks = re.sub(r"[^\w\s]", " ", text.lower()).split()
    votes = [0] * 64
    for tok in toks:
        h = int(hashlib.md5(tok.encode()).hexdigest(), 16) & ((1 << 64) - 1)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    return fp


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "The quick brown fox jumps over a lazy dog",
    "A completely different text about something else entirely",
    "hello world hello world hello",
    "Hello, World! How are you today?",
    "hello world how are you today",
    "putusan mahkamah agung nomor 123 tahun 2024 tentang perkara pidana",
    "single",
    "123 456 789",
    "ünïcödé tèxt wïth áccents",
]


def test_tokenize():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("  multiple   spaces  ") == ["multiple", "spaces"]
    assert tokenize("a-b_c d") == ["a", "b_c", "d"]  # \w keeps underscores
    assert tokenize("...") == []


def test_token_hash_is_md5_low64():
    h = token_hash64("hello")
    assert h == int(hashlib.md5(b"hello").hexdigest(), 16) & ((1 << 64) - 1)


def test_batch_matches_spec():
    fps, valid = simhash_batch(TEXTS)
    assert valid.all()
    for text, fp in zip(TEXTS, fps):
        assert int(fp) == spec_simhash(text), text


def test_scalar_wrapper():
    assert simhash(TEXTS[0]) == spec_simhash(TEXTS[0])


def test_empty_and_none_rows():
    fps, valid = simhash_batch(["ok text", "", None, "..."])
    assert valid.tolist() == [True, False, False, False]
    assert fps[1:].tolist() == [0, 0, 0]


def test_distance_and_similarity():
    fps, _ = simhash_batch(TEXTS)
    d01 = hamming_distance(fps[0:1], fps[1:2])[0]
    d02 = hamming_distance(fps[0:1], fps[2:3])[0]
    assert hamming_distance(fps[0:1], fps[0:1])[0] == 0
    assert 0 < d01 < d02 <= 64  # near-dup closer than unrelated
    assert similarity_pct(0) == 100.0
    assert similarity_pct(64) == 0.0
    # case/punctuation insensitive -> identical fingerprints
    a, _ = simhash_batch(["Hello, World! How are you today?"])
    b, _ = simhash_batch(["hello world how are you today"])
    assert a[0] == b[0]


def test_signed_bridge():
    u = np.array([0, 1, (1 << 63), (1 << 64) - 1], dtype=np.uint64)
    s = to_signed(u)
    assert s.dtype == np.int64
    assert s.tolist() == [0, 1, -(1 << 63), -1]
    assert (from_signed(s) == u).all()
    assert to_signed((1 << 64) - 1) == -1
    assert from_signed(-1) == (1 << 64) - 1
    assert to_signed(5) == 5 and from_signed(5) == 5


def test_band_keys_pigeonhole():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 63, size=50, dtype=np.int64).astype(np.uint64)
    # flip <=3 bits -> must share at least one of 4 bands
    flipped = base.copy()
    for i in range(len(base)):
        for b in rng.choice(64, size=3, replace=False):
            flipped[i] ^= np.uint64(1) << np.uint64(b)
    kb, kf = band_keys(base), band_keys(flipped)
    assert ((kb == kf).any(axis=1)).all()
