"""Distributed duplicate marking: exact content-hash + simhash LSH near-dup.

Reference semantics (``/root/reference/crawler/services/result_persistence.py:
213-264``): a page is an exact duplicate when an earlier page has the same
content_hash (similarity 100); otherwise it is a fuzzy duplicate of the
best (min Hamming, then earliest) earlier DISTINCT-content page within
Hamming distance <= 3, similarity = clamp(int((1 - d/64) * 100)).  "Earlier"
is crawl order — rank key (round, score, url_hash).

The reference finds fuzzy matches with an O(N) full-scan XOR SQL query per
page (``/root/reference/sql/queries/content_hash.sql:67-78``).  Here:

- exact: ``groupby(content_hash)`` keep-first (one shuffle keyed exactly as
  the reference's UNIQUE(content_hash) table);
- fuzzy: 4x16-bit LSH banding — two 64-bit fingerprints at distance <= 3
  share at least one of 4 bands (pigeonhole), so ``flat-map band keys ->
  groupby(band) -> in-group vectorized Hamming verify`` finds EVERY pair at
  distance <= 3 with bounded candidate sets, then a second tiny groupby
  picks each page's best match.  Skew note: a band bucket of k near-identical
  pages costs O(k^2) verify — acceptable because candidates carry distinct
  content hashes; pathological buckets should be capped + sampled at 100 TB
  scale (documented, not needed at sandbox scale).

Marks (duplicates only) are collected and broadcast (``ray.put``) into a
final ``map_batches`` that stamps is_duplicate / duplicate_of /
similarity_score onto the full pages dataset — a small-side broadcast join,
no shuffle of the wide span rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from crawler_ray.functions.simhash import band_keys, from_signed

N_BANDS = 4
MAX_HAMMING = 3


def _rank_key_col(t: pa.Table) -> pa.Table:
    rk = [
        f"{r:06d}|{s:020d}|{h}"
        for r, s, h in zip(
            t["round"].to_pylist(), t["score"].to_pylist(), t["url_hash"].to_pylist()
        )
    ]
    return t.append_column("rank_key", pa.array(rk, type=pa.string()))


def _exact_bucket(df: pd.DataFrame) -> pa.Table:
    """Vectorized per-bucket exact-dup marking: a content_hash lives wholly
    in one bucket; the rank-first row per hash is canonical.  Bucketing keeps
    group counts off the Ray shuffle (thousands of tiny map_groups calls
    cost ~15 ms each); inside the bucket everything is one pandas pass."""
    df = df.sort_values(["content_hash", "rank_key"], kind="mergesort")
    first = df.groupby("content_hash", sort=False)["url_hash"].transform("first")
    is_dup = df["url_hash"].to_numpy() != first.to_numpy()
    return pa.table(
        {
            "url_hash": pa.array(df["url_hash"].tolist(), type=pa.string()),
            "simhash": pa.array(df["simhash"].tolist(), type=pa.int64()),
            "rank_key": pa.array(df["rank_key"].tolist(), type=pa.string()),
            "dup_of": pa.array(
                [f if d else None for f, d in zip(first.tolist(), is_dup)],
                type=pa.string(),
            ),
            "similarity": pa.array(
                [100 if d else None for d in is_dup], type=pa.int32()
            ),
        }
    )


def _band_pairs_bucket(df: pd.DataFrame) -> pa.Table:
    """Per hash-bucket of (band, value) keys: vectorized self-join on the
    band key, then pairwise Hamming verify on the matched pairs only."""
    empty = pa.table(
        {
            "url_hash": pa.array([], type=pa.string()),
            "dup_of": pa.array([], type=pa.string()),
            "distance": pa.array([], type=pa.int64()),
            "a_rank": pa.array([], type=pa.string()),
        }
    )
    if len(df) < 2:
        return empty
    m = df.merge(df, on=["band", "val"], suffixes=("_a", "_b"))
    m = m[m["rank_key_a"] < m["rank_key_b"]]
    if m.empty:
        return empty
    fa = from_signed(m["simhash_a"].to_numpy(dtype=np.int64))
    fb = from_signed(m["simhash_b"].to_numpy(dtype=np.int64))
    xor = fa ^ fb
    d = np.unpackbits(xor.view(np.uint8).reshape(len(m), 8), axis=-1).sum(-1)
    keep = d <= MAX_HAMMING
    return pa.table(
        {
            "url_hash": pa.array(m["url_hash_b"].to_numpy()[keep], type=pa.string()),
            "dup_of": pa.array(m["url_hash_a"].to_numpy()[keep], type=pa.string()),
            "distance": pa.array(d[keep].astype(np.int64)),
            "a_rank": pa.array(m["rank_key_a"].to_numpy()[keep], type=pa.string()),
        }
    )


def _best_match_bucket(df: pd.DataFrame) -> pa.Table:
    """Per hash-bucket of later-page url_hashes: vectorized min
    (distance, earlier-rank) per url_hash."""
    df = df.sort_values(["url_hash", "distance", "a_rank"], kind="mergesort")
    first = df.groupby("url_hash", sort=False).head(1)
    sims = np.clip(((1 - first["distance"].to_numpy() / 64) * 100).astype(np.int64), 0, 100)
    return pa.table(
        {
            "url_hash": pa.array(first["url_hash"].tolist(), type=pa.string()),
            "dup_of": pa.array(first["dup_of"].tolist(), type=pa.string()),
            "similarity": pa.array(sims, type=pa.int32()),
        }
    )


N_DEDUP_BUCKETS = 32


def mark_duplicates(pages: "rd.Dataset") -> "rd.Dataset":
    """Append is_duplicate / duplicate_of / similarity_score to pages."""
    narrow = pages.select_columns(
        ["url_hash", "content_hash", "simhash", "round", "score"]
    ).map_batches(_rank_key_col, batch_format="pyarrow")

    def _hash_bucket(t: pa.Table, col: str) -> pa.Table:
        import hashlib as _hl

        b = [
            int(_hl.md5(str(v).encode()).hexdigest()[:8], 16) % N_DEDUP_BUCKETS
            for v in t[col].to_pylist()
        ]
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    by_hash = (
        narrow.map_batches(lambda t: _hash_bucket(t, "content_hash"),
                           batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_exact_bucket, batch_format="pandas")
        .materialize()
    )
    exact_marks = {
        r["url_hash"]: (r["dup_of"], 100)
        for r in by_hash.take_all()
        if r["dup_of"] is not None
    }

    canon = by_hash.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["dup_of"])).select(
            ["url_hash", "simhash", "rank_key"]
        ),
        batch_format="pyarrow",
    )

    # ---- exact-fingerprint fast path -----------------------------------
    # Pages sharing a full 64-bit fingerprint are at Hamming distance 0, so
    # the reference's best-match rule (min distance, then earliest) makes
    # every later member a duplicate of the group's earliest page — no
    # banding needed, and the LSH stage then runs over DISTINCT fingerprints
    # only.  This collapses pathological clusters (K same-fp pages would
    # otherwise produce K^2 band candidates) with identical semantics.
    def _fp_group_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["simhash", "rank_key"], kind="mergesort")
        first_hash = df.groupby("simhash", sort=False)["url_hash"].transform("first")
        first_rank = df.groupby("simhash", sort=False)["rank_key"].transform("first")
        is_member = df["url_hash"].to_numpy() != first_hash.to_numpy()
        return pa.table(
            {
                "url_hash": pa.array(df["url_hash"].tolist(), type=pa.string()),
                "simhash": pa.array(df["simhash"].tolist(), type=pa.int64()),
                "rank_key": pa.array(df["rank_key"].tolist(), type=pa.string()),
                "rep_hash": pa.array(first_hash.tolist(), type=pa.string()),
                "rep_rank": pa.array(first_rank.tolist(), type=pa.string()),
                "is_member": pa.array(is_member),
            }
        )

    def _fp_bucketize(t: pa.Table) -> pa.Table:
        b = [int(v) % N_DEDUP_BUCKETS for v in
             from_signed(np.asarray(t["simhash"].to_pylist(), dtype=np.int64))]
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    fp_grouped = (
        canon.map_batches(_fp_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_fp_group_bucket, batch_format="pandas")
        .materialize()
    )
    samefp_marks = {
        r["url_hash"]: (r["rep_hash"], 100)
        for r in fp_grouped.take_all()
        if r["is_member"]
    }
    canon = fp_grouped.map_batches(
        lambda t: t.filter(pa.compute.invert(t["is_member"])).select(
            ["url_hash", "simhash", "rank_key"]
        ),
        batch_format="pyarrow",
    )

    def _explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hl

        if df.empty:
            return pd.DataFrame({"band": [], "val": [], "bucket": [],
                                 "url_hash": [], "simhash": [], "rank_key": []})
        fps = from_signed(df["simhash"].to_numpy(dtype=np.int64))
        bk = band_keys(fps, N_BANDS)
        n = len(df)
        band = np.repeat(np.arange(N_BANDS), n)
        val = bk.T.reshape(-1).astype(np.int64)
        bucket = [
            int(_hl.md5(f"{b}:{v}".encode()).hexdigest()[:8], 16) % N_DEDUP_BUCKETS
            for b, v in zip(band, val)
        ]
        return pd.DataFrame(
            {
                "band": band,
                "val": val,
                "bucket": bucket,
                "url_hash": np.tile(df["url_hash"].to_numpy(), N_BANDS),
                "simhash": np.tile(df["simhash"].to_numpy(), N_BANDS),
                "rank_key": np.tile(df["rank_key"].to_numpy(), N_BANDS),
            }
        )

    fuzzy_best = (
        canon.map_batches(_explode_bands, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_band_pairs_bucket, batch_format="pandas")
        # same pair may surface from several bands; min-per-url_hash is
        # idempotent over those duplicates, so no pre-dedup pass is needed
        .map_batches(lambda t: _hash_bucket(t, "url_hash"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_best_match_bucket, batch_format="pandas")
        .materialize()
    )
    fuzzy_marks = {
        r["url_hash"]: (r["dup_of"], r["similarity"]) for r in fuzzy_best.take_all()
    }

    marks = {**fuzzy_marks, **samefp_marks, **exact_marks}  # exact wins if both
    marks_ref = ray.put(marks)

    def _stamp(t: pa.Table) -> pa.Table:
        m = ray.get(marks_ref)
        hashes = t["url_hash"].to_pylist()
        hits = [m.get(h) for h in hashes]
        return (
            t.append_column(
                "is_duplicate", pa.array([h is not None for h in hits], type=pa.bool_())
            )
            .append_column(
                "duplicate_of",
                pa.array([h[0] if h else None for h in hits], type=pa.string()),
            )
            .append_column(
                "similarity_score",
                pa.array([h[1] if h else None for h in hits], type=pa.int32()),
            )
        )

    return pages.map_batches(_stamp, batch_format="pyarrow")
