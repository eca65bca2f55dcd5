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


def _exact_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per content_hash group: first (by rank) is canonical, rest are exact dups."""
    df = df.sort_values("rank_key", kind="mergesort")
    canon = df.iloc[0]["url_hash"]
    out = df[["url_hash", "simhash", "rank_key"]].copy()
    # nullable dtypes: an all-null object column would infer Arrow null type
    # in one block and string in another, breaking the union
    out["dup_of"] = pd.array([None] + [canon] * (len(df) - 1), dtype="string")
    out["similarity"] = pd.array([None] + [100] * (len(df) - 1), dtype="Int32")
    return out


def _band_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per (band, value) bucket: all ordered pairs within Hamming <= 3."""
    if len(df) < 2:
        return pd.DataFrame(
            {
                "url_hash": pd.array([], dtype="object"),
                "dup_of": pd.array([], dtype="object"),
                "distance": pd.array([], dtype="int64"),
                "a_rank": pd.array([], dtype="object"),
            }
        )
    df = df.sort_values("rank_key", kind="mergesort")
    fps = from_signed(df["simhash"].to_numpy(dtype=np.int64))
    xor = fps[:, None] ^ fps[None, :]
    # byte-wise popcount (numpy<2 lacks bitwise_count)
    d = np.unpackbits(xor.view(np.uint8).reshape(len(df), len(df), 8), axis=-1).sum(-1)
    ii, jj = np.where(np.triu(d <= MAX_HAMMING, k=1))  # i earlier than j
    return pd.DataFrame(
        {
            "url_hash": df["url_hash"].to_numpy()[jj],
            "dup_of": df["url_hash"].to_numpy()[ii],
            "distance": d[ii, jj].astype(np.int64),
            "a_rank": df["rank_key"].to_numpy()[ii],
        }
    )


def _best_match(df: pd.DataFrame) -> pd.DataFrame:
    """Per later-page: keep min (distance, earlier-rank) candidate."""
    df = df.sort_values(["distance", "a_rank"], kind="mergesort")
    first = df.iloc[0]
    sim = max(0, min(100, int((1 - int(first["distance"]) / 64) * 100)))
    return pd.DataFrame(
        {"url_hash": [first["url_hash"]], "dup_of": [first["dup_of"]],
         "similarity": [sim]}
    )


def mark_duplicates(pages: "rd.Dataset") -> "rd.Dataset":
    """Append is_duplicate / duplicate_of / similarity_score to pages."""
    narrow = pages.select_columns(
        ["url_hash", "content_hash", "simhash", "round", "score"]
    ).map_batches(_rank_key_col, batch_format="pyarrow")

    by_hash = (
        narrow.groupby("content_hash")
        .map_groups(_exact_group, batch_format="pandas")
        .materialize()
    )
    exact_marks = {
        r["url_hash"]: (r["dup_of"], 100)
        for r in by_hash.take_all()
        if r["dup_of"] is not None
    }

    canon = by_hash.map_batches(
        lambda df: df[df["dup_of"].isna()][["url_hash", "simhash", "rank_key"]],
        batch_format="pandas",
    )

    def _explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"band": [], "val": [], "url_hash": [],
                                 "simhash": [], "rank_key": []})
        fps = from_signed(df["simhash"].to_numpy(dtype=np.int64))
        bk = band_keys(fps, N_BANDS)
        n = len(df)
        return pd.DataFrame(
            {
                "band": np.repeat(np.arange(N_BANDS), n),
                "val": bk.T.reshape(-1).astype(np.int64),
                "url_hash": np.tile(df["url_hash"].to_numpy(), N_BANDS),
                "simhash": np.tile(df["simhash"].to_numpy(), N_BANDS),
                "rank_key": np.tile(df["rank_key"].to_numpy(), N_BANDS),
            }
        )

    fuzzy_candidates = (
        canon.map_batches(_explode_bands, batch_format="pandas")
        .groupby(["band", "val"])
        .map_groups(_band_group, batch_format="pandas")
    )
    # the same pair can surface from multiple bands -> dedup then best-match
    fuzzy_best = (
        fuzzy_candidates.groupby("url_hash")
        .map_groups(_best_match, batch_format="pandas")
        .materialize()
    )
    fuzzy_marks = {
        r["url_hash"]: (r["dup_of"], r["similarity"]) for r in fuzzy_best.take_all()
    }

    marks = {**fuzzy_marks, **exact_marks}  # exact wins if both
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
