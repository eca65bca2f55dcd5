"""Distributed duplicate marking: exact content-hash + simhash LSH near-dup.

Reference semantics (``/root/reference/crawler/services/result_persistence.py:
213-264``): a page is an exact duplicate when an earlier page has the same
content_hash (similarity 100); otherwise it is a fuzzy duplicate of the
best (min Hamming, then earliest) earlier DISTINCT-content page within
Hamming distance <= 3, similarity = clamp(int((1 - d/64) * 100)).  "Earlier"
is crawl order — rank key (round, score, url_hash).

The reference finds fuzzy matches with an O(N) full-scan XOR SQL query per
page (``/root/reference/sql/queries/content_hash.sql:67-78``).  Here:

- **fused exact + same-fingerprint pass**: identical content implies an
  identical simhash, so every content_hash group nests inside a simhash
  group — ONE shuffle keyed by simhash handles both the reference's
  UNIQUE(content_hash) exact marking (rank-first canonical per
  content_hash) and the distance-0 fast path (later DISTINCT-content pages
  sharing a full 64-bit fingerprint are duplicates of the fp-group's
  earliest canonical, sim 100).  The LSH stage then runs over DISTINCT
  fingerprints only, collapsing pathological K-same-fp clusters that
  would otherwise create K^2 band candidates.
- **fuzzy**: 4x16-bit LSH banding — two 64-bit fingerprints at distance
  <= 3 share at least one of 4 bands (pigeonhole), so ``flat-map band keys
  -> groupby(band) -> in-group vectorized Hamming verify`` finds EVERY pair
  at distance <= 3 with bounded candidate sets, then a second tiny groupby
  picks each page's best match.  Skew note: a band bucket of k
  near-identical pages costs O(k^2) verify — acceptable because candidates
  carry distinct fingerprints; pathological buckets should be capped +
  sampled at 100 TB scale (documented, not needed at sandbox scale).

Marks live in a DATASET (url_hash, dup_of, similarity), never a driver
dict.  Stamping onto the wide pages rows picks its strategy by |marks|:
small mark sets broadcast (``ray.put`` one narrow table, vectorized lookup
per batch — no shuffle of the wide span rows); large mark sets stamp via a
distributed left join bucketed on url_hash where the wide page payload
stays zero-copy Arrow end-to-end (packed struct through the shuffle,
``struct_field`` unpack, null-masked ``take`` — no pandas conversion of
span rows ever).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from crawler_ray.functions.simhash import band_keys, from_signed
from crawler_ray.stages.join import bucket_ids

N_BANDS = 4
MAX_HAMMING = 3
N_DEDUP_BUCKETS = 32
# Above this many marks the broadcast dict would strain the driver /
# per-worker heap; switch to the distributed stamp join.
BROADCAST_MARK_LIMIT = 200_000


def _rank_key_col(t: pa.Table) -> pa.Table:
    rnd = t["round"].to_pandas().astype(str).str.zfill(6)
    score = t["score"].to_pandas().astype(str).str.zfill(20)
    rk = rnd.str.cat(score, sep="|").str.cat(t["url_hash"].to_pandas(), sep="|")
    return t.append_column("rank_key", pa.array(rk, type=pa.string()))


def _fused_bucket(t: pa.Table) -> pa.Table:
    """One vectorized pass per simhash-hash bucket doing BOTH the exact
    content_hash marking and the distance-0 same-fingerprint marking.
    Bucketing keeps group counts off the Ray shuffle (thousands of tiny
    map_groups calls cost ~15 ms each); inside the bucket everything is
    pandas/numpy.  Emits marks (is_rep=False: url_hash, dup_of, similarity)
    and fingerprint representatives (is_rep=True: url_hash, simhash,
    rank_key) for the downstream LSH stage."""
    df = t.to_pandas()
    df = df.sort_values(["content_hash", "rank_key"], kind="mergesort")
    first_url = df.groupby("content_hash", sort=False)["url_hash"].transform("first")
    exact_dup = df["url_hash"].to_numpy() != first_url.to_numpy()

    canon = df.loc[~exact_dup].sort_values(["simhash", "rank_key"], kind="mergesort")
    rep_url = canon.groupby("simhash", sort=False)["url_hash"].transform("first")
    fp_dup = canon["url_hash"].to_numpy() != rep_url.to_numpy()

    mark_url = np.concatenate(
        [df["url_hash"].to_numpy()[exact_dup], canon["url_hash"].to_numpy()[fp_dup]]
    )
    mark_of = np.concatenate(
        [first_url.to_numpy()[exact_dup], rep_url.to_numpy()[fp_dup]]
    )
    reps = canon.loc[~fp_dup]
    n_marks, n_reps = len(mark_url), len(reps)
    return pa.table(
        {
            "url_hash": pa.array(
                np.concatenate([mark_url, reps["url_hash"].to_numpy()]),
                type=pa.string(),
            ),
            "dup_of": pa.array(
                list(mark_of) + [None] * n_reps, type=pa.string()
            ),
            "similarity": pa.array(
                [100] * n_marks + [None] * n_reps, type=pa.int32()
            ),
            "simhash": pa.array(
                np.concatenate(
                    [np.zeros(n_marks, dtype=np.int64),
                     reps["simhash"].to_numpy(dtype=np.int64)]
                )
            ),
            "rank_key": pa.array(
                [""] * n_marks + list(reps["rank_key"]), type=pa.string()
            ),
            "is_rep": pa.array([False] * n_marks + [True] * n_reps),
        }
    )


# A (band, value) group of k fingerprints costs O(k^2) pairwise verify.
# Groups above this size take the recursive pigeonhole path instead — still
# EXACT, never quadratic in the hot-group size.
HOT_GROUP_CAP = 256


def _hamming64(fa: np.ndarray, fb: np.ndarray) -> np.ndarray:
    xor = fa ^ fb
    return np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8), axis=-1).sum(-1)


def _pairs_exact(fps, ranks, idx, intervals, out):
    """All index pairs (i, j) with full-fp Hamming <= MAX_HAMMING among
    ``idx``, found EXACTLY without O(k^2) on hot groups.

    ``intervals`` are (shift, width) bit ranges on which the group may still
    differ.  Pigeonhole: a pair within total distance d <= MAX_HAMMING must
    agree exactly on at least one of any MAX_HAMMING+1 disjoint chunks of
    those bits — so a hot group splits into per-chunk-value subgroups and
    recurses on the remaining bits.  Each level removes a chunk, so the
    recursion terminates; when fewer than MAX_HAMMING+1 splittable bits
    remain, distinct fingerprints in the group can differ only inside those
    few bits, so the group is tiny and brute force is safe."""
    k = len(idx)
    if k < 2:
        return
    total_bits = sum(w for _, w in intervals)
    if k <= HOT_GROUP_CAP or total_bits < MAX_HAMMING + 1:
        f = fps[idx]
        ii, jj = np.triu_indices(k, 1)
        d = _hamming64(f[ii], f[jj])
        keep = d <= MAX_HAMMING
        for a, b, dd in zip(idx[ii[keep]], idx[jj[keep]], d[keep]):
            out.append((a, b, int(dd)))
        return
    # split the remaining bits into MAX_HAMMING+1 chunks of intervals
    flat = []
    for shift, width in intervals:
        flat.extend(range(shift, shift + width))
    n_chunks = MAX_HAMMING + 1
    per = -(-len(flat) // n_chunks)
    for c in range(n_chunks):
        bits = flat[c * per:(c + 1) * per]
        if not bits:
            continue
        key = np.zeros(k, dtype=np.uint64)
        for pos, b in enumerate(bits):
            key |= ((fps[idx] >> np.uint64(b)) & np.uint64(1)) << np.uint64(pos)
        rest = [x for x in flat if x not in set(bits)]
        rest_intervals = _bits_to_intervals(rest)
        order = np.argsort(key, kind="stable")
        sk = key[order]
        bounds = np.flatnonzero(np.concatenate([[True], sk[1:] != sk[:-1], [True]]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                _pairs_exact(fps, ranks, idx[order[s:e]], rest_intervals, out)


def _bits_to_intervals(bits: list[int]) -> list[tuple[int, int]]:
    if not bits:
        return []
    bits = sorted(bits)
    out = []
    start = prev = bits[0]
    for b in bits[1:]:
        if b == prev + 1:
            prev = b
            continue
        out.append((start, prev - start + 1))
        start = prev = b
    out.append((start, prev - start + 1))
    return out


def _band_pairs_bucket(t: pa.Table) -> pa.Table:
    """Per hash-bucket of (band, value) keys: vectorized self-join on the
    band key for normal-size groups, recursive pigeonhole sub-banding for
    hot groups (exact; structured fingerprint corpora otherwise blow up
    O(k^2) in a hot band value), then pairwise Hamming verify."""
    df = t.to_pandas()
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
    sizes = df.groupby(["band", "val"], sort=False)["url_hash"].transform("size")
    hot = df[sizes > HOT_GROUP_CAP]
    df = df[sizes <= HOT_GROUP_CAP]

    parts = []
    if len(df) >= 2:
        m = df.merge(df, on=["band", "val"], suffixes=("_a", "_b"))
        m = m[m["rank_key_a"] < m["rank_key_b"]]
        if not m.empty:
            fa = from_signed(m["simhash_a"].to_numpy(dtype=np.int64))
            fb = from_signed(m["simhash_b"].to_numpy(dtype=np.int64))
            d = _hamming64(fa, fb)
            keep = d <= MAX_HAMMING
            parts.append(
                pa.table(
                    {
                        "url_hash": pa.array(m["url_hash_b"].to_numpy()[keep], type=pa.string()),
                        "dup_of": pa.array(m["url_hash_a"].to_numpy()[keep], type=pa.string()),
                        "distance": pa.array(d[keep].astype(np.int64)),
                        "a_rank": pa.array(m["rank_key_a"].to_numpy()[keep], type=pa.string()),
                    }
                )
            )
    if len(hot) >= 2:
        width = 64 // N_BANDS
        for (band, _val), g in hot.groupby(["band", "val"], sort=False):
            fps = from_signed(g["simhash"].to_numpy(dtype=np.int64))
            ranks = g["rank_key"].to_numpy()
            hashes = g["url_hash"].to_numpy()
            # bits outside the matched band are where members still differ
            intervals = _bits_to_intervals(
                [b for b in range(64)
                 if not (band * width <= b < (band + 1) * width)]
            )
            found: list[tuple[int, int, int]] = []
            _pairs_exact(fps, ranks, np.arange(len(g)), intervals, found)
            if not found:
                continue
            ai = np.array([f[0] for f in found])
            bi = np.array([f[1] for f in found])
            dd = np.array([f[2] for f in found], dtype=np.int64)
            # orient each pair by rank (earlier page is the dup target)
            swap = ranks[ai] > ranks[bi]
            ai2 = np.where(swap, bi, ai)
            bi2 = np.where(swap, ai, bi)
            parts.append(
                pa.table(
                    {
                        "url_hash": pa.array(hashes[bi2], type=pa.string()),
                        "dup_of": pa.array(hashes[ai2], type=pa.string()),
                        "distance": pa.array(dd),
                        "a_rank": pa.array(ranks[ai2], type=pa.string()),
                    }
                )
            )
    if not parts:
        return empty
    return pa.concat_tables(parts)


def _best_match_bucket(t: pa.Table) -> pa.Table:
    """Per hash-bucket of later-page url_hashes: vectorized min
    (distance, earlier-rank) per url_hash."""
    df = t.to_pandas()
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


def _explode_bands(t: pa.Table) -> pa.Table:
    """Arrow in/out (an empty-pandas block anywhere in a lineage poisons
    every downstream sort into a type-mangling pandas roundtrip)."""
    n = len(t)
    if n == 0:
        return pa.table(
            {"band": pa.array([], type=pa.int64()),
             "val": pa.array([], type=pa.int64()),
             "bucket": pa.array([], type=pa.int64()),
             "url_hash": pa.array([], type=pa.string()),
             "simhash": pa.array([], type=pa.int64()),
             "rank_key": pa.array([], type=pa.string())}
        )
    simhash = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
    fps = from_signed(simhash)
    bk = band_keys(fps, N_BANDS)
    band = np.repeat(np.arange(N_BANDS), n)
    val = bk.T.reshape(-1).astype(np.int64)
    composite = (val << 2) | band
    tile_idx = pa.array(np.tile(np.arange(n), N_BANDS))
    return pa.table(
        {
            "band": pa.array(band, type=pa.int64()),
            "val": pa.array(val),
            "bucket": pa.array(bucket_ids(composite, N_DEDUP_BUCKETS)),
            "url_hash": pc.take(t["url_hash"].combine_chunks(), tile_idx),
            "simhash": pa.array(np.tile(simhash, N_BANDS)),
            "rank_key": pc.take(t["rank_key"].combine_chunks(), tile_idx),
        }
    )


def _col_bucket(t: pa.Table, col: str) -> pa.Table:
    b = bucket_ids(t[col].to_numpy(zero_copy_only=False), N_DEDUP_BUCKETS)
    return t.append_column("bucket", pa.array(b, type=pa.int64()))


def compute_marks(pages: "rd.Dataset", shuffle_blocks: int = 64) -> "rd.Dataset":
    """Duplicate marks as a Dataset (url_hash, dup_of, similarity) — one
    row per duplicate page, nothing on the driver.

    ``shuffle_blocks`` coalesces the narrow (5-column) key table before the
    shuffles: crawl output arrives as hundreds of politeness-sliced
    micro-blocks per round, and a groupby inherits its input block count as
    its partition count (576 micro-blocks -> 576 reduce partitions x ~15 ms
    -> 10x wall blow-up measured at sf0.1).  Repartitioning the narrow side
    is ~MBs even when the span payload is GBs; size it ~2x cluster cores at
    scale."""
    narrow = (
        pages.select_columns(
            ["url_hash", "content_hash", "simhash", "round", "score"]
        )
        .map_batches(_rank_key_col, batch_format="pyarrow")
        .repartition(shuffle_blocks)
    )

    def _sim_bucket(t: pa.Table) -> pa.Table:
        fp = from_signed(t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64))
        b = (fp % np.uint64(N_DEDUP_BUCKETS)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    fused = (
        narrow.map_batches(_sim_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_fused_bucket, batch_format="pyarrow")
        .materialize()
    )
    exact_marks = fused.map_batches(
        lambda t: t.filter(pc.invert(t["is_rep"])).select(
            ["url_hash", "dup_of", "similarity"]
        ),
        batch_format="pyarrow",
    )
    reps = fused.map_batches(
        lambda t: t.filter(t["is_rep"]).select(["url_hash", "simhash", "rank_key"]),
        batch_format="pyarrow",
    )

    fuzzy_best = (
        reps.map_batches(_explode_bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_band_pairs_bucket, batch_format="pyarrow")
        # same pair may surface from several bands; min-per-url_hash is
        # idempotent over those duplicates, so no pre-dedup pass is needed
        .map_batches(lambda t: _col_bucket(t, "url_hash"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_best_match_bucket, batch_format="pyarrow")
    )
    # mark sets are disjoint: fuzzy marks only hit fp-representatives,
    # which by construction are never exact / same-fp duplicates
    return exact_marks.union(fuzzy_best).materialize()


def _stamp_broadcast(pages: "rd.Dataset", marks: "rd.Dataset") -> "rd.Dataset":
    rows = marks.take_all()
    m_of = {r["url_hash"]: r["dup_of"] for r in rows}
    m_sim = {r["url_hash"]: r["similarity"] for r in rows}
    ref = ray.put((m_of, m_sim))

    def _stamp(t: pa.Table) -> pa.Table:
        of_map, sim_map = ray.get(ref)
        h = t["url_hash"].to_pandas()
        dup_of = h.map(of_map)
        sim = h.map(sim_map)
        return (
            t.append_column("is_duplicate", pa.array(dup_of.notna().to_numpy()))
            .append_column(
                "duplicate_of", pa.array(dup_of, type=pa.string(), from_pandas=True)
            )
            .append_column(
                "similarity_score", pa.array(sim, type=pa.int32(), from_pandas=True)
            )
        )

    return pages.map_batches(_stamp, batch_format="pyarrow")


def _stamp_join(
    pages: "rd.Dataset", marks: "rd.Dataset", n_buckets: int = 64
) -> "rd.Dataset":
    """Distributed left-join stamp for unbounded mark sets via
    :func:`crawler_ray.stages.join.attach_unique`: the wide page payload
    (span structs) stays Arrow through pack -> shuffle -> take; only
    url_hash keys touch numpy."""
    from crawler_ray.stages.join import attach_unique

    joined = attach_unique(
        pages, marks, "url_hash", "url_hash", n_buckets=n_buckets, how="left"
    )

    def finish(t: pa.Table) -> pa.Table:
        dup_of = t["dup_of"]
        out = t.drop_columns(["dup_of", "similarity"])
        return (
            out.append_column("is_duplicate", pc.is_valid(dup_of).combine_chunks())
            .append_column("duplicate_of", dup_of.cast(pa.string()))
            .append_column(
                "similarity_score", t["similarity"].cast(pa.int32())
            )
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def mark_duplicates(
    pages: "rd.Dataset", broadcast_limit: int = BROADCAST_MARK_LIMIT
) -> "rd.Dataset":
    """Append is_duplicate / duplicate_of / similarity_score to pages."""
    marks = compute_marks(pages)
    if marks.count() <= broadcast_limit:
        return _stamp_broadcast(pages, marks)
    return _stamp_join(pages, marks)
