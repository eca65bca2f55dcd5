"""Approximate nearest-neighbor search over an embedding column.

Two paths (similarity-search family, SURVEY.md build mandate):

- brute force (queries.py::q_knn_bruteforce): broadcast query matrix,
  per-batch matmul, partial top-k, final per-query top-k — exact, O(N*Q).
- LSH (this module): random-hyperplane signatures (Charikar 2002) in T
  tables of b bits; a vector is a candidate for a query when they share a
  bucket in ANY table.  Candidates are scored exactly; recall is tunable
  via (T, b).  The scale path: bucket assignment is a stateless
  ``map_batches``; only candidate rows reach scoring, so the work per query
  is O(candidates) not O(N).

Determinism: plane matrices derive from a seeded RNG, so results are
reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    c = t[col].combine_chunks()
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(t), -1)


def _duck_round(x: np.ndarray, ndigits: int) -> np.ndarray:
    """DuckDB ROUND semantics (half away from zero) so ANN outputs stay
    bit-comparable with SQL oracles, mirroring queries.duck_round."""
    s = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(arr) * s + 0.5), arr) / s


#: planes are always drawn at this width and sliced to ``n_bits`` so the
#: plane values for bit b are identical for every n_bits <= MAX_PLANE_BITS
#: (lets the SQL oracle embed one literal plane table while n_bits is
#: tuned at runtime, and keeps tuning from changing the planes themselves)
MAX_PLANE_BITS = 24


class HyperplaneLSH:
    """T tables x b random hyperplanes; bucket = sign-bit pattern."""

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 12, seed: int = 7):
        if n_bits > MAX_PLANE_BITS:
            raise ValueError(f"n_bits must be <= {MAX_PLANE_BITS}")
        rng = np.random.default_rng(seed)
        self.planes = np.ascontiguousarray(
            rng.standard_normal((n_tables, MAX_PLANE_BITS, dim))[:, :n_bits, :]
        )
        self.n_tables = n_tables
        self.n_bits = n_bits

    def buckets(self, X: np.ndarray) -> np.ndarray:
        """[n, n_tables] int bucket ids."""
        out = np.empty((X.shape[0], self.n_tables), dtype=np.int64)
        weights = 1 << np.arange(self.n_bits, dtype=np.int64)
        for t in range(self.n_tables):
            bits = (X @ self.planes[t].T) > 0
            out[:, t] = bits @ weights
        return out


def lsh_candidate_pairs(
    planes: np.ndarray, Xn: np.ndarray, q_buckets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All (row_idx, query_idx) pairs sharing a bucket in ANY table —
    loop-free per table (sort + double searchsorted + repeat expansion),
    deduped across tables with one np.unique over a fused pair key.

    ``planes``: [T, b, dim]; ``Xn``: [n, dim] normalized; ``q_buckets``:
    [n_q, T] from :meth:`HyperplaneLSH.buckets`.
    """
    n_q = q_buckets.shape[0]
    weights = 1 << np.arange(planes.shape[1], dtype=np.int64)
    rows_all: list[np.ndarray] = []
    qs_all: list[np.ndarray] = []
    for t in range(planes.shape[0]):
        xb = ((Xn @ planes[t].T) > 0) @ weights          # [n] data buckets
        qb = q_buckets[:, t]
        order = np.argsort(qb, kind="stable")
        qb_sorted = qb[order]
        left = np.searchsorted(qb_sorted, xb, side="left")
        cnt = np.searchsorted(qb_sorted, xb, side="right") - left
        hit = np.flatnonzero(cnt)
        if not len(hit):
            continue
        reps = cnt[hit]
        total = int(reps.sum())
        # per-hit-row range [left, left+reps) into the sorted query array
        offsets = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        rows_all.append(np.repeat(hit, reps))
        qs_all.append(order[np.repeat(left[hit], reps) + offsets])
    if not rows_all:
        z = np.empty(0, dtype=np.int64)
        return z, z
    rows = np.concatenate(rows_all)
    qs = np.concatenate(qs_all)
    key = np.unique(rows * np.int64(n_q) + qs)
    return key // n_q, key % n_q


def tune_lsh_bits(
    sample_X: np.ndarray,
    Q: np.ndarray,
    k: int = 5,
    n_tables: int = 16,
    recall_floor: float = 0.9,
    min_bits: int = 4,
    max_bits: int = 24,
) -> int:
    """Pick bits-per-table from a SAMPLED similarity distribution: the
    largest ``b`` whose analytic top-k recall stays above ``recall_floor``.

    Signal similarity = the k-th best cosine per query within the sample
    (an underestimate of the full corpus' top-k floor, so the tuning errs
    toward recall).  Per Charikar hyperplane LSH, P(two vectors agree on
    one hyperplane) = 1 - theta/pi; a table of b planes collides with p^b
    and T tables admit 1-(1-p^b)^T.  Clustered corpora (signal cosine
    > 0.8) tune to 10+ bits — background candidates collapse to < 1 % —
    while weak-similarity corpora (random embeddings, signal ~ 0.4) tune
    back to ~4 bits, where LSH honestly cannot prune without losing
    recall.  Deterministic: no RNG, same sample -> same bits.
    """
    Xn = sample_X / np.linalg.norm(sample_X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = np.clip(Xn @ Qn.T, -1.0, 1.0)                 # [n_sample, n_q]
    kk = min(k, sims.shape[0])
    topk = np.sort(sims, axis=0)[-kk, :]                 # k-th best per query
    p_sig = 1.0 - np.arccos(np.clip(topk, -1.0, 1.0)) / np.pi
    best = min_bits
    for b in range(min_bits, max_bits + 1):
        recall = float((1.0 - (1.0 - p_sig**b) ** n_tables).mean())
        if recall >= recall_floor:
            best = b
        else:
            break
    return best


def ann_topk(
    ds: "rd.Dataset",
    query_ids: np.ndarray,
    Q: np.ndarray,
    k: int = 5,
    n_tables: int = 16,
    n_bits: int | None = None,
    train_sample: np.ndarray | None = None,
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """Top-k approximate cosine neighbors for each query vector.

    ``n_bits=None`` auto-tunes bits-per-table from ``train_sample`` (or the
    query matrix itself) via :func:`tune_lsh_bits` — the knob that makes
    LSH actually PRUNE on clustered corpora instead of admitting most of
    the corpus as candidates.  Candidate matching is loop-free
    (:func:`lsh_candidate_pairs`); scoring is one fused gather + row-wise
    dot.  Returns (query_id, neighbor_id, cosine) — same shape as the
    brute-force baseline so recall is directly measurable.
    """
    dim = Q.shape[1]
    if n_bits is None:
        sample = train_sample if train_sample is not None else Q
        n_bits = tune_lsh_bits(sample, Q, k=k, n_tables=n_tables)
    lsh = HyperplaneLSH(dim, n_tables, n_bits)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_buckets = lsh.buckets(Qn)                 # [n_q, T]
    ref = ray.put((lsh.planes, q_buckets, query_ids, Qn))

    def candidates(t: pa.Table) -> pa.Table:
        planes, q_buckets_, q_ids, Qn_ = ray.get(ref)
        X = _matrix(t)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = np.asarray(t[id_col].to_pylist())
        rows, qs = lsh_candidate_pairs(planes, Xn, q_buckets_)
        keep = ids[rows] != q_ids[qs]           # drop self-matches
        rows, qs = rows[keep], qs[keep]
        cos = np.einsum("ij,ij->i", Xn[rows], Qn_[qs])
        return pa.table(
            {
                "query_id": pa.array(q_ids[qs], type=pa.int64()),
                "neighbor_id": pa.array(ids[rows], type=pa.int64()),
                "cosine_raw": pa.array(cos, type=pa.float64()),
            }
        )

    def topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["cosine_raw", "neighbor_id"],
                            ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "query_id": pa.array(df["query_id"].tolist(), type=pa.int64()),
                "neighbor_id": pa.array(df["neighbor_id"].tolist(), type=pa.int64()),
                "cosine": pa.array(_duck_round(df["cosine_raw"].to_numpy(), 6)),
            }
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def _kmeans(X: np.ndarray, k: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic numpy k-means on a (sample) matrix -> centroids."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(0)
    return C


def expand_ivf_candidates(
    assign: np.ndarray,
    ids: np.ndarray,
    Xn: np.ndarray,
    p_lists: np.ndarray,
    p_qis: np.ndarray,
    q_ids: np.ndarray,
    Qn: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Loop-free (row, probing-query) expansion for IVF candidate emission.

    ``p_lists`` (sorted list ids) / ``p_qis`` (query index per entry) form a
    CSR-style inverted probe table; each corpus row expands to the
    contiguous run of probe entries matching its list assignment, self
    matches drop, and scores come from ONE batched row-wise dot
    (``einsum``) instead of per-pair Python floats.  Returns
    ``(query_idx, row_idx, cosine)`` arrays.
    """
    lo = np.searchsorted(p_lists, assign, side="left")
    hi = np.searchsorted(p_lists, assign, side="right")
    counts = hi - lo
    rows = np.repeat(np.arange(len(ids)), counts)
    if len(rows) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    # offsets within each row's run -> absolute probe-entry indices
    starts = np.repeat(lo, counts)
    step = np.arange(len(rows)) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    qi = p_qis[starts + step]
    self_mask = ids[rows] != q_ids[qi]
    rows, qi = rows[self_mask], qi[self_mask]
    scores = np.einsum("ij,ij->i", Xn[rows], Qn[qi])
    return qi, rows, scores


def ivf_topk(
    ds: "rd.Dataset",
    query_ids: np.ndarray,
    Q: np.ndarray,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: np.ndarray | None = None,
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """IVF (inverted-file) ANN: k-means coarse quantizer -> per-vector list
    assignment (stateless map) -> queries probe their ``n_probe`` nearest
    lists -> exact scoring of candidates only.  The classic scale path
    (FAISS IVF-Flat shape): work per query is O(N * n_probe / n_lists).

    Centroids train on a driver-side sample (deterministic, seeded) and are
    broadcast — at 100 TB scale the sample is a `ds.random_sample` pass and
    assignment stays a streaming map.
    """
    sample = train_sample if train_sample is not None else Q
    C = _kmeans(sample.astype(np.float64), n_lists)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probes = np.argsort(-(Qn @ Cn.T), axis=1)[:, :n_probe]     # [n_q, n_probe]
    # invert probes into a flat CSR-style (list -> query indices) layout so
    # the per-batch expansion below is pure sort/searchsorted — no Python
    # loop over rows (the LSH twin, lsh_candidate_pairs, uses the same shape)
    flat_lists = probes.ravel().astype(np.int64)               # [n_q*n_probe]
    flat_qis = np.repeat(np.arange(len(query_ids), dtype=np.int64), n_probe)
    order = np.argsort(flat_lists, kind="stable")
    probe_lists = flat_lists[order]          # sorted list ids
    probe_qis = flat_qis[order]              # query index per entry
    ref = ray.put((Cn, probe_lists, probe_qis, query_ids, Qn))

    def candidates(t: pa.Table) -> pa.Table:
        Cn_, p_lists, p_qis, q_ids, Qn_ = ray.get(ref)
        X = _matrix(t)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assign = (Xn @ Cn_.T).argmax(1).astype(np.int64)
        qi, rows, scores = expand_ivf_candidates(
            assign, ids, Xn, p_lists, p_qis, q_ids, Qn_
        )
        return pa.table(
            {
                "query_id": pa.array(q_ids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[rows], type=pa.int64()),
                "cosine_raw": pa.array(scores, type=pa.float64()),
            }
        )

    def topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["cosine_raw", "neighbor_id"],
                            ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "query_id": pa.array(df["query_id"].tolist(), type=pa.int64()),
                "neighbor_id": pa.array(df["neighbor_id"].tolist(), type=pa.int64()),
                "cosine": pa.array(_duck_round(df["cosine_raw"].to_numpy(), 6)),
            }
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def ivf_query(sf_dir: str, n_queries: int = 10, k: int = 5):
    """queries()-style IVF entry (rows-only; recall vs brute force in
    tests/test_ann_media.py)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # row-group filter pushdown: only the ≤256 sample rows reach the driver,
    # never the full embedding table
    tt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 256)],
    )
    train = _matrix(tt)
    qt = tt.filter(pc.less(tt["vec_id"], n_queries))
    q_ids = np.asarray(qt["vec_id"].to_pylist())
    Q = _matrix(qt)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_topk(ds, q_ids, Q, k=k, train_sample=train)


def ann_query(sf_dir: str, n_queries: int = 10, k: int = 5):
    """queries()-style entry: ANN top-k for the first ``n_queries`` vectors
    of the embeddings table (rows-only: approximate by design; recall vs the
    exact brute force is asserted in tests/test_ann.py)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 256)],
    )
    train = _matrix(tt)
    qt = tt.filter(pc.less(tt["vec_id"], n_queries))
    q_ids = np.asarray(qt["vec_id"].to_pylist())
    Q = _matrix(qt)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_topk(ds, q_ids, Q, k=k, train_sample=train)


# ---------------------------------------------------- LSH near-dup ALL-PAIRS
def lsh_dedup_pairs(
    ds: "rd.Dataset",
    dim: int,
    threshold: float,
    n_tables: int = 12,
    n_bits: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 4096,
    broadcast_elems: int = 16_000_000,  # rows x dim cap (~128 MB float64)
) -> "rd.Dataset":
    """Embedding-cosine near-duplicate PAIRS over the whole corpus via LSH
    banding: signatures -> (band, id) rows -> per-bucket candidate pairs ->
    cross-table dedup -> exact-cosine verification through distributed
    attach joins (stages/join.attach_unique — the minhash verify shape,
    queries.py:974-985).  Only bucket-mates ever pair, so candidate volume
    is O(sum_b k_b^2) instead of O(N^2); with (T, b) sized to the corpus'
    similarity structure (see tune_lsh_bits) that collapses to the near-dup
    clusters.  Recall is approximate by construction — asserted against
    exact all-pairs on planted-duplicate corpora in tests/test_ann_pruning.py.

    Hot buckets (a band value shared by > max_bucket ids — where the hash
    is uninformative and LSH recall is already lost) are subdivided in
    sorted-id chunks, bounding any bucket's pair emission at
    O(k * max_bucket) instead of O(k^2).
    """
    lsh = HyperplaneLSH(dim, n_tables=n_tables, n_bits=n_bits, seed=seed)
    pref = ray.put(lsh.planes)
    shift = np.int64(1 << n_bits)

    def sigs(t: pa.Table) -> pa.Table:
        planes = ray.get(pref)
        X = _matrix(t, vec_col)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        weights = 1 << np.arange(planes.shape[1], dtype=np.int64)
        bands, out_ids = [], []
        for tb in range(planes.shape[0]):
            xb = ((Xn @ planes[tb].T) > 0) @ weights
            bands.append(np.int64(tb) * shift + xb)
            out_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), type=pa.int64()),
                "vid": pa.array(np.concatenate(out_ids), type=pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        ids = np.sort(df["vid"].to_numpy(np.int64))
        empty = pa.table(
            {"a_id": pa.array([], type=pa.int64()),
             "b_id": pa.array([], type=pa.int64())}
        )
        if len(ids) < 2:
            return empty
        a_all, b_all = [], []
        for s in range(0, len(ids), max_bucket):
            chunk = ids[s : s + max_bucket]
            if len(chunk) < 2:
                continue
            iu = np.triu_indices(len(chunk), 1)
            a_all.append(chunk[iu[0]])
            b_all.append(chunk[iu[1]])
        if not a_all:
            return empty
        return pa.table(
            {"a_id": pa.array(np.concatenate(a_all), type=pa.int64()),
             "b_id": pa.array(np.concatenate(b_all), type=pa.int64())}
        )

    cands = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # distinct pairs across tables: bucket by pair hash, vectorized
    # drop_duplicates per bucket (the _dedup_pair_candidates shape)
    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        pb = ((a * np.int64(1000003) + b) % np.int64(64)).astype(np.int32)
        return t.append_column("pbucket", pa.array(pb, type=pa.int32()))

    def dedup(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["a_id", "b_id"])
        return pa.table(
            {"a_id": pa.array(df["a_id"].to_numpy(np.int64)),
             "b_id": pa.array(df["b_id"].to_numpy(np.int64))}
        )

    uniq = (
        cands.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pandas")
    )

    # exact-cosine verify — hybrid, like the minhash verify: small corpora
    # broadcast the (id, vector) matrix once and score candidate pairs by
    # indexed dots inside map_batches (no join shuffle); larger corpora go
    # through distributed unique-key attach joins so only candidate ids'
    # vectors ever co-locate.  Both paths compute the IDENTICAL float
    # expression dot/(na*nb), so results are bit-equal.
    from crawler_ray.stages.join import attach_unique

    # pin the narrow (id, vector) projection once: both attach joins consume
    # it, and an unmaterialized projection would re-run the base read per join
    vecs = ds.map_batches(
        lambda t: t.select([id_col, vec_col]), batch_format="pyarrow"
    ).materialize()

    if vecs.count() * dim <= broadcast_elems:  # dim-aware: bounds the
        # broadcast matrix's bytes, not just its row count
        side = pa.concat_tables(
            ray.get(vecs.to_arrow_refs()), promote_options="default"
        )
        s_ids = side[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _matrix(side, vec_col)
        order = np.argsort(s_ids, kind="stable")
        s_ids, M = s_ids[order], np.ascontiguousarray(M[order])
        norms = np.maximum(np.linalg.norm(M, axis=1), 1e-12)
        ref = ray.put((s_ids, M, norms))

        def _lookup(s_ids_: np.ndarray, ids: np.ndarray) -> np.ndarray:
            """searchsorted with membership guard: ids absent from the
            vector side map to -1 (dropped, matching the join path's
            inner-join semantics instead of indexing a wrong row)."""
            pos = np.searchsorted(s_ids_, ids)
            # clamp out-of-range positions to a valid index; the membership
            # compare below rejects them (the clamped row never matches)
            pos[pos >= len(s_ids_)] = 0
            ok = len(s_ids_) > 0
            hit = (s_ids_[pos] == ids) if ok else np.zeros(len(ids), bool)
            return np.where(hit, pos, -1)

        def verify_bc(t: pa.Table) -> pd.DataFrame:
            s_ids_, M_, n_ = ray.get(ref)
            a_ids = t["a_id"].to_numpy(zero_copy_only=False)
            b_ids = t["b_id"].to_numpy(zero_copy_only=False)
            a = _lookup(s_ids_, a_ids)
            b = _lookup(s_ids_, b_ids)
            present = (a >= 0) & (b >= 0)
            a, b = a[present], b[present]
            cos = (M_[a] * M_[b]).sum(axis=1) / (n_[a] * n_[b])
            keep = cos >= threshold
            return pd.DataFrame(
                {
                    "a_id": a_ids[present][keep],
                    "b_id": b_ids[present][keep],
                    "cosine": _duck_round(cos[keep], 6),
                }
            )

        return uniq.map_batches(verify_bc, batch_format="pyarrow")

    with_a = attach_unique(uniq, vecs, "a_id", id_col, how="inner").map_batches(
        lambda t: t.rename_columns(
            [c if c != vec_col else "__vec_a" for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    with_both = attach_unique(with_a, vecs, "b_id", id_col, how="inner")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a_id": pd.array([], dtype="int64"),
                 "b_id": pd.array([], dtype="int64"),
                 "cosine": pd.array([], dtype="float64")}
            )
        va = np.vstack(df["__vec_a"].to_numpy()).astype(np.float64)
        vb = np.vstack(df[vec_col].to_numpy()).astype(np.float64)
        na = np.maximum(np.linalg.norm(va, axis=1), 1e-12)
        nb = np.maximum(np.linalg.norm(vb, axis=1), 1e-12)
        cos = (va * vb).sum(axis=1) / (na * nb)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a_id": df["a_id"].to_numpy(np.int64)[keep],
                "b_id": df["b_id"].to_numpy(np.int64)[keep],
                "cosine": _duck_round(cos[keep], 6),
            }
        )

    return with_both.map_batches(verify, batch_format="pandas", batch_size=4096)
