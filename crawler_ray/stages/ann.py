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


class HyperplaneLSH:
    """T tables x b random hyperplanes; bucket = sign-bit pattern."""

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 12, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
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


def ann_topk(
    ds: "rd.Dataset",
    query_ids: np.ndarray,
    Q: np.ndarray,
    k: int = 5,
    n_tables: int = 16,
    n_bits: int = 4,
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """Defaults (16 tables x 4 bits) are tuned for weak-similarity corpora
    (top cosine ~0.4, like random embeddings): P(candidate) ~ 0.96 for the
    true neighbor vs ~0.64 background.  Clustered real-world embeddings
    (top cosine > 0.8) support 10-16 bits per table, which collapses the
    background rate — raise ``n_bits`` there for the real speedup."""
    """Top-k approximate cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine) — same shape as the brute-force
    baseline so recall is directly measurable.
    """
    dim = Q.shape[1]
    lsh = HyperplaneLSH(dim, n_tables, n_bits)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_buckets = lsh.buckets(Qn)                 # [n_q, T]
    # bucket -> query indices lookup per table
    lookup = [dict() for _ in range(n_tables)]
    for qi in range(len(query_ids)):
        for t in range(n_tables):
            lookup[t].setdefault(int(q_buckets[qi, t]), []).append(qi)
    ref = ray.put((lsh.planes, lookup, query_ids, Qn))

    def candidates(t: pa.Table) -> pa.Table:
        planes, lookup_, q_ids, Qn_ = ray.get(ref)
        X = _matrix(t)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = np.asarray(t[id_col].to_pylist())
        weights = 1 << np.arange(planes.shape[1], dtype=np.int64)
        hit_pairs: set[tuple[int, int]] = set()
        for tb in range(planes.shape[0]):
            b = ((Xn @ planes[tb].T) > 0) @ weights
            for row, bucket in enumerate(b):
                for qi in lookup_[tb].get(int(bucket), ()):  # noqa: B905
                    hit_pairs.add((row, qi))
        out_q, out_n, out_c = [], [], []
        for row, qi in hit_pairs:
            if ids[row] == q_ids[qi]:
                continue
            out_q.append(q_ids[qi])
            out_n.append(ids[row])
            out_c.append(float(Xn[row] @ Qn_[qi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine_raw": pa.array(out_c, type=pa.float64()),
            }
        )

    def topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["cosine_raw", "neighbor_id"],
                            ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "query_id": pa.array(df["query_id"].tolist(), type=pa.int64()),
                "neighbor_id": pa.array(df["neighbor_id"].tolist(), type=pa.int64()),
                "cosine": pa.array(np.round(df["cosine_raw"].to_numpy(), 6)),
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
    probed_by_list: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for lst in probes[qi]:
            probed_by_list.setdefault(int(lst), []).append(qi)
    ref = ray.put((Cn, probed_by_list, query_ids, Qn))

    def candidates(t: pa.Table) -> pa.Table:
        Cn_, probed, q_ids, Qn_ = ray.get(ref)
        X = _matrix(t)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = np.asarray(t[id_col].to_pylist())
        assign = (Xn @ Cn_.T).argmax(1)
        out_q, out_n, out_c = [], [], []
        for row, lst in enumerate(assign):
            for qi in probed.get(int(lst), ()):
                if ids[row] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(ids[row])
                out_c.append(float(Xn[row] @ Qn_[qi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine_raw": pa.array(out_c, type=pa.float64()),
            }
        )

    def topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["cosine_raw", "neighbor_id"],
                            ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "query_id": pa.array(df["query_id"].tolist(), type=pa.int64()),
                "neighbor_id": pa.array(df["neighbor_id"].tolist(), type=pa.int64()),
                "cosine": pa.array(np.round(df["cosine_raw"].to_numpy(), 6)),
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

    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    train = _matrix(full.filter(pc.less(full["vec_id"], 256)))
    qt = full.filter(pc.less(full["vec_id"], n_queries))
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

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt["vec_id"], n_queries))
    q_ids = np.asarray(qt["vec_id"].to_pylist())
    Q = _matrix(qt)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_topk(ds, q_ids, Q, k=k)
