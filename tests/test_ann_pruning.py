"""ANN-LSH must actually PRUNE on clustered corpora (VERDICT r02 #4).

On a corpus with real cluster structure (signal cosine ~0.9 vs background
~0), auto-tuned bits-per-table must admit < 10 % of the corpus as
candidates while keeping recall >= 0.6 vs exact brute force.  Also pins
the vectorized candidate matcher against a straightforward per-row
reference implementation.
"""

import numpy as np
import pyarrow as pa

from crawler_ray.stages.ann import (
    HyperplaneLSH,
    ann_topk,
    lsh_candidate_pairs,
    tune_lsh_bits,
)

DIM, N_CLUSTERS, PER_CLUSTER, N_Q, K = 32, 20, 100, 10, 5


def _clustered_corpus(seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, PER_CLUSTER, axis=0) + 0.08 * rng.standard_normal(
        (N_CLUSTERS * PER_CLUSTER, DIM)
    )
    ids = np.arange(len(X), dtype=np.int64)
    # queries: perturbed members of the first N_Q clusters
    Q = centers[:N_Q] + 0.05 * rng.standard_normal((N_Q, DIM))
    q_ids = np.arange(10_000, 10_000 + N_Q, dtype=np.int64)
    return X, ids, Q, q_ids


def _brute_topk(X, ids, Q, q_ids):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Xn @ Qn.T
    out = {}
    for qi in range(len(q_ids)):
        top = np.argsort(-sims[:, qi], kind="stable")[:K]
        out[int(q_ids[qi])] = {int(ids[r]) for r in top}
    return out


def test_candidate_matcher_matches_per_row_reference():
    rng = np.random.default_rng(3)
    Xn = rng.standard_normal((500, DIM))
    Xn /= np.linalg.norm(Xn, axis=1, keepdims=True)
    Qn = rng.standard_normal((7, DIM))
    Qn /= np.linalg.norm(Qn, axis=1, keepdims=True)
    lsh = HyperplaneLSH(DIM, n_tables=6, n_bits=5)
    qb = lsh.buckets(Qn)
    rows, qs = lsh_candidate_pairs(lsh.planes, Xn, qb)
    got = set(zip(rows.tolist(), qs.tolist()))

    weights = 1 << np.arange(5, dtype=np.int64)
    want = set()
    for t in range(6):
        xb = ((Xn @ lsh.planes[t].T) > 0) @ weights
        for r in range(len(Xn)):
            for q in range(len(Qn)):
                if xb[r] == qb[q, t]:
                    want.add((r, q))
    assert got == want


def test_tuned_bits_prune_clustered_corpus(ray_session):
    import ray.data as rd

    X, ids, Q, q_ids = _clustered_corpus()
    n_tables = 16
    # strided sample: representative of every cluster (an unrepresentative
    # sample under-tunes toward recall, by design)
    sample = X[::4]
    bits = tune_lsh_bits(sample, Q, k=K, n_tables=n_tables)
    assert bits >= 8, bits   # clustered signal supports aggressive tables

    # candidate fraction measured over the FULL corpus, pure numpy
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    lsh = HyperplaneLSH(DIM, n_tables=n_tables, n_bits=bits)
    rows, _ = lsh_candidate_pairs(lsh.planes, Xn, lsh.buckets(Qn))
    frac = len(rows) / (len(X) * len(Q))
    assert frac < 0.10, frac

    # ... and recall vs brute force stays useful through the Ray pipeline
    tbl = pa.table(
        {"vec_id": pa.array(ids), "embedding": pa.array(list(map(list, X)))}
    )
    ds = rd.from_arrow(tbl).repartition(4)
    approx = {}
    for r in ann_topk(
        ds, q_ids, Q, k=K, n_tables=n_tables, train_sample=sample
    ).take_all():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact = _brute_topk(X, ids, Q, q_ids)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert float(np.mean(recalls)) >= 0.6, recalls


def test_tuning_backs_off_on_weak_similarity():
    """Random embeddings have no signal gap: tuning must fall back to few
    bits (recall preserved; pruning honestly impossible)."""
    rng = np.random.default_rng(5)
    X = rng.standard_normal((500, DIM))
    Q = rng.standard_normal((8, DIM))
    assert tune_lsh_bits(X, Q, k=K, n_tables=16) <= 6


# ------------------------------------------------ LSH near-dup ALL-PAIRS
def _planted_dup_corpus(n_clusters=40, per_cluster=8, n_noise=680, dim=32):
    """Clusters of tight near-duplicates (cosine >= ~0.9 within a cluster)
    in a sea of random noise vectors."""
    rng = np.random.default_rng(23)
    rows, ids = [], []
    i = 0
    for _ in range(n_clusters):
        base = rng.normal(0, 1, dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            rows.append(base + rng.normal(0, 0.05, dim))
            ids.append(i)
            i += 1
    for _ in range(n_noise):
        rows.append(rng.normal(0, 1, dim))
        ids.append(i)
        i += 1
    return np.array(rows), np.array(ids, dtype=np.int64)


def test_lsh_dedup_pairs_recall_and_pruning(ray_session):
    import ray.data as rd

    from crawler_ray.stages.ann import HyperplaneLSH, lsh_dedup_pairs

    X, ids = _planted_dup_corpus()
    dim, thr = X.shape[1], 0.85
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    hits = S[iu] >= thr
    exact = {
        (int(ids[iu[0][j]]), int(ids[iu[1][j]]))
        for j in np.flatnonzero(hits)
    }
    assert len(exact) >= 500  # the planted clusters produce real work

    n_tables, n_bits = 16, 10
    tbl = pa.table(
        {"vec_id": pa.array(ids), "embedding": pa.array(list(map(list, X)))}
    )
    ds = rd.from_arrow(tbl).repartition(4)
    out = lsh_dedup_pairs(
        ds, dim=dim, threshold=thr, n_tables=n_tables, n_bits=n_bits
    ).take_all()
    got = {(r["a_id"], r["b_id"]) for r in out}

    # every returned pair is exact-verified (precision 1.0 by construction)
    assert got <= exact
    # recall: banding at 12 bits finds nearly all >= 0.85-cosine pairs
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, recall

    # pruning: candidate volume collapses to the clusters (< 5% of all
    # pairs) — measured by replaying the banding in numpy
    lsh = HyperplaneLSH(dim, n_tables=n_tables, n_bits=n_bits)
    B = lsh.buckets(Xn)
    n_cand = 0
    for t in range(n_tables):
        _, counts = np.unique(B[:, t], return_counts=True)
        n_cand += int((counts * (counts - 1) // 2).sum())
    frac = n_cand / (len(X) * (len(X) - 1) // 2)
    assert frac < 0.05, frac


def test_emb_lsh_pairs_query_recall(ray_session, sf_dir):
    """The full-corpus query at this corpus' weak 0.35 threshold: verify
    subset-of-exact (precision 1.0) and useful recall at 4 tuned bits."""
    from crawler_ray.pipelines.queries import (
        EMB_PAIR_THRESHOLD, QUERIES, q_emb_lsh_pairs,
    )
    import duckdb

    con = duckdb.connect()
    df = con.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).df()
    X = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy(np.int64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    hits = S[iu] >= EMB_PAIR_THRESHOLD
    exact = {
        (int(min(ids[iu[0][j]], ids[iu[1][j]])),
         int(max(ids[iu[0][j]], ids[iu[1][j]])))
        for j in np.flatnonzero(hits)
    }
    got = {
        (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
        for r in q_emb_lsh_pairs(sf_dir).take_all()
    }
    assert got <= exact
    if exact:
        assert len(got & exact) / len(exact) >= 0.8, (len(got), len(exact))


def test_lsh_dedup_broadcast_and_join_paths_agree(ray_session, sf_dir):
    """The hybrid verify's two paths (broadcast indexed-dot vs distributed
    attach joins) must emit identical pairs AND identical rounded cosines
    (same float expression on both)."""
    import pandas as pd

    from crawler_ray.stages.ann import lsh_dedup_pairs
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    kw = dict(dim=64, threshold=0.35, n_tables=16, n_bits=4)
    a = (lsh_dedup_pairs(ds, broadcast_elems=10**12, **kw).to_pandas()
         .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    b = (lsh_dedup_pairs(ds, broadcast_elems=0, **kw).to_pandas()
         .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert len(a) > 0
