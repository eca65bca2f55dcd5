"""Scale probe: round-5b corpus operators at ~100x the bench corpus.

Two legs, one JSON line each field:

1. **bigram-LM** — doc_bigram_lm (the SHIPPED query code, unmodified)
   over a distributively-generated 500k-doc / ~20M-token corpus written
   to /tmp parquet.  Exactness is checked against DuckDB running the
   registered oracle SQL on the same parquet (full value compare of all
   500k rows after the shared duck_round) — the same oracle contract as
   the bench corpus, at 100x the rows.  Driver state: one vocabulary
   scalar; every exchange is a narrow (string key, count) row stream.

2. **snapshot diff** — doc_snapshot_diff (shipped code) over the SAME
   generated corpus: every status count has a closed form from the
   perturbation rule (removed = #(id%17==0), changed = #(id%13==0 and
   id%17!=0), added = #(id%19==0)), asserted exactly.

3. **SemDeDup at prescribed-scale K** — 1M 64-d vectors with planted
   exact duplicates (every 100th vector copies its predecessor), K=1024
   clusters (the paper's K-grows-with-N prescription; the sf query keeps
   the fixed IVF quantizer K=16).  Assignment is a broadcast-centroid
   chunked matmul map_batches; within-cluster resolution is the SHARED
   `_semdedup_group` (the exact code the query ships).  Asserted: every
   planted duplicate is marked with dup_of == its source, keepers are
   untouched, and the max cluster size stays ~N/K (no degenerate hot
   cluster), so the quadratic term is bounded.

Run:  python probes/corpus_lm_probe.py     (one JSON line on stdout)
Env:  PROBE_DOCS (default 500_000), PROBE_VECS (default 1_000_000),
      RAY_GRAFT_CPUS (default 32)
Results are recorded in BASELINE.md (round-5 scale probes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_DOCS = int(os.environ.get("PROBE_DOCS", "500000"))
N_VECS = int(os.environ.get("PROBE_VECS", "1000000"))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WORDS_PER_DOC = 40
VOCAB_N = 50_000
DIM = 64
K = 1024
SEM_T = 0.9


def gen_docs(batch: pd.DataFrame) -> pa.Table:
    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 11)
    # Zipf-ish skew: squaring a uniform concentrates mass on low word ids,
    # so hot bigrams exist (the combine actually reduces) while the tail
    # keeps the bigram vocabulary large.
    w = (rng.random((len(ids), WORDS_PER_DOC)) ** 2 * VOCAB_N).astype(np.int64)
    text = np.array([" ".join(f"w{x}" for x in row) for row in w], dtype=object)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(text)})


def leg_bigram_lm(tmp: str) -> dict:
    import duckdb

    from crawler_ray.pipelines.queries import QUERIES, oracle_sql

    doc_dir = f"{tmp}/documents.parquet"
    t0 = time.monotonic()
    (
        rd.range(N_DOCS, override_num_blocks=max(CPUS * 4, 64))
        .map_batches(gen_docs, batch_format="pandas")
        .write_parquet(doc_dir)
    )
    gen_s = time.monotonic() - t0

    t0 = time.monotonic()
    out = QUERIES["doc_bigram_lm"](tmp).to_pandas()
    lm_s = time.monotonic() - t0
    assert len(out) == N_DOCS, len(out)

    t0 = time.monotonic()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_dir}/*.parquet')"
    )
    oracle = con.sql(oracle_sql()["doc_bigram_lm"]).df()
    a = out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_bigrams", "xent"]
    ]
    b = oracle.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_bigrams", "xent"]
    ].astype({"n_bigrams": np.int64})
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    oracle_s = time.monotonic() - t0

    toks = N_DOCS * WORDS_PER_DOC
    return {
        "lm_docs": N_DOCS,
        "lm_tokens": toks,
        "lm_gen_s": round(gen_s, 1),
        "lm_wall_s": round(lm_s, 1),
        "lm_tokens_per_s": int(toks / lm_s),
        "lm_oracle_exact": True,
        "lm_oracle_s": round(oracle_s, 1),
    }


def _unoise(ids: np.ndarray, dim: int, scale: float) -> np.ndarray:
    """Deterministic per-id uniform noise via a vectorized splitmix-style
    integer hash — vector(id) is a pure function of id, so a planted
    duplicate can regenerate its SOURCE's vector exactly regardless of
    which batch either lands in."""
    x = (ids[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        (np.arange(dim, dtype=np.uint64) + np.uint64(1))
        * np.uint64(0xBF58476D1CE4E5B9)
    )
    x ^= x >> np.uint64(31)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(29)
    return (x.astype(np.float64) / 2.0**64 - 0.5) * (2.0 * scale)


def _vec_of(ids: np.ndarray, C: np.ndarray) -> np.ndarray:
    # noise scale 2.0: same-center cosine ~0.4, cross-center ~0 — only the
    # planted EXACT copies cross SEM_T=0.9, so expected dup_of == source
    return C[ids % len(C)] + _unoise(ids, DIM, 2.0)


def leg_snapshot_diff(tmp: str) -> dict:
    from crawler_ray.pipelines.queries import QUERIES

    t0 = time.monotonic()
    cdf = (
        QUERIES["doc_snapshot_diff"](tmp)
        .map_batches(
            lambda df: df["status"]
            .value_counts()
            .rename_axis("status")
            .reset_index(name="n"),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: <= 3 rows per block (partial counts)
    )
    counts = dict(cdf.groupby("status")["n"].sum())
    wall = time.monotonic() - t0
    ids = np.arange(N_DOCS)
    want = {
        "removed": int((ids % 17 == 0).sum()),
        "changed": int(((ids % 13 == 0) & (ids % 17 != 0)).sum()),
        "added": int((ids % 19 == 0).sum()),
    }
    got = {k: int(counts.get(k, 0)) for k in want}
    assert got == want, (got, want)
    return {
        "diff_docs": N_DOCS,
        "diff_wall_s": round(wall, 1),
        "diff_rows_per_s": int(2 * N_DOCS / wall),
        "diff_counts_exact": True,
    }


def gen_vecs(batch: pd.DataFrame, C: np.ndarray) -> pa.Table:
    ids = batch["id"].to_numpy()
    # every 100th vector copies its predecessor EXACTLY (the planted dup)
    src = np.where((ids % 100 == 99) & (ids > 0), ids - 1, ids)
    base = _vec_of(src, C)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(base.astype(np.float32))),
        }
    )


def _lloyd_matmul(X: np.ndarray, k: int, iters: int = 4, seed: int = 7) -> np.ndarray:
    """Probe-local chunk-free Lloyd via the |x|^2 - 2xC' + |c|^2 trick
    (the (n, k, dim) tensor of stages/ann._kmeans doesn't fit at K=1024)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = -2.0 * X @ C.T + (C**2).sum(1)[None, :]
        a = d.argmin(1)
        for j in np.unique(a):
            C[j] = X[a == j].mean(0)
    return C


def leg_semdedup() -> dict:
    from crawler_ray.pipelines.queries import _semdedup_group

    # seed centers define the generator; train K=1024 on a 32k sample
    seed_C = np.random.default_rng(3).standard_normal((4096, DIM))
    vecs = (
        rd.range(N_VECS, override_num_blocks=max(CPUS * 4, 64))
        .map_batches(lambda b: gen_vecs(b, seed_C), batch_format="pandas")
        .materialize()
    )
    sample = vecs.limit(32_768).to_pandas()
    Xs = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    t0 = time.monotonic()
    C = _lloyd_matmul(Xs, K)
    train_s = time.monotonic() - t0
    cref = ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C_ = ray.get(cref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = -2.0 * X @ C_.T + (C_**2).sum(1)[None, :]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "cluster": d.argmin(1).astype(np.int64),
                "embedding": df["embedding"],
            }
        )

    t0 = time.monotonic()
    out = (
        vecs.map_batches(assign, batch_format="pandas")
        .groupby("cluster")
        .map_groups(
            lambda g: _semdedup_group(g, threshold=SEM_T), batch_format="pandas"
        )
        .to_pandas()  # probe-side verification needs the full marking
    )
    dedup_s = time.monotonic() - t0

    out = out.set_index("vec_id").sort_index()
    ids = out.index.to_numpy()
    planted = (ids % 100 == 99) & (ids > 0)
    dup_rows = out.loc[planted]
    assert bool(dup_rows["is_dup"].all()), "planted duplicate missed"
    exact_src = (dup_rows["dup_of"] == dup_rows.index.to_numpy() - 1)
    assert bool(exact_src.all()), "planted duplicate collapsed to a non-source"
    csize = out.groupby("cluster").size()
    return {
        "sd_vecs": N_VECS,
        "sd_k": K,
        "sd_train_s": round(train_s, 1),
        "sd_wall_s": round(dedup_s, 1),
        "sd_vecs_per_s": int(N_VECS / dedup_s),
        "sd_planted_found": int(planted.sum()),
        "sd_planted_exact_src_frac": round(float(exact_src.mean()), 4),
        "sd_dup_total": int(out["is_dup"].sum()),
        "sd_max_cluster": int(csize.max()),
        "sd_mean_cluster": int(csize.mean()),
    }


def main() -> None:
    ray.init(
        address="local",
        num_cpus=CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import tempfile

    res = {}
    with tempfile.TemporaryDirectory(prefix="corpus_lm_probe") as tmp:
        res.update(leg_bigram_lm(tmp))
        res.update(leg_snapshot_diff(tmp))
    res.update(leg_semdedup())
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
