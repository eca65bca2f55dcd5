"""Scale probe: token-window chunking, DSIR importance weights, and BPE
merge training at ~1000x their bench volume — 500k docs / 20M tokens over
a 50k-word Zipf-ish vocabulary with 10 sources, generated distributively
(`rd.range(...).map_batches`; the driver never holds rows), then
cross-checked against DuckDB on the same parquet.

Asserted invariants:
- doc_chunk: FULL-table exactness vs SQL_DOC_CHUNK via a symmetric
  EXCEPT compare over all ~1M chunk rows (both directions empty);
- doc_dsir_weights: row-for-row doc_id/n_tokens equality and
  max |logratio diff| <= 1e-6 vs SQL_DOC_DSIR (6-dp rounding boundary
  flips are the only tolerated divergence; the exact-match fraction is
  reported and asserted >= 99.9%);
- doc_bpe_merges: all BPE_MERGE_ROUNDS merge rows byte-exact vs the
  recursion-free DuckDB replay (counts, symbols, tie-break order);
- driver-held state stays bounded: chunking is a zero-shuffle flat map,
  DSIR ends in a per-doc combine, BPE pulls O(blocks) candidate rows per
  round and M merge tuples total.

Run:  python probes/chunk_dsir_bpe_probe.py   (one JSON line on stdout)
Env:  PROBE_DOCS (default 500_000), RAY_GRAFT_CPUS (default 32)
Results are recorded in BASELINE.md (round-5 scale probes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_DOCS = int(os.environ.get("PROBE_DOCS", "500000"))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WORDS_PER_DOC = 40
VOCAB_N = 50_000
N_SOURCES = 10


def gen_docs(batch: dict) -> pa.Table:
    ids = np.asarray(batch["id"])
    rng = np.random.default_rng(int(ids[0]) + 29)
    w = (rng.random((len(ids), WORDS_PER_DOC)) ** 2 * VOCAB_N).astype(np.int64)
    text = np.array([" ".join(f"w{x}" for x in row) for row in w], dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(text),
            "source": pa.array([f"src{i % N_SOURCES}" for i in ids]),
        }
    )


def main() -> None:
    import duckdb

    from crawler_ray.pipelines.queries import QUERIES, oracle_sql

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out: dict[str, object] = {
        "docs": N_DOCS,
        "tokens": N_DOCS * WORDS_PER_DOC,
        "cpus": CPUS,
    }
    sqls = oracle_sql()
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        rd.range(N_DOCS).map_batches(gen_docs, batch_size=8192).repartition(
            64
        ).write_parquet(os.path.join(td, "documents.parquet"))
        out["gen_s"] = round(time.time() - t0, 1)

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{td}/documents.parquet/*.parquet')"
        )

        # ---- doc_chunk: full-table symmetric EXCEPT compare ----
        t0 = time.time()
        chunks = QUERIES["doc_chunk"](td)
        cdir = os.path.join(td, "chunks_out")
        chunks.write_parquet(cdir)
        wall = time.time() - t0
        n_rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{cdir}/*.parquet')"
        ).fetchone()[0]
        out["chunk_wall_s"] = round(wall, 1)
        out["chunk_rows"] = int(n_rows)
        out["chunk_tokens_per_s"] = int(N_DOCS * WORDS_PER_DOC / wall)
        t0 = time.time()
        diff = con.execute(
            f"""WITH r AS (SELECT * FROM read_parquet('{cdir}/*.parquet')),
            o AS ({sqls['doc_chunk']})
            SELECT (SELECT COUNT(*) FROM (SELECT * FROM r EXCEPT SELECT * FROM o))
                 + (SELECT COUNT(*) FROM (SELECT * FROM o EXCEPT SELECT * FROM r))"""
        ).fetchone()[0]
        out["chunk_oracle_s"] = round(time.time() - t0, 1)
        out["chunk_oracle_exact"] = diff == 0
        assert diff == 0, f"doc_chunk diverges on {diff} rows"

        # ---- doc_dsir_weights: per-doc compare with 6-dp tolerance ----
        t0 = time.time()
        dsir = QUERIES["doc_dsir_weights"](td).to_pandas()
        wall = time.time() - t0
        out["dsir_wall_s"] = round(wall, 1)
        out["dsir_tokens_per_s"] = int(N_DOCS * WORDS_PER_DOC / wall)
        t0 = time.time()
        exp = con.execute(sqls["doc_dsir_weights"]).df()
        out["dsir_oracle_s"] = round(time.time() - t0, 1)
        m = dsir.merge(exp, on="doc_id", suffixes=("", "_o"))
        assert len(m) == len(dsir) == len(exp) == N_DOCS
        assert (m["n_tokens"] == m["n_tokens_o"]).all()
        d = np.abs(m["logratio"].to_numpy() - m["logratio_o"].to_numpy())
        out["dsir_max_absdiff"] = float(d.max())
        out["dsir_exact_frac"] = round(float((d == 0).mean()), 6)
        assert d.max() <= 1e-6 + 1e-12, f"dsir max diff {d.max()}"
        assert (d == 0).mean() >= 0.999

        # ---- doc_bpe_merges: byte-exact merge table ----
        t0 = time.time()
        bpe = QUERIES["doc_bpe_merges"](td).to_pandas()
        wall = time.time() - t0
        out["bpe_wall_s"] = round(wall, 1)
        t0 = time.time()
        bexp = con.execute(sqls["doc_bpe_merges"]).df()
        out["bpe_oracle_s"] = round(time.time() - t0, 1)
        a = bpe.sort_values("merge_rank").reset_index(drop=True)[
            ["merge_rank", "s1", "s2", "n"]
        ]
        b = bexp.sort_values("merge_rank").reset_index(drop=True)[
            ["merge_rank", "s1", "s2", "n"]
        ]
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
        out["bpe_rows"] = len(a)
        out["bpe_oracle_exact"] = True

        # ---- BPE distributed path: force past the local-vocab cutover
        # and require the identical merge table at this scale too ----
        import crawler_ray.pipelines.queries as _q

        saved = _q.BPE_LOCAL_VOCAB
        try:
            _q.BPE_LOCAL_VOCAB = 0
            t0 = time.time()
            bpe_d = QUERIES["doc_bpe_merges"](td).to_pandas()
            out["bpe_dist_wall_s"] = round(time.time() - t0, 1)
        finally:
            _q.BPE_LOCAL_VOCAB = saved
        pd.testing.assert_frame_equal(
            a,
            bpe_d.sort_values("merge_rank").reset_index(drop=True)[
                ["merge_rank", "s1", "s2", "n"]
            ],
        )
        out["bpe_paths_agree"] = True

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
