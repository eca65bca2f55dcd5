"""Scale probe: round-5c text-analysis operators at ~100x the bench corpus.

Two legs, one JSON line on stdout:

1. **langid** — doc_langid (the SHIPPED query code, unmodified) over a
   distributively-generated corpus of PROBE_LANGID_DOCS docs whose
   characters are drawn from per-language biased alphabets (4 synthetic
   languages, overlapping letter ranges so profiles share mass but stay
   separable).  Exactness is checked against DuckDB running the
   registered oracle SQL on the same parquet (full value compare), and
   the prediction must recover the generating language on >= 99% of
   docs — the profile TRAIN exchange stays alphabet-bounded no matter
   the corpus size, so the only thing that grows is the two maps.

2. **substring dups** — doc_substring_dups (shipped code) over
   PROBE_SUBSTR_DOCS docs of rng text (24-gram collisions across rng
   text are ~(n_windows^2 / 26^24), i.e. never) where every id%100==0
   doc embeds one SHARED 64-char template at a stride-aligned offset:
   every planted doc must report n_dup = (64-W)/S+1 duplicated windows
   covering (n_dup-1)*S+W chars (>= 95% exactly that; the rest gain one
   boundary-collision window, see the in-code birthday math), every
   other doc exactly 0 — a closed-form check of the window-bucket
   distinct-doc test AND the doc-bucket interval union at 100x, plus
   windows/s throughput.

Run:  python probes/langid_substr_probe.py     (one JSON line on stdout)
Env:  PROBE_LANGID_DOCS (default 200_000), PROBE_SUBSTR_DOCS (default
      500_000), RAY_GRAFT_CPUS (default 32)
Results are recorded in BASELINE.md (round-5 scale probes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_LANGID = int(os.environ.get("PROBE_LANGID_DOCS", "200000"))
N_SUBSTR = int(os.environ.get("PROBE_SUBSTR_DOCS", "500000"))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
LANGID_CHARS = 160
SUBSTR_CHARS = 200
LANGS = ["aa", "bb", "cc", "dd"]
TEMPLATE_LEN = 64


def gen_langid(batch: pd.DataFrame) -> pa.Table:
    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 23)
    lang_i = (ids % len(LANGS)).astype(np.int64)
    # language j draws from a 12-letter window starting at 4*j: adjacent
    # languages share 8 of 12 letters, so profiles overlap but the rank
    # orders differ enough to separate
    u = rng.random((len(ids), LANGID_CHARS))
    off = (u * 12).astype(np.int64) + 4 * lang_i[:, None]
    codes = (off + ord("a")).astype(np.uint32)
    blob = codes.astype("<u4").tobytes()
    txt = blob.decode("utf-32-le")
    text = np.array(
        [txt[i * LANGID_CHARS : (i + 1) * LANGID_CHARS] for i in range(len(ids))],
        dtype=object,
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(np.array(LANGS, object)[lang_i]),
            "text": pa.array(text),
            "n_chars": pa.array(np.full(len(ids), LANGID_CHARS), pa.int64()),
        }
    )


def leg_langid(tmp: str) -> dict:
    import duckdb

    from crawler_ray.pipelines.queries import QUERIES, oracle_sql

    doc_dir = f"{tmp}/documents.parquet"
    t0 = time.monotonic()
    (
        rd.range(N_LANGID, override_num_blocks=max(CPUS * 4, 64))
        .map_batches(gen_langid, batch_format="pandas")
        .write_parquet(doc_dir)
    )
    gen_s = time.monotonic() - t0

    t0 = time.monotonic()
    out = QUERIES["doc_langid"](tmp).to_pandas()
    wall = time.monotonic() - t0
    assert len(out) == N_LANGID, len(out)
    acc = float(out["is_match"].mean())
    assert acc >= 0.99, acc

    t0 = time.monotonic()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_dir}/*.parquet')"
    )
    oracle = con.sql(oracle_sql()["doc_langid"]).df()
    a = out.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "pred_lang", "score", "is_match"]
    ]
    b = oracle.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "pred_lang", "score", "is_match"]
    ]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    oracle_s = time.monotonic() - t0

    chars = N_LANGID * LANGID_CHARS
    return {
        "langid_docs": N_LANGID,
        "langid_chars": chars,
        "langid_gen_s": round(gen_s, 1),
        "langid_wall_s": round(wall, 1),
        "langid_chars_per_s": int(chars / wall),
        "langid_accuracy": round(acc, 4),
        "langid_oracle_exact": True,
        "langid_oracle_s": round(oracle_s, 1),
    }


def gen_substr(batch: pd.DataFrame) -> pa.Table:
    from crawler_ray.pipelines.queries import DOC_SUBSTR_STRIDE as S

    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 41)
    codes = (rng.random((len(ids), SUBSTR_CHARS)) * 26).astype(np.uint32) + ord(
        "a"
    )
    # the shared template: 64 caps, identical across ALL planted docs,
    # placed at a stride-aligned offset (8 % S == 0)
    tpl = (np.arange(TEMPLATE_LEN, dtype=np.uint32) * 7) % 26 + ord("A")
    planted = ids % 100 == 0
    assert 8 % S == 0
    codes[planted, 8 : 8 + TEMPLATE_LEN] = tpl
    blob = codes.astype("<u4").tobytes()
    txt = blob.decode("utf-32-le")
    text = np.array(
        [txt[i * SUBSTR_CHARS : (i + 1) * SUBSTR_CHARS] for i in range(len(ids))],
        dtype=object,
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(text),
            "n_chars": pa.array(np.full(len(ids), SUBSTR_CHARS), pa.int64()),
        }
    )


def leg_substr(tmp: str) -> dict:
    from crawler_ray.pipelines.queries import (
        DOC_SUBSTR_STRIDE as S,
        DOC_SUBSTR_W as W,
        QUERIES,
    )

    doc_dir = f"{tmp}/documents.parquet"
    t0 = time.monotonic()
    (
        rd.range(N_SUBSTR, override_num_blocks=max(CPUS * 4, 64))
        .map_batches(gen_substr, batch_format="pandas")
        .write_parquet(doc_dir)
    )
    gen_s = time.monotonic() - t0

    t0 = time.monotonic()
    out = QUERIES["doc_substring_dups"](tmp).to_pandas()
    wall = time.monotonic() - t0
    assert len(out) == N_SUBSTR, len(out)

    n_dup = (TEMPLATE_LEN - W) // S + 1
    cover = (n_dup - 1) * S + W
    planted = out["doc_id"].to_numpy() % 100 == 0
    # Closed form is a LOWER bound on planted docs: windows straddling a
    # template edge share W-S template chars and differ only in their S
    # rng chars, so two planted docs collide on a boundary window with
    # p = 26^-S per pair — a birthday term: with k planted docs a
    # fraction ~2*(1-(1-26^-S)^k) ~ 2k/26^S of them gain one extra
    # window (~2.2%% at the default 5k planted; measured 6/1000 when a
    # denser 10%% planting was tried).
    # Unplanted docs carry no template chars: any dup there would need a
    # full 24-char rng collision (p ~ 26^-24), so they stay exactly 0.
    pd_ = out.loc[planted]
    assert (pd_["n_dup_windows"] >= n_dup).all()
    assert (pd_["dup_chars"] >= cover).all()
    assert float((pd_["n_dup_windows"] == n_dup).mean()) >= 0.95
    assert (out.loc[~planted, "n_dup_windows"] == 0).all()
    assert (out.loc[~planted, "dup_chars"] == 0).all()

    n_windows = int(out["n_windows"].sum())
    return {
        "substr_docs": N_SUBSTR,
        "substr_windows": n_windows,
        "substr_gen_s": round(gen_s, 1),
        "substr_wall_s": round(wall, 1),
        "substr_windows_per_s": int(n_windows / wall),
        "substr_planted_exact": True,
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
    res = {"cpus": CPUS}
    for leg, n in ((leg_langid, "langid"), (leg_substr, "substr")):
        tmp = f"/tmp/probe_{n}_{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        try:
            res.update(leg(tmp))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
