"""Scale probe: span-level boilerplate dedup at ~2M documents / ~50M spans.

The sf0.1 bench runs span_boilerplate over 5k documents; this probe runs
the identical operator shape (synthesize list<struct> spans -> flatten ->
(span, source) bucketed combine -> span-keyed hotness resolution -> tiny
final groupby) over a distributively-generated 2M-doc corpus with planted
boilerplate (every doc in an odd shard shares a fixed 4-word chunk, so the
hot set is non-empty and its expected counts are arithmetic).

Asserted invariants:
- the planted boilerplate chunk is detected: boiler_spans equals the
  planted occurrence count exactly (per-source arithmetic check);
- driver holds only the O(sources) final aggregate — the span stream
  (~50M rows) and the distinct-span exchange never materialize anywhere;
- wall time reported per stage (generate+flatten+combine fused by the
  streaming executor; one number is honest).

Run:  python probes/span_dedup_probe.py   (one JSON line on stdout)
Env:  PROBE_DOCS (default 2_000_000), RAY_GRAFT_CPUS (default 32)
Results are recorded in BASELINE.md (round-4 scale probes).
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

N_DOCS = int(os.environ.get("PROBE_DOCS", "2000000"))
WORDS_PER_DOC = 24  # -> 6 text chunks/doc at W=4, ~7.2 text spans w/ media
PLANT = "lorem ipsum dolor sit"  # the planted boilerplate chunk (W words)
VOCAB = np.array(
    [f"w{i:05d}" for i in range(65536)], dtype=object
)  # 65536^4 ~ 1.8e19 4-gram space: organic cross-doc repeats don't happen


def gen(batch: pd.DataFrame) -> pa.Table:
    ids = batch["id"].to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 1)
    words = rng.choice(VOCAB, size=(len(ids), WORDS_PER_DOC))
    # docs with odd id carry the planted chunk as words [4, 8)
    planted = (ids % 2) == 1
    text = np.array([" ".join(w) for w in words], dtype=object)
    pw = PLANT.split(" ")
    for i in np.nonzero(planted)[0]:
        w = words[i]
        w[4:8] = pw
        text[i] = " ".join(w)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(
                np.where(ids % 4 < 2, "src_a", "src_b"), pa.string()
            ),
            "text": pa.array(text, pa.string()),
        }
    )


def main() -> None:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.pipelines import queries as Q

    # same operator body as q_span_boilerplate, but over the synthetic
    # corpus: patch _read for this run
    t0 = time.time()
    ds = rd.range(N_DOCS, override_num_blocks=256).map_batches(
        gen, batch_format="pandas"
    )
    real_read = Q._read
    Q._read = lambda sf_dir, name, columns=None: ds  # noqa: E731
    try:
        out = Q.q_span_boilerplate("probe://").to_pandas()
    finally:
        Q._read = real_read
    wall = time.time() - t0

    out = out.sort_values("source").reset_index(drop=True)
    # planted occurrences: every odd doc carries exactly one PLANT chunk;
    # odd ids split between src_a (id%4==1) and src_b (id%4==3)
    exp = {
        "src_a": (N_DOCS + 2) // 4,  # ids ≡ 1 (mod 4)
        "src_b": N_DOCS // 4,        # ids ≡ 3 (mod 4)
    }
    checks = {}
    for _, row in out.iterrows():
        checks[row["source"]] = int(row["boiler_spans"]) == exp[row["source"]]
    n_spans_total = int(out["n_spans"].sum())
    # the probe FAILS (non-zero exit) when any invariant breaks — a wrong
    # boiler count or driver-side blowup must not record a passing line
    assert len(out) == 2, f"driver rows {len(out)} != O(sources)"
    assert all(checks.values()), f"planted-chunk mismatch: {checks} exp {exp}"

    print(
        json.dumps(
            {
                "metric": "span_dedup_probe",
                "docs": N_DOCS,
                "text_spans": n_spans_total,
                "wall_sec": round(wall, 1),
                "spans_per_sec": round(n_spans_total / wall),
                "boiler_exact": checks,
                "driver_rows": int(len(out)),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
