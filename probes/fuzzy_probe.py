"""Scale probe: the fuzzy edit-distance self-join at vocabulary scale —
~500k DISTINCT names — demonstrating the segment (PassJoin-style)
candidate filter emits orders of magnitude fewer candidates than the
per-band all-pairs cross product it replaced.

The probe computes two exact volumes from the name set (driver-side
numpy/pandas, same formulas the operator uses):
- ``allpairs_candidates``: what per-band ``triu_indices`` generated —
  sum over bands of (pairs whose canonical band it is);
- ``segment_candidates``: the equi-merge output volume of the
  (d+1)(2d+1) segment/shift probes (pre-dedup — the DP-verification
  upper bound the new code pays);
then runs the REAL Ray operator over a parquet copy of the names and
reports wall + verified-pair count.

Run:  python probes/fuzzy_probe.py   (one JSON line on stdout)
Env:  PROBE_FUZZY_NAMES (default 500_000), RAY_GRAFT_CPUS (default 32)
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
import pyarrow.parquet as pq

import ray


WORDS = (
    "almond antique aquamarine azure beige bisque black blanched blue "
    "blush brown burlywood burnished chartreuse chiffon chocolate coral "
    "cornflower cornsilk cream cyan dark deep dim dodger drab firebrick "
    "floral forest frosted gainsboro ghost goldenrod green grey honeydew "
    "hot indian ivory khaki lace lavender lawn lemon light lime linen "
    "magenta maroon medium metallic midnight mint misty moccasin navajo "
    "navy olive orange orchid pale papaya peach peru pink plum powder "
    "puff purple red rose rosy royal saddle salmon sandy seashell sienna "
    "sky slate smoke snow spring steel tan thistle tomato turquoise "
    "violet wheat white yellow"
).split()


def _make_names(n: int, rng: np.random.Generator) -> np.ndarray:
    """n distinct TPC-H-style part names (5 words joined by spaces — the
    reference p_name shape; vectorized generation)."""
    w = np.array(WORDS)
    out = pd.Series([], dtype=object)
    while len(out) < n:
        idx = rng.integers(0, len(w), size=(n + n // 4, 5))
        s = pd.Series(w[idx[:, 0]]).str.cat(
            [w[idx[:, k]] for k in range(1, 5)], sep=" "
        )
        out = pd.concat([out, s]).drop_duplicates()
    return out.head(n).to_numpy()


def _allpairs_volume(ln: np.ndarray, d: int) -> int:
    """Exact candidate volume of the per-band triu cross product: for each
    band ℓ, pairs whose canonical band (min length) is ℓ."""
    counts = pd.Series(ln).value_counts()
    total = 0
    for ell, c in counts.items():
        longer = sum(int(counts.get(ell + k, 0)) for k in range(1, d + 1))
        total += c * (c - 1) // 2 + c * longer
    return int(total)


def _segment_volume(nm: np.ndarray, ln: np.ndarray, d: int) -> int:
    """Exact pre-dedup candidate volume of the segment/shift equi-merges
    (same slicing as the operator; computed from value_counts products)."""
    total = 0
    s_all = pd.Series(nm)
    for band in np.unique(ln):
        in_band = (ln >= band) & (ln <= band + d)
        names_b = s_all[in_band]
        shorts = names_b[ln[in_band] == band]
        n_seg = d + 1
        base, rem = divmod(int(band), n_seg)
        seg_lens = [base + (1 if x < rem else 0) for x in range(n_seg)]
        starts = np.concatenate([[0], np.cumsum(seg_lens[:-1])]).astype(int)
        for seg in range(n_seg):
            st, L = int(starts[seg]), int(seg_lens[seg])
            kc = shorts.str.slice(st, st + L).value_counts()
            for delta in range(-d, d + 1):
                pos = st + delta
                if pos < 0:
                    continue
                pc_ = names_b.str.slice(pos, pos + L).value_counts()
                common = kc.index.intersection(pc_.index)
                total += int((kc[common] * pc_[common]).sum())
    return total


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

    from crawler_ray.pipelines.queries import FUZZY_MAX_DIST, q_part_fuzzy_pairs

    n = int(os.environ.get("PROBE_FUZZY_NAMES", "500000"))
    rng = np.random.default_rng(17)
    nm = _make_names(n, rng)
    ln = np.array([len(s) for s in nm], dtype=np.int64)
    d = FUZZY_MAX_DIST

    allpairs = _allpairs_volume(ln, d)
    segment = _segment_volume(nm, ln, d)

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"p_name": pa.array(nm.tolist(), pa.string())}),
            os.path.join(td, "part.parquet"),
        )
        t0 = time.perf_counter()
        n_pairs = q_part_fuzzy_pairs(td).count()
        wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "fuzzy_probe",
        "n_names": int(n),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "allpairs_candidates": allpairs,
        "segment_candidates": segment,
        "reduction_x": round(allpairs / max(segment, 1), 1),
        "verified_pairs": int(n_pairs),
        "wall_sec": round(wall, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
