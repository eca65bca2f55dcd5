"""Scale probe: the round-4 analytic-window + pivot operators at ~200x
their bench volume — 20M events over 100k users, generated distributively
(`rd.range(...).map_batches`; the driver never holds rows).

Asserted invariants:
- events_window_rank output is EXACT on the spot-checkable invariants the
  synthetic data encodes (row count preserved; per-user max rn == user
  cardinality; gap_us == the fixed synthetic stride for every non-first
  event);
- events_pivot collapses to exactly one row per user with the exact
  per-type counts the generator's modular layout implies;
- driver-held state stays O(aggregates): both pipelines end in count()/
  tiny take()s, never a full materialize to the driver.

Run:  python probes/window_pivot_probe.py   (one JSON line on stdout)
Env:  PROBE_EVENT_ROWS (default 20_000_000)
Results are recorded in BASELINE.md (round-4 scale probes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


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

    import crawler_ray.pipelines.queries as q

    n_rows = int(os.environ.get("PROBE_EVENT_ROWS", "20000000"))
    n_users = 100_000
    stride_us = 60_000_000  # one event per user per synthetic minute
    types = np.array(q.PIVOT_EVENT_TYPES)

    # layout: event i belongs to user i % n_users, is that user's (i //
    # n_users)-th event (ts = seq * stride), type cycles with the sequence
    def to_events(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        user = (i % n_users).astype(np.int64)
        seq = (i // n_users).astype(np.int64)
        ts = (seq * stride_us).astype("datetime64[us]")
        etype = types[(seq % len(types)).astype(np.int64)]
        value = (seq % 100).astype(np.float64)
        return pa.table(
            {
                "event_id": i,
                "user_id": user,
                "ts": pa.array(ts),
                "event_type": pa.array(etype, type=pa.string()),
                "value": value,
                "props": pa.array(np.full(len(i), '{"k": 1}'), type=pa.string()),
            }
        )

    path = "/tmp/probe_window_pivot"
    os.makedirs(path, exist_ok=True)
    rd.range(n_rows).map_batches(to_events, batch_format="pyarrow").write_parquet(
        f"{path}/events.parquet"
    )
    per_user = n_rows // n_users
    out: dict = {"metric": "window_pivot_probe", "rows": n_rows, "users": n_users}

    # ---- window rank ---------------------------------------------------
    t0 = time.monotonic()
    wr = q.q_events_window_rank(path)

    def check(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        gap = t["gap_us"].to_numpy(zero_copy_only=False)
        first = rn == 1
        ok_gap = int(((gap == stride_us) | first).sum())
        ok_first = int((gap[first] == -1).sum())
        return pa.table(
            {
                "n": [len(t)],
                "ok_gap": [ok_gap],
                "ok_first": [ok_first],
                "max_rn": [int(rn.max()) if len(rn) else 0],
            }
        )

    agg = wr.map_batches(check, batch_format="pyarrow").to_pandas()  # O(blocks)
    wr_sec = round(time.monotonic() - t0, 3)
    assert int(agg["n"].sum()) == n_rows, (int(agg["n"].sum()), n_rows)
    assert int(agg["ok_gap"].sum()) == n_rows
    assert int(agg["max_rn"].max()) == per_user
    out["window_rank"] = {
        "wall_sec": wr_sec,
        "rows_per_sec": round(n_rows / wr_sec),
    }

    # ---- pivot ----------------------------------------------------------
    t0 = time.monotonic()
    pv = q.q_events_pivot(path)
    n_out = pv.count()
    pv_sec = round(time.monotonic() - t0, 3)
    assert n_out == n_users, (n_out, n_users)
    sample = pv.take(5)
    for r in sample:
        total = sum(r[f"n_{t}"] for t in q.PIVOT_EVENT_TYPES)
        assert total == per_user, (r, per_user)
        # type cycle: counts differ by at most 1 across the five types
        counts = [r[f"n_{t}"] for t in q.PIVOT_EVENT_TYPES]
        assert max(counts) - min(counts) <= 1, r
    out["pivot"] = {
        "wall_sec": pv_sec,
        "rows_per_sec": round(n_rows / pv_sec),
        "out_rows": n_out,
    }

    # ---- bucket bound (round-5) ----------------------------------------
    # the raw-stream map_groups operators resolve each BUCKET as one
    # in-memory frame; with CPUs held fixed and rows grown 10x the policy
    # must grow the bucket count so max per-group rows stays bounded
    import pyarrow.compute as pc

    from crawler_ray.pipelines.queries import _meta_rows
    from crawler_ray.stages.combine import (
        TARGET_ROWS_PER_BUCKET,
        n_buckets_for_rows,
    )

    nb = n_buckets_for_rows(_meta_rows(path, "events"))

    def bcount(t: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(t["user_id"], nb - 1)
        g = pa.table({"bucket": b}).group_by("bucket").aggregate(
            [("bucket", "count")]
        )
        return g.rename_columns(["bucket", "n"])

    bc = (
        rd.read_parquet(f"{path}/events.parquet", columns=["user_id"])
        .map_batches(bcount, batch_format="pyarrow")
        .to_pandas()  # bounded: <= nb rows per block partial
    )
    max_group_rows = int(bc.groupby("bucket")["n"].sum().max())
    # exact bound is ceil(rows/buckets) x hash skew; 2x slack covers skew
    assert max_group_rows <= 2 * TARGET_ROWS_PER_BUCKET, (
        max_group_rows, nb, TARGET_ROWS_PER_BUCKET,
    )
    out["bucket_bound"] = {
        "n_buckets": nb,
        "max_group_rows": max_group_rows,
        "target_rows_per_bucket": TARGET_ROWS_PER_BUCKET,
    }

    import shutil

    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
