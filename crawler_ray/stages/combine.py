"""Hash-bucketed distributed combines for HIGH-CARDINALITY groupbys.

Ray's ``groupby().aggregate()`` reduce costs ~1 ms per (group, aggregate)
and its parallelism equals the number of partial blocks — after a
well-reduced partial the output fits in ONE block, so thousands of groups
reduce serially (measured: a 3,385-group hourly-window aggregate went
3.4 s -> 11.3 s when its partial collapsed 8 blocks to 1).  Bucketing rows
by a hash of the key columns into O(CPUs) fixed buckets keeps the exchange
volume identical but finishes each bucket with ONE vectorized pandas
groupby over MANY groups — per-group cost becomes a hashtable probe, not a
Ray aggregate dispatch.

At cluster scale the bucket count grows with CPUs, each bucket is a
bounded fraction of the GROUP space (not the row space: partials upstream
already collapsed rows to one per (group, batch)), and no driver
materialization occurs anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

PARTIAL_BATCH = 1 << 20
"""Partial-aggregation batch size (rows).

The point is to COALESCE ACROSS BLOCK BOUNDARIES: default/None batching
caps a batch at one block, and blocks from many-small-file parquet
layouts are ~100k rows, so a partial over a high-cardinality key reduces
almost nothing and the shuffle moves the full input stream (measured:
a 20M-row/100k-user pivot shuffled 20M "partial" rows, 153 s wall;
1M-row partials cut the exchange 10-20x -> 2.9x faster end-to-end).
Safe for any mergeable batch-size-invariant reduction
(sums/counts/min/max, per-batch top-k, HLL register max); partials run
over narrow projections, so a 1M-row pandas batch is ~10-100 MB.
"""


def n_buckets_for_cluster() -> int:
    """Fixed bucket count ~2x the cluster CPUs (next power of two, >=32)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    n = 32
    while n < 2 * cpus:
        n <<= 1
    return n


TARGET_ROWS_PER_BUCKET = 1 << 20
"""Upper bound on rows a RAW-STREAM map_groups bucket may hold in memory.

``bucketed_combine`` buckets are safe at any scale (their inputs are
pre-reduced partials, so a bucket is a bounded fraction of the GROUP
space), but operators that group the raw row stream — window functions,
funnels, span-hotness — resolve each bucket as ONE in-memory pandas
frame.  With a CPU-only bucket count that frame is O(N/CPUs) rows: fine
at bench scale, worker-OOM at 100x on a fixed cluster.  Sizing the
bucket count by estimated input rows caps every frame at ~1M rows
(~10-100 MB for the narrow projections these operators carry) no matter
how the data grows.
"""


def n_buckets_for_rows(n_rows: int | None) -> int:
    """Bucket count sized by DATA VOLUME with the CPU floor kept.

    Returns the next power of two >= max(n_buckets_for_cluster(),
    ceil(n_rows / TARGET_ROWS_PER_BUCKET)).  ``n_rows`` may be an estimate
    or an upper bound (parquet-footer row counts / byte sizes — never a
    full scan); ``None`` falls back to the CPU-only policy.  Correctness
    everywhere is bucket-count-invariant (tests/test_combine.py pins it),
    so callers can feed any honest estimate."""
    n = n_buckets_for_cluster()
    if n_rows:
        need = -(-int(n_rows) // TARGET_ROWS_PER_BUCKET)
        while n < need:
            n <<= 1
    return n


def bucketed_combine(ds, keys: list[str], agg_spec: dict[str, tuple[str, str]],
                     n_buckets: int | None = None):
    """Finish a partial aggregation: group by ``keys``, apply ``agg_spec``.

    ``agg_spec`` maps output column -> (source column, pandas agg op name:
    "sum" / "min" / "max" / "size").  Keys survive as columns; output row
    order is unspecified (callers sort if they need order).  Input blocks
    may be Arrow or pandas; the bucketize pass converts to pandas.
    """
    if n_buckets is None:
        n_buckets = n_buckets_for_cluster()
    mask = np.uint64(n_buckets - 1)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        return df.assign(__bucket=(h & mask).astype(np.int64))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null key is a GROUP (SQL GROUP BY / Ray aggregate
        # semantics), not a row to silently discard
        return df.groupby(keys, sort=False, as_index=False, dropna=False).agg(
            **{o: pd.NamedAgg(column=s, aggfunc=op)
               for o, (s, op) in agg_spec.items()}
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas", batch_size=PARTIAL_BATCH)
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )


def bucketed_distinct(ds, key: str, marker: str | None = None,
                      n_buckets: int | None = None):
    """Distinct values of ``key`` (one output row per distinct value).

    With ``marker`` set, adds an all-ones int64 column of that name (the
    non-null presence flag a left join can test).  Dedups per batch first
    so the bucket exchange carries one row per (value, batch).
    """
    if n_buckets is None:
        n_buckets = n_buckets_for_cluster()
    mask = np.uint64(n_buckets - 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[key]].drop_duplicates()
        h = pd.util.hash_pandas_object(u[key], index=False).to_numpy()
        return u.assign(__bucket=(h & mask).astype(np.int64))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[key]].drop_duplicates()
        if marker is not None:
            u = u.assign(**{marker: np.ones(len(u), np.int64)})
        return u

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=PARTIAL_BATCH)
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )
