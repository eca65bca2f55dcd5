"""Large-by-large joins as explicit partitioned hash joins + as-of joins.

Ray Data's built-in ``Dataset.join`` availability varies by release, so the
engine carries the portable pattern (ray_guide: bucket both sides by
``hash(key) % B``, co-group per bucket, join inside the bucket):

- :func:`hash_join` — tag each side, union, ``groupby(bucket)``, vectorized
  merge inside the bucket.  One all-to-all for BOTH sides together; B
  bounds per-task memory (a bucket holds ~|L|/B + |R|/B rows).  Skewed hot
  keys should be salted into sub-buckets before calling (the caller knows
  its key distribution; see pipelines/crawl.py mega-host salting for the
  pattern).
- :func:`asof_join` — same bucketing with ``pd.merge_asof`` per bucket
  (both sides sorted by (key, time) inside the bucket), i.e. the
  "last right row at or before the left row's time per key" semantics of
  DuckDB's ASOF JOIN.

Broadcast joins (small side) stay the preferred path — see
queries.py::q_mktsegment_revenue; these operators exist for the genuinely
large-large case.

All per-row work is vectorized: bucket ids come from
``pd.util.hash_array`` (deterministic siphash with pandas' fixed default
key, so every worker process computes the same bucket for the same value),
and the packed ``__row`` struct column is unpacked with Arrow
``struct_field`` by name — no Python-object row materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

DEFAULT_BUCKETS = 32


def _arrow_types(ds: "rd.Dataset") -> dict:
    """Column -> pa.DataType for a dataset, tolerating pandas-block schemas
    (numpy dtypes).  Object columns are assumed string — callers with
    nested object payloads should hand in Arrow-block datasets."""
    sch = ds.schema()
    out = {}
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            out[n] = t
        else:
            dt = np.dtype(t)
            out[n] = pa.string() if dt == object else pa.from_numpy_dtype(dt)
    return out


def bucket_ids(values, n_buckets: int) -> np.ndarray:
    """Deterministic vectorized hash-bucket assignment for a key column.

    ``pd.util.hash_array`` uses a fixed default hash key, so results agree
    across worker processes (required: both join sides bucket independently).
    The value dtype is normalized first (ints -> int64, floats -> float64,
    strings/objects -> object): hash_array hashes raw dtype bits, so the
    same logical key in different widths (int32 -1 vs int64 -1) would
    otherwise land in different buckets and silently drop matches.
    """
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = np.asarray(values, dtype=object)
    elif arr.dtype.kind in ("i", "u", "b"):
        arr = arr.astype(np.int64, copy=False)
    elif arr.dtype.kind == "f":
        arr = arr.astype(np.float64, copy=False)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _unify_key_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    """One Arrow type both sides' key columns are cast to before bucketing
    and matching, so cross-dtype joins (int32 vs int64, int vs float) agree
    bucket-wise and value-wise."""
    if lt == rt:
        return lt
    if pa.types.is_floating(lt) or pa.types.is_floating(rt):
        return pa.float64()
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        return pa.int64()
    if pa.types.is_string(lt) and pa.types.is_string(rt):
        return pa.string()
    raise TypeError(f"join key types are not unifiable: {lt} vs {rt}")


def _with_bucket(
    ds: "rd.Dataset", key: str, side: str, n_buckets: int,
    key_type: pa.DataType | None = None,
) -> "rd.Dataset":
    def tag(t: pa.Table) -> pa.Table:
        if key_type is not None and t.schema.field(key).type != key_type:
            # normalize the key dtype BEFORE hashing: both sides must agree
            t = t.set_column(
                t.column_names.index(key), key, t[key].cast(key_type)
            )
        b = bucket_ids(t[key].to_numpy(zero_copy_only=False), n_buckets)
        return t.append_column(
            "__bucket", pa.array(b, type=pa.int64())
        ).append_column("__side", pa.array([side] * len(t), type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def _pack(t: pa.Table) -> pa.Table:
    """Pack all payload columns into one struct column so mismatched left /
    right schemas can flow through a single union + groupby shuffle."""
    payload = t.drop_columns(["__bucket", "__side"])
    struct = pa.StructArray.from_arrays(
        [payload[c].combine_chunks() for c in payload.column_names],
        payload.column_names,
    )
    return pa.table(
        {"__bucket": t["__bucket"], "__side": t["__side"], "__row": struct}
    )


def _unpack_side(t: pa.Table, side: str, cols: list[str]) -> pd.DataFrame:
    """Vectorized struct unpack for one side of the bucket (Arrow
    ``flatten()``, no per-row Python)."""
    rows = t.filter(pc.equal(t["__side"], side))["__row"].combine_chunks()
    if len(rows) == 0:
        return pd.DataFrame(columns=cols)
    # Ray unifies the two sides' struct schemas at union time (missing
    # fields become null), so select fields BY NAME, never positionally.
    return pa.table({c: pc.struct_field(rows, c) for c in cols}).to_pandas()


def _listify(df: pd.DataFrame) -> pd.DataFrame:
    """Arrow list columns arrive in pandas as numpy-array cells, which the
    Arrow block builder cannot convert back — rewrap them as Python lists
    (touches only list-typed columns, key/scalar columns stay vectorized)."""
    for c in df.columns:
        if df[c].dtype == object:
            idx = df[c].first_valid_index()
            if idx is not None and isinstance(df[c].loc[idx], np.ndarray):
                df[c] = df[c].map(
                    lambda v: v.tolist() if isinstance(v, np.ndarray) else v
                )
    return df


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    how: str = "inner",
) -> "rd.Dataset":
    """Partitioned hash join; output columns = left columns + right columns
    (right key column dropped when names differ).  Column name collisions
    other than the keys must be resolved by the caller beforehand.  Key
    columns are normalized to one unified dtype (int32 vs int64 etc.) so
    both sides bucket and match consistently."""
    ltypes = _arrow_types(left)
    rtypes = _arrow_types(right)
    key_type = _unify_key_type(ltypes[left_key], rtypes[right_key])
    ltypes[left_key] = key_type

    lcols = left.schema().names
    rcols = right.schema().names
    # When right_key collides with a NON-KEY left column, the packed-struct
    # union would merge two same-named fields of possibly different types
    # (fatal), and the post-merge drop would hit the LEFT column.  Rename
    # right's key to a reserved name up front — it is dropped from the
    # output anyway whenever the key names differ.
    rk_eff = right_key
    if right_key != left_key and right_key in lcols:
        rk_eff = "__rkey__"
        if rk_eff in lcols or rk_eff in rcols:
            raise ValueError("column name '__rkey__' is reserved by hash_join")
        idx = rcols.index(right_key)
        renamed = rcols.copy()
        renamed[idx] = rk_eff
        right = right.map_batches(
            lambda t, names=renamed: t.rename_columns(names),
            batch_format="pyarrow",
        )
        rtypes[rk_eff] = rtypes.pop(right_key)
        rcols = renamed
    rtypes[rk_eff] = key_type

    lt = _with_bucket(left, left_key, "l", n_buckets, key_type)
    rt = _with_bucket(right, rk_eff, "r", n_buckets, key_type)

    both = lt.map_batches(_pack, batch_format="pyarrow").union(
        rt.map_batches(_pack, batch_format="pyarrow")
    )

    # the merged column layout (pandas suffix rules), for typed empty blocks
    out_fields = [(c, ltypes[c]) for c in lcols]
    for c in rcols:
        if c == rk_eff:
            continue
        out_fields.append((c + "__r" if c in lcols else c, rtypes[c]))
    empty_schema = pa.schema(out_fields)

    def join_bucket(t: pa.Table):
        lrows = _unpack_side(t, "l", lcols)
        rrows = _unpack_side(t, "r", rcols)
        merged = lrows.merge(
            rrows, left_on=left_key, right_on=rk_eff, how=how,
            suffixes=("", "__r"),
        )
        if rk_eff != left_key and rk_eff in merged.columns:
            merged = merged.drop(columns=[rk_eff])
        if merged.empty:
            # a typed empty block: all-empty results would otherwise lose
            # the output schema entirely (schema-less dataset downstream)
            return empty_schema.empty_table()
        return _listify(merged)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def attach_unique(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    how: str = "left",
) -> "rd.Dataset":
    """Specialized hash join for the common "attach columns by unique key"
    case (right side has at most one row per key).  Unlike :func:`hash_join`
    the payloads NEVER pass through pandas: both sides are aligned to ONE
    exact combined schema (typed nulls for the columns a side lacks) before
    the union — if the union carried two different schemas, the shuffle
    concat would fall back to a pandas roundtrip that silently rewrites
    types (int32 -> int64, struct field reorder, all-null -> null type),
    fatal for nested payloads.  Inside each bucket the match indices are
    computed on the key columns only and right payload columns attach via
    null-masked Arrow ``take``, so wide payloads (span lists, shingle
    lists) move zero-copy end-to-end.  ``how`` is "left" (unmatched left
    rows keep null payloads) or "inner"."""
    ltypes = _arrow_types(left)
    rtypes = _arrow_types(right)
    lcols = left.schema().names
    rcols = [c for c in right.schema().names if c != right_key]
    clash = set(rcols) & set(lcols)
    if clash:
        raise ValueError(f"attach_unique payload column collision: {clash}")

    fields = (
        [("__key", ltypes[left_key]), ("__side", pa.string())]
        + [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols]
    )

    def align(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in fields:
                if name == "__key":
                    cols[name] = t[key].cast(typ)
                elif name == "__side":
                    cols[name] = pa.array([side] * n, type=pa.string())
                elif name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            # bucket on the CAST key values: hashing the raw column would
            # route the same logical key to different buckets when the two
            # sides carry different key dtypes
            b = bucket_ids(
                out["__key"].to_numpy(zero_copy_only=False), n_buckets
            )
            return out.append_column("__bucket", pa.array(b, type=pa.int64()))

        return fn

    both = left.map_batches(align("l", left_key), batch_format="pyarrow").union(
        right.map_batches(align("r", right_key), batch_format="pyarrow")
    )

    expected = pa.schema(
        [(n, ty) for n, ty in fields] + [("__bucket", pa.int64())]
    )

    def attach_bucket(t: pa.Table) -> pa.Table:
        if t.schema != expected:
            # a pandas fallback upstream (e.g. an empty pandas block in the
            # union) widens ints to double and mangles nested types; recover
            # primitives losslessly, fail loudly on unrecoverable nesting
            t = t.select(expected.names).cast(expected)
        is_l = pc.equal(t["__side"], "l").combine_chunks()
        lrows = t.filter(is_l)
        rrows = t.filter(pc.invert(is_l))
        out = pa.table({c: lrows[c] for c in lcols})
        rkeys = rrows["__key"].to_numpy(zero_copy_only=False)
        lkeys = lrows["__key"].to_numpy(zero_copy_only=False)
        pos = pd.Series(np.arange(len(rkeys)), index=rkeys).reindex(lkeys)
        idx_f = pos.to_numpy(dtype=np.float64)
        miss = np.isnan(idx_f)
        if how == "inner":
            out = out.filter(pa.array(~miss))
            indices = pa.array(idx_f[~miss].astype(np.int64))
        else:
            indices = pa.array(np.where(miss, 0, idx_f).astype(np.int64), mask=miss)
        for c in rcols:
            out = out.append_column(
                c, pc.take(rrows[c].combine_chunks(), indices)
            )
        return out

    return both.groupby("__bucket").map_groups(attach_bucket, batch_format="pyarrow")


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key: tuple[str, str],
    time: tuple[str, str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> "rd.Dataset":
    """For each left row, attach the right row with the greatest
    ``time[1] <= time[0]`` for the same key (backward as-of; DuckDB
    ASOF JOIN semantics).  Left rows without a match are dropped (inner)."""
    lk, rk = key
    lt_col, rt_col = time
    key_type = _unify_key_type(_arrow_types(left)[lk], _arrow_types(right)[rk])
    lt = _with_bucket(left, lk, "l", n_buckets, key_type)
    rt = _with_bucket(right, rk, "r", n_buckets, key_type)

    both = lt.map_batches(_pack, batch_format="pyarrow").union(
        rt.map_batches(_pack, batch_format="pyarrow")
    )

    lcols = left.schema().names
    rcols = right.schema().names

    def asof_bucket(t: pa.Table) -> pd.DataFrame:
        lrows = _unpack_side(t, "l", lcols)
        rrows = _unpack_side(t, "r", rcols)
        if lrows.empty or rrows.empty:
            cols = lcols + [c for c in rcols if c not in lcols]
            return pd.DataFrame(columns=cols)
        lrows = lrows.sort_values(lt_col, kind="mergesort")
        rrows = rrows.sort_values(rt_col, kind="mergesort")
        merged = pd.merge_asof(
            lrows, rrows, left_on=lt_col, right_on=rt_col,
            left_by=lk, right_by=rk, direction="backward",
            suffixes=("", "__r"),
        )
        return _listify(merged[merged[rt_col].notna()])

    return both.groupby("__bucket").map_groups(asof_bucket, batch_format="pyarrow")


# windows per epoch partition in range_count_join: a larger M duplicates
# fewer boundary build rows (1/M of the build side) but grows the per-task
# slice of a hot key's history (M windows of it)
RANGE_EPOCH_WINDOWS = 32


def range_count_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key: tuple[str, str],
    time: tuple[str, str],
    window_us: int,
    id_col: str,
    out_col: str = "n_in_window",
) -> "rd.Dataset":
    """For each left row, count right rows with the same key whose time lies
    in the half-open window ``[left_time - window, left_time)`` — the
    interval/range join Ray Data has no native operator for (reference
    analogue: the time-bounded lookups behind retry scheduling and log
    windows, e.g. sql/queries/crawl_log.sql time-range filters, generalized
    to a per-row window).

    ONE-shuffle shape.  Time divides into epochs of M windows; rows
    partition by (key, epoch).  A probe's window can only leave its own
    epoch through the first window, so duplicating just the builds of each
    epoch's LAST window into the next epoch (1/M of the build side) makes
    every probe answerable exactly within a single partition — no
    per-probe partial counts, and crucially no second groupby-sum on the
    probe id (Ray's sort-based aggregate pays per-distinct-key cost, which
    at one-id-per-left-row dwarfs the join itself; measured 24 s vs <5 s
    total on a 100 k-event self-join).

    (key, epoch) cells are not the shuffle unit either — millions of tiny
    groups would pay per-group Python overhead in ``map_groups``.  Cells
    hash into a bounded number of coarse groups (hash-join style), and
    counting inside a group is loop-free across all its cells: cell pairs
    densify to ids via one lexsort, builds sort once by a (cell, time-rank)
    composite int64, and each probe's count is the difference of two
    ``searchsorted`` positions.  Per-task memory is bounded by
    cells-per-group × one key's rows per M windows; hot keys split across
    epochs.
    """
    lk, rk = key
    ltc, rtc = time
    key_type = _unify_key_type(_arrow_types(left)[lk], _arrow_types(right)[rk])
    w = int(window_us)
    m = RANGE_EPOCH_WINDOWS
    n_groups = DEFAULT_BUCKETS * 2

    def _ts_int64(col: pa.ChunkedArray) -> pa.ChunkedArray:
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64())

    def _coarse(k_np: np.ndarray, e_np: np.ndarray) -> np.ndarray:
        # deterministic cross-process hash of the (key, epoch) cell into a
        # bounded number of shuffle groups (collisions just co-locate cells)
        hk = pd.util.hash_array(k_np, categorize=False)
        he = pd.util.hash_array(e_np.astype(np.int64), categorize=False)
        g = (hk ^ (he * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(n_groups)
        return g.astype(np.int64)

    def _tagged(
        k: pa.ChunkedArray, e: np.ndarray, ts: pa.ChunkedArray,
        ids: pa.ChunkedArray | pa.Array, is_probe: int,
    ) -> pa.Table:
        n = len(e)
        return pa.table(
            {
                "__k": k,
                "__e": pa.array(e),
                "__ts": ts,
                "__id": ids,
                "__probe": pa.array(np.full(n, is_probe, dtype=np.int8)),
                "__g": pa.array(
                    _coarse(k.to_numpy(zero_copy_only=False), e)
                ),
            }
        )

    def build(t: pa.Table) -> pa.Table:
        ts = _ts_int64(t[rtc])
        k = t[rk].cast(key_type)
        # exact int64 division (epoch-µs timestamps are positive, so
        # truncation == floor); float division would mis-bucket rows at
        # exact window boundaries
        b = ts.to_numpy().astype(np.int64) // w
        e = b // m
        zeros = pa.array(np.zeros(len(e), dtype=np.int64))
        own = _tagged(k, e, ts, zeros, 0)
        # builds in an epoch's last window also serve next epoch's
        # first-window probes
        edge = (b % m) == (m - 1)
        if edge.any():
            idx = np.flatnonzero(edge)
            sub = t.take(idx)
            dup = _tagged(
                sub[rk].cast(key_type), e[idx] + 1, _ts_int64(sub[rtc]),
                pa.array(np.zeros(len(idx), dtype=np.int64)), 0,
            )
            return pa.concat_tables([own, dup])
        return own

    def probe(t: pa.Table) -> pa.Table:
        ts = _ts_int64(t[ltc])
        e = (ts.to_numpy().astype(np.int64) // w) // m
        return _tagged(
            t[lk].cast(key_type), e, ts, t[id_col].cast(pa.int64()), 1
        )

    both = right.map_batches(build, batch_format="pyarrow").union(
        left.map_batches(probe, batch_format="pyarrow")
    )

    def count_in_group(g: pd.DataFrame) -> pd.DataFrame:
        is_probe = g["__probe"].to_numpy() == 1
        ids = g["__id"].to_numpy()[is_probe]
        if not len(ids):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 out_col: pd.Series([], dtype=np.int64)})
        ts = g["__ts"].to_numpy()
        if int((~is_probe).sum()) == 0:
            return pd.DataFrame(
                {id_col: ids, out_col: np.zeros(len(ids), dtype=np.int64)}
            )
        # densify (key, epoch) pairs to cell ids: one lexsort + run breaks
        ck, _ = pd.factorize(g["__k"], sort=False)
        ce = g["__e"].to_numpy()
        o = np.lexsort((ce, ck))
        kk, ee = ck[o], ce[o]
        brk = np.empty(len(o), dtype=bool)
        brk[0] = True
        brk[1:] = (kk[1:] != kk[:-1]) | (ee[1:] != ee[:-1])
        cell = np.empty(len(o), dtype=np.int64)
        cell[o] = np.cumsum(brk) - 1
        # (cell, time-rank) composite: rank over the group's build times is
        # monotone in time, so composite order == (cell, time) order; dense
        # cells keep cell*shift+rank within int64 (≤ rows² per group)
        b_cell, b_ts = cell[~is_probe], ts[~is_probe]
        p_cell, p_ts = cell[is_probe], ts[is_probe]
        uniq = np.unique(b_ts)
        shift = np.int64(len(uniq) + 2)
        comp = np.sort(b_cell * shift + np.searchsorted(uniq, b_ts))
        r_lo = np.searchsorted(uniq, p_ts - w, side="left")
        r_hi = np.searchsorted(uniq, p_ts, side="left")
        base = p_cell * shift
        cnt = np.searchsorted(comp, base + r_hi, side="left") - np.searchsorted(
            comp, base + r_lo, side="left"
        )
        return pd.DataFrame({id_col: ids, out_col: cnt.astype(np.int64)})

    return both.groupby("__g").map_groups(count_in_group, batch_format="pandas")
