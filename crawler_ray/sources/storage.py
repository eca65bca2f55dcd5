"""Table storage layer: Lance when available, parquet otherwise.

The north rule targets Lance tables for the interleaved documents (list-of-
struct span columns, blob-friendly).  The ``lance``/``pylance`` package is
not installed in this sandbox, so every writer/reader goes through this
module: if ``import lance`` succeeds the dataset is written as a Lance
dataset (merge-insert friendly, columnar blobs); otherwise it falls back to
partitioned parquet with identical schemas and directory layout semantics.
Nothing else in the engine knows which format is underneath.

Resumable layout contract (both backends): one directory per logical table
version (``<root>/<table>/<partition>=<value>/``); writers write a temp dir
and rename, so a partially-written partition is never visible; a partition
directory's existence means it is complete.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

try:  # pragma: no cover - lance is absent in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

import pyarrow as pa
import pyarrow.parquet as pq


def backend() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def write_table(table: pa.Table, path: str) -> str:
    """Atomically write one Arrow table as a dataset directory."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        if HAVE_LANCE:
            lance.write_dataset(table, tmp, mode="overwrite")
        else:
            pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        _swap_into_place(tmp, path)
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def _swap_into_place(tmp: str, path: str) -> None:
    """Replace ``path`` with ``tmp`` without a window where neither is a
    complete directory: the old version is renamed ASIDE (not deleted)
    before the new one moves in, so a crash at any instant leaves either
    the old complete partition, the new complete partition, or the new one
    plus a removable ``.old-*`` remnant — never nothing."""
    aside = None
    if os.path.isdir(path):
        aside = f"{path}.old-{uuid.uuid4().hex[:8]}"
        os.replace(path, aside)
    try:
        os.replace(tmp, path)
    except BaseException:
        if aside is not None and not os.path.isdir(path):
            os.replace(aside, path)  # roll the old version back into place
        raise
    if aside is not None:
        shutil.rmtree(aside, ignore_errors=True)


def remove_dir_atomic(path: str) -> None:
    """Remove a directory without readers ever observing a half-deleted
    one: rename it aside first (atomic), then delete the aside copy.

    The aside name is DOT-PREFIXED (``.trash-…``) so partition scanners
    matching ``<key>=`` prefixes never pick up a leftover from a crash
    between the rename and the rmtree; leftovers are re-swept on the next
    call into the same parent (best-effort)."""
    parent, name = os.path.split(os.path.normpath(path))
    aside = os.path.join(parent, f".trash-{name}-{uuid.uuid4().hex[:8]}")
    os.replace(path, aside)
    shutil.rmtree(aside, ignore_errors=True)
    # opportunistically clear older crash leftovers — once per parent per
    # process (a listdir per removal would make a K-partition sweep
    # O(K x dir-size))
    if parent not in _SWEPT_PARENTS:
        _SWEPT_PARENTS.add(parent)
        try:
            for n in os.listdir(parent):
                if n.startswith(".trash-"):
                    shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
        except OSError:
            pass


_SWEPT_PARENTS: set = set()


def read_table(path: str) -> pa.Table:
    if HAVE_LANCE and os.path.exists(os.path.join(path, "_versions")):
        return lance.dataset(path).to_table()
    return pq.read_table(path)


def write_dataset(
    ds, path: str, skip_existing: bool = False, format: str = "auto"
) -> str:
    """Write a ray.data.Dataset as a dataset directory (streaming), under
    the module's resumable contract: blocks stream into a temp dir that is
    renamed into place LAST, so a crashed write never leaves a
    partial-but-visible partition, and ``skip_existing=True`` makes reruns
    skip completed partitions (directory presence == completeness).

    ``format``: ``"auto"`` (Lance when available, else parquet),
    ``"parquet"``, or ``"jsonl"`` (newline-delimited JSON — the common
    text-corpus interchange format; Ray emits one ``.json`` file of
    newline-delimited records per block, streaming, same atomic-rename
    contract)."""
    if format not in ("auto", "parquet", "jsonl"):
        raise ValueError(f"unknown format {format!r} (auto/parquet/jsonl)")
    if skip_existing and os.path.isdir(path):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        if format == "jsonl":
            ds.write_json(tmp)
        elif format == "parquet" or not (HAVE_LANCE and hasattr(ds, "write_lance")):
            ds.write_parquet(tmp)
        else:
            ds.write_lance(tmp)
        _swap_into_place(tmp, path)
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return path


#: Ray's ``write_json`` data files are ``<write_uuid>_<task>_<block>.json``
#: — the trailing ``_N_N`` pair is what separates them from hand-written
#: sidecars like ``manifest.json`` / ``order.json``.
_RAY_JSON_DATA = re.compile(r"_\d+_\d+\.json$")


def read_dataset(path: str, columns: list[str] | None = None):
    """Read a leaf dataset directory, auto-detecting the backend (Lance /
    parquet / jsonl).  ``columns`` prunes at the read for the columnar
    backends; jsonl is row-oriented, so pruning happens right after parse
    (still before anything wide enters the pipeline).

    Detection scans the top level plus one level of ``key=value``
    partition subdirectories.  A ``.json`` file counts as jsonl DATA only
    when it is ``.jsonl`` or matches Ray ``write_json``'s
    ``*_<task>_<block>.json`` naming — hand-written sidecars
    (``manifest.json``, ``order.json``) never reroute the read.  Parquet
    wins whenever parquet data files exist anywhere in the scan."""
    import ray.data as rd

    if HAVE_LANCE and os.path.exists(os.path.join(path, "_versions")):
        return rd.read_lance(path, columns=columns)
    if os.path.isdir(path):
        names = list(os.listdir(path))
        for n in list(names):
            sub = os.path.join(path, n)
            if "=" in n and os.path.isdir(sub):
                names.extend(os.listdir(sub))
        has_parquet = any(n.endswith(".parquet") for n in names)
        has_json = any(
            n.endswith(".jsonl") or _RAY_JSON_DATA.search(n) for n in names
        )
        if has_json and not has_parquet:
            ds = rd.read_json(path)
            return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns)


def retention_sweep(
    root: str,
    keep: int | None = None,
    min_value: int | None = None,
    partition_key: str = "round",
) -> list[str]:
    """Partition-level retention delete (reference: the 90-day retention
    deletes on content hashes and crawled pages,
    /root/reference/sql/queries/content_hash.sql:42-44 and
    crawled_page.sql:105-108, and the monthly log-partition rotation).

    The Ray-native shape is O(partitions), not O(rows): data is laid out
    one directory per ``<partition_key>=<value>`` (this module's resumable
    contract), so expiring old data is a directory *unlink* driven by the
    partition value — no scan, no rewrite, and concurrent readers of
    surviving partitions are untouched.  Exactly one of ``keep`` (retain
    the newest N partitions) or ``min_value`` (retain partitions with
    value >= cutoff — the "older than 90 days" form) must be given.

    Removal reuses the aside-rename discipline: a partition is renamed
    aside first (atomic; readers never observe a half-deleted directory)
    and then removed.  Returns the partition values swept, as strings.
    """
    if (keep is None) == (min_value is None):
        raise ValueError("exactly one of keep / min_value is required")
    prefix = f"{partition_key}="
    parts = []
    for name in os.listdir(root) if os.path.isdir(root) else []:
        if name.startswith(prefix) and os.path.isdir(os.path.join(root, name)):
            try:
                parts.append((int(name[len(prefix):]), name))
            except ValueError:
                continue  # foreign directory; never a sweep target
    parts.sort()
    if keep is not None:
        doomed = parts[: max(len(parts) - keep, 0)]
    else:
        doomed = [p for p in parts if p[0] < min_value]
    swept = []
    for value, name in doomed:
        remove_dir_atomic(os.path.join(root, name))
        swept.append(str(value))
    return swept
