"""Dead-letter-queue bookkeeping and re-drive.

The reference keeps a ``dead_letter_queue`` table of permanently failed
jobs and supports manual re-drives with per-entry bookkeeping:
``MarkDLQRetryAttempted`` sets ``retry_attempted`` / ``retry_success``,
``MarkDLQResolved`` stamps ``resolved`` + notes, and ``GetDLQStats``
aggregates the four counters
(``/root/reference/sql/queries/dead_letter_queue.sql:53-80``).

Here the DLQ is an Arrow table (the engine's ``CrawlResult.dlq_rows``
promoted by :func:`dlq_table`); :func:`redrive` re-enqueues unresolved,
not-yet-retried entries as frontier rows, runs them through the normal
fetch+parse stages as a Ray Dataset pass, and marks each entry's
``retry_attempted`` / ``retry_success`` vectorized.  At scale the DLQ is
persistable like any other table (``sources/storage.py``) and the re-drive
is a bounded batch job — DLQ volume is failures-after-max-retries, orders
of magnitude below frontier volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DLQ_FIELDS = [
    ("url", pa.string()),
    ("url_hash", pa.string()),
    ("status", pa.int64()),
    ("round", pa.int64()),
    ("error_category", pa.string()),
    ("retry_count", pa.int64()),
    # bookkeeping (reference dead_letter_queue.sql:55-59, 66-71)
    ("retry_attempted", pa.bool_()),
    ("retry_attempted_round", pa.int64()),
    ("retry_success", pa.bool_()),
    ("resolved", pa.bool_()),
    ("resolution_notes", pa.string()),
]
DLQ_SCHEMA = pa.schema(DLQ_FIELDS)


def dlq_table(rows: list[dict]) -> pa.Table:
    """Promote ``CrawlResult.dlq_rows`` to the bookkeeping schema (fresh
    entries: never retried, unresolved)."""
    n = len(rows)
    base = {name: [r.get(name) for r in rows]
            for name in ("url", "url_hash", "status", "round",
                         "error_category", "retry_count")}
    return pa.table(
        {
            **{k: pa.array(v, type=dict(DLQ_FIELDS)[k]) for k, v in base.items()},
            "retry_attempted": pa.array([False] * n, type=pa.bool_()),
            "retry_attempted_round": pa.array([-1] * n, type=pa.int64()),
            "retry_success": pa.array([False] * n, type=pa.bool_()),
            "resolved": pa.array([False] * n, type=pa.bool_()),
            "resolution_notes": pa.array([""] * n, type=pa.string()),
        },
        schema=DLQ_SCHEMA,
    )


def redrive(web, dlq: pa.Table, round_no: int = 0,
            fetch_kwargs: dict | None = None):
    """Re-drive unresolved, not-yet-retried DLQ entries through fetch+parse.

    Returns ``(updated_dlq, recovered_pages)``:

    - every eligible entry gets ``retry_attempted=True`` and
      ``retry_attempted_round=round_no``; entries whose re-fetch succeeded
      get ``retry_success=True`` AND ``resolved=True`` (reference semantics:
      a successful manual retry resolves the entry);
    - ``recovered_pages`` is a Ray Dataset of the successfully re-fetched
      pages in the engine's page schema (status==200 rows only), ready to
      union with a crawl's pages output.

    The fetch+parse pass is the engine's own stages (``SyntheticFetcher``
    batches + ``parse_fetched_batch``), so redriven pages are
    byte-identical to what the crawl would have emitted.
    """
    import ray
    import ray.data as rd

    from crawler_ray.pipelines.crawl import _split_page_block
    from crawler_ray.stages.fetch import SyntheticFetcher
    from crawler_ray.stages.parse import parse_fetched_batch

    eligible = pc.and_(
        pc.invert(dlq["resolved"]), pc.invert(dlq["retry_attempted"])
    )
    todo = dlq.filter(eligible)
    if len(todo) == 0:
        return dlq, rd.from_arrow(_empty_recovered())

    # frontier-shaped fetch input; retry_count carries the PRIOR attempt
    # count so flaky-once hosts (which heal on retry_count>=1) behave as a
    # real re-drive would
    hosts = [
        u.split("/", 3)[2].lower() if "://" in u else ""
        for u in todo["url"].to_pylist()
    ]
    fetch_in = pa.table(
        {
            "url": todo["url"],
            "url_hash": todo["url_hash"],
            "host": pa.array(hosts, type=pa.string()),
            "priority": pa.array([2] * len(todo), type=pa.int32()),
            "score": pa.array([0] * len(todo), type=pa.int64()),
            "discovery_round": pa.array([round_no] * len(todo), type=pa.int32()),
            "not_before_round": pa.array([round_no] * len(todo), type=pa.int32()),
            "retry_count": pc.cast(todo["retry_count"], pa.int32()),
            "lineage": pa.array(["dlq-redrive"] * len(todo), type=pa.string()),
        }
    )
    web_ = web
    fk = dict(fetch_kwargs or {})
    parsed = (
        rd.from_arrow(fetch_in)
        .map_batches(
            lambda t, web_=web_, fk=fk: parse_fetched_batch(
                SyntheticFetcher(web_, **fk)(t)
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    split = [_split_page_block.remote(ref, round_no)
             for ref in parsed.to_arrow_refs()]
    page_refs = [s[0] for s in split]
    ok_tbls = [t for t in ray.get(page_refs) if len(t)]
    ok_hashes = (
        pa.concat_tables(
            [t.select(["url_hash"]) for t in ok_tbls]
        )["url_hash"]
        if ok_tbls else pa.array([], type=pa.string())
    )
    recovered = rd.from_arrow_refs(page_refs)

    # vectorized bookkeeping update over the WHOLE dlq table
    att = pc.or_(dlq["retry_attempted"], eligible)
    att_round = pc.if_else(
        eligible, pa.scalar(round_no, pa.int64()), dlq["retry_attempted_round"]
    )
    succeeded = pc.and_(eligible, pc.is_in(dlq["url_hash"], value_set=ok_hashes))
    succ = pc.or_(dlq["retry_success"], succeeded)
    resolved = pc.or_(dlq["resolved"], succeeded)
    notes = pc.if_else(
        succeeded, pa.scalar("redrive: fetch succeeded", pa.string()),
        dlq["resolution_notes"],
    )
    updated = pa.table(
        {
            "url": dlq["url"], "url_hash": dlq["url_hash"],
            "status": dlq["status"], "round": dlq["round"],
            "error_category": dlq["error_category"],
            "retry_count": dlq["retry_count"],
            "retry_attempted": att,
            "retry_attempted_round": att_round,
            "retry_success": succ,
            "resolved": resolved,
            "resolution_notes": notes,
        },
        schema=DLQ_SCHEMA,
    )
    return updated, recovered


def mark_resolved(dlq: pa.Table, url_hashes: list[str], notes: str) -> pa.Table:
    """``MarkDLQResolved`` parity: stamp resolved + notes on the given
    entries (vectorized)."""
    hit = pc.is_in(dlq["url_hash"], value_set=pa.array(url_hashes, pa.string()))
    return pa.table(
        {
            **{c: dlq[c] for c in dlq.column_names
               if c not in ("resolved", "resolution_notes")},
            "resolved": pc.or_(dlq["resolved"], hit),
            "resolution_notes": pc.if_else(
                pc.and_(hit, pc.invert(dlq["resolved"])),
                pa.scalar(notes, pa.string()), dlq["resolution_notes"],
            ),
        },
        schema=DLQ_SCHEMA,
    )


def dlq_stats(dlq: pa.Table) -> dict:
    """``GetDLQStats`` parity: the four counters."""
    def _count(mask) -> int:
        return int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)

    return {
        "total_entries": len(dlq),
        "unresolved_count": _count(pc.invert(dlq["resolved"])),
        "retry_attempted_count": _count(dlq["retry_attempted"]),
        "retry_success_count": _count(dlq["retry_success"]),
    }


def _empty_recovered() -> pa.Table:
    from crawler_ray.pipelines.crawl import _empty_pages_table

    return _empty_pages_table()
