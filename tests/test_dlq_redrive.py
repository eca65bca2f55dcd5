"""DLQ retry bookkeeping + re-drive (VERDICT r3 missing #4; reference
``sql/queries/dead_letter_queue.sql:53-80``: MarkDLQRetryAttempted,
MarkDLQResolved, GetDLQStats)."""

import pyarrow as pa

from crawler_ray.sources.miniweb import MiniWeb
from crawler_ray.state.dlq import dlq_table, dlq_stats, mark_resolved, redrive

WEB = MiniWeb(n_docs=24, n_hosts=2, dead_link_every=2, flaky_every=5)


def _crawl_dlq():
    from crawler_ray.pipelines.crawl import CrawlEngine

    res = CrawlEngine(
        WEB, budget_per_host=4, max_rounds=30, seen_shards=2,
        record_history=True,
    ).run()
    return res


def test_redrive_marks_bookkeeping_and_recovers_pages(ray_session):
    res = _crawl_dlq()
    assert res.dlq_rows, "web must produce DLQ entries (dead links)"
    dlq = dlq_table(res.dlq_rows)
    # synthesize one transient-failure entry that heals on re-drive: a real
    # doc URL whose crawl-time failure was a 500 after retries (the miniweb
    # serves it fine at retry_count >= 1)
    host = WEB.hosts()[0]
    healed_url = f"https://{host}/doc/0"
    healed = pa.table(
        {
            "url": [healed_url], "url_hash": ["f" * 64],
            "status": [500], "round": [1],
            "error_category": ["server_error"], "retry_count": [2],
            "retry_attempted": [False], "retry_attempted_round": [-1],
            "retry_success": [False], "resolved": [False],
            "resolution_notes": [""],
        },
        schema=dlq.schema,
    )
    dlq = pa.concat_tables([dlq, healed])
    n = len(dlq)

    updated, recovered = redrive(WEB, dlq, round_no=99)
    stats = dlq_stats(updated)
    assert stats["total_entries"] == n
    assert stats["retry_attempted_count"] == n          # every entry retried
    assert stats["retry_success_count"] == 1            # only the healed one
    assert stats["unresolved_count"] == n - 1           # success auto-resolves

    u = updated.to_pylist()
    healed_row = next(r for r in u if r["url"] == healed_url)
    assert healed_row["retry_attempted"] and healed_row["retry_success"]
    assert healed_row["resolved"]
    assert healed_row["retry_attempted_round"] == 99
    dead = next(r for r in u if not r["retry_success"])
    assert dead["retry_attempted"] and not dead["resolved"]

    # the recovered page is a real engine-schema page row
    pages = recovered.take_all()
    assert len(pages) == 1
    assert pages[0]["url"] == healed_url
    assert pages[0]["status"] == 200
    assert pages[0]["round"] == 99
    assert pages[0]["spans"], "re-driven page must be parsed"


def test_redrive_skips_resolved_and_already_attempted(ray_session):
    res = _crawl_dlq()
    dlq = dlq_table(res.dlq_rows)
    # resolve everything manually, then re-drive: nothing eligible
    dlq = mark_resolved(dlq, dlq["url_hash"].to_pylist(), "wontfix")
    updated, recovered = redrive(WEB, dlq, round_no=5)
    assert dlq_stats(updated)["retry_attempted_count"] == 0
    assert recovered.count() == 0
    notes = set(updated["resolution_notes"].to_pylist())
    assert notes == {"wontfix"}


def test_second_redrive_is_a_noop(ray_session):
    res = _crawl_dlq()
    dlq = dlq_table(res.dlq_rows)
    once, _ = redrive(WEB, dlq, round_no=1)
    twice, recovered = redrive(WEB, once, round_no=2)
    assert once.to_pylist() == twice.to_pylist()
    assert recovered.count() == 0
