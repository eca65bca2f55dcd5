"""Scheduled-job loop conformance (reference S8,
scheduled_job_processor.py:221-700): due-poll processing, the one-hour
missed-schedule catch-up rule, guards (missing website / invalid cron /
failed publish), batch draining, and wiring into CrawlEngine."""

from datetime import datetime, timedelta, timezone

from crawler_ray.state.scheduler import (
    MAX_CATCHUP_DELAY,
    ScheduledJob,
    Scheduler,
    Submission,
)

T0 = datetime(2026, 3, 2, 12, 0, tzinfo=timezone.utc)  # Monday


def make(jobs, now=T0, submit_ok=True, websites=None):
    fired: list[Submission] = []

    def submit(sub: Submission) -> bool:
        fired.append(sub)
        return submit_ok

    sched = Scheduler(
        jobs, submit,
        website_exists=(lambda w: w in websites) if websites is not None else (lambda w: True),
        clock=lambda: now,
    )
    return sched, fired


# ------------------------------------------------------------- due cycle
def test_due_jobs_fire_and_reschedule():
    j = ScheduledJob("j1", "hostA", "0 * * * *", next_run_time=T0)
    sched, fired = make([j])
    assert sched.process_due() == 1
    assert len(fired) == 1 and not fired[0].is_catchup
    assert j.last_run_time == T0
    assert j.next_run_time == T0 + timedelta(hours=1)  # next top of hour


def test_not_due_jobs_do_not_fire():
    j = ScheduledJob("j1", "hostA", "0 * * * *",
                     next_run_time=T0 + timedelta(minutes=5))
    sched, fired = make([j])
    assert sched.process_due() == 0
    assert fired == []


def test_missing_website_deactivates():
    j = ScheduledJob("j1", "gone", "0 * * * *", next_run_time=T0)
    sched, fired = make([j], websites={"hostA"})
    assert sched.process_due() == 0
    assert not j.is_active
    assert fired == []


def test_invalid_cron_deactivates():
    j = ScheduledJob("j1", "hostA", "not a cron", next_run_time=T0)
    sched, fired = make([j])
    assert sched.process_due() == 0
    assert not j.is_active
    assert fired == []


def test_failed_publish_leaves_job_due_for_retry():
    j = ScheduledJob("j1", "hostA", "0 * * * *", next_run_time=T0)
    sched, fired = make([j], submit_ok=False)
    assert sched.process_due() == 0
    assert len(fired) == 1              # attempted
    assert j.next_run_time == T0        # unchanged -> retried next cycle
    assert j.last_run_time is None


# ------------------------------------------------- missed-schedule catch-up
def test_downtime_gap_replays_reference_decisions():
    """Jobs missed < 1 h catch up (execute + reschedule); >= 1 h skip
    (reschedule only); both reschedule from NOW."""
    late_30m = ScheduledJob("a", "hostA", "*/15 * * * *",
                            next_run_time=T0 - timedelta(minutes=30))
    late_59m = ScheduledJob("b", "hostA", "0 * * * *",
                            next_run_time=T0 - timedelta(minutes=59, seconds=59))
    late_1h = ScheduledJob("c", "hostA", "0 * * * *",
                           next_run_time=T0 - MAX_CATCHUP_DELAY)
    late_3h = ScheduledJob("d", "hostA", "0 6 * * *",
                           next_run_time=T0 - timedelta(hours=3))
    sched, fired = make([late_30m, late_59m, late_1h, late_3h])
    caught, skipped = sched.handle_missed_schedules()
    assert caught == 2 and skipped == 2
    assert {s.job_id for s in fired} == {"a", "b"}
    assert all(s.is_catchup for s in fired)
    assert fired[0].missed_time is not None
    # every overdue job rescheduled to the future, from NOW
    assert late_30m.next_run_time == T0 + timedelta(minutes=15)
    assert late_3h.next_run_time == datetime(2026, 3, 3, 6, 0, tzinfo=timezone.utc)
    # last_run_time updated only for caught-up jobs
    assert late_30m.last_run_time == T0 and late_59m.last_run_time == T0
    assert late_1h.last_run_time is None and late_3h.last_run_time is None


def test_catchup_drains_beyond_batch_size():
    """Jobs past batch_size must still get the 1-h rule (the reference's
    drain loop, scheduled_job_processor.py:267-276)."""
    jobs = [
        ScheduledJob(f"j{i}", "hostA", "0 6 * * *",
                     next_run_time=T0 - timedelta(hours=2, minutes=i))
        for i in range(25)
    ]
    sched, fired = make(jobs)
    sched.batch_size = 10
    caught, skipped = sched.handle_missed_schedules()
    assert caught == 0 and skipped == 25   # all > 1 h late -> none executed
    assert fired == []
    assert all(j.next_run_time > T0 for j in jobs)


def test_first_tick_runs_catchup_then_due():
    missed = ScheduledJob("m", "hostA", "*/5 * * * *",
                          next_run_time=T0 - timedelta(minutes=10))
    sched, fired = make([missed])
    out = sched.tick()
    assert out["caught_up"] == 1
    # catch-up already rescheduled to the next 5-minute mark (> now), so the
    # due pass of the same tick must NOT double-fire
    assert out["processed"] == 0
    assert len(fired) == 1
    out2 = sched.tick()
    assert out2["caught_up"] == 0 and out2["skipped"] == 0


# ------------------------------------------------------------ crawl wiring
def test_scheduler_feeds_crawl_engine(ray_session):
    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.miniweb import MiniWeb

    web = MiniWeb(n_docs=20, n_hosts=2)
    pages_by_job: dict[str, int] = {}

    def submit(sub: Submission) -> bool:
        res = CrawlEngine(web, budget_per_host=4,
                          max_rounds=int(sub.config.get("max_rounds", 4)),
                          seen_shards=2).run()
        pages_by_job[sub.job_id] = res.pages.count()
        return True

    jobs = [ScheduledJob("crawl-hostA", web.hosts()[0], "0 * * * *",
                         next_run_time=T0, config={"max_rounds": 3})]
    sched = Scheduler(jobs, submit, clock=lambda: T0)
    assert sched.process_due() == 1
    assert pages_by_job["crawl-hostA"] > 0


def test_catchup_publish_outage_terminates():
    """A publisher outage with a full batch of overdue jobs must not spin
    the drain loop forever; failed jobs stay due for the NEXT tick."""
    jobs = [
        ScheduledJob(f"j{i}", "hostA", "*/5 * * * *",
                     next_run_time=T0 - timedelta(minutes=10))
        for i in range(12)
    ]
    sched, fired = make(jobs, submit_ok=False)
    sched.batch_size = 4
    caught, skipped = sched.handle_missed_schedules()
    assert caught == 0 and skipped == 0
    assert len(fired) == 12           # each attempted exactly once
    assert all(j.next_run_time <= T0 for j in jobs)  # still due for retry
