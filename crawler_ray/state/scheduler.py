"""Scheduled-job processing loop (reference S8).

Reference: ``/root/reference/crawler/services/scheduled_job_processor.py``
— a 60-second poll loop over a scheduled_jobs table that, per cycle,
publishes crawl jobs for every due schedule and recomputes next-run times;
on startup it first drains schedules missed during downtime with a one-hour
catch-up rule.  Semantics ported exactly:

- **due processing** (``process_scheduled_jobs``, lines 433-597): due =
  active jobs with ``next_run_time <= now``; per job the website must exist
  and not be deleted (else the job is deactivated); the crawl job is
  submitted; ``next_run_time = calculate_next_run(cron, now)`` (invalid
  cron deactivates the job); ``last_run_time = now``.  A failed submit
  leaves the job untouched so the next cycle retries it.
- **missed-schedule catch-up** (``handle_missed_schedules``, lines
  221-430): on the first cycle after a restart, overdue jobs are drained in
  batches; a job missed by LESS than one hour (``MAX_CATCHUP_DELAY``)
  executes immediately (submitted with ``is_catchup=True``) and
  reschedules; one missed by one hour or more only reschedules
  (``last_run_time`` unchanged).  Draining loops until a short batch so
  jobs beyond ``batch_size`` still get the 1-hour rule.
- **loop** (``scheduled_job_processor_loop``, lines 600-700): first tick
  runs catch-up, every tick processes due jobs.

Ray-native shape: the scheduler is DRIVER-side control flow (exactly as the
reference runs it in one service process); the jobs it submits launch Ray
Data crawl pipelines.  The clock is injectable so downtime replay is
deterministic in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable

from crawler_ray.functions.cron import calculate_next_run

MAX_CATCHUP_DELAY = timedelta(hours=1)   # scheduled_job_processor.py:37


@dataclass
class ScheduledJob:
    job_id: str
    website: str                  # website id / host (seed source)
    cron_schedule: str
    next_run_time: datetime
    last_run_time: datetime | None = None
    is_active: bool = True
    tz: object | None = None      # schedule timezone (None = UTC timeline)
    config: dict = field(default_factory=dict)


@dataclass
class Submission:
    """What a fired schedule produced (reference _create_and_publish_crawl_job)."""

    job_id: str
    website: str
    fired_at: datetime
    is_catchup: bool
    missed_time: datetime | None
    config: dict


class Scheduler:
    """Deterministic port of the reference scheduled-job processor.

    ``submit(submission) -> bool`` publishes one crawl job (False = publish
    failure: the schedule is left due and retried next cycle);
    ``website_exists(website) -> bool`` is the website/deleted_at guard.
    """

    def __init__(
        self,
        jobs: list[ScheduledJob],
        submit: Callable[[Submission], bool],
        website_exists: Callable[[str], bool] = lambda w: True,
        batch_size: int = 100,
        clock: Callable[[], datetime] | None = None,
    ) -> None:
        self.jobs = {j.job_id: j for j in jobs}
        self.submit = submit
        self.website_exists = website_exists
        self.batch_size = batch_size
        self.clock = clock or (lambda: datetime.now(timezone.utc))
        self._first_tick = True

    # ------------------------------------------------------------ helpers
    def _due(self, now: datetime, limit: int) -> list[ScheduledJob]:
        due = [
            j for j in self.jobs.values()
            if j.is_active and j.next_run_time <= now
        ]
        due.sort(key=lambda j: (j.next_run_time, j.job_id))
        return due[:limit]

    def _reschedule(self, job: ScheduledJob, now: datetime) -> bool:
        """next_run_time = calculate_next_run(cron, now); invalid cron
        deactivates (scheduled_job_processor.py:330-341)."""
        try:
            job.next_run_time = calculate_next_run(job.cron_schedule, now, job.tz)
            return True
        except (ValueError, TypeError):
            job.is_active = False
            return False

    def _guard_website(self, job: ScheduledJob) -> bool:
        if not self.website_exists(job.website):
            job.is_active = False   # scheduled_job_processor.py:294-302
            return False
        return True

    # ------------------------------------------------------- missed (startup)
    def handle_missed_schedules(self, now: datetime | None = None) -> tuple[int, int]:
        """Drain overdue schedules: catch up (< 1 h late) or skip (>= 1 h),
        always rescheduling from ``now`` (scheduled_job_processor.py:221-430)."""
        now = now or self.clock()
        caught_up = skipped = 0
        failed_publish: set[str] = set()
        while True:
            batch = [
                j for j in self._due(now, self.batch_size + len(failed_publish))
                if j.job_id not in failed_publish
            ][: self.batch_size]
            if not batch:
                break
            for job in batch:
                if not self._guard_website(job):
                    continue
                delay = now - job.next_run_time
                missed_time = job.next_run_time
                should_catchup = delay < MAX_CATCHUP_DELAY
                if not self._reschedule(job, now):
                    continue
                if should_catchup:
                    ok = self.submit(Submission(
                        job_id=job.job_id, website=job.website, fired_at=now,
                        is_catchup=True, missed_time=missed_time,
                        config=job.config,
                    ))
                    if not ok:
                        # publish failed: leave the schedule due, but do NOT
                        # re-drain it in this pass (a publisher outage with a
                        # full batch of overdue jobs would otherwise spin
                        # this loop forever) — the next tick retries it, as
                        # the reference's 60 s cycle does
                        job.next_run_time = missed_time
                        failed_publish.add(job.job_id)
                        continue
                    job.last_run_time = now
                    caught_up += 1
                else:
                    skipped += 1   # reschedule only; last_run_time unchanged
            if len(batch) < self.batch_size:
                break
        return caught_up, skipped

    # --------------------------------------------------------------- due
    def process_due(self, now: datetime | None = None) -> int:
        """One regular poll cycle (scheduled_job_processor.py:433-597)."""
        now = now or self.clock()
        processed = 0
        for job in self._due(now, self.batch_size):
            if not self._guard_website(job):
                continue
            missed_time = job.next_run_time
            if not self._reschedule(job, now):
                continue
            ok = self.submit(Submission(
                job_id=job.job_id, website=job.website, fired_at=now,
                is_catchup=False, missed_time=None, config=job.config,
            ))
            if not ok:
                job.next_run_time = missed_time   # retry next cycle
                continue
            job.last_run_time = now
            processed += 1
        return processed

    # -------------------------------------------------------------- loop
    def tick(self) -> dict:
        """One iteration of the processor loop: first tick drains missed
        schedules, every tick processes due jobs
        (scheduled_job_processor_loop, lines 600-700)."""
        out = {"caught_up": 0, "skipped": 0, "processed": 0}
        if self._first_tick:
            out["caught_up"], out["skipped"] = self.handle_missed_schedules()
            self._first_tick = False
        out["processed"] = self.process_due()
        return out
