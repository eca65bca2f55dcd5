"""Cron schedule arithmetic for scheduled crawls.

The reference computes scheduled-job next-run times with croniter plus DST
transition handling (``/root/reference/crawler/utils/cron.py:9-101``,
``crawler/utils/dst.py:36-227``; consumed by
``scheduled_job_processor.py:433-597``).  croniter is not available in this
environment, so this is a from-scratch 5-field cron evaluator with the
standard semantics:

- fields: minute hour day-of-month month day-of-week (0=Sunday, 7=Sunday);
- each field: ``*``, ``N``, ``A-B``, ``*/S``, ``A-B/S``, comma lists;
- extended aliases (reference ``cron.py:23-28``): ``@yearly`` ``@annually``
  ``@monthly`` ``@weekly`` ``@daily`` ``@midnight`` ``@hourly``;
- day-of-month vs day-of-week: if both are restricted, a date matches when
  EITHER matches (POSIX cron rule);
- :func:`next_run` returns the first matching minute strictly after ``now``;
- DST (reference ``crawler/utils/dst.py:36-227`` semantics): with no ``tz``
  the schedule lives on the UTC timeline, which has no transitions.  With a
  zone, candidates are iterated on the LOCAL wall-clock timeline:
  * spring forward — a schedule falling in the skipped hour fires at the
    first valid instant after the gap (``0 2`` -> 3:00 local, fold-0
    resolution), never silently skips to the next day;
  * fall back — a schedule in the repeated hour fires on the FIRST
    occurrence only (fold=0); re-scheduling from that fire time cannot
    double-fire because candidates strictly follow the local minute just
    fired.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]

ALIASES = {
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
    "@monthly": "0 0 1 * *",
    "@weekly": "0 0 * * 0",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@hourly": "0 * * * *",
}


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"bad step in cron field: {spec}")
        if part == "*":
            rng = range(lo, hi + 1, step)
        elif "-" in part:
            a, b = part.split("-", 1)
            a_i, b_i = int(a), int(b)
            if not (lo <= a_i <= b_i <= hi):
                raise ValueError(f"range out of bounds: {part}")
            rng = range(a_i, b_i + 1, step)
        else:
            v = int(part)
            if not (lo <= v <= hi):
                raise ValueError(f"value out of bounds: {part}")
            rng = range(v, v + 1)
        out.update(rng)
    if not out:
        raise ValueError(f"empty cron field: {spec}")
    return out


class CronSchedule:
    def __init__(self, expression: str) -> None:
        expression = ALIASES.get(expression.strip(), expression)
        fields = expression.split()
        if len(fields) != 5:
            raise ValueError(f"cron expression must have 5 fields: {expression!r}")
        self.expression = expression
        self.minutes, self.hours, self.dom, self.months, self.dow = (
            _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, FIELD_RANGES)
        )
        if 7 in self.dow:  # 7 == Sunday == 0
            self.dow = self.dow | {0}
        raw_dom, raw_dow = fields[2], fields[4]
        self._dom_any = raw_dom == "*"
        self._dow_any = raw_dow == "*"

    def matches(self, dt: datetime) -> bool:
        if dt.minute not in self.minutes or dt.hour not in self.hours:
            return False
        if dt.month not in self.months:
            return False
        dom_ok = dt.day in self.dom
        dow_ok = ((dt.weekday() + 1) % 7) in self.dow  # python Mon=0 -> cron Sun=0
        if self._dom_any and self._dow_any:
            return True
        if self._dom_any:
            return dow_ok
        if self._dow_any:
            return dom_ok
        return dom_ok or dow_ok  # POSIX: either restricted field may match

    def next_run(self, now: datetime, tz=None) -> datetime:
        """First matching minute strictly after ``now``, in UTC (searches 4
        years).  ``tz`` (tzinfo or IANA name) evaluates the schedule on that
        zone's wall clock with the DST policy in the module docstring."""
        if now.tzinfo is None:
            now = now.replace(tzinfo=timezone.utc)
        if tz is None:
            cursor = (now + timedelta(minutes=1)).replace(second=0, microsecond=0)
            limit = cursor + timedelta(days=4 * 366)
            while cursor <= limit:
                if self.matches(cursor):
                    return cursor
                cursor += timedelta(minutes=1)
            raise ValueError(f"no next run within 4 years for {self.expression!r}")
        if isinstance(tz, str):
            from zoneinfo import ZoneInfo

            tz = ZoneInfo(tz)
        # local wall-clock iteration (the reference evaluates the expression
        # in the schedule's zone and converts the result to UTC)
        cursor = now.astimezone(tz).replace(
            tzinfo=None, second=0, microsecond=0
        ) + timedelta(minutes=1)
        limit = cursor + timedelta(days=4 * 366)
        while cursor <= limit:
            if self.matches(cursor):
                # fold=0: ambiguous (fall-back) times resolve to their FIRST
                # occurrence; nonexistent (spring-forward) times resolve to
                # the first instant after the gap (pre-gap offset applied)
                resolved = cursor.replace(tzinfo=tz, fold=0).astimezone(
                    timezone.utc
                )
                if resolved > now:
                    return resolved
                # e.g. ``now`` sits in the second pass of a repeated hour:
                # the fold-0 candidate is in the past — keep scanning
            cursor += timedelta(minutes=1)
        raise ValueError(f"no next run within 4 years for {self.expression!r}")


def is_valid_cron(expression: str) -> bool:
    try:
        CronSchedule(expression)
        return True
    except (ValueError, TypeError):
        return False


def calculate_next_run(expression: str, now: datetime, tz=None) -> datetime:
    return CronSchedule(expression).next_run(now, tz)
