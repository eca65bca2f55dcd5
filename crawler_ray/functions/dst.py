"""DST transition detection for scheduled crawls.

Reference: ``/root/reference/crawler/utils/dst.py`` — the scheduler stores
and computes everything in UTC (which has no DST), and this module provides
the detection/warning layer for schedules evaluated in a local timezone:

- :func:`is_dst_transition` — is this instant inside a transition window?
- :func:`get_dst_transition_type` — ``"spring_forward"`` (local clock gap)
  or ``"fall_back"`` (repeated local hour);
- :func:`safe_next_run_utc` — next run via :mod:`crawler_ray.functions.cron`
  (nonexistent times resolve past the gap; ambiguous times fire on the
  first occurrence) plus a human-readable warning when the run lands in a
  transition.

Semantics are matched to the reference vectors (``tests/unit/utils/
test_dst.py`` there; ``tests/test_dst.py`` here): naive datetimes are
interpreted as UTC, ``"UTC"`` short-circuits, unknown zones report no
transition.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from crawler_ray.functions.cron import calculate_next_run


def _as_local(dt: datetime, timezone_name: str):
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(timezone_name)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(tz), tz


def is_dst_transition(dt: datetime, timezone_name: str = "UTC") -> bool:
    """True when the surrounding +/- 1 h window crosses a DST offset change
    in ``timezone_name`` (always False for UTC; reference dst.py:36-101)."""
    if timezone_name == "UTC":
        return False
    try:
        local, _tz = _as_local(dt, timezone_name)
        return (local - timedelta(hours=1)).dst() != (
            local + timedelta(hours=1)
        ).dst()
    except Exception:
        return False


def get_dst_transition_type(
    dt: datetime, timezone_name: str = "UTC"
) -> str | None:
    """``"spring_forward"`` | ``"fall_back"`` | None (reference
    dst.py:104-160)."""
    if timezone_name == "UTC" or not is_dst_transition(dt, timezone_name):
        return None
    try:
        local, _tz = _as_local(dt, timezone_name)
        before = (local - timedelta(hours=1)).dst()
        after = (local + timedelta(hours=1)).dst()
        if after and after > (before or timedelta(0)):
            return "spring_forward"
        return "fall_back"
    except Exception:
        return None


def safe_next_run_utc(
    cron_expression: str,
    base_time: datetime,
    timezone_name: str = "UTC",
) -> tuple[datetime, str | None]:
    """Next run (UTC) with a DST warning when it lands in a transition
    window (reference dst.py:163-227).

    Spring forward: a schedule in the skipped hour runs at the first valid
    instant after the gap.  Fall back: a schedule in the repeated hour runs
    at the first occurrence only.  Both behaviors live in
    :meth:`crawler_ray.functions.cron.CronSchedule.next_run`.
    """
    tz = None if timezone_name == "UTC" else timezone_name
    next_run_utc = calculate_next_run(cron_expression, base_time, tz)
    transition = get_dst_transition_type(next_run_utc, timezone_name)
    warning = None
    if transition == "spring_forward":
        local, _ = _as_local(next_run_utc, timezone_name)
        warning = (
            f"Next run falls during spring forward in {timezone_name}. "
            f"Scheduled for {local.strftime('%I:%M %p %Z')} "
            "(skipped hour adjusted)."
        )
    elif transition == "fall_back":
        local, _ = _as_local(next_run_utc, timezone_name)
        warning = (
            f"Next run falls during fall back in {timezone_name}. "
            f"Scheduled for {local.strftime('%I:%M %p %Z')} "
            "(first occurrence)."
        )
    return next_run_utc, warning
