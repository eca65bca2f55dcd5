"""DST conformance vectors, ported from the reference's dedicated DST unit
tests (``/root/reference/tests/unit/utils/test_dst.py`` over
``crawler/utils/dst.py:36-227``), plus exact expectations for this engine's
documented gap/ambiguity policy (functions/cron.py docstring): nonexistent
local times fire at the first instant after the gap; ambiguous local times
fire on the FIRST occurrence only and never double-fire a rescheduling loop.

2025 America/New_York transitions: Mar 9 2:00 EST -> 3:00 EDT (gap);
Nov 2 2:00 EDT -> 1:00 EST (1:00-1:59 repeats).
"""

from datetime import datetime, timezone

from crawler_ray.functions.cron import calculate_next_run
from crawler_ray.functions.dst import (
    get_dst_transition_type,
    is_dst_transition,
    safe_next_run_utc,
)

UTC = timezone.utc
NY = "America/New_York"


class TestDetection:
    def test_utc_never_has_dst(self):
        assert is_dst_transition(datetime(2025, 3, 9, 7, 0, tzinfo=UTC), "UTC") is False
        assert is_dst_transition(datetime(2025, 11, 2, 6, 0, tzinfo=UTC), "UTC") is False

    def test_spring_forward_us_eastern(self):
        dt = datetime(2025, 3, 9, 7, 0, tzinfo=UTC)   # 2 AM EST: skipped
        assert is_dst_transition(dt, NY) is True
        assert get_dst_transition_type(dt, NY) == "spring_forward"

    def test_fall_back_us_eastern(self):
        dt = datetime(2025, 11, 2, 6, 0, tzinfo=UTC)  # 1 AM: repeated
        assert is_dst_transition(dt, NY) is True
        assert get_dst_transition_type(dt, NY) == "fall_back"

    def test_normal_time_not_dst_transition(self):
        for dt in (datetime(2025, 6, 15, 14, 0, tzinfo=UTC),
                   datetime(2025, 12, 15, 14, 0, tzinfo=UTC)):
            assert is_dst_transition(dt, NY) is False
            assert get_dst_transition_type(dt, NY) is None

    def test_multiple_timezones(self):
        assert get_dst_transition_type(
            datetime(2025, 3, 9, 7, 0, tzinfo=UTC), NY
        ) == "spring_forward"
        # UK springs forward Mar 30 2025 (1 AM GMT -> 2 AM BST)
        assert get_dst_transition_type(
            datetime(2025, 3, 30, 1, 0, tzinfo=UTC), "Europe/London"
        ) == "spring_forward"
        assert get_dst_transition_type(
            datetime(2025, 11, 2, 6, 0, tzinfo=UTC), NY
        ) == "fall_back"

    def test_invalid_timezone_returns_none(self):
        dt = datetime(2025, 3, 9, 2, 30, tzinfo=UTC)
        assert is_dst_transition(dt, "Invalid/Timezone") is False
        assert get_dst_transition_type(dt, "Invalid/Timezone") is None

    def test_naive_datetime_assumed_utc(self):
        assert is_dst_transition(datetime(2025, 3, 9, 7, 0), NY) is True
        assert is_dst_transition(datetime(2025, 3, 9, 7, 0), "UTC") is False


class TestSafeScheduling:
    def test_no_missed_runs_during_spring_forward(self):
        # hourly NY schedule stepping over the gap: 1 AM EST -> (2 AM skipped,
        # resolves past the gap) -> 4 AM EDT; no hour is silently lost
        base = datetime(2025, 3, 9, 6, 0, tzinfo=UTC)   # 1 AM EST
        n1, _ = safe_next_run_utc("0 * * * *", base, NY)
        n2, _ = safe_next_run_utc("0 * * * *", n1, NY)
        assert n1 == datetime(2025, 3, 9, 7, 0, tzinfo=UTC)
        assert n2 == datetime(2025, 3, 9, 8, 0, tzinfo=UTC)

    def test_no_duplicate_runs_during_fall_back(self):
        # hourly NY schedule across the repeated hour: consecutive fires stay
        # 1 h apart; the second occurrence of 1:00 never double-fires
        base = datetime(2025, 11, 2, 5, 0, tzinfo=UTC)  # 1 AM EDT (first)
        n1, _ = safe_next_run_utc("0 * * * *", base, NY)
        n2, _ = safe_next_run_utc("0 * * * *", n1, NY)
        assert n1.tzinfo == UTC and n2.tzinfo == UTC
        assert (n2 - n1).total_seconds() == 3600

    def test_nonexistent_daily_time_fires_after_gap(self):
        # "2:30 AM NY" does not exist on Mar 9: policy = first instant after
        # the gap (3:30 EDT = 7:30 UTC), NOT skipped to the next day
        base = datetime(2025, 3, 9, 6, 0, tzinfo=UTC)
        nxt, warning = safe_next_run_utc("30 2 * * *", base, NY)
        assert nxt == datetime(2025, 3, 9, 7, 30, tzinfo=UTC)
        assert warning is not None and "spring forward" in warning

    def test_ambiguous_daily_time_fires_first_occurrence_once(self):
        # "1:30 AM NY" occurs twice on Nov 2: fire at the FIRST (EDT)
        # occurrence; rescheduling from it must jump to Nov 3, not re-fire
        # the second (EST) 1:30
        base = datetime(2025, 11, 2, 4, 0, tzinfo=UTC)  # midnight EDT
        n1, warning = safe_next_run_utc("30 1 * * *", base, NY)
        assert n1 == datetime(2025, 11, 2, 5, 30, tzinfo=UTC)  # 1:30 EDT
        assert warning is not None and "fall back" in warning
        n2, _ = safe_next_run_utc("30 1 * * *", n1, NY)
        assert n2 == datetime(2025, 11, 3, 6, 30, tzinfo=UTC)  # 1:30 EST Nov 3

    def test_base_inside_second_pass_of_repeated_hour(self):
        # now = 1:45 EST (the SECOND pass): the fold-0 candidate 1:50 EDT is
        # already in the past and must be skipped, not returned
        base = datetime(2025, 11, 2, 6, 45, tzinfo=UTC)  # 1:45 EST
        nxt = calculate_next_run("50 1 * * *", base, NY)
        assert nxt > base
        assert nxt == datetime(2025, 11, 3, 6, 50, tzinfo=UTC)

    def test_no_warning_for_utc(self):
        nxt, warning = safe_next_run_utc(
            "0 2 * * *", datetime(2025, 3, 9, 2, 0, tzinfo=UTC), "UTC"
        )
        assert warning is None and nxt.tzinfo == UTC

    def test_consistent_scheduling_across_dst_boundary(self):
        # midnight-NY daily: local wall-clock time is consistent on both
        # sides of the transition; the UTC hour shifts with the offset
        n1, _ = safe_next_run_utc(
            "0 0 * * *", datetime(2025, 3, 2, 0, 0, tzinfo=UTC), NY
        )
        n2, _ = safe_next_run_utc(
            "0 0 * * *", datetime(2025, 3, 16, 0, 0, tzinfo=UTC), NY
        )
        assert n1 == datetime(2025, 3, 2, 5, 0, tzinfo=UTC)   # EST: UTC-5
        assert n2 == datetime(2025, 3, 16, 4, 0, tzinfo=UTC)  # EDT: UTC-4


class TestAliases:
    def test_extended_syntax(self):
        from crawler_ray.functions.cron import is_valid_cron

        for alias in ("@yearly", "@annually", "@monthly", "@weekly",
                      "@daily", "@midnight", "@hourly"):
            assert is_valid_cron(alias), alias
        now = datetime(2026, 8, 17, 10, 2, tzinfo=UTC)
        assert calculate_next_run("@hourly", now) == datetime(
            2026, 8, 17, 11, 0, tzinfo=UTC
        )
        assert calculate_next_run("@daily", now) == datetime(
            2026, 8, 18, 0, 0, tzinfo=UTC
        )
