"""Retry classification + backoff conformance (mirrors
/root/reference/tests/unit/test_retry_policy.py expectations)."""

import random
from datetime import datetime, timezone

from crawler_ray.functions.backoff import (
    AUTH_ERROR, CLIENT_ERROR, NOT_FOUND, RATE_LIMIT, SERVER_ERROR, TIMEOUT,
    UNKNOWN, RetryPolicy, add_jitter, backoff_delay, classify_status,
    is_retryable, next_delay, parse_retry_after,
)


def test_classification():
    assert classify_status(404) == NOT_FOUND
    assert classify_status(401) == AUTH_ERROR
    assert classify_status(403) == AUTH_ERROR
    assert classify_status(429) == RATE_LIMIT
    assert classify_status(408) == TIMEOUT
    assert classify_status(400) == CLIENT_ERROR
    assert classify_status(451) == CLIENT_ERROR
    assert classify_status(500) == SERVER_ERROR
    assert classify_status(503) == SERVER_ERROR
    assert classify_status(600) == UNKNOWN
    assert classify_status(200) == UNKNOWN


def test_retryability():
    assert is_retryable(RATE_LIMIT) and is_retryable(SERVER_ERROR) and is_retryable(TIMEOUT)
    assert not is_retryable(NOT_FOUND) and not is_retryable(AUTH_ERROR)
    assert not is_retryable(CLIENT_ERROR) and not is_retryable(UNKNOWN)


def test_exponential_backoff():
    pol = RetryPolicy("exponential", 1, 300, 2.0)
    assert [backoff_delay(a, pol) for a in (1, 2, 3, 4)] == [1, 2, 4, 8]
    assert backoff_delay(11, pol) == 300  # capped


def test_linear_and_fixed():
    lin = RetryPolicy("linear", 10, 300, 5.0)
    assert [backoff_delay(a, lin) for a in (1, 2, 3)] == [10, 15, 20]
    fix = RetryPolicy("fixed", 30, 300, 2.0)
    assert [backoff_delay(a, fix) for a in (1, 5)] == [30, 30]


def test_hard_cap_300():
    pol = RetryPolicy("exponential", 100, 10_000, 10.0)
    assert backoff_delay(5, pol) == 300


def test_jitter_bounds_and_determinism():
    rng = random.Random(42)
    vals = {add_jitter(100, 0.2, rng) for _ in range(50)}
    assert all(80 <= v <= 120 for v in vals)
    assert add_jitter(100, 0.2, random.Random(7)) == add_jitter(100, 0.2, random.Random(7))
    assert add_jitter(100, 5.0, random.Random(7)) <= 120  # bad pct -> default 0.2
    assert add_jitter(0, 0.2, rng) == 0


def test_retry_after_parsing():
    assert parse_retry_after("120") == 120
    assert parse_retry_after(None) is None
    assert parse_retry_after("garbage") is None
    now = datetime(2025, 10, 21, 7, 0, 0, tzinfo=timezone.utc)
    assert parse_retry_after("Wed, 21 Oct 2025 07:28:00 GMT", now=now) == 28 * 60
    assert parse_retry_after("Wed, 21 Oct 2025 06:00:00 GMT", now=now) == 0  # past


def test_next_delay_decision():
    cat, retry, delay = next_delay(500, 1, rng=random.Random(1))
    assert cat == SERVER_ERROR and retry and delay is not None
    cat, retry, delay = next_delay(404, 1)
    assert cat == NOT_FOUND and not retry and delay is None
    # Retry-After override, capped at 300
    cat, retry, delay = next_delay(429, 1, retry_after="900")
    assert cat == RATE_LIMIT and retry and delay == 300
    # attempts exhausted
    cat, retry, delay = next_delay(500, 99)
    assert not retry
