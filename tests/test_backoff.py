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


# ---------------------------------------------------------------- exceptions
# (reference test_retry_policy.py:72-96 + custom-rule suite :425-722)

def test_classify_exception_vectors():
    from crawler_ray.functions.backoff import (
        BROWSER_CRASH, NETWORK_ERROR, RESOURCE_UNAVAILABLE, VALIDATION_ERROR,
        classify_exception,
    )

    assert classify_exception(ConnectionError("refused")) == NETWORK_ERROR
    assert classify_exception(ConnectionResetError()) == NETWORK_ERROR
    assert classify_exception(TimeoutError("slow")) == TIMEOUT
    assert classify_exception(ValueError("bad config")) == VALIDATION_ERROR
    assert classify_exception(MemoryError()) == RESOURCE_UNAVAILABLE
    assert classify_exception(OSError(28, "no space")) == RESOURCE_UNAVAILABLE
    assert classify_exception(RuntimeError("???")) == UNKNOWN
    # name-substring timeout heuristic (retry_policy.py:247-260)
    PlaywrightTimeoutError = type("PlaywrightTimeoutError", (Exception,), {})
    assert classify_exception(PlaywrightTimeoutError()) == TIMEOUT
    # pool crash exception maps to the browser-crash analogue
    from crawler_ray.stages.pool import InstanceCrashError

    assert classify_exception(InstanceCrashError("dead")) == BROWSER_CRASH
    assert is_retryable(BROWSER_CRASH) and is_retryable(RESOURCE_UNAVAILABLE)
    assert not is_retryable(VALIDATION_ERROR)


def test_get_error_context_includes_stack_trace():
    from crawler_ray.functions.backoff import get_error_context

    try:
        raise ValueError("boom")
    except ValueError as e:
        ctx = get_error_context(e)
    assert ctx["exception_type"] == "ValueError"
    assert ctx["error_message"] == "boom"
    assert "ValueError: boom" in ctx["stack_trace"]


def test_custom_rule_validation():
    import pytest

    from crawler_ray.functions.backoff import ErrorClassificationRule

    with pytest.raises(ValueError):
        ErrorClassificationRule("", lambda e, s: True, RATE_LIMIT, "r")
    with pytest.raises(ValueError):
        ErrorClassificationRule("n", None, RATE_LIMIT, "r")
    with pytest.raises(ValueError):
        ErrorClassificationRule("n", "not-callable", RATE_LIMIT, "r")
    with pytest.raises(ValueError):
        ErrorClassificationRule("n", lambda e, s: True, RATE_LIMIT, "")


def test_custom_rules_first_match_wins_and_fallback():
    from crawler_ray.functions.backoff import (
        ErrorClassificationRule, classify_with_custom_rules,
    )

    first = ErrorClassificationRule(
        "first", lambda e, s: s == 503, RATE_LIMIT, "maintenance window",
        is_retryable=True,
    )
    second = ErrorClassificationRule(
        "second", lambda e, s: s == 503, SERVER_ERROR, "shadowed",
    )
    # in-order evaluation: first matching rule wins (ref :470-497)
    assert classify_with_custom_rules(
        http_status=503, custom_rules=[first, second]
    ) == (RATE_LIMIT, True)
    # no rule matches -> standard status classification, no override (:498-518)
    assert classify_with_custom_rules(
        http_status=404, custom_rules=[first, second]
    ) == (NOT_FOUND, None)
    # empty / None rule lists use standard classification (:598-611)
    assert classify_with_custom_rules(http_status=429) == (RATE_LIMIT, None)
    assert classify_with_custom_rules(http_status=429, custom_rules=[]) == (
        RATE_LIMIT, None,
    )


def test_custom_rules_exceptions_and_edge_cases():
    from crawler_ray.functions.backoff import (
        NETWORK_ERROR, ErrorClassificationRule, classify_with_custom_rules,
    )

    # rule matching on the exception message (ref example :619-651)
    msg_rule = ErrorClassificationRule(
        "msg", lambda e, s: e is not None and "rate limit" in str(e).lower(),
        RATE_LIMIT, "keyword match", is_retryable=True,
    )
    assert classify_with_custom_rules(
        exc=Exception("API rate limit exceeded"), custom_rules=[msg_rule]
    ) == (RATE_LIMIT, True)
    # broken predicate is skipped, later rules still evaluated (:571-597)
    broken = ErrorClassificationRule(
        "broken", lambda e, s: 1 / 0, SERVER_ERROR, "raises")
    assert classify_with_custom_rules(
        exc=Exception("rate limit"), custom_rules=[broken, msg_rule]
    ) == (RATE_LIMIT, True)
    # both exc and status: rules see both; fallback prefers status (:519-543)
    assert classify_with_custom_rules(
        exc=ConnectionError(), http_status=500, custom_rules=[broken]
    ) == (SERVER_ERROR, None)
    assert classify_with_custom_rules(exc=ConnectionError()) == (
        NETWORK_ERROR, None,
    )
    # nothing provided -> unknown (:613-617)
    assert classify_with_custom_rules() == (UNKNOWN, None)
    # no retryable override -> None, caller uses category default (:653-672)
    no_override = ErrorClassificationRule(
        "no-override", lambda e, s: s == 418, CLIENT_ERROR, "teapot")
    assert classify_with_custom_rules(
        http_status=418, custom_rules=[no_override]
    ) == (CLIENT_ERROR, None)
