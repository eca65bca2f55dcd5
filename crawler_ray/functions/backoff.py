"""Error classification and retry backoff (the engine's failure semantics).

Mirrors the reference retry stack
(``/root/reference/crawler/services/retry_policy.py``):

- :func:`classify_status`: 404 -> not_found; 401/403 -> auth_error (both
  permanent); 429 -> rate_limit; 408 -> timeout (both retryable); other
  4xx -> client_error (permanent); 5xx -> server_error (retryable); else
  unknown (retry_policy.py:33-140).
- backoff strategies (retry_policy.py:602-754): exponential
  ``min(init * mult^(attempt-1), max)``, linear ``min(init + mult*(attempt-1),
  max)``, fixed ``min(init, max)``; attempt is 1-indexed; results are int
  seconds, hard-capped by ``MAX_DELAY_CAP`` = 300 s.
- ±jitter_percent jitter via an injectable RNG (retry_policy.py:519-547) —
  deterministic in tests/conformance, random in production.
- Retry-After parsing: integer seconds or HTTP-date (retry_policy.py:549-600).

One policy row per category mirrors the reference's ``retry_policy`` table
(``sql/schema/current_schema.sql:560-576``); the 12-row table is a broadcast
dict in the engine (SURVEY.md J5).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

MAX_DELAY_CAP = 300  # seconds (retry_policy.py:683-754 hard cap)

NOT_FOUND = "not_found"
AUTH_ERROR = "auth_error"
RATE_LIMIT = "rate_limit"
TIMEOUT = "timeout"
CLIENT_ERROR = "client_error"
SERVER_ERROR = "server_error"
NETWORK_ERROR = "network_error"
BROWSER_CRASH = "browser_crash"
VALIDATION_ERROR = "validation_error"
RESOURCE_UNAVAILABLE = "resource_unavailable"
UNKNOWN = "unknown"

RETRYABLE = frozenset(
    {RATE_LIMIT, TIMEOUT, SERVER_ERROR, NETWORK_ERROR, BROWSER_CRASH,
     RESOURCE_UNAVAILABLE}
)


def classify_status(status: int) -> str:
    """HTTP status -> error category (retry_policy.py:33-140)."""
    if status == 404:
        return NOT_FOUND
    if status in (401, 403):
        return AUTH_ERROR
    if status == 429:
        return RATE_LIMIT
    if status == 408:
        return TIMEOUT
    if 400 <= status < 500:
        return CLIENT_ERROR
    if 500 <= status < 600:
        return SERVER_ERROR
    return UNKNOWN


def is_retryable(category: str) -> bool:
    return category in RETRYABLE


# exception-name groups (retry_policy.py:143-340; name-based so the engine
# classifies exception shapes from any fetch backend without importing it)
_TIMEOUT_NAMES = frozenset({"TimeoutError", "ConnectTimeout", "ReadTimeout"})
_NETWORK_NAMES = frozenset(
    {"ConnectionError", "DNSError", "SSLError",
     "ConnectionRefusedError", "ConnectionResetError"}
)
_HTTPX_NETWORK_NAMES = frozenset(
    {"ConnectError", "ReadError", "WriteError", "PoolTimeout", "ProtocolError"}
)
_BROWSER_CRASH_NAMES = frozenset(
    {"BrowserCrashError", "InstanceCrashError", "TargetClosedError",
     "BrowserContextClosedError", "PageClosedError"}
)
_VALIDATION_NAMES = frozenset(
    {"StepValidationError", "ValidationError", "ValueError"}
)


def classify_exception(exc: Exception) -> str:
    """Python exception -> error category (retry_policy.py:143-340).

    Precedence mirrors the reference: explicit timeout names, network names,
    httpx network names, browser-crash names (ours adds the pool's
    ``InstanceCrashError``, the engine's browser-crash analogue), the
    name-substring timeout heuristic, validation names, MemoryError /
    OSError resource exhaustion, else unknown (conservatively permanent —
    ``is_retryable(UNKNOWN)`` is False).
    """
    name = type(exc).__name__
    module = type(exc).__module__
    if name in _TIMEOUT_NAMES:
        return TIMEOUT
    if name in _NETWORK_NAMES:
        return NETWORK_ERROR
    if module == "httpx" and name in _HTTPX_NETWORK_NAMES:
        return NETWORK_ERROR
    if name in _BROWSER_CRASH_NAMES:
        return BROWSER_CRASH
    if "timeout" in name.lower() or "TimeoutException" in name:
        return TIMEOUT
    if name in _VALIDATION_NAMES:
        return VALIDATION_ERROR
    if name == "MemoryError" or isinstance(exc, OSError):
        return RESOURCE_UNAVAILABLE
    return UNKNOWN


def get_error_context(exc: Exception) -> dict[str, str]:
    """Error details for DLQ/log rows (retry_policy.py:343-358)."""
    import traceback

    return {
        "exception_type": type(exc).__name__,
        "exception_module": type(exc).__module__,
        "error_message": str(exc),
        "stack_trace": "".join(
            traceback.format_exception(type(exc), exc, exc.__traceback__)
        ),
    }


class ErrorClassificationRule:
    """User-supplied classification rule (retry_policy.py:364-417).

    ``predicate(exc, status_code) -> bool``; first matching rule wins.
    ``is_retryable=None`` means "no override" — the category default
    (:func:`is_retryable`) applies.
    """

    def __init__(self, name: str, predicate, category: str, reason: str,
                 is_retryable: bool | None = None) -> None:
        if not name:
            raise ValueError("Rule name cannot be empty")
        if predicate is None:
            raise ValueError("Rule predicate cannot be None")
        if not callable(predicate):
            raise ValueError("Rule predicate must be callable")
        if not reason:
            raise ValueError("Rule reason cannot be empty")
        self.name = name
        self.predicate = predicate
        self.category = category
        self.reason = reason
        self.is_retryable = is_retryable


def classify_with_custom_rules(
    exc: Exception | None = None,
    http_status: int | None = None,
    custom_rules: list[ErrorClassificationRule] | None = None,
) -> tuple[str, bool | None]:
    """(category, retryable-override) with custom rules tried first, in
    order; a rule whose predicate raises is skipped (retry_policy.py:420-516).
    Fallback precedence: HTTP status, then exception, then unknown."""
    if custom_rules:
        for rule in custom_rules:
            try:
                if rule.predicate(exc, http_status):
                    return rule.category, rule.is_retryable
            except Exception:
                continue  # reference: log and skip broken rules
    if http_status is not None:
        return classify_status(http_status), None
    if exc is not None:
        return classify_exception(exc), None
    return UNKNOWN, None


@dataclass(frozen=True)
class RetryPolicy:
    """One row of the reference retry_policy table (current_schema.sql:560-576)."""

    strategy: str = "exponential"   # exponential | linear | fixed
    initial_delay: int = 1
    max_delay: int = 300
    multiplier: float = 2.0
    max_retries: int = 3
    jitter_percent: float = 0.2


DEFAULT_POLICIES: dict[str, RetryPolicy] = {
    RATE_LIMIT: RetryPolicy("exponential", 5, 300, 2.0, 5),
    TIMEOUT: RetryPolicy("exponential", 2, 300, 2.0, 3),
    SERVER_ERROR: RetryPolicy("exponential", 1, 300, 2.0, 3),
    NETWORK_ERROR: RetryPolicy("exponential", 1, 300, 2.0, 3),
    NOT_FOUND: RetryPolicy("fixed", 0, 0, 1.0, 0),
    AUTH_ERROR: RetryPolicy("fixed", 0, 0, 1.0, 0),
    CLIENT_ERROR: RetryPolicy("fixed", 0, 0, 1.0, 0),
    UNKNOWN: RetryPolicy("fixed", 0, 0, 1.0, 0),
}


def backoff_delay(attempt: int, policy: RetryPolicy) -> int:
    """Base delay (no jitter) for 1-indexed ``attempt``; int seconds,
    capped at both policy.max_delay and the 300 s hard cap."""
    if attempt < 1:
        raise ValueError("attempt is 1-indexed")
    if policy.strategy == "exponential":
        d = policy.initial_delay * (policy.multiplier ** (attempt - 1))
    elif policy.strategy == "linear":
        d = policy.initial_delay + policy.multiplier * (attempt - 1)
    else:  # fixed
        d = policy.initial_delay
    return min(int(d), policy.max_delay, MAX_DELAY_CAP)


def add_jitter(delay: int, jitter_percent: float = 0.2,
               rng: random.Random | None = None) -> int:
    """delay ± jitter_percent (retry_policy.py:519-547); injectable RNG."""
    if jitter_percent < 0 or jitter_percent > 1:
        jitter_percent = 0.2
    amount = int(delay * jitter_percent)
    r = rng if rng is not None else random
    return max(0, delay + r.randint(-amount, amount))


def parse_retry_after(value: str | None, now: datetime | None = None) -> int | None:
    """Retry-After header -> seconds (int form or HTTP-date form);
    None when missing/invalid (retry_policy.py:549-600)."""
    if not value:
        return None
    try:
        return int(value)
    except ValueError:
        pass
    try:
        when = parsedate_to_datetime(value)
    except (ValueError, TypeError, OverflowError):
        return None
    if when is None:
        return None
    now = now or datetime.now(timezone.utc)
    if when.tzinfo is None:
        when = when.replace(tzinfo=timezone.utc)
    return max(0, int((when - now).total_seconds()))


def next_delay(status: int, attempt: int,
               retry_after: str | None = None,
               policies: dict[str, RetryPolicy] | None = None,
               rng: random.Random | None = None) -> tuple[str, bool, int | None]:
    """Full failure decision: (category, retry?, delay_seconds|None).

    Retry-After (when present and the category is retryable) overrides the
    computed backoff, still capped at 300 s.
    """
    policies = policies or DEFAULT_POLICIES
    cat = classify_status(status)
    pol = policies.get(cat, DEFAULT_POLICIES[UNKNOWN])
    if cat not in RETRYABLE or attempt > pol.max_retries:
        return cat, False, None
    ra = parse_retry_after(retry_after)
    if ra is not None:
        return cat, True, min(ra, MAX_DELAY_CAP)
    base = backoff_delay(attempt, pol)
    return cat, True, add_jitter(base, pol.jitter_percent, rng)
