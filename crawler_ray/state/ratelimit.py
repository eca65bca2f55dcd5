"""Global per-host rate-limit layer: sharded fixed-window request counters.

The reference keeps one Redis counter per website and refuses requests once
the count inside the current window reaches the cap
(``/root/reference/crawler/services/redis_cache.py:360-463``: ``INCR`` +
``EXPIRE`` on first increment, ``is_rate_limited`` when ``count >=
rate_limit_requests``).  That counter is GLOBAL across every worker, which
the engine's per-actor token buckets are not: when a mega-host's frontier is
salted across several fetch actors (pipelines/crawl.py::_snapshot), each
actor's local bucket would happily emit ``rps`` on its own and the aggregate
rate multiplies by the pool size.  This module is the aggregate cap.

Shape: N tiny Ray actors (``num_cpus=0``), each owning a deterministic
host-hash shard of the counter space — the same sharding discipline as the
seen set (state/seen.py), so one host's counter lives on exactly one actor
and actor-method serialization makes increments atomic.  Fetch actors
acquire permits in CHUNKS (one RPC grants up to ``n`` permits, returns how
many were granted plus the time until the window resets), so the RPC count
per block is O(windows spanned), not O(rows).

At 256-node scale the shard count follows the cluster (hosts hash-spread
across shards); a shard holds one ``(window_start, count)`` pair per active
host — megabytes for millions of hosts.
"""

from __future__ import annotations

import hashlib
import time

import ray


def _host_shard(host: str, n_shards: int) -> int:
    return int.from_bytes(hashlib.sha256(host.encode()).digest()[:4], "big") % n_shards


class RateLimitWindow:
    """Fixed-window per-host counter (reference RateLimiter semantics).

    Plain class so unit tests can drive it with a fake clock;
    :data:`RateLimitShard` is its Ray-actor wrapping.  ``clock`` is
    injectable; defaults to monotonic wall time.
    """

    def __init__(self, max_requests: int, period_sec: float, clock=None) -> None:
        if max_requests < 1:
            raise ValueError("max_requests must be >= 1")
        if period_sec <= 0:
            raise ValueError("period_sec must be > 0")
        self._max = int(max_requests)
        self._period = float(period_sec)
        self._clock = clock or time.monotonic
        self._win: dict[str, tuple[float, int]] = {}  # host -> (window_start, count)

    def acquire(self, host: str, n: int = 1) -> tuple[int, float]:
        """Grant up to ``n`` permits inside the current window.

        Returns ``(granted, retry_after_sec)``; ``retry_after_sec`` is 0.0
        when everything was granted, else the time until the host's window
        resets.  Mirrors the reference's increment-then-check: a window
        admits exactly ``max_requests`` requests, surplus callers wait out
        the window remainder (http_executor consults ``is_rate_limited``
        before fetching).
        """
        now = self._clock()
        start, cnt = self._win.get(host, (now, 0))
        if now - start >= self._period:
            start, cnt = now, 0
        take = max(0, min(int(n), self._max - cnt))
        self._win[host] = (start, cnt + take)
        retry = 0.0 if take == n else max(0.0, start + self._period - now)
        return take, retry

    def get_count(self, host: str) -> int:
        """Current in-window count (0 after expiry — reference get_count)."""
        now = self._clock()
        start, cnt = self._win.get(host, (now, 0))
        return 0 if now - start >= self._period else cnt

    def is_rate_limited(self, host: str) -> bool:
        """True when the host's current window is exhausted."""
        return self.get_count(host) >= self._max

    def reset(self, host: str) -> bool:
        """Drop the host's counter (reference reset)."""
        self._win.pop(host, None)
        return True

    def prune(self) -> int:
        """Drop every expired window; returns live-host count (keeps a
        long-running limiter's memory proportional to ACTIVE hosts)."""
        now = self._clock()
        self._win = {
            h: (s, c) for h, (s, c) in self._win.items() if now - s < self._period
        }
        return len(self._win)

    def snapshot(self) -> dict[str, int]:
        """Live (unexpired) per-host counts on this shard."""
        now = self._clock()
        return {
            h: c for h, (s, c) in self._win.items() if now - s < self._period
        }


RateLimitShard = ray.remote(num_cpus=0)(RateLimitWindow)


class GlobalRateLimiter:
    """Picklable handle bundle: routes hosts to shards, chunk-acquires.

    Built once on the driver (actors spin up here), then shipped inside
    ``fn_constructor_kwargs`` to every fetch actor — the handle pickles,
    the shard actors are shared.
    """

    def __init__(
        self,
        max_requests: int,
        period_sec: float,
        n_shards: int = 4,
        clock=None,
    ) -> None:
        self.max_requests = int(max_requests)
        self.period_sec = float(period_sec)
        self._shards = [
            RateLimitShard.remote(max_requests, period_sec, clock)
            for _ in range(max(1, n_shards))
        ]

    def shard_for(self, host: str):
        return self._shards[_host_shard(host, len(self._shards))]

    def acquire_some(self, host: str, n: int, sleep=time.sleep) -> int:
        """Block until AT LEAST one of ``n`` requested permits is granted;
        returns how many were (<= n).  Callers fetch exactly the granted
        rows, then ask again — so requests always fire inside the window
        that admitted them.  With cap C per period P this paces a host at
        C/P aggregate across the WHOLE pool regardless of how many actors
        fetch it."""
        shard = self.shard_for(host)
        while True:
            granted, retry = ray.get(shard.acquire.remote(host, int(n)))
            if granted > 0:
                return granted
            sleep(max(retry, 0.005))

    def acquire_blocking(self, host: str, n: int, sleep=time.sleep) -> None:
        """Block until ``n`` permits are granted (chunked via
        :meth:`acquire_some`)."""
        remaining = int(n)
        while remaining > 0:
            remaining -= self.acquire_some(host, remaining, sleep=sleep)

    def counts(self) -> dict[str, int]:
        """Debug/metrics: merged per-host in-window counts of all shards
        (each host lives on exactly one shard, so this is a union)."""
        merged: dict[str, int] = {}
        for snap in ray.get([sh.snapshot.remote() for sh in self._shards]):
            merged.update(snap)
        return merged
