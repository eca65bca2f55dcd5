"""Fetch stage: an actor pool of synthetic (or pluggable) fetchers.

Reference analogue: ``HTTPExecutor`` with a lazily created, reused HTTP
client and per-job token-bucket politeness
(``/root/reference/crawler/services/step_executors/http_executor.py:21-254``,
``local_rate_limiter.py:20-154``).  Ray-native shape: a callable CLASS passed
to ``map_batches(..., concurrency=N)`` — client/state built once per actor in
``__init__``, batches processed in ``__call__``.

In the sandbox the "network" is :class:`crawler_ray.sources.miniweb.MiniWeb`
(a pure function of the URL), optionally combined with a text corpus looked
up from a broadcast object (``ray.put`` once, read per actor — the
small-side-broadcast pattern).  Against a real network only this class
changes; everything downstream consumes (status, html) columns.

Politeness: the round structure already caps fetches per host per round (the
discretized token bucket — see pipelines/golden.py docstring).  When
``requests_per_second`` is set, actors additionally pace wall-clock requests
per host with the reference's token-bucket semantics (rps/burst), which
matters in real-network mode only.
"""

from __future__ import annotations

import time

import pyarrow as pa


class TokenBucket:
    """Reference token bucket (local_rate_limiter.py:67-104), synchronous."""

    def __init__(self, rps: float, burst: int) -> None:
        self.rps = max(0.1, min(100.0, rps))
        self.burst = max(1, min(100, burst))
        self.tokens = float(self.burst)
        self.last = time.monotonic()

    def take(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(float(self.burst), self.tokens + (now - self.last) * self.rps)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep((1.0 - self.tokens) / self.rps)


class SyntheticFetcher:
    """map_batches actor: (url, retry_count) -> + (status, html).

    Input batch columns: url, retry_count (int); all columns pass through.
    """

    def __init__(self, web, requests_per_second: float | None = None,
                 burst: int = 10, net_latency_sec: float = 0.0,
                 global_limiter=None, connections: int = 1) -> None:
        self.web = web
        self.rps = requests_per_second
        self.burst = burst
        self.net_latency_sec = net_latency_sec  # simulated RTT per request
        # optional state.ratelimit.GlobalRateLimiter: the AGGREGATE per-host
        # cap across the whole pool (reference redis_cache.py:360-463) —
        # local token buckets alone multiply by pool size when a salted
        # mega-host spans actors
        self.global_limiter = global_limiter
        self._buckets: dict[str, TokenBucket] = {}
        # in-flight requests per worker: a wave of C requests shares one
        # RTT (the async-HTTP-client analogue — the reference runs 30
        # concurrent clients on one asyncio loop, PRD MAX_HTTP_WORKERS=30).
        # Wall-clock rps pacing is per-request by contract, so it forces
        # sequential waves of 1.
        self.connections = max(1, int(connections))

    def _pace(self, host: str) -> None:
        if self.rps is None:
            return
        b = self._buckets.get(host)
        if b is None:
            b = self._buckets[host] = TokenBucket(self.rps, self.burst)
        b.take()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        retries = batch["retry_count"].to_pylist()
        hosts = batch["host"].to_pylist()
        statuses, htmls = [], []
        i, n = 0, len(hosts)
        if self.rps is None and self.global_limiter is None and self.connections > 1:
            # pure budget-politeness mode: the connection pool spans hosts
            # (an async client multiplexes in-flight requests wherever they
            # go), so waves ignore host boundaries entirely
            for w in range(0, n, self.connections):
                if self.net_latency_sec:
                    time.sleep(self.net_latency_sec)
                for idx in range(w, min(w + self.connections, n)):
                    status, html = self.web.fetch(
                        urls[idx], retry_count=retries[idx] or 0
                    )
                    statuses.append(status)
                    htmls.append(html)
            return batch.append_column(
                "status", pa.array(statuses, type=pa.int32())
            ).append_column("html", pa.array(htmls, type=pa.string()))
        while i < n:
            host = hosts[i]
            j = i + 1
            while j < n and hosts[j] == host:  # consecutive same-host run
                j += 1
            k = i
            while k < j:
                # chunk-grant from the global window (one RPC per window
                # spanned, not per row), then fetch EXACTLY the granted
                # rows before asking again — requests stay inside the
                # window their permits came from
                granted = (
                    self.global_limiter.acquire_some(host, j - k)
                    if self.global_limiter is not None
                    else j - k
                )
                conns = 1 if self.rps is not None else self.connections
                for w in range(k, k + granted, conns):
                    wave_end = min(w + conns, k + granted)
                    for idx in range(w, wave_end):
                        self._pace(host)
                    if self.net_latency_sec:
                        # one RTT covers the whole in-flight wave
                        time.sleep(self.net_latency_sec)
                    for idx in range(w, wave_end):
                        status, html = self.web.fetch(
                            urls[idx], retry_count=retries[idx] or 0
                        )
                        statuses.append(status)
                        htmls.append(html)
                k += granted
            i = j
        return batch.append_column(
            "status", pa.array(statuses, type=pa.int32())
        ).append_column("html", pa.array(htmls, type=pa.string()))
