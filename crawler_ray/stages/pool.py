"""Browser-pool semantics behind the Fetcher seam (reference S3/T5).

The reference's biggest subsystem is a Playwright browser pool
(``/root/reference/crawler/services/browser_pool.py:117-1197``).  Playwright
cannot run in this sandbox, but the pool SEMANTICS are portable and tested
here against synthetic crashy/slow backends:

- **bounded FIFO acquisition**: capacity = instances x max_contexts_per
  enforced by a semaphore; ``acquire`` blocks up to ``timeout`` then raises
  ``TimeoutError`` (browser_pool.py:473-556).
- **least-loaded selection**: an acquire binds to the healthy instance with
  the most free context slots (``_get_available_browser``,
  browser_pool.py:753-771).
- **crash detection + replacement**: a backend raising
  :class:`InstanceCrashError` marks its instance crashed; the pool removes
  and replaces it (``_remove_and_replace_browser``, browser_pool.py:267-330)
  subject to exponential recovery backoff ``base ** attempts`` seconds
  (``is_in_recovery_backoff``, browser_pool.py:96-114).
- **health checks**: ``health_check()`` probes every instance, replaces
  unhealthy ones, and reports pool stats (browser_pool.py:773-955).

Ray-native shape: ONE pool per fetch actor (``PooledFetcher`` is a
map_batches callable class — the pool is built in ``__init__``, once per
actor).  A real Playwright backend would implement :class:`FetchInstance`
with a browser context; the synthetic backend wraps ``web.fetch``.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import pyarrow as pa


class InstanceCrashError(Exception):
    """A fetch instance died mid-use (reference BrowserCrashError,
    browser_pool.py:44-56)."""


class NoHealthyInstanceError(RuntimeError):
    """Every instance is crashed and still inside its recovery backoff."""


class FetchInstance:
    """One pooled instance (a browser, a session, a client).  Subclass or
    duck-type: ``fetch(url, retry_count) -> (status, body)`` raising
    :class:`InstanceCrashError` on crash; ``healthy() -> bool``;
    ``close()``."""

    def fetch(self, url: str, retry_count: int = 0) -> tuple[int, str]:
        raise NotImplementedError

    def healthy(self) -> bool:
        return True

    def close(self) -> None:
        pass


class SyntheticInstance(FetchInstance):
    """Backend for tests/sandbox: wraps ``web.fetch``; optionally crashes
    after ``crash_after`` fetches or is born unhealthy."""

    def __init__(self, web, crash_after: int | None = None,
                 born_dead: bool = False, latency_sec: float = 0.0) -> None:
        self.web = web
        self.crash_after = crash_after
        self.n_fetches = 0
        self.closed = False
        self._dead = born_dead
        self.latency_sec = latency_sec

    def fetch(self, url: str, retry_count: int = 0) -> tuple[int, str]:
        if self._dead:
            raise InstanceCrashError("instance is dead")
        self.n_fetches += 1
        if self.crash_after is not None and self.n_fetches > self.crash_after:
            self._dead = True
            raise InstanceCrashError(f"crashed after {self.crash_after} fetches")
        if self.latency_sec:
            time.sleep(self.latency_sec)
        return self.web.fetch(url, retry_count=retry_count)

    def healthy(self) -> bool:
        return not self._dead

    def close(self) -> None:
        self.closed = True


@dataclass
class _PooledInstance:
    """Bookkeeping wrapper (reference BrowserInstance, browser_pool.py:68-114)."""

    backend: FetchInstance
    index: int
    active_contexts: int = 0
    max_contexts: int = 4
    is_healthy: bool = True
    recovery_attempts: int = 0
    last_recovery_attempt: float | None = None
    total_fetches: int = 0

    def can_create_context(self) -> bool:
        return self.is_healthy and self.active_contexts < self.max_contexts

    def in_recovery_backoff(self, backoff_base: float, now: float) -> bool:
        if self.last_recovery_attempt is None:
            return False
        return now < self.last_recovery_attempt + backoff_base ** self.recovery_attempts


class FetcherPool:
    """Bounded pool of fetch instances with crash replacement and health
    checks (reference BrowserPool lifecycle, browser_pool.py:117-1197)."""

    def __init__(
        self,
        factory,
        pool_size: int = 2,
        max_contexts_per: int = 4,
        acquire_timeout: float = 10.0,
        recovery_backoff_base: float = 2.0,
        clock=time.monotonic,
    ) -> None:
        self._factory = factory
        self.pool_size = pool_size
        self.max_contexts_per = max_contexts_per
        self.acquire_timeout = acquire_timeout
        self.backoff_base = recovery_backoff_base
        self._clock = clock
        self._lock = threading.Lock()
        self._sem = threading.BoundedSemaphore(pool_size * max_contexts_per)
        self._shutting_down = False
        self._instances: list[_PooledInstance] = [
            _PooledInstance(backend=factory(), index=i,
                            max_contexts=max_contexts_per)
            for i in range(pool_size)
        ]
        self.stats = {"acquired": 0, "timeouts": 0, "crashes": 0, "replaced": 0}

    # ------------------------------------------------------------- acquire
    def acquire(self, timeout: float | None = None) -> "_Lease":
        """Context manager yielding a :class:`_PooledInstance`; raises
        TimeoutError when capacity is exhausted past ``timeout`` and
        RuntimeError during shutdown (browser_pool.py:473-556)."""
        if self._shutting_down:
            raise RuntimeError("pool is shutting down")
        timeout = self.acquire_timeout if timeout is None else timeout
        if not self._sem.acquire(timeout=timeout):
            self.stats["timeouts"] += 1
            raise TimeoutError(f"failed to acquire fetch instance within {timeout}s")
        with self._lock:
            inst = self._least_loaded()
            if inst is None:
                # every instance crashed: revive the ones past their
                # recovery backoff (otherwise a crash reported DURING
                # backoff would leave its slot dead forever — nothing else
                # retries it)
                now = self._clock()
                for dead in list(self._instances):
                    if not dead.is_healthy and not dead.in_recovery_backoff(
                        self.backoff_base, now
                    ):
                        self._replace(dead, now)
                inst = self._least_loaded()
            if inst is None:
                self._sem.release()
                raise NoHealthyInstanceError(
                    "no healthy fetch instances available"
                )
            inst.active_contexts += 1
            self.stats["acquired"] += 1
        return _Lease(self, inst)

    def _least_loaded(self) -> _PooledInstance | None:
        """Healthy instance with the most free slots (browser_pool.py:753-771)."""
        best = None
        for inst in self._instances:
            if inst.can_create_context():
                if best is None or inst.active_contexts < best.active_contexts:
                    best = inst
        return best

    # -------------------------------------------------------------- crash
    def report_crash(self, inst: _PooledInstance) -> None:
        """Mark crashed and replace, honoring recovery backoff
        (browser_pool.py:267-330; is_in_recovery_backoff:96-114)."""
        with self._lock:
            self.stats["crashes"] += 1
            inst.is_healthy = False
            if self._instances[inst.index] is not inst:
                # a concurrent lease on the same instance already reported
                # this crash and the slot holds a fresh replacement —
                # replacing again would discard a healthy (possibly leased)
                # backend
                return
            now = self._clock()
            if inst.in_recovery_backoff(self.backoff_base, now):
                return  # replacement deferred (acquire() revives post-backoff)
            self._replace(inst, now)

    def _replace(self, inst: _PooledInstance, now: float) -> None:
        try:
            inst.backend.close()
        except Exception:
            pass
        attempts = inst.recovery_attempts + 1
        self._instances[inst.index] = _PooledInstance(
            backend=self._factory(), index=inst.index,
            max_contexts=self.max_contexts_per,
            recovery_attempts=attempts, last_recovery_attempt=now,
        )
        self.stats["replaced"] += 1

    # ------------------------------------------------------------- health
    def health_check(self) -> dict:
        """Probe every instance; replace unhealthy ones past their backoff;
        return pool stats (browser_pool.py:773-955)."""
        with self._lock:
            now = self._clock()
            healthy = 0
            for inst in list(self._instances):
                ok = inst.is_healthy and inst.backend.healthy()
                if ok:
                    healthy += 1
                else:
                    inst.is_healthy = False
                    if not inst.in_recovery_backoff(self.backoff_base, now):
                        self._replace(inst, now)
            return {
                "pool_size": len(self._instances),
                "healthy": healthy,
                "active_contexts": sum(i.active_contexts for i in self._instances),
                "capacity": len(self._instances) * self.max_contexts_per,
                **self.stats,
            }

    def shutdown(self) -> None:
        with self._lock:
            self._shutting_down = True
            for inst in self._instances:
                try:
                    inst.backend.close()
                except Exception:
                    pass


class _Lease:
    def __init__(self, pool: FetcherPool, inst: _PooledInstance) -> None:
        self._pool = pool
        self.inst = inst

    def __enter__(self) -> _PooledInstance:
        return self.inst

    def __exit__(self, exc_type, exc, tb) -> bool:
        with self._pool._lock:
            self.inst.active_contexts -= 1
        self._pool._sem.release()
        if exc_type is not None and issubclass(exc_type, InstanceCrashError):
            self._pool.report_crash(self.inst)
        return False


class PooledFetcher:
    """Drop-in alternative to ``SyntheticFetcher``: same batch contract
    (url/host/retry_count -> +status/+html), but every fetch goes through a
    :class:`FetcherPool` acquire/release cycle with bounded crash retries —
    the Ray actor-pool shape of the reference's browser executor
    (browser_executor.py:26-418 uses pool.acquire_context per page)."""

    def __init__(self, web, pool_size: int = 2, max_contexts_per: int = 4,
                 acquire_timeout: float = 10.0, crash_retries: int = 2,
                 factory=None, net_latency_sec: float = 0.0,
                 requests_per_second: float | None = None,
                 burst: int = 10, global_limiter=None) -> None:
        from crawler_ray.stages.fetch import TokenBucket

        self.crash_retries = crash_retries
        # optional state.ratelimit.GlobalRateLimiter — pool-wide aggregate
        # per-host window cap (browser fetches are requests too)
        self.global_limiter = global_limiter
        if factory is None:
            factory = lambda: SyntheticInstance(web, latency_sec=net_latency_sec)
        self.pool = FetcherPool(
            factory, pool_size=pool_size, max_contexts_per=max_contexts_per,
            acquire_timeout=acquire_timeout,
        )
        # per-host wall-clock politeness pacing, same token-bucket semantics
        # as SyntheticFetcher (crawl pre-slices one block per host in rps
        # mode, so a host's requests serialize through one actor's buckets)
        self.rps = requests_per_second
        self.burst = burst
        self._bucket_cls = TokenBucket
        self._buckets: dict[str, object] = {}

    def _pace(self, host: str) -> None:
        if self.rps is None:
            return
        b = self._buckets.get(host)
        if b is None:
            b = self._buckets[host] = self._bucket_cls(self.rps, self.burst)
        b.take()

    def _fetch_one(self, url: str, rc: int, host: str) -> tuple[int, str]:
        for _ in range(self.crash_retries + 1):
            # pace EVERY backend attempt: a crash retry is still a request
            # against the host, so it must consume a politeness token too
            # (and a global window permit, when the aggregate cap is on)
            self._pace(host)
            if self.global_limiter is not None:
                self.global_limiter.acquire_some(host, 1)
            try:
                with self.pool.acquire() as inst:
                    inst.total_fetches += 1
                    return inst.backend.fetch(url, retry_count=rc)
            except (InstanceCrashError, NoHealthyInstanceError, TimeoutError):
                # instance replaced by the lease / pool exhausted: retry on
                # another slot, then degrade to a retryable 5xx — the same
                # contract the HTTP path uses for transient failures
                continue
        return 503, ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        retries = batch["retry_count"].to_pylist()
        hosts = (
            batch["host"].to_pylist()
            if "host" in batch.column_names else [""] * len(urls)
        )
        statuses, htmls = [], []
        for url, rc, host in zip(urls, retries, hosts):
            status, html = self._fetch_one(url, rc or 0, host)
            statuses.append(status)
            htmls.append(html)
        return batch.append_column(
            "status", pa.array(statuses, type=pa.int32())
        ).append_column("html", pa.array(htmls, type=pa.string()))
