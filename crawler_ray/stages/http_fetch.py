"""Real HTTP fetch backend: urllib-based, transport-injectable.

Reference analogue: ``HTTPExecutor`` — a lazily created, REUSED client with
per-request timeout, redirect following, header/cookie/param/body
passthrough, and status + body + Retry-After capture
(``/root/reference/crawler/services/step_executors/http_executor.py:68-231``,
Retry-After parsing ``retry_policy.py:549-595``).

Ray-native shape: :class:`HttpFetcher` is a ``map_batches`` actor class —
the client (opener + cookie jar, or an injected transport) is built ONCE
per actor in ``__init__``; batches stream through ``__call__``.  It
subclasses :class:`~crawler_ray.stages.fetch.SyntheticFetcher`, so the
whole politeness engine (per-host token buckets, global-limiter
chunk-grants, connection waves) is inherited unchanged — only the actual
request is swapped from the in-process miniweb to HTTP.

The TRANSPORT seam makes the backend testable without a network (this
sandbox has none): ``transport`` is any callable ``(request: dict) ->
(status, body, headers)`` receiving ``{"url", "method", "headers",
"timeout", "body", "retry_count"}``.  ``None`` uses a real urllib opener.
:class:`MiniWebTransport` adapts a miniweb so the full crawl conformance
suite runs through the HTTP backend end-to-end.

Redirects are followed by THIS module (the urllib auto-handler is
disabled) so both the real and the mock paths share one verified
semantics — httpx's ``_redirect_method`` rules, which the reference
relies on: 302/303 demote every method except HEAD to GET and drop the
body, 301 demotes only POST, 307/308 preserve method + body; relative
Locations resolve against the hop URL and hops are capped at
``max_redirects``.
"""

from __future__ import annotations

import json as _json
import re
from urllib.parse import urlencode, urljoin

import pyarrow as pa

from crawler_ray.functions.backoff import parse_retry_after
from crawler_ray.stages.fetch import SyntheticFetcher

#: httpx's default redirect cap, which the reference client inherits.
MAX_REDIRECTS = 20

_CHARSET_RE = re.compile(r"charset=([\w.-]+)", re.I)


class MiniWebTransport:
    """Adapt a miniweb (``fetch(url, retry_count) -> (status, html)``) to
    the transport seam, so conformance suites exercise the HTTP backend's
    full request path against the in-process web."""

    def __init__(self, web, headers: dict[str, str] | None = None) -> None:
        self.web = web
        self.headers = dict(headers or {})

    def __call__(self, request: dict) -> tuple[int, str, dict]:
        status, body = self.web.fetch(
            request["url"], retry_count=request.get("retry_count", 0)
        )
        return status, body, dict(self.headers)


def _decode_body(raw, headers: dict) -> str:
    if isinstance(raw, str):
        return raw
    ctype = ""
    for k, v in headers.items():
        if str(k).lower() == "content-type":
            ctype = str(v)
            break
    m = _CHARSET_RE.search(ctype)
    enc = m.group(1) if m else "utf-8"
    try:
        return raw.decode(enc, errors="replace")
    except LookupError:
        return raw.decode("utf-8", errors="replace")


class HttpClient:
    """One reused client per actor/worker: urllib opener + cookie jar, or
    the injected transport.  ``fetch(url, retry_count) -> (status, text)``
    matches the engine-wide fetch-backend protocol, so this class slots in
    anywhere a miniweb does — the inherited politeness engine in
    :class:`HttpFetcher` drives it untouched, and
    ``WorkflowEngine(web=HttpClient(...))`` runs declarative workflows
    over real HTTP.  Per-request extras (final URL, Retry-After seconds,
    error text) accumulate in ``self.extras`` aligned with the calls of
    the current batch.

    Instances PICKLE cleanly into Ray tasks: the urllib opener and cookie
    jar are process-local live objects, so they are dropped on pickling
    and rebuilt lazily on first use in the receiving worker (each worker
    then owns its cookie session, the actor-pool analogue of the
    reference's one client per asyncio worker)."""

    def __init__(
        self,
        transport=None,
        timeout: float = 30.0,
        http_method: str = "GET",
        headers: dict[str, str] | None = None,
        params: dict[str, str] | None = None,
        data=None,
        json_body=None,
        cookies: dict[str, str] | None = None,
        follow_redirects: bool = True,
        max_redirects: int = MAX_REDIRECTS,
    ) -> None:
        self.transport = transport
        self.timeout = timeout
        self.method = (http_method or "GET").upper()
        self.headers = dict(headers or {})
        self.params = dict(params or {})
        self.follow_redirects = follow_redirects
        self.max_redirects = max_redirects
        if cookies:
            self.headers["Cookie"] = "; ".join(
                f"{k}={v}" for k, v in cookies.items()
            )
        # request body, reference passthrough order: explicit data beats
        # json (http_executor.py forwards "data"/"json" kwargs verbatim)
        self.body: bytes | None = None
        if data is not None:
            if isinstance(data, dict):
                self.body = urlencode(data).encode()
                self.headers.setdefault(
                    "Content-Type", "application/x-www-form-urlencoded"
                )
            elif isinstance(data, str):
                self.body = data.encode()
            else:
                self.body = bytes(data)
        elif json_body is not None:
            self.body = _json.dumps(json_body).encode()
            self.headers.setdefault("Content-Type", "application/json")

        import threading

        self._opener = None
        self._jar = None
        self._lock = threading.Lock()
        self.extras: list[tuple[str, int, str]] = []  # (final_url, retry_after, error)

    def __getstate__(self):
        # opener/jar are process-local (sockets, live handlers) and the
        # lock is unpicklable: drop them so the instance ships into Ray
        # tasks; the receiving worker rebuilds its own on first request
        d = dict(self.__dict__)
        d["_opener"] = None
        d["_jar"] = None
        d["extras"] = []
        d.pop("_lock", None)
        return d

    def __setstate__(self, state):
        import threading

        self.__dict__.update(state)
        self._lock = threading.Lock()

    def _ensure_opener(self):
        # double-checked under the lock: the first THREADED wave calls
        # this concurrently, and an unsynchronized build could pair an
        # in-flight request with a cookie jar that is then overwritten
        # (silent session-cookie loss)
        if self._opener is None:
            with self._lock:
                if self._opener is None:
                    import urllib.request
                    from http.cookiejar import CookieJar

                    class _NoRedirect(urllib.request.HTTPRedirectHandler):
                        # no auto-follow: the fetcher owns redirects
                        def redirect_request(self, *a, **kw):  # pragma: no cover
                            return None

                    self._jar = CookieJar()
                    self._opener = urllib.request.build_opener(
                        _NoRedirect(),
                        urllib.request.HTTPCookieProcessor(self._jar),
                    )
        return self._opener

    # -- single hop ----------------------------------------------------
    def _hop(self, url: str, method: str, body: bytes | None,
             retry_count: int) -> tuple[int, object, dict]:
        headers = dict(self.headers)
        if self.transport is not None:
            return self.transport({
                "url": url, "method": method, "headers": headers,
                "timeout": self.timeout, "body": body,
                "retry_count": retry_count,
            })
        import urllib.request

        req = urllib.request.Request(
            url, data=body, headers=headers, method=method
        )
        try:
            with self._ensure_opener().open(req, timeout=self.timeout) as r:
                return r.status, r.read(), dict(r.headers)
        except urllib.error.HTTPError as e:  # non-2xx IS a response
            raw = b""
            try:
                raw = e.read() or b""
            except Exception:
                pass
            return e.code, raw, dict(e.headers or {})

    # -- full request: redirects + capture ------------------------------
    def fetch_one(self, url: str, retry_count: int = 0
                  ) -> tuple[int, str, tuple[str, int, str]]:
        """One request, returning ``(status, text, extra)`` with the extra
        tuple ``(final_url, retry_after_sec, error)`` — shared-state-free,
        so threaded wave fetching can call it concurrently."""
        import http.client
        import socket
        import urllib.error

        method, body = self.method, self.body
        qs = urlencode(self.params) if self.params else ""
        if qs:
            url = f"{url}&{qs}" if "?" in url else f"{url}?{qs}"
        final_url, hops = url, 0
        try:
            while True:
                status, raw, rheaders = self._hop(
                    final_url, method, body, retry_count
                )
                loc = None
                if self.follow_redirects and status in (301, 302, 303, 307, 308):
                    for k, v in rheaders.items():
                        if str(k).lower() == "location":
                            loc = str(v)
                            break
                if loc is None:
                    break
                hops += 1
                if hops > self.max_redirects:
                    return 0, "", (final_url, -1, "too many redirects")
                final_url = urljoin(final_url, loc)
                # httpx demotion semantics (its _redirect_method, which the
                # reference client inherits — httpx _client.py:498-512):
                # 302 and 303 turn every method except HEAD into GET;
                # 301 demotes only POST; 307/308 preserve method + body
                if status in (302, 303) and method != "HEAD":
                    method, body = "GET", None
                elif status == 301 and method == "POST":
                    method, body = "GET", None
        except (TimeoutError, socket.timeout) as e:
            return 0, "", (final_url, -1, f"timeout: {e}")
        except urllib.error.URLError as e:
            if isinstance(getattr(e, "reason", None), (TimeoutError, socket.timeout)):
                return 0, "", (final_url, -1, f"timeout: {e.reason}")
            return 0, "", (final_url, -1, f"request error: {e.reason}")
        except (OSError, http.client.HTTPException, ValueError) as e:
            # HTTPException (BadStatusLine/IncompleteRead from a malformed
            # server response) and ValueError (Request on a non-http href
            # like mailto:/javascript:) are per-ROW failures: record a
            # status-0 error row, never crash the whole fetch task
            return 0, "", (
                final_url, -1, f"request error: {type(e).__name__}: {e}"
            )

        ra = None
        for k, v in rheaders.items():
            if str(k).lower() == "retry-after":
                ra = parse_retry_after(str(v))
                break
        return (
            int(status),
            _decode_body(raw, rheaders),
            (final_url, -1 if ra is None else int(ra), ""),
        )

    def fetch(self, url: str, retry_count: int = 0) -> tuple[int, str]:
        status, text, extra = self.fetch_one(url, retry_count)
        self.extras.append(extra)
        return status, text


class HttpFetcher(SyntheticFetcher):
    """map_batches actor: (url, retry_count, host) -> + (status, html)
    via real (or transport-mocked) HTTP.

    All :class:`SyntheticFetcher` politeness controls apply
    (``requests_per_second`` / ``burst`` per-host buckets,
    ``global_limiter`` chunk grants, ``connections`` waves).  With
    ``extended=True`` three more columns are appended — ``final_url``
    (post-redirect), ``retry_after_sec`` (parsed Retry-After, -1 when
    absent), ``fetch_error`` ("" on success; "timeout: ..." /
    "request error: ..." mirroring the reference's error taxonomy) —
    for pipelines that schedule retries off server hints."""

    def __init__(
        self,
        transport=None,
        timeout: float = 30.0,
        http_method: str = "GET",
        headers: dict[str, str] | None = None,
        params: dict[str, str] | None = None,
        data=None,
        json_body=None,
        cookies: dict[str, str] | None = None,
        follow_redirects: bool = True,
        max_redirects: int = MAX_REDIRECTS,
        requests_per_second: float | None = None,
        burst: int = 10,
        global_limiter=None,
        connections: int = 1,
        extended: bool = False,
    ) -> None:
        client = HttpClient(
            transport=transport,
            timeout=timeout,
            http_method=http_method,
            headers=headers,
            params=params,
            data=data,
            json_body=json_body,
            cookies=cookies,
            follow_redirects=follow_redirects,
            max_redirects=max_redirects,
        )
        super().__init__(
            client,
            requests_per_second=requests_per_second,
            burst=burst,
            net_latency_sec=0.0,
            global_limiter=global_limiter,
            connections=connections,
        )
        self.extended = extended

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.web.extras = []
        if (self.connections > 1 and self.rps is None
                and self.global_limiter is None):
            # pure budget-politeness mode: REAL concurrency.  The
            # synthetic engine's waves simulate one shared RTT per wave;
            # a sync urllib client would serialize them, so here the wave
            # runs on a per-actor thread pool (the reference's 30 async
            # clients on one loop, PRD MAX_HTTP_WORKERS=30).  fetch_one is
            # shared-state-free (urllib openers and CookieJar lock
            # internally); results are re-ordered by row index.
            out = self._threaded(batch)
        else:
            out = super().__call__(batch)
        if not self.extended:
            return out
        ex = self.web.extras
        assert len(ex) == len(out), (len(ex), len(out))
        return (
            out.append_column(
                "final_url", pa.array([e[0] for e in ex], pa.string())
            )
            .append_column(
                "retry_after_sec", pa.array([e[1] for e in ex], pa.int64())
            )
            .append_column(
                "fetch_error", pa.array([e[2] for e in ex], pa.string())
            )
        )

    def _threaded(self, batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor

        if getattr(self, "_pool", None) is None:
            self._pool = ThreadPoolExecutor(max_workers=self.connections)
        urls = batch["url"].to_pylist()
        retries = batch["retry_count"].to_pylist()
        results = list(self._pool.map(
            lambda ur: self.web.fetch_one(ur[0], ur[1] or 0),
            zip(urls, retries),
        ))  # pool.map preserves input order
        self.web.extras = [r[2] for r in results]
        return batch.append_column(
            "status", pa.array([r[0] for r in results], type=pa.int32())
        ).append_column(
            "html", pa.array([r[1] for r in results], type=pa.string())
        )
