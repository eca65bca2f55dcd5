"""Robots policy (a north-rule addition — the reference has none).

The reference crawler never consults robots.txt (zero grep hits across
``/root/reference/crawler``); BASELINE.json's north_rule layers robots
enforcement on top.  Semantics here are the standard longest-match
Disallow/Allow prefix rules of ``urllib.robotparser``, applied for
user-agent ``*``.

Deployment shape: one :class:`RobotsPolicy` is built on the driver (in the
sandbox, from the miniweb's static rule set; against a real network the
fetch actors would fetch+parse ``/robots.txt`` per host lazily) and
broadcast to every parse/fetch stage via ``ray.put`` — a classic
small-side broadcast, never a shuffle.
"""

from __future__ import annotations

from urllib.parse import urlparse
from urllib.robotparser import RobotFileParser


class RobotsPolicy:
    """Per-host allow/deny, cheap to pickle, lazily compiled parsers."""

    def __init__(self, host_rules: dict[str, str] | None = None) -> None:
        # host -> raw robots.txt body ('' = allow all)
        self.host_rules = host_rules or {}
        self._parsers: dict[str, RobotFileParser] = {}

    def __getstate__(self):
        return self.host_rules

    def __setstate__(self, state):
        self.host_rules = state
        self._parsers = {}

    def _parser(self, host: str) -> RobotFileParser | None:
        body = self.host_rules.get(host)
        if not body:
            return None
        p = self._parsers.get(host)
        if p is None:
            p = RobotFileParser()
            p.parse(("User-agent: *\n" + body).splitlines())
            self._parsers[host] = p
        return p

    def allowed(self, url: str) -> bool:
        host = urlparse(url).netloc.lower()
        p = self._parser(host)
        return True if p is None else p.can_fetch("*", url)

    def allowed_batch(self, urls: list[str | None]) -> list[bool]:
        return [bool(u) and self.allowed(u) for u in urls]

    @classmethod
    def for_miniweb(cls, web) -> "RobotsPolicy":
        """Static policy for the synthetic web (same Disallow set per host)."""
        from crawler_ray.sources.miniweb import ROBOTS_DISALLOW

        body = "".join(f"Disallow: {d}\n" for d in ROBOTS_DISALLOW)
        return cls({h: body for h in web.hosts()})

    @classmethod
    def fetched(cls, hosts: list[str], client,
                scheme: str = "https") -> "RobotsPolicy":
        """Fetch each host's live ``/robots.txt`` through a fetch backend
        (``fetch(url) -> (status, body)`` — e.g.
        ``stages/http_fetch.HttpClient``) and build the policy from the
        bodies.  Non-200 (missing robots, network error) means allow-all
        for that host — the standard permissive interpretation.  One
        driver-side request per DISTINCT seed host, bounded by the seed
        list, never per crawled URL."""
        rules: dict[str, str] = {}
        for h in dict.fromkeys(hosts):  # de-dup, keep order
            status, body = client.fetch(f"{scheme}://{h}/robots.txt")
            rules[h.lower()] = body if status == 200 else ""
        return cls(rules)

    @classmethod
    def fetched_for_seeds(cls, seeds: list[str], client) -> "RobotsPolicy":
        """Like :meth:`fetched`, but each host's robots.txt is requested
        with ITS seed's scheme — an http-only host must not be probed over
        https (which errors and silently degrades to allow-all)."""
        pairs: dict[str, str] = {}
        for s in seeds:
            u = urlparse(s)
            if u.scheme in ("http", "https") and u.netloc:
                pairs.setdefault(u.netloc.lower(), u.scheme)
        rules: dict[str, str] = {}
        for host, scheme in pairs.items():
            status, body = client.fetch(f"{scheme}://{host}/robots.txt")
            rules[host] = body if status == 200 else ""
        return cls(rules)
