"""Deterministic test doubles that must be importable from Ray workers.

Anything passed into ``CrawlEngine`` gets pickled into ``map_batches``
closures (bound methods carry the engine), so classes defined in test
modules would fail to import on workers — doubles live here instead.
"""

from __future__ import annotations


class FakeClock:
    """Manually-advanced wall clock for TTL / scheduler determinism."""

    def __init__(self, t: float = 0.0) -> None:
        self.t = t

    def __call__(self) -> float:
        return self.t
