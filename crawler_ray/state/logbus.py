"""Real-time log streaming: the Ray-native analogue of the reference's
NATS log fan-out (``crawler/services/log_publisher.py:21-35`` — crawl logs
published to ``crawler.logs.<job_id>`` as they happen, so live dashboards
tail a run without touching its storage).

Shape: one :class:`LogBus` actor per engine run.  Producers (the driver's
round loop, DLQ writer, workflow steps) publish fire-and-forget — the
``.remote()`` call returns immediately and is never awaited on the hot
path, so a slow or absent consumer cannot stall the crawl.  Consumers
POLL ``tail(topic, cursor)`` and get ``(records, next_cursor)``; each
topic is a bounded ring buffer, so a lagging dashboard loses the oldest
records instead of back-pressuring the producer — the same at-most-once
contract as the reference's core NATS publish (JetStream-style durable
history is what the per-round checkpoint manifests already provide).

The actor is ``num_cpus=0``: it must never compete with fetch/parse tasks
for a scheduling slot, and its state is O(capacity) records.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class _LogBusActor:
    def __init__(self, capacity: int = 4096) -> None:
        self.capacity = int(capacity)
        # topic -> (ring list, absolute sequence number of ring[0])
        self._rings: dict[str, list] = {}
        self._base: dict[str, int] = {}

    def publish(self, topic: str, records: list[dict]) -> int:
        ring = self._rings.setdefault(topic, [])
        base = self._base.setdefault(topic, 0)
        now = time.time()
        for r in records:
            r = dict(r)
            r.setdefault("ts", now)
            ring.append(r)
        drop = len(ring) - self.capacity
        if drop > 0:
            del ring[:drop]
            self._base[topic] = base + drop
        return self._base[topic] + len(ring)  # next cursor

    def tail(self, topic: str, cursor: int = 0,
             limit: int = 1024) -> tuple[list[dict], int]:
        ring = self._rings.get(topic, [])
        base = self._base.get(topic, 0)
        start = max(int(cursor) - base, 0)  # lagged cursors skip dropped rows
        out = ring[start: start + int(limit)]
        return out, base + start + len(out)

    def topics(self) -> list[str]:
        return sorted(self._rings)


class LogBus:
    """Driver/stage-side handle: pickles into tasks and actors freely."""

    def __init__(self, capacity: int = 4096) -> None:
        self._actor = _LogBusActor.remote(capacity)

    def publish(self, topic: str, *records: dict) -> None:
        """Fire-and-forget: returns before the bus stores the records."""
        self._actor.publish.remote(topic, list(records))

    def publish_sync(self, topic: str, *records: dict) -> int:
        """Publish and wait; returns the next cursor (tests, final flush)."""
        return ray.get(self._actor.publish.remote(topic, list(records)))

    def tail(self, topic: str, cursor: int = 0,
             limit: int = 1024) -> tuple[list[dict], int]:
        """Poll records at/after ``cursor``; returns (records, next_cursor).
        A cursor older than the ring's retention resumes at the oldest
        retained record (dropped records are gone — at-most-once)."""
        return ray.get(self._actor.tail.remote(topic, cursor, limit))

    def topics(self) -> list[str]:
        return ray.get(self._actor.topics.remote())
