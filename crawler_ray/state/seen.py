"""Sharded URL-seen set: the distributed replacement for the reference's
Redis dedup keyspace.

The reference stores one Redis key per seen URL hash with a 24 h TTL and
batch-checks candidates with MGET
(``/root/reference/crawler/services/redis_cache.py:26-251``), consumed as an
anti-join during URL extraction (``url_extractor.py:208-256``).  Here the
seen set is N Ray actors, each owning a deterministic hash-range shard:

    shard(url_hash) = int(url_hash[:8], 16) % n_shards

``seen_and_add`` is the fused anti-join: atomically tests membership and
inserts, returning a "was new" mask per batch.  Because each hash routes to
exactly one shard and actor method calls serialize per actor, first-wins is
exact under any task parallelism.

Two backends behind one interface:
- ``exact``  — a Python set per shard (test scale; byte-exact conformance).
- ``cuckoo`` — a cuckoo filter per shard (bench/100 TB scale: ~2 bytes/key,
  so a 10^10-URL frontier needs ~20 GB across all shards of a cluster; the
  false-positive rate ~1e-4 trades a vanishing number of skipped URLs for
  10x memory headroom).  Deletion support (cuckoo's advantage over bloom)
  keeps the TTL-expiry option open.

Scale note: shard count is set at engine start (n_shards ~ cluster cores /
4); routing is pure, so resharding only happens between runs.  Snapshots for
checkpoint/resume are delta-based: ``drain_new()`` returns hashes added
since the previous drain, which the engine writes per round.
"""

from __future__ import annotations

import numpy as np


class CuckooFilter:
    """Bucketed cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets,
    16-bit fingerprints, partial-key eviction."""

    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 20, seed: int = 7) -> None:
        n_buckets = 1
        while n_buckets * 4 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)

    def _fp_and_buckets(self, h: int) -> tuple[int, int, int]:
        fp = (h & 0xFFFF) or 1  # 0 marks an empty slot
        i1 = (h >> 16) % self.n_buckets
        # partial-key displacement: i2 = i1 xor hash(fp)
        i2 = (i1 ^ (fp * 0x5BD1E995)) % self.n_buckets
        return fp, i1, i2

    def _bucket_has(self, i: int, fp: int) -> bool:
        return bool((self.table[i] == fp).any())

    def _bucket_insert(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def contains(self, h: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(h)
        return self._bucket_has(i1, fp) or self._bucket_has(i2, fp)

    def add(self, h: int) -> bool:
        """Insert; returns False only when the filter is saturated."""
        fp, i1, i2 = self._fp_and_buckets(h)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.count += 1
            return True
        i = int(self._rng.choice((i1, i2)))
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = (i ^ (fp * 0x5BD1E995)) % self.n_buckets
            if self._bucket_insert(i, fp):
                self.count += 1
                return True
        return False


def shard_of(url_hash: str, n_shards: int) -> int:
    """Deterministic shard routing from the hex sha256 url hash."""
    return int(url_hash[:8], 16) % n_shards


class SeenShard:
    """One shard of the URL-seen set; deploy as a Ray actor."""

    def __init__(self, backend: str = "exact", capacity: int = 1 << 20) -> None:
        self.backend = backend
        self._exact: set[str] = set()
        self._cuckoo = CuckooFilter(capacity) if backend == "cuckoo" else None
        self._new_since_drain: list[str] = []

    def seen_and_add(self, hashes: list[str]) -> np.ndarray:
        """Atomic membership-test-and-insert; True where the hash was new."""
        out = np.zeros(len(hashes), dtype=bool)
        if self.backend == "exact":
            seen = self._exact
            for i, h in enumerate(hashes):
                if h not in seen:
                    seen.add(h)
                    out[i] = True
        else:
            ck = self._cuckoo
            for i, h in enumerate(hashes):
                hv = int(h[:16], 16)
                if not ck.contains(hv):
                    ck.add(hv)
                    out[i] = True
        self._new_since_drain.extend(h for i, h in enumerate(hashes) if out[i])
        return out

    def add_bulk(self, hashes: list[str]) -> int:
        """Insert without reporting (checkpoint resume path)."""
        mask = self.seen_and_add(hashes)
        return int(mask.sum())

    def size(self) -> int:
        return len(self._exact) if self.backend == "exact" else self._cuckoo.count

    def drain_new(self) -> list[str]:
        """Hashes added since the last drain (per-round seen snapshot)."""
        out, self._new_since_drain = self._new_since_drain, []
        return out

    # ---------------------------------------------------------- offer/resolve
    # Round-local first-wins dedup fused into the shard: tasks OFFER candidate
    # rows during a round (any arrival order); RESOLVE deterministically keeps
    # the minimum-sortkey offer per unseen hash, marks it seen, and returns the
    # winner rows.  This replaces a per-round groupby(url_hash) shuffle — the
    # shard actor IS the reduce point for its hash range.

    def offer(self, hashes: list[str], keys: list[str], payloads: list[tuple]) -> int:
        if not hasattr(self, "_pending"):
            self._pending: dict[str, tuple] = {}
        pend = self._pending
        contains = (
            self._exact.__contains__
            if self.backend == "exact"
            else (lambda h: self._cuckoo.contains(int(h[:16], 16)))
        )
        n = 0
        for h, k, p in zip(hashes, keys, payloads):
            if contains(h):
                continue
            prev = pend.get(h)
            if prev is None or k < prev[0]:
                pend[h] = (k, p)
            n += 1
        return n

    def resolve(self) -> list[tuple]:
        """Winners (url_hash-sorted) since last resolve; marks them seen."""
        pend = getattr(self, "_pending", None)
        if not pend:
            return []
        out = []
        for h in sorted(pend):
            _, payload = pend[h]
            if self.backend == "exact":
                self._exact.add(h)
            else:
                self._cuckoo.add(int(h[:16], 16))
            self._new_since_drain.append(h)
            out.append((h, *payload))
        self._pending = {}
        return out


class ShardedSeen:
    """Driver/task-side handle over the shard actors.

    Constructed once per crawl; the handle (actor refs only) is cheap to
    pickle into ``map_batches`` tasks, where :meth:`filter_new` fans a
    batch's hashes out to their shards in one round trip each.
    """

    def __init__(self, n_shards: int = 4, backend: str = "exact",
                 capacity_per_shard: int = 1 << 20) -> None:
        import ray

        self.n_shards = n_shards
        self.shards = [
            ray.remote(SeenShard)
            .options(num_cpus=0.25, max_concurrency=1)
            .remote(backend, capacity_per_shard)
            for _ in range(n_shards)
        ]

    def filter_new(self, hashes: list[str]) -> np.ndarray:
        """Mask of hashes never seen before (and mark them seen). Exact
        first-wins: per-hash routing + serialized actor execution."""
        import ray

        if not hashes:
            return np.zeros(0, dtype=bool)
        by_shard: list[list[int]] = [[] for _ in range(self.n_shards)]
        for i, h in enumerate(hashes):
            by_shard[shard_of(h, self.n_shards)].append(i)
        futs, idx_lists = [], []
        for s, idxs in enumerate(by_shard):
            if idxs:
                futs.append(self.shards[s].seen_and_add.remote([hashes[i] for i in idxs]))
                idx_lists.append(idxs)
        out = np.zeros(len(hashes), dtype=bool)
        for idxs, mask in zip(idx_lists, ray.get(futs)):
            out[np.asarray(idxs)] = mask
        return out

    def add_bulk(self, hashes: list[str]) -> None:
        import ray

        by_shard: list[list[str]] = [[] for _ in range(self.n_shards)]
        for h in hashes:
            by_shard[shard_of(h, self.n_shards)].append(h)
        ray.get([
            self.shards[s].add_bulk.remote(hs)
            for s, hs in enumerate(by_shard) if hs
        ])

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def drain_new(self) -> list[str]:
        import ray

        out: list[str] = []
        for part in ray.get([s.drain_new.remote() for s in self.shards]):
            out.extend(part)
        return out

    def offer(self, hashes: list[str], keys: list[str], payloads: list[tuple]) -> int:
        """Fan one batch's candidate rows out to their shards' pending pools."""
        import ray

        if not hashes:
            return 0
        by_shard: list[tuple[list, list, list]] = [([], [], []) for _ in range(self.n_shards)]
        for h, k, p in zip(hashes, keys, payloads):
            b = by_shard[shard_of(h, self.n_shards)]
            b[0].append(h)
            b[1].append(k)
            b[2].append(p)
        futs = [
            self.shards[s].offer.remote(*b) for s, b in enumerate(by_shard) if b[0]
        ]
        return int(sum(ray.get(futs)))

    def resolve(self) -> list[tuple]:
        """Deterministic union of all shards' winners, url_hash-sorted."""
        import ray

        out: list[tuple] = []
        for part in ray.get([s.resolve.remote() for s in self.shards]):
            out.extend(part)
        out.sort(key=lambda t: t[0])
        return out
