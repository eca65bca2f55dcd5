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

import os

import numpy as np
import pyarrow as pa

# hex-nibble lookup for the vectorized shard router
_HEX_LUT = np.zeros(256, dtype=np.uint64)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX_LUT[_c] = _i
for _i, _c in enumerate(b"ABCDEF"):
    _HEX_LUT[_c] = 10 + _i
_HEX_LUT8 = _HEX_LUT.astype(np.uint8)  # small-output variant: a (n, 16)
# uint64 gather materializes 128 MB/M rows (seconds under memory pressure);
# the uint8 gather is 16 MB and the fold upcasts one column at a time


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
        # overflow stash: a failed eviction chain ends holding some OTHER
        # key's displaced fingerprint — dropping it would turn a previously
        # SEEN key into a false negative (re-crawl).  Stash (bucket, fp)
        # instead; membership checks it.  Stays tiny: _CuckooGen grows the
        # chain at 80 % load, so failed chains are rare.
        self.stash: set[tuple[int, int]] = set()

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
        if self._bucket_has(i1, fp) or self._bucket_has(i2, fp):
            return True
        return bool(self.stash) and (
            (i1, fp) in self.stash or (i2, fp) in self.stash
        )

    def contains_batch(self, hv: np.ndarray) -> np.ndarray:
        """Vectorized :meth:`contains` over uint64 hashes — the resolve
        path's membership test runs this once per shard per round instead
        of a per-row Python loop."""
        if not len(hv):
            return np.zeros(0, dtype=bool)
        fp = (hv & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        nb = np.uint64(self.n_buckets)
        i1 = ((hv >> np.uint64(16)) % nb).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fp.astype(np.uint64) *
               np.uint64(0x5BD1E995))) % nb).astype(np.int64)
        out = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        for si, sfp in self.stash:  # tiny (see __init__); vectorized per entry
            out |= ((i1 == si) | (i2 == si)) & (fp == sfp)
        return out

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
        # chain exhausted: the carried fp belongs to some earlier-displaced
        # key whose alternate bucket for that fp is exactly i — stash it so
        # no previously-inserted key is ever forgotten, then report
        # saturation (False -> the caller grows a new filter)
        if (i, fp) not in self.stash:
            self.stash.add((i, fp))
            self.count += 1
        return False

    def add_batch(self, hv: np.ndarray) -> np.ndarray:
        """Vectorized no-eviction insert: two placement waves (home bucket,
        then alternate) with collision-aware slot assignment — within a
        wave, the j-th key targeting a bucket takes that bucket's j-th
        empty slot, so writes never clobber each other.  Returns the
        placed mask; leftovers (needing evictions) go through :meth:`add`.
        """
        n = len(hv)
        placed = np.zeros(n, dtype=bool)
        if not n:
            return placed
        fp = (hv & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        nb = np.uint64(self.n_buckets)
        i1 = ((hv >> np.uint64(16)) % nb).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fp.astype(np.uint64) *
               np.uint64(0x5BD1E995))) % nb).astype(np.int64)
        for b_arr in (i1, i2):
            idx = np.flatnonzero(~placed)
            if not len(idx):
                break
            b = b_arr[idx]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            starts = np.concatenate(([True], bs[1:] != bs[:-1]))
            first_pos = np.flatnonzero(starts)
            pos = np.arange(len(bs)) - first_pos[np.cumsum(starts) - 1]
            rows = self.table[bs]
            em = rows == 0
            can = pos < em.sum(axis=1)
            if not can.any():
                continue
            tgt = idx[order[can]]
            cum = em[can].cumsum(axis=1)
            slot = (cum == (pos[can] + 1)[:, None]).argmax(axis=1)
            self.table[bs[can], slot] = fp[tgt]
            self.count += len(tgt)
            placed[tgt] = True
        return placed


class _CuckooGen:
    """One TTL generation of the cuckoo backend: a CHAIN of filters that
    grows when the newest filter passes ~80 % load (or rejects an insert
    after its eviction budget).  Cuckoo filters degrade sharply above ~90 %
    load — eviction chains approach MAX_KICKS per insert and then keys get
    DROPPED — so capacity mis-sizing must cost memory, not correctness or
    latency.  Membership checks every filter in the chain; inserts go to
    the newest."""

    GROW_LOAD = 0.8

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity
        self.filters = [CuckooFilter(capacity)]

    def contains(self, hv: int) -> bool:
        return any(f.contains(hv) for f in self.filters)

    def add(self, hv: int) -> None:
        f = self.filters[-1]
        if f.count >= self.GROW_LOAD * f.n_buckets * 4:
            f = CuckooFilter(self.capacity)
            self.filters.append(f)
        if not f.add(hv):
            # False = stored (table + stash) but saturated: grow for the
            # NEXT insert; hv itself is already queryable
            self.filters.append(CuckooFilter(self.capacity))

    def add_batch(self, hv: np.ndarray) -> None:
        """Chunked vectorized insert honoring the growth cap; stragglers
        that would need evictions fall back to the scalar path."""
        start, n = 0, len(hv)
        while start < n:
            f = self.filters[-1]
            room = int(self.GROW_LOAD * f.n_buckets * 4) - f.count
            if room <= 0:
                self.filters.append(CuckooFilter(self.capacity))
                continue
            chunk = hv[start : start + room]
            stragglers = chunk[~f.add_batch(chunk)]
            for x in stragglers:
                self.add(int(x))
            start += len(chunk)

    @property
    def count(self) -> int:
        return sum(f.count for f in self.filters)


def _fold_nibbles(nib: np.ndarray) -> np.ndarray:
    """Fold an (n, W) uint8 nibble matrix into uint64 values — the ONE
    shared hex-fold for hex16_batch / hex16_from_arrow / shard_of_batch."""
    val = np.zeros(len(nib), dtype=np.uint64)
    for i in range(nib.shape[1]):
        val = (val << np.uint64(4)) | nib[:, i].astype(np.uint64)
    return val


def hex16_batch(hashes) -> np.ndarray:
    """Vectorized ``int(h[:16], 16)`` over hex strings (the cuckoo key):
    fixed-width S16 cast + nibble lookup, zero per-row Python.  Values
    shorter than 16 chars right-align exactly like the scalar
    ``int(h[:16], 16)`` (the S16 null-padding would otherwise LEFT-align
    them, making the batch key disagree with the scalar insert paths)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.asarray(hashes, dtype="S16").view(np.uint8).reshape(-1, 16)
    val = _fold_nibbles(_HEX_LUT8[b])
    pad = (b == 0).sum(axis=1).astype(np.uint64)  # hex bytes are never \\0
    if pad.any():
        val >>= np.uint64(4) * pad
    return val


def hexn_from_arrow(arr: "pa.Array", width: int = 16) -> np.ndarray:
    """Vectorized ``int(h[:width], 16)`` straight off an Arrow string
    array's buffers — the object-dtype cast of ``np.asarray(strings,
    'S16')`` costs ~6 s/M rows, the buffer gather ~30 ms/M.  Processes per
    chunk (never ``combine_chunks``, which overflows int32 offsets past
    2 GiB of hashes); handles both ``string`` (int32 offsets) and
    ``large_string`` (int64 offsets) — anything else raises rather than
    silently misdecoding; falls back per chunk when any value is shorter
    than ``width`` code units (only crafted test fixtures are)."""
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    parts = []
    for c in chunks:
        n = len(c)
        if n == 0:
            continue
        if pa.types.is_string(c.type):
            off_dtype = np.int32
        elif pa.types.is_large_string(c.type):
            off_dtype = np.int64
        else:
            raise TypeError(
                f"hexn_from_arrow expects string/large_string, got {c.type}"
            )
        offsets = np.frombuffer(c.buffers()[1], dtype=off_dtype)[
            c.offset : c.offset + n + 1
        ].astype(np.int64)
        lens = offsets[1:] - offsets[:-1]
        if (lens < width).any():
            vals = c.to_pandas().to_numpy(dtype=object)
            if width == 16:
                parts.append(hex16_batch(vals))
            else:
                parts.append(
                    np.array(
                        [int(str(v)[:width], 16) for v in vals],
                        dtype=np.uint64,
                    )
                )
            continue
        data = np.frombuffer(c.buffers()[2], dtype=np.uint8)
        if (lens == lens[0]).all():
            # fixed-length hashes (the real case: 64-hex sha256): a
            # contiguous reshape replaces the fancy-index gather entirely
            L = int(lens[0])
            view = data[offsets[0] : offsets[0] + n * L].reshape(n, L)[:, :width]
            nib = _HEX_LUT8[view]
        else:
            idx = offsets[:-1, None] + np.arange(width)
            nib = _HEX_LUT8[data[idx]]
        parts.append(_fold_nibbles(nib))
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def hex16_from_arrow(arr: "pa.Array") -> np.ndarray:
    """:func:`hexn_from_arrow` at the cuckoo key width (first 16 nibbles)."""
    return hexn_from_arrow(arr, 16)


def shard_of(url_hash: str, n_shards: int) -> int:
    """Deterministic shard routing from the hex sha256 url hash."""
    return int(url_hash[:8], 16) % n_shards


def shard_of_batch(hashes, n_shards: int) -> np.ndarray:
    """Vectorized :func:`shard_of` over a batch of hex hashes.

    numpy's fixed-width ``S8`` cast truncates each string to its first 8
    bytes in C, and the nibble lookup replaces the per-row ``int(h[:8], 16)``
    — the whole route is loop-free (the offer path runs this once per parse
    task over every discovered link)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.asarray(hashes, dtype="S8").view(np.uint8).reshape(-1, 8)
    val = _fold_nibbles(_HEX_LUT8[b])
    pad = (b == 0).sum(axis=1).astype(np.uint64)  # right-align short hashes
    if pad.any():                                 # exactly like shard_of's
        val >>= np.uint64(4) * pad                # int(h[:8], 16)
    return (val % np.uint64(n_shards)).astype(np.int64)


class SeenShard:
    """One shard of the URL-seen set; deploy as a Ray actor.

    TTL (reference parity: the Redis dedup keyspace sets a 24 h TTL per key,
    ``/root/reference/crawler/services/redis_cache.py:55-75``, so recurring
    scheduled crawls revisit pages once their dedup window lapses):

    - ``exact`` backend: per-hash timestamps; :meth:`expire` sweeps entries
      older than ``ttl`` — exact expiry, byte-identical to the reference's
      per-key clock.
    - ``cuckoo`` backend: GENERATIONAL filters — inserts go to the current
      generation; membership checks all generations; every ``ttl/2`` the
      oldest of 3 generations is dropped wholesale.  An entry is therefore
      never expired EARLY (it lives at least ``ttl``) and at most ``1.5x
      ttl`` — the right trade at 10^10 keys, where per-key stamps would cost
      50x the filter itself.
    """

    GENERATIONS = 3

    def __init__(
        self, backend: str = "exact", capacity: int = 1 << 20,
        ttl: float | None = None,
    ) -> None:
        self.backend = backend
        self.ttl = ttl
        self.capacity = capacity
        self._exact: set[str] = set()
        self._stamps: dict[str, float] = {}   # exact+ttl only
        if backend == "cuckoo":
            self._gens: list[_CuckooGen] = [_CuckooGen(capacity)]
            self._window_start: float | None = None
        self._new_since_drain: list[str] = []

    # ------------------------------------------------------------- membership
    def _contains(self, h: str) -> bool:
        if self.backend == "exact":
            return h in self._exact
        hv = int(h[:16], 16)
        return any(g.contains(hv) for g in self._gens)

    def _insert(self, h: str, now: float | None) -> None:
        if self.backend == "exact":
            self._exact.add(h)
            if self.ttl is not None:
                self._stamps[h] = now if now is not None else 0.0
        else:
            self._gens[0].add(int(h[:16], 16))

    def seen_and_add(self, hashes: list[str], now: float | None = None) -> np.ndarray:
        """Atomic membership-test-and-insert; True where the hash was new."""
        out = np.zeros(len(hashes), dtype=bool)
        if self.backend == "exact":
            seen = self._exact
            stamps = self._stamps if self.ttl is not None else None
            stamp = now if now is not None else 0.0
            for i, h in enumerate(hashes):
                if h not in seen:
                    seen.add(h)
                    if stamps is not None:
                        stamps[h] = stamp
                    out[i] = True
        else:
            # vectorized: batch membership across all filters, then insert
            # only first occurrences (duplicates within one batch must get
            # False, matching the scalar first-wins semantics)
            hv = hex16_batch(hashes)
            seen_mask = np.zeros(len(hv), dtype=bool)
            for g in self._gens:
                for f in g.filters:
                    seen_mask |= f.contains_batch(hv)
            is_first = np.zeros(len(hv), dtype=bool)
            is_first[np.unique(hv, return_index=True)[1]] = True
            out = ~seen_mask & is_first
            self._gens[0].add_batch(hv[out])
        self._new_since_drain.extend(h for i, h in enumerate(hashes) if out[i])
        return out

    def expire(self, now: float) -> int:
        """Drop entries whose dedup window has lapsed; returns entries
        removed (exact) or generations rotated (cuckoo)."""
        if self.ttl is None:
            return 0
        if self.backend == "exact":
            cutoff = now - self.ttl
            dead = [h for h, t in self._stamps.items() if t <= cutoff]
            for h in dead:
                del self._stamps[h]
                self._exact.discard(h)
            return len(dead)
        window = self.ttl / (self.GENERATIONS - 1)
        if self._window_start is None:
            self._window_start = now
            return 0
        rotated = 0
        if now - self._window_start >= self.GENERATIONS * window:
            # long idle gap: every generation is stale — reset wholesale
            rotated = len(self._gens)
            self._gens = [_CuckooGen(self.capacity)]
            self._window_start = now
            return rotated
        while now - self._window_start >= window:
            self._gens.insert(0, _CuckooGen(self.capacity))
            if len(self._gens) > self.GENERATIONS:
                self._gens.pop()
            self._window_start += window
            rotated += 1
        return rotated

    def add_bulk(self, hashes: list[str], now: float | None = None) -> int:
        """Insert without reporting (checkpoint resume path)."""
        mask = self.seen_and_add(hashes, now)
        return int(mask.sum())

    def size(self) -> int:
        if self.backend == "exact":
            return len(self._exact)
        return sum(g.count for g in self._gens)

    def drain_new(self) -> list[str]:
        """Hashes added since the last drain (per-round seen snapshot)."""
        out, self._new_since_drain = self._new_since_drain, []
        return out

    def drain_count(self) -> int:
        """Count of hashes added since the last drain, without shipping the
        hashes themselves (default-mode seen_count: O(1) driver traffic)."""
        n = len(self._new_since_drain)
        self._new_since_drain = []
        return n

    def write_delta(self, path: str) -> int:
        """Persist (and clear) the hashes added since the last drain as ONE
        parquet file, written shard-side: at 10^10-URL scale per-round
        discoveries must never transit the driver, so each shard durably
        logs its own delta and the driver holds only O(shards) paths.  An
        EMPTY delta still writes a 0-row file — the file count encodes the
        writing run's shard count for resume-side rerouting.  Atomic:
        tmp-file + rename, so a crash mid-write never leaves a torn file."""
        import pyarrow.parquet as pq_

        out, self._new_since_drain = self._new_since_drain, []
        tmp = f"{path}.tmp"
        pq_.write_table(
            pa.table({"url_hash": pa.array(out, type=pa.string())}), tmp
        )
        os.replace(tmp, path)
        return len(out)

    def load_delta(
        self, paths: list[str], now: float | None = None,
        my_index: int | None = None, n_shards: int | None = None,
    ) -> int:
        """Bulk-load delta files shard-side (checkpoint resume) — the
        inverse of :meth:`write_delta`; hash rows never touch the driver.

        With ``my_index``/``n_shards`` set, rows routing to other shards are
        dropped (vectorized), so a resume with a DIFFERENT shard count can
        hand every shard the full file list and still end up with exact
        hash-range ownership."""
        import pyarrow.parquet as pq_

        total = 0
        for p in paths:
            col = pq_.read_table(p, columns=["url_hash"])["url_hash"]
            if my_index is not None and n_shards is not None:
                arr = col.to_numpy(zero_copy_only=False)
                arr = arr[shard_of_batch(arr, n_shards) == my_index]
                hashes = arr.tolist()
            else:
                hashes = col.to_pylist()
            if hashes:
                self.seen_and_add(hashes, now)
                total += len(hashes)
        self._new_since_drain = []  # loads are not "new" discoveries
        return total

    # ---------------------------------------------------------- offer/resolve
    # Round-local first-wins dedup fused into the shard: tasks OFFER candidate
    # blocks during a round (any arrival order); RESOLVE deterministically
    # keeps the minimum-sortkey offer per unseen hash, marks it seen, and
    # returns the winner rows AS AN ARROW FRONTIER BLOCK that stays in the
    # object store (the driver only ever holds the block's ObjectRef).  This
    # replaces a per-round groupby(url_hash) shuffle — the shard actor IS the
    # reduce point for its hash range — without the discoveries (which are
    # NOT budget-bounded: pages x avg-links per round) ever round-tripping
    # through the driver as Python objects.

    def offer_table(self, t: "pa.Table") -> int:
        """Queue one task's candidate block: columns (url_hash, sortkey,
        url, host, parent_hash).  Dedup/seen-filtering is deferred to
        :meth:`resolve_block` where it runs vectorized over the whole round."""
        if not hasattr(self, "_pending_tables"):
            self._pending_tables: list[pa.Table] = []
        self._pending_tables.append(t)
        return len(t)

    def resolve_block(
        self, priority: int, score: int, discovery_round: int,
        now: float | None = None,
    ) -> "pa.Table":
        """First-wins winners since the last resolve, as a frontier block.

        Winner per url_hash = minimum sortkey (golden spec: within a round
        every discovery shares one score, so the key reduces to
        ``parent_hash:dom_idx``); already-seen hashes drop; winners are
        marked seen and logged for drain.  Returns a FRONTIER_SCHEMA table
        (url_hash-sorted) built shard-side.
        """
        import pandas as pd

        from crawler_ray.pipelines.crawl import FRONTIER_SCHEMA, _empty_frontier

        tabs = getattr(self, "_pending_tables", None)
        self._pending_tables = []
        if not tabs:
            return _empty_frontier()
        t = pa.concat_tables(tabs)
        # first-wins per url_hash, all-Arrow: multithreaded C++ sort, then
        # keep the first row of each hash run (pandas mergesort on two
        # string keys was the resolve hot spot at millions of offers)
        t = t.sort_by([("url_hash", "ascending"), ("sortkey", "ascending")])
        n_all = len(t)
        if n_all:
            # run boundaries via a C-level string compare of the column
            # against itself shifted by one — no per-row Python objects
            import pyarrow.compute as _pc

            col = t["url_hash"]
            eq = _pc.equal(col.slice(1), col.slice(0, n_all - 1))
            first = np.concatenate(
                ([True], ~eq.to_numpy(zero_copy_only=False).astype(bool))
            )
            t = t.filter(pa.array(first, type=pa.bool_()))
        if self.backend == "exact":
            uh = np.asarray(t["url_hash"].to_pandas(), dtype=object)
            keep = ~pd.Series(uh, dtype=object).isin(self._exact).to_numpy()
            t = t.filter(pa.array(keep, type=pa.bool_()))
            uh = uh[keep]
            self._exact.update(uh)
            if self.ttl is not None:
                stamp = now if now is not None else 0.0
                self._stamps.update((h, stamp) for h in uh)
        else:
            # vectorized membership over every filter in every generation;
            # only genuinely-new keys reach the vectorized insert, and only
            # the WINNERS ever materialize as Python strings (for drain)
            hv = hex16_from_arrow(t["url_hash"])
            seen_mask = np.zeros(len(t), dtype=bool)
            for g in self._gens:
                for f in g.filters:
                    seen_mask |= f.contains_batch(hv)
            self._gens[0].add_batch(hv[~seen_mask])
            t = t.filter(pa.array(~seen_mask, type=pa.bool_()))
            uh = np.asarray(t["url_hash"].to_pandas(), dtype=object)
        self._new_since_drain.extend(uh)
        n = len(uh)
        if not n:
            return _empty_frontier()
        return pa.table(
            {
                "url": t["url"],
                "url_hash": t["url_hash"],
                "host": t["host"],
                "priority": pa.array([priority] * n, type=pa.int32()),
                "score": pa.array([score] * n, type=pa.int64()),
                "discovery_round": pa.array([discovery_round] * n, type=pa.int32()),
                "not_before_round": pa.array([0] * n, type=pa.int32()),
                "retry_count": pa.array([0] * n, type=pa.int32()),
                "lineage": t["parent_hash"],
            }
        ).cast(FRONTIER_SCHEMA)


class ShardedSeen:
    """Driver/task-side handle over the shard actors.

    Constructed once per crawl; the handle (actor refs only) is cheap to
    pickle into ``map_batches`` tasks, where :meth:`filter_new` fans a
    batch's hashes out to their shards in one round trip each.
    """

    def __init__(self, n_shards: int = 4, backend: str = "exact",
                 capacity_per_shard: int = 1 << 20,
                 ttl: float | None = None) -> None:
        import ray

        self.n_shards = n_shards
        self.ttl = ttl
        self.shards = [
            ray.remote(SeenShard)
            .options(num_cpus=0.25, max_concurrency=1)
            .remote(backend, capacity_per_shard, ttl)
            for _ in range(n_shards)
        ]

    def filter_new(self, hashes: list[str], now: float | None = None) -> np.ndarray:
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
                futs.append(
                    self.shards[s].seen_and_add.remote(
                        [hashes[i] for i in idxs], now
                    )
                )
                idx_lists.append(idxs)
        out = np.zeros(len(hashes), dtype=bool)
        for idxs, mask in zip(idx_lists, ray.get(futs)):
            out[np.asarray(idxs)] = mask
        return out

    def expire(self, now: float) -> int:
        """Apply the dedup-window TTL across all shards (no-op if ttl unset)."""
        import ray

        if self.ttl is None:
            return 0
        return int(sum(ray.get([s.expire.remote(now) for s in self.shards])))

    def add_bulk(self, hashes: list[str], now: float | None = None) -> None:
        """Bulk insert (legacy JSON-delta resume / tests).  With TTL enabled
        the loaded hashes are stamped at ``now`` — resume time approximates
        their original insert time (the deltas don't persist stamps).
        Routing is vectorized; prefer :meth:`load_delta_files` for real
        resumes (hashes never transit the driver there)."""
        import ray

        if not hashes:
            return
        arr = np.asarray(hashes, dtype=object)
        sh = shard_of_batch(arr, self.n_shards)
        futs = []
        for s in range(self.n_shards):
            part = arr[sh == s]
            if len(part):
                futs.append(self.shards[s].add_bulk.remote(part.tolist(), now))
        if futs:
            ray.get(futs)

    def write_deltas(self, dir_path: str) -> int:
        """Per-round seen-delta persistence: every shard writes its OWN
        parquet file under ``dir_path`` (``shard=K.parquet``), in parallel;
        returns the total new-hash count.  Driver traffic is O(shards)
        integers — this replaces the drain_new()-to-JSON round-trip that
        made checkpointing O(new URLs/round) on the driver."""
        import ray

        os.makedirs(dir_path, exist_ok=True)
        return int(sum(ray.get([
            s.write_delta.remote(os.path.join(dir_path, f"shard={k}.parquet"))
            for k, s in enumerate(self.shards)
        ])))

    def load_delta_files(
        self, files_by_shard: list[list[str]], now: float | None = None,
        reroute_from: int | None = None,
    ) -> int:
        """Resume-side bulk load: shard ``k`` reads its own file list
        (parallel, shard-side).

        Same shard count as the writer: pass each shard exactly its own
        delta file and leave ``reroute_from=None`` (no filtering needed —
        the writer's routing is already correct).  DIFFERENT shard count:
        pass every file to every shard and set ``reroute_from`` to THIS
        engine's (the reader's) shard count — each shard then keeps only
        the hashes that route to it under the current topology via the
        vectorized ownership filter (``shard_of(h, reroute_from) == k``).
        Passing the writer's count here would filter by a routing no
        lookup uses and silently lose dedup coverage."""
        import ray

        futs = [
            s.load_delta.remote(
                files, now,
                my_index=(k if reroute_from is not None else None),
                n_shards=reroute_from,
            )
            for k, (s, files) in enumerate(zip(self.shards, files_by_shard))
            if files
        ]
        return int(sum(ray.get(futs))) if futs else 0

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def drain_new(self) -> list[str]:
        import ray

        out: list[str] = []
        for part in ray.get([s.drain_new.remote() for s in self.shards]):
            out.extend(part)
        return out

    def drain_count(self) -> int:
        """Total hashes added since the last drain; hashes stay shard-side."""
        import ray

        return int(sum(ray.get([s.drain_count.remote() for s in self.shards])))

    def offer_block(self, t: "pa.Table") -> int:
        """Fan one task's candidate block out to its shards as Arrow slices.

        Runs INSIDE map_batches tasks (never on the driver); the block is
        routed with the vectorized shard router and each shard receives a
        zero-copy-serialized Arrow sub-table — no per-row Python tuples."""
        import ray

        if not len(t):
            return 0
        sh = shard_of_batch(t["url_hash"].to_numpy(zero_copy_only=False),
                            self.n_shards)
        futs = []
        for s in range(self.n_shards):
            mask = sh == s
            if mask.any():
                futs.append(self.shards[s].offer_table.remote(t.filter(pa.array(mask))))
        return int(sum(ray.get(futs)))

    def resolve_refs(
        self, priority: int, score: int, discovery_round: int,
        now: float | None = None,
    ) -> list:
        """One ObjectRef per shard to that shard's winner FRONTIER block.

        The driver passes these straight to ``ray.data.from_arrow_refs`` —
        it holds O(shards) refs, never the winner rows themselves."""
        return [
            s.resolve_block.remote(priority, score, discovery_round, now)
            for s in self.shards
        ]
