"""Cuckoo filter (Fan et al., CoNEXT'14) + sharded Ray actor pool.

Replaces the reference's URL-seen Manager dict (``src/crawler.py:110-115,351``
— one IPC round-trip per URL, the scalability killer) with hash-partitioned
filter shards holding ~1 byte/URL, probed with ONE batched RPC per Arrow batch
(north rule: "sharded cuckoo-filter URL-seen set held in actor-pool state").

Design for 10^10 URLs: partition = splitmix64(url) % n_shards → each shard
holds n/shards fingerprints; shards serialize to bytes for per-wave checkpoint
(``dump()``/``load()``), so a killed crawl resumes with its seen-state intact.

False positives would *drop* URLs; the engine therefore verifies filter hits
against the exact per-wave key set when exactness is required (SURVEY.md §2.6
note) — in the crawl pipeline the filter is a prefetch optimization, and the
sequential replay (pipelines/crawl.py) is the source of truth for the
reference-parity URL-seen set.
"""

from __future__ import annotations

import pickle

import numpy as np

from ..functions.hashing import splitmix64

_EMPTY = np.uint16(0)


class CuckooFilter:
    """Bucketed cuckoo filter: 4-way buckets, 16-bit fingerprints.

    ~2 bytes/item at <=95% load; insert kicks up to ``max_kicks`` times and
    reports False (filter full) instead of silently dropping.
    """

    def __init__(self, capacity: int, seed: int = 7, max_kicks: int = 250):
        n_buckets = 1
        while n_buckets * 4 < capacity / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.seed = seed
        self.max_kicks = max_kicks
        self.count = 0
        self._rng_state = np.uint64(seed * 2654435761 + 1)

    # -- hashing -------------------------------------------------------------
    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = splitmix64(keys.astype(np.uint64) ^ np.uint64(self.seed))
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == _EMPTY, np.uint16(1), fp)  # 0 = empty sentinel
        i1 = ((h >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = splitmix64(fp.astype(np.uint64))
        return ((i.astype(np.uint64) ^ mix) % np.uint64(self.n_buckets)).astype(np.int64)

    # -- batch ops -----------------------------------------------------------
    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt_index(i1, fp)
        b1 = self.table[i1]  # (n, 4)
        b2 = self.table[i2]
        return ((b1 == fp[:, None]).any(axis=1)) | ((b2 == fp[:, None]).any(axis=1))

    def add_batch(self, keys: np.ndarray) -> np.ndarray:
        """Insert each key (idempotent-ish: skips keys already present).

        Returns a bool array: True where the key is present after the call.
        """
        ok = np.ones(len(keys), dtype=bool)
        present = self.contains_batch(keys)
        fp_all, i1_all = self._fp_and_index(keys)
        for k in np.nonzero(~present)[0]:
            ok[k] = self._insert_one(int(i1_all[k]), np.uint16(fp_all[k]))
        return ok

    def seen_and_add_batch(self, keys: np.ndarray) -> np.ndarray:
        """The crawl primitive: returns seen-before mask, inserts the unseen."""
        seen = self.contains_batch(keys)
        fp_all, i1_all = self._fp_and_index(keys)
        for k in np.nonzero(~seen)[0]:
            self._insert_one(int(i1_all[k]), np.uint16(fp_all[k]))
        return seen

    def _insert_one(self, i1: int, fp: np.uint16) -> bool:
        for idx in (i1, int(self._alt_index(np.array([i1]), np.array([fp]))[0])):
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        idx = i1
        cur = fp
        for _ in range(self.max_kicks):
            self._rng_state = splitmix64(self._rng_state)
            slot = int(self._rng_state & np.uint64(3))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(self._alt_index(np.array([idx]), np.array([cur]))[0])
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # full — caller should grow / spill

    # -- checkpoint ----------------------------------------------------------
    def dump(self) -> bytes:
        return pickle.dumps(
            {
                "table": self.table,
                "seed": self.seed,
                "count": self.count,
                "rng": int(self._rng_state),
                "max_kicks": self.max_kicks,
            }
        )

    @classmethod
    def load(cls, blob: bytes) -> "CuckooFilter":
        d = pickle.loads(blob)
        f = cls.__new__(cls)
        f.table = d["table"]
        f.n_buckets = f.table.shape[0]
        f.seed = d["seed"]
        f.count = d["count"]
        f.max_kicks = d["max_kicks"]
        f._rng_state = np.uint64(d["rng"])
        return f


class SeenShard:
    """One URL-seen shard: a cuckoo filter + an exact spill set for safety.

    Run as a Ray actor (``ray.remote(SeenShard)``); all ops are batched.
    The exact set bounds memory by storing 64-bit key hashes only when the
    filter reports full (rare below the load factor).
    """

    def __init__(self, capacity: int = 1 << 20, seed: int = 7):
        self.filter = CuckooFilter(capacity, seed=seed)
        self.spill: set[int] = set()

    def seen_and_add(self, keys: np.ndarray) -> np.ndarray:
        seen = self.filter.seen_and_add_batch(keys)
        # any unseen key whose insert failed (filter full) goes to the exact
        # spill set, so the filter never false-negatives on inserted keys
        new = keys[~seen]
        if new.size:
            held = self.filter.contains_batch(new)
            for k in new[~held]:
                self.spill.add(int(k))
        if self.spill:
            for j, k in enumerate(keys):
                if not seen[j] and int(k) in self.spill:
                    seen[j] = True
        return seen

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = self.filter.contains_batch(keys)
        if self.spill:
            for j, k in enumerate(keys):
                if not out[j] and int(k) in self.spill:
                    out[j] = True
        return out

    def dump(self) -> bytes:
        return pickle.dumps({"filter": self.filter.dump(), "spill": self.spill})

    def load(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.filter = CuckooFilter.load(d["filter"])
        self.spill = d["spill"]

    def stats(self) -> dict:
        return {"count": self.filter.count, "buckets": self.filter.n_buckets, "spill": len(self.spill)}
