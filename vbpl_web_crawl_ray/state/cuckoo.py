"""Cuckoo filter — the deletion-capable fallback for URL-seen membership.

north_rule: "partitioned Bloom filter (falling back to a cuckoo filter for
deletions)". The reference can *remove* seen-ness only by deleting DB rows
(soft delete via ``deleted_at``, reference app/model/base.py:38-44,76); a
Bloom filter cannot unlearn, so partitions that must honor deletions (e.g.
re-crawl of expired documents) use this structure instead.

Standard (2, 4)-cuckoo: two candidate buckets per item, 4 slots per bucket,
16-bit fingerprints, partial-key displacement (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14 — public algorithm).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import mix64

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4):
        # ~95% load factor max for b=4; size to the next power of two buckets
        n_buckets = 1
        while n_buckets * bucket_size < capacity / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)  # 0 = empty
        self.count = 0

    def _fp_and_buckets(self, h: int) -> tuple[int, int, int]:
        h = np.uint64(h)
        fp = int(h & np.uint64(0xFFFF)) or 1  # never 0 (0 marks empty)
        i1 = int(h >> np.uint64(16)) % self.n_buckets
        i2 = (i1 ^ int(mix64(np.array([fp], dtype=np.uint64))[0])) % self.n_buckets
        return fp, i1, i2

    def _alt(self, fp: int, i: int) -> int:
        return (i ^ int(mix64(np.array([fp], dtype=np.uint64))[0])) % self.n_buckets

    def _try_insert(self, fp: int, i: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, h: int) -> bool:
        """Insert one element hash; False if the filter is full."""
        fp, i1, i2 = self._fp_and_buckets(h)
        if self._try_insert(fp, i1) or self._try_insert(fp, i2):
            self.count += 1
            return True
        # displace
        rng = np.random.default_rng(np.uint64(h))  # deterministic kicks
        i = i1 if rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(self.bucket_size))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt(fp, i)
            if self._try_insert(fp, i):
                self.count += 1
                return True
        return False

    def contains(self, h: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(h)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def remove(self, h: int) -> bool:
        """Delete one occurrence; True if found. This is the capability a
        Bloom filter lacks (the reason this fallback exists)."""
        fp, i1, i2 = self._fp_and_buckets(h)
        for i in (i1, i2):
            hit = np.nonzero(self.table[i] == fp)[0]
            if len(hit):
                self.table[i, hit[0]] = 0
                self.count -= 1
                return True
        return False

    def contains_batch(self, hashes) -> np.ndarray:
        return np.fromiter((self.contains(int(h)) for h in np.asarray(hashes)),
                           dtype=bool, count=len(hashes))

    def snapshot(self) -> dict:
        return {"n_buckets": self.n_buckets, "bucket_size": self.bucket_size,
                "count": self.count, "table": self.table.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = snap["n_buckets"]
        cf.bucket_size = snap["bucket_size"]
        cf.count = snap["count"]
        cf.table = np.frombuffer(snap["table"], dtype=np.uint16).reshape(
            cf.n_buckets, cf.bucket_size).copy()
        return cf
