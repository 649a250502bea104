"""Partitioned Bloom filter for URL-seen membership (north_rule).

Replaces the reference's per-row MySQL primary-key existence probes
(reference app/service/vbpl.py:188-190, app/service/anle.py:139-141) with an
approximate membership structure sized for 10^10-URL frontiers: each frontier
partition holds one Bloom filter over the uint64 hashes of canonicalized URLs
it owns, so memory per partition = m/8 bytes and probes are O(k) bit tests,
vectorized over whole batches with numpy.

No false negatives (a URL once added always reads as seen); false-positive
rate is set by (m, k). At 10^10 URLs across P partitions with 1% FP, each
partition needs ~1.2 GB — the partitioning is what makes the scale work.

Double hashing: bit index_i = (h1 + i*h2) mod m with h2 from a SplitMix64
remix of h1 (Kirsch & Mitzenmacher, "Less Hashing, Same Performance").
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.hashing import mix64


class BloomFilter:
    """Vectorized Bloom filter over precomputed uint64 element hashes."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.num_bits = ((m + 63) // 64) * 64
        self.num_hashes = max(1, round(self.num_bits / capacity * math.log(2)))
        self.bits = np.zeros(self.num_bits // 64, dtype=np.uint64)
        self.count = 0  # elements added (approximate if duplicates added)

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) matrix of bit positions for n element hashes."""
        h1 = np.asarray(hashes, dtype=np.uint64)
        h2 = mix64(h1) | np.uint64(1)  # odd => full-period stride
        i = np.arange(self.num_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def add(self, hashes: np.ndarray) -> np.ndarray:
        """Add a batch; returns a bool mask of which elements were NEW
        (False = already present / FP). One pass, fully vectorized."""
        hashes = np.atleast_1d(np.asarray(hashes, dtype=np.uint64))
        idx = self._indices(hashes)
        word, bit = idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63))
        present = (self.bits[word] & bit) != 0
        was_present = present.all(axis=1)
        # intra-batch duplicates: only the first occurrence of a hash is "new"
        _, first_idx = np.unique(hashes, return_index=True)
        is_first = np.zeros(len(hashes), dtype=bool)
        is_first[first_idx] = True
        # set bits (duplicate word indices are fine with |= via ufunc.at)
        np.bitwise_or.at(self.bits, word.ravel(), bit.ravel())
        new = ~was_present & is_first
        self.count += int(new.sum())
        return new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.atleast_1d(np.asarray(hashes, dtype=np.uint64))
        idx = self._indices(hashes)
        word, bit = idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=1)

    # ---- checkpointing (north_rule: filter snapshots per partition) ----

    def snapshot(self) -> dict:
        return {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "count": self.count,
            "bits": self.bits.tobytes(),
        }

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        bf = cls(snap["capacity"], snap["fp_rate"])
        bf.bits = np.frombuffer(snap["bits"], dtype=np.uint64).copy()
        bf.count = snap["count"]
        return bf
