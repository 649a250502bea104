"""Stable 64-bit hashing, vectorized.

The reference checks URL/doc identity with MySQL primary-key existence
probes (reference app/service/vbpl.py:188-190, app/service/anle.py:139-141).
The engine replaces those with 64-bit content hashes probed against
partitioned Bloom/cuckoo filters (BASELINE.json north_rule), so the hash
must be (a) stable across processes and Ray workers, (b) vectorized.

``pandas.util.hash_array`` (siphash-style, C-vectorized) with a fixed
hash_key gives both. A pure-numpy FNV-1a is provided for raw bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "vbpl_crawl_ray_0"  # exactly 16 bytes, fixed => stable across processes

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def hash64(values) -> np.ndarray:
    """Stable uint64 hash of an array-like of strings (or bytes).

    Vectorized via pandas' C siphash implementation with a pinned key.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash64_one(value: str | bytes) -> int:
    """Scalar convenience wrapper around :func:`hash64`."""
    return int(hash64([value])[0])


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit over raw bytes (scalar; used for small control values)."""
    h = FNV_OFFSET
    with np.errstate(over="ignore"):
        for b in np.frombuffer(data, dtype=np.uint8):
            h = np.uint64(h ^ np.uint64(b)) * FNV_PRIME
    return int(h)


def mix64(h: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — derive an independent second hash stream from
    a uint64 array (used for Bloom double-hashing: idx_i = h1 + i*h2)."""
    h = np.asarray(h, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        h += np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return h


def md5_hash64(values) -> np.ndarray:
    """uint64 from the first 16 hex chars of md5 — THE deterministic
    64-bit hash contract shared with the DuckDB oracles
    (``CAST(CONCAT('0x', substr(md5(x), 1, 16)) AS UBIGINT)``). Slower
    than :func:`hash64` (Python loop over hashlib); used only by the
    oracle-backed sketch/near-dup twins where SQL must restate the hash."""
    import hashlib
    return np.fromiter(
        (int(hashlib.md5(v.encode()).hexdigest()[:16], 16) for v in values),
        dtype=np.uint64, count=len(values))


def md5_hex_prefix(keys, width: int = 8) -> np.ndarray:
    """First ``width`` hex chars of md5 over each string — THE
    deterministic row-hash contract shared with the DuckDB oracles
    (``substr(md5(x), 1, w)``). Hex strings of equal length compare
    lexicographically exactly like their numeric values, so thresholds
    are plain string compares in both engines. Every sampling/resampling
    operator routes through this one helper so the contract has a single
    definition."""
    import hashlib
    return np.array([hashlib.md5(k.encode()).hexdigest()[:width]
                     for k in keys])
