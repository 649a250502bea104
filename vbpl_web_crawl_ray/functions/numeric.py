"""Numeric kernels shared across stages.

``round_half_away`` mirrors SQL ROUND (half away from zero, the DuckDB /
ANSI behavior) instead of numpy's banker's rounding, so Ray results
value-hash identically to the DuckDB oracles on exact .5 boundaries
(e.g. 137/32 = 4.28125 -> 4.2813, not 4.2812).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 4):
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out


def blob_matrix(blobs, dtype) -> np.ndarray:
    """Decode a column of equal-width binary blobs into an (n, k) matrix
    with ONE buffer copy (``b"".join`` + one frombuffer) instead of a
    per-row frombuffer/stack loop — the verify stages run this over
    candidate sets orders of magnitude larger than the corpus."""
    blobs = list(blobs)
    if not blobs:
        return np.empty((0, 0), dtype=dtype)
    flat = np.frombuffer(b"".join(blobs), dtype=dtype)
    return flat.reshape(len(blobs), -1)
