"""Actor-held incremental state for stream-shaped workloads.

Ray Data has no event-time runtime; for semantics that genuinely need
incremental state across arrivals (the guide's 'one actor per key-hash
bucket, fed batches in ts order'), this module keeps one StreamBucket
actor per key-hash bucket. The driver feeds each actor its bucket's
events in timestamp order; the actor maintains per-key running state
(count, sum, EMA) that any later batch continues from.

Ordering assumption (documented per the guide): events within one key
arrive in non-decreasing ts order — the feeder sorts each bucket's
slice before delivery, and keys never straddle buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .shuffle import bucket_of


@ray.remote(num_cpus=0)
class StreamBucket:
    """Per-bucket incremental state: user_id -> (count, sum, ema)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.state: dict = {}

    def feed(self, batch: pd.DataFrame) -> int:
        """Consume one ts-ordered batch; returns rows absorbed."""
        for uid, value in zip(batch["user_id"], batch["value"]):
            c, s, e = self.state.get(uid, (0, 0.0, None))
            e = value if e is None else (self.alpha * value
                                         + (1 - self.alpha) * e)
            self.state[uid] = (c + 1, s + value, e)
        return len(batch)

    def snapshot(self) -> pd.DataFrame:
        rows = [(uid, c, s, e) for uid, (c, s, e) in self.state.items()]
        return pd.DataFrame(rows, columns=["user_id", "n", "total", "ema"])


def run_stream(ds: rd.Dataset, num_buckets: int = 4, alpha: float = 0.1,
               feed_batch_rows: int = 2048,
               max_inflight: int = 64) -> pd.DataFrame:
    """Feed an events Dataset through bucket actors in ts order; returns
    the final per-user state union. Deterministic: routing is hash(key),
    order within bucket is (ts, event_id).

    Streaming: a distributed sort orders the log, then ``iter_batches``
    pulls one batch at a time — the driver never holds the full event log
    (the log itself stays in the object store). Per-actor ordering holds
    because actor tasks from a single submitter execute in submission
    order, and batches are submitted in global (ts, event_id) order."""
    actors = [StreamBucket.remote(alpha) for _ in range(num_buckets)]
    pending: list = []
    for batch in (ds.sort(["ts", "event_id"])
                    .iter_batches(batch_format="pandas",
                                  batch_size=feed_batch_rows)):
        b = bucket_of(batch["user_id"].to_numpy(), num_buckets)
        for bid in np.unique(b):
            pending.append(actors[bid].feed.remote(batch[b == bid]))
        if len(pending) >= max_inflight:   # bounded in-flight backpressure
            ray.get(pending)
            pending = []
    ray.get(pending)
    outs = ray.get([a.snapshot.remote() for a in actors])
    # an idle bucket snapshots an empty all-object frame whose dtypes
    # would fight the typed ones inside concat — exclude them
    outs = [o for o in outs if len(o)]
    if not outs:
        return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64),
                             "total": pd.Series(dtype=np.float64),
                             "ema": pd.Series(dtype=np.float64)})
    return (pd.concat(outs, ignore_index=True)
            .sort_values("user_id").reset_index(drop=True))
