"""Explicit hash-bucketed shuffle patterns.

Ray Data's native ``groupby(...).aggregate/map_groups`` shuffles and then
pays per-group scheduling overhead — pathological when there are many tiny
groups (95k window keys took ~20s where DuckDB takes 50ms). The fix is the
classic explicit pattern: bucket rows by hash(key) % B in a vectorized
map_batches, shuffle only B coarse buckets, and run the per-key logic
VECTORIZED (pandas groupby) inside each bucket. One all-to-all over B
partitions instead of one per distinct key.

At cluster scale B is sized to the cluster (≈ 2-4x total cores); hot keys
can be salted into sub-buckets by extending ``bucket_of`` — the hook is the
single place partitioning is decided.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

_BUCKET = "__bucket"
_HKEY = "bucket_shuffle_0"  # exactly 16 bytes


def bucket_of(values, num_buckets: int) -> np.ndarray:
    """Deterministic bucket ids from any key column (int or str)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        h = arr.astype(np.uint64, copy=False)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        return (h % np.uint64(num_buckets)).astype(np.int64)
    return (pd.util.hash_array(arr.astype(object), hash_key=_HKEY)
            % num_buckets).astype(np.int64)


def compact_for_join(ds: rd.Dataset, num_blocks: int = 8) -> rd.Dataset:
    """Make a map_groups-derived dataset safe as a ``Dataset.join`` input.

    Ray's sort-based ``groupby().map_groups`` emits ZERO-COLUMN empty
    blocks at empty group boundaries. The hash-join aggregator builds each
    partition table from the shards it receives — a partition whose only
    shards came from those schema-less blocks becomes a zero-column table
    and pyarrow fails with 'No match or multiple matches for key field'.
    ``repartition`` coalesces blocks and drops the empties, restoring a
    consistent schema. Only needed on join inputs; plain consumers
    (iter_batches/to_pandas) skip empty blocks anyway."""
    return ds.repartition(num_blocks)


def bucketed_group_apply(ds: rd.Dataset, key: str,
                         bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
                         num_buckets: int = 8,
                         partial_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
                         ) -> rd.Dataset:
    """groupby(key)-equivalent with a coarse shuffle.

    ``partial_fn`` (optional): per-batch combiner BEFORE the shuffle (must
    keep ``key``). ``bucket_fn``: applied to one bucket's frame, must do its
    own per-key pandas groupby; all keys with the same hash bucket arrive
    together, keys never straddle buckets.
    """
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if partial_fn is not None:
            df = partial_fn(df)
        df = df.assign(**{_BUCKET: bucket_of(df[key].to_numpy(), num_buckets)})
        return df

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=[_BUCKET]))

    return (ds.map_batches(add_bucket, batch_format="pandas")
              .groupby(_BUCKET)
              .map_groups(apply, batch_format="pandas"))
