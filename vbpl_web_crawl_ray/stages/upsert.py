"""Idempotent upsert sink — last-write-wins merge + partitioned overwrite.

The reference upserts row-by-row into MySQL (existence probe then
insert-or-update, app/service/vbpl.py:186-252); re-crawls are "resume by
replay" because the upsert is idempotent. The engine form (SURVEY.md A7/J1):

1. per-key last-write-wins reduce (bucketed shuffle, per-batch combiner)
2. merge with the existing table (read old, union, reduce again)
3. write each hash-partition directory ATOMICALLY (temp dir + rename),
   so a failed run can be re-run and finished partitions are simply
   overwritten with identical content — never half-written.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import ray.data as rd

from .shuffle import bucket_of, bucketed_group_apply


def last_write_wins(ds: rd.Dataset, key_cols: list[str],
                    ts_col: str | list[str],
                    num_buckets: int | None = None) -> rd.Dataset:
    """Keep the newest row per key. Pass a LIST of ts/tiebreak columns
    forming a total order (e.g. ["ts", "event_id"]) for determinism under
    any input partitioning; a bare timestamp with ties falls back to
    arrival order like the reference's overwrite-on-replay."""
    ts_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(ts_cols, kind="mergesort")
                  .groupby(key_cols, as_index=False).tail(1))

    return bucketed_group_apply(ds, key_cols[0], combiner,
                                num_buckets=num_buckets, partial_fn=combiner)


def upsert_parquet(ds: rd.Dataset, out_dir: str, key_cols: list[str],
                   ts_col: str, num_buckets: int | None = None,
                   driver_merge_threshold: int = 1_000_000) -> str:
    """Merge ``ds`` into the parquet table at ``out_dir`` (hash-partitioned
    by key into ``bucket=*/`` dirs), last-write-wins per key. Small results
    lay out on the driver; above ``driver_merge_threshold`` rows the
    partitioned write runs distributed."""
    from .shuffle import resolve_num_buckets
    num_buckets = resolve_num_buckets(num_buckets)
    key = key_cols[0]
    if os.path.isdir(out_dir) and any(
            e.startswith("bucket=") for e in os.listdir(out_dir)):
        existing = rd.read_parquet(out_dir)
        # hive partitioning restores the bucket as a column on read (normal
        # hive-table semantics) -> drop it so the union schema matches the
        # incoming dataset
        existing = existing.map_batches(
            lambda df: df.drop(columns=[c for c in df.columns
                                        if c in ("__b", "bucket")]),
            batch_format="pandas")
        ds = ds.union(existing)
    merged = last_write_wins(ds, key_cols, ts_col, num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__b=bucket_of(df[key].to_numpy(), num_buckets))

    # materialize ONCE: count() on a materialized dataset is metadata, and
    # both the driver and the distributed layout consume the same blocks —
    # no double execution of the merged plan
    bucketed = merged.map_batches(add_bucket, batch_format="pandas").materialize()
    pdf = bucketed.to_pandas() \
        if bucketed.count() < driver_merge_threshold else None
    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    if pdf is not None:
        for b, sub in pdf.groupby("__b"):
            pdir = os.path.join(tmp, f"bucket={b}")
            os.makedirs(pdir, exist_ok=True)
            sub.drop(columns="__b").sort_values(key_cols).to_parquet(
                os.path.join(pdir, "part-0.parquet"), index=False)
    else:  # large path: distributed hive-partitioned write (one dir per
        # key-hash bucket — the resumable layout at scale)
        bucketed.write_parquet(tmp, partition_cols=["__b"])
        # normalize dir names to the bucket=*/ layout
        for e in os.listdir(tmp):
            if e.startswith("__b="):
                os.rename(os.path.join(tmp, e),
                          os.path.join(tmp, "bucket=" + e.split("=", 1)[1]))
    # atomic swap: rename old away, new in (a crash leaves either old or new)
    old = f"{out_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return out_dir


def compact_crawl_output(out_dir: str, table: str = "payload",
                         key: str = "image_id") -> str:
    """Collapse the per-round crawl output into one upserted table:
    rounds are versions, later rounds win per key (A7 last-write-wins).
    Re-runnable: compaction of a compacted+unchanged input is a no-op
    rewrite with identical content."""
    import ray.data as rd
    ds = rd.read_parquet(f"{out_dir}/{table}")  # hive round=* partitions

    def cast_round(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["round"] = df["round"].astype("int64")
        return df

    ds = ds.map_batches(cast_round, batch_format="pandas")
    return upsert_parquet(ds, f"{out_dir}/{table}_compacted", [key], "round")
