"""HLL accuracy and second-batch operator sanity."""

import numpy as np
import ray.data as rd

from vbpl_web_crawl_ray.functions.hashing import hash64
from vbpl_web_crawl_ray.pipelines.relational2 import (HyperLogLog,
                                                      approx_distinct)


def test_hll_accuracy():
    hll = HyperLogLog(p=12)
    n = 50_000
    hll.add_hashes(hash64([f"user-{i}" for i in range(n)]))
    est = hll.estimate()
    assert abs(est - n) / n < 0.05  # ~1.04/sqrt(4096) = 1.6% std error


def test_hll_merge_equals_union():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add_hashes(hash64([f"x{i}" for i in range(10_000)]))
    b.add_hashes(hash64([f"x{i}" for i in range(5_000, 15_000)]))
    u = HyperLogLog(p=12)
    u.add_hashes(hash64([f"x{i}" for i in range(15_000)]))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)


def test_approx_distinct_on_dataset(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    exact = ds.to_pandas()["user_id"].nunique()
    est = approx_distinct(ds, "user_id")
    assert abs(est - exact) / exact < 0.1


def test_hll_md5_accuracy_and_batch_invariance(sf_dir):
    """The md5-contract HLL twin estimates within the sketch's error
    bound, and its per-batch-distinct optimization cannot change the
    sketch: the register array from hashing each value once equals the
    distributed partial-merge result (max is idempotent)."""
    import pandas as pd

    from vbpl_web_crawl_ray.pipelines.relational2 import q_hll_distinct_md5

    exact = pd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])["user_id"].nunique()
    est = int(q_hll_distinct_md5(sf_dir)["approx_users"].iloc[0])
    assert abs(est - exact) / exact < 0.1
